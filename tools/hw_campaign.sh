#!/bin/bash
# Round-3 HW measurement campaign (tools/HW_RUNBOOK.md automated).
# Run ONCE when the axon TPU tunnel is back: bash tools/hw_campaign.sh
# Steps run serially (axon serializes concurrent clients); each logs to
# /tmp/hw_logs/NN_name.log and keeps going on failure so one bad step
# doesn't block the rest.
set -u
cd "$(dirname "$0")/.."
LOGDIR=/tmp/hw_logs
mkdir -p "$LOGDIR"

run() {
  local name="$1"; shift
  local log="$LOGDIR/${name}.log"
  echo "=== $name: $* (log: $log)"
  local t0=$SECONDS
  timeout 3600 "$@" >"$log" 2>&1
  local rc=$?
  echo "    rc=$rc wall=$((SECONDS - t0))s; tail:"
  tail -3 "$log" | sed 's/^/    /'
}

# 1. Loop-body A/B — the VERDICT #1 lever (body1 / body2 / extend_partial).
run 01_body2_ab python tools/dev_body2_bench.py all

# 2. CIGAR parity of body2 on HW (chunk packing can't be interpret-tested).
run 02_hw_tests env WFA_TPU_TEST_HW=1 python -m pytest tests/test_tpu_hw.py -q

# 3. HBM-ring wide exact: >certificate distances stay on device.
run 03_ring_5k python tools/dev_ring_bench.py
run 04_ring_8k python tools/dev_ring_bench.py 16 8000 0.3

# 4. 20kbp burst recall table on the Pallas kernel.
run 05_burst_recall python tools/nanopore_recall.py --burst

# 5. Penalty-cliff measurement (working set > 64 -> XLA route).
run 06_cliff python tools/dev_cliff_bench.py

# 6. Wide-exact span/tile sweep + aligner-vs-kernel overhead.
run 07_tile_sweep python tools/dev_tile_sweep.py
run 08_wide_sweep python tools/dev_wide_sweep.py

# 7. Headline bench last, with whatever defaults the A/B decided
#    (flip PallasConfig.two_score_body default first if body2 lost).
run 09_bench python bench.py

echo "=== campaign done; logs in $LOGDIR"
