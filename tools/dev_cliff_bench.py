"""Measure the penalty working-set cliff (VERDICT r2 weak #6).

Round 3 widened the Pallas kernel's rolling existence bitmask to TWO u32
words, so working sets up to 64 scores stay on the Pallas path (x=40 used
to route to the XLA engine).  This measures, on 512 x 1kbp pairs at 5%
error: x=30 and x=40 on Pallas (the former cliff is gone — the x=40
number IS the recovered speed), and x=70 (aws=71 > 64, the remaining
genuine cliff, routed to the CPU engine on accelerators).
"""
import os
import sys
import time

sys.path.insert(0, ".")
import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/wfa_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

import bench
from wfa_tpu.aligner import align_pairs
from wfa_tpu.params import AlignmentOptions
from wfa_tpu.types import Penalties

rng = np.random.default_rng(3)
bases = np.frombuffer(b"ACGT", dtype=np.uint8)
n = 512
pats = [rng.choice(bases, size=1000).tobytes() for _ in range(n)]
txts = bench._mutate_batch(rng, pats, 0.05)

# NOTE: the (40, "xla") forced leg was removed — the XLA engine's
# gather-heavy program CRASHED the axon TPU worker (measured 2026-08-19);
# aws>64 on an accelerator now routes to the CPU engine (aligner.py), so
# the x=70 row below measures the real product path.  Set
# WFA_TPU_FORCE_XLA_TPU=1 to re-measure the old XLA-on-TPU route at your
# own risk.
for x, backend in ((30, "auto"), (40, "auto"), (70, "auto")):
    pen = Penalties(x, 6, 2)
    opts = AlignmentOptions(
        penalties=pen, compute_cigar=False, max_error=4000, backend=backend
    )
    t0 = time.time()
    res = align_pairs(pats, txts, opts)
    warm = time.time() - t0
    t0 = time.time()
    res = align_pairs(pats, txts, opts)
    dt = time.time() - t0
    aws = pen.active_working_set
    # The aws>64 reroute only fires on accelerators (aligner.py): on a CPU
    # platform the x=70 row actually runs the XLA engine.
    if backend != "auto":
        eng = backend
    elif aws <= 64:
        eng = "pallas"
    elif jax.default_backend() == "cpu" or os.environ.get(
        "WFA_TPU_FORCE_XLA_TPU"
    ):
        eng = "xla"
    else:
        eng = "cpu-engine"
    print(
        f"x={x} aws={aws} engine={eng}: {n / dt:.0f} aln/s "
        f"(first call incl. compile {warm:.0f}s), "
        f"mean dist {np.mean([r.error for r in res]):.0f}",
        flush=True,
    )
