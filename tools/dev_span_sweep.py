"""One-config throughput + real-dynamics counters on the HiFi workload.

Usage: WFA_STAGE_CHUNKS=N python tools/dev_span_sweep.py SPAN [reps]

Prints aln/s for the real banded distance run (results asserted against the
span-96 defaults) plus the extension counters, including the wide-body
staged-serve vs full-table-sweep split (cols 6/7) — the quantity the
stage-chunks knob controls (serve cap = STAGE_CHUNKS*128 - span - 1 words).
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

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from wfa_tpu.ops.engine_pallas import PallasConfig, align_batch_pallas
from wfa_tpu.ops.packing import pack_batch
from wfa_tpu.types import Penalties
from wfa_tpu.utils.io import read_seq_file

span = int(sys.argv[1]) if len(sys.argv) > 1 else 96
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
sc = os.environ.get("WFA_STAGE_CHUNKS", "1")

batch = read_seq_file(Path("tests/data/test_hifi.seq"))
pats = batch.patterns * reps
txts = batch.texts * reps
n = len(pats)

lmax = max(max(len(p), len(t)) for p, t in zip(pats, txts))
nwp = ((lmax // 16 + 8 + 127) // 128) * 128
pat, plen, vp = pack_batch(pats, nwp)
txt, tlen, vt = pack_batch(txts, nwp)
args = (jnp.asarray(pat), jnp.asarray(txt), jnp.asarray(plen),
        jnp.asarray(tlen), jnp.asarray(vp & vt))

base = dict(penalties=Penalties(2, 3, 1), max_steps=3000, wf_width=512,
            tile_batch=8, band=25, extend_span=span)

cfg = PallasConfig(**base)
out = align_batch_pallas(cfg, *args)
dist = np.asarray(out["distance"])
assert np.asarray(out["finished"]).all()

best = 0.0
for _ in range(3):
    t0 = time.time()
    out = align_batch_pallas(cfg, *args)
    np.asarray(out["distance"])
    best = max(best, n / (time.time() - t0))

cnt = align_batch_pallas(PallasConfig(**base, debug_counters=True), *args)
assert (np.asarray(cnt["distance"]) == dist).all()
C = np.asarray(cnt["counters"])[::8].astype(np.int64)
tot = C.sum(axis=0)
calls = max(int(tot[0]), 1)
print(f"span={span} SC={sc}: {best:7.0f} aln/s | ext_calls {tot[0]} "
      f"strides/call {tot[1]/calls:.2f} serve/call {tot[6]/calls:.2f} "
      f"fullsweep/call {tot[7]/calls:.2f}", flush=True)
