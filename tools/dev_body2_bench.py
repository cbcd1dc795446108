"""A/B the two-score stacked body (engine_pallas.body2) against the
one-score body on the headline HiFi banded distance workload.

Usage: python tools/dev_body2_bench.py [both|one|two]
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

import jax.numpy as jnp
import numpy as np
from pathlib import Path

from wfa_tpu.ops.engine_pallas import PallasConfig, align_batch_pallas
from wfa_tpu.ops.packing import pack_batch
from wfa_tpu.types import Penalties
from wfa_tpu.utils.io import read_seq_file

batch = read_seq_file(Path("tests/data/test_hifi.seq"))
reps = 8
pats = batch.patterns * reps
txts = batch.texts * reps
n = len(pats)

lmax = max(max(len(p), len(t)) for p, t in zip(pats, txts))
nwp = ((lmax // 16 + 8 + 127) // 128) * 128
pat, plen, vp = pack_batch(pats, nwp)
txt, tlen, vt = pack_batch(txts, nwp)
args = (jnp.asarray(pat), jnp.asarray(txt), jnp.asarray(plen),
        jnp.asarray(tlen), jnp.asarray(vp & vt))

mode = sys.argv[1] if len(sys.argv) > 1 else "both"
# (two_score_body, extend_partial) variants:
runs = {
    "one": [(0, False)],
    "two": [(-1, False)],
    "both": [(0, False), (-1, False)],
    "partial": [(0, False), (0, True)],
    "all": [(0, False), (-1, False), (0, True), (-1, True)],
}[mode]
ref_dist = None
for tsb, ep in runs:
    cfg = PallasConfig(
        penalties=Penalties(2, 3, 1), max_steps=3000, wf_width=512,
        tile_batch=8, band=25, two_score_body=tsb, extend_partial=ep,
    )
    out = align_batch_pallas(cfg, *args)
    dist = np.asarray(out["distance"])
    fin = np.asarray(out["finished"])
    assert fin.all(), f"tsb={tsb}: {(~fin).sum()} unfinished"
    if ref_dist is None:
        ref_dist = dist
    else:
        assert (dist == ref_dist).all(), "distance mismatch between bodies!"
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        out = align_batch_pallas(cfg, *args)
        np.asarray(out["distance"])
        dt = time.time() - t0
        best = max(best, n / dt)
    print(f"two_score_body={tsb} stacked={cfg.stacked_scores} "
          f"extend_partial={ep}: {best:.0f} aln/s", flush=True)
