"""Re-measure tile_batch on HiFi banded under lane compaction + cost-ordered
tiles (both landed after the original tile-8 choice): wider tiles amortize
the extension's latency chains across 2-4x the sublanes, if finish-time
variance inside a tile doesn't eat the gain."""
import sys, time
sys.path.insert(0, ".")
import os, jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/wfa_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from pathlib import Path

from wfa_tpu.ops.engine_pallas import PallasConfig, align_batch_pallas
from wfa_tpu.ops.packing import pack_batch
from wfa_tpu.types import Penalties
from wfa_tpu.utils.io import read_seq_file
from wfa_tpu.utils.presort import divergence_scores

batch = read_seq_file(Path("tests/data/test_hifi.seq"))
reps = 8
pats = batch.patterns * reps
txts = batch.texts * reps
n = len(pats)
lens = np.array([max(len(p), len(t)) for p, t in zip(pats, txts)])

order_mode = sys.argv[1] if len(sys.argv) > 1 else "presort"
if order_mode == "presort":
    hints = divergence_scores(pats, txts, lens)
    order = np.argsort(-hints, kind="stable")
    pats = [pats[i] for i in order]
    txts = [txts[i] for i in order]

lmax = int(lens.max())
nwp = ((lmax // 16 + 8 + 127) // 128) * 128
pat, plen, vp = pack_batch(pats, nwp)
txt, tlen, vt = pack_batch(txts, nwp)
args = (jnp.asarray(pat), jnp.asarray(txt), jnp.asarray(plen),
        jnp.asarray(tlen), jnp.asarray(vp & vt))

for tile in (8, 16, 32):
    cfg = PallasConfig(
        penalties=Penalties(2, 3, 1), max_steps=3000, wf_width=512,
        tile_batch=tile, band=25,
    )
    out = align_batch_pallas(cfg, *args)
    assert np.asarray(out["finished"]).all()
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        out = align_batch_pallas(cfg, *args)
        np.asarray(out["distance"])
        best = max(best, n / (time.time() - t0))
    print(f"tile {tile:3d} ({order_mode}): {best:8.1f} aln/s")
