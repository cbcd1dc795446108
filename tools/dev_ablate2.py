"""Extension cost on REAL data: HiFi pairs, forced step count, full vs
no-extend (timing only), RTT amortized over many tiles."""
import sys, time, dataclasses
sys.path.insert(0, ".")
import os, jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/wfa_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from wfa_tpu.ops.engine_pallas import PallasConfig, align_batch_pallas
from wfa_tpu.ops.packing import pack_batch
from wfa_tpu.types import Penalties
from wfa_tpu.utils.io import read_seq_file
from pathlib import Path

CAP = 256
batch = read_seq_file(Path("tests/data/test_hifi.seq"))
reps = 8
pats = batch.patterns * reps
txts = batch.texts * reps
n = len(pats)
lmax = max(max(len(p), len(t)) for p, t in zip(pats, txts))
nwp = ((lmax // 16 + 8 + 127) // 128) * 128
pat, plen, vp = pack_batch(pats, nwp)
txt, tlen, vt = pack_batch(txts, nwp)
pen = Penalties(2, 3, 1)
base = PallasConfig(penalties=pen, max_steps=100000, wf_width=512,
                    tile_batch=8, band=25, score_cap=CAP)
args = (jnp.asarray(pat), jnp.asarray(txt), jnp.asarray(plen),
        jnp.asarray(tlen), jnp.asarray(vp & vt))
for name, kw in [("full", {}), ("no-extend", {"debug_skip_extend": True}),
                 ("no-wread", {"debug_skip_wread": True})]:
    cfg = dataclasses.replace(base, **kw)
    out = align_batch_pallas(cfg, *args)
    np.asarray(out["distance"])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = align_batch_pallas(cfg, *args)
        np.asarray(out["distance"])
        best = min(best, time.time() - t0)
    steps = CAP * (n // 8)
    print(f"{name:10s}: {best*1e3:7.1f} ms total, "
          f"({(best - 0.023)/steps*1e6:6.2f} us/step per tile, RTT-corrected)")
