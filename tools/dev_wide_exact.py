"""Dev experiment: wide exact Pallas kernel on the 100x10kbp golden set."""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")
import os

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/wfa_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from wfa_tpu.ops.engine_pallas import PallasConfig, align_batch_pallas
from wfa_tpu.ops.packing import pack_batch
from wfa_tpu.types import Penalties
from wfa_tpu.utils.io import read_seq_file

W = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
BT = int(sys.argv[2]) if len(sys.argv) > 2 else 8
SPAN = int(sys.argv[3]) if len(sys.argv) > 3 else 16
STAGED = (sys.argv[4] != "0") if len(sys.argv) > 4 else True

data = Path("tests/data")
batch = read_seq_file(data / "seq_10K_n100.seq")
golden = json.loads((data / "seq_10K_n100.golden.json").read_text())
expect = np.array([-v for v in golden["results_10K_n100_x2o3e1"]])

pats, txts = batch.patterns, batch.texts
n = len(pats)
n_pad = ((n + BT - 1) // BT) * BT
pats = pats + [b""] * (n_pad - n)
txts = txts + [b""] * (n_pad - n)
lmax = max(max(len(p), len(t)) for p, t in zip(pats, txts))
nwp = ((lmax // 16 + 8 + 127) // 128) * 128
pat, plen, vp = pack_batch(pats, nwp)
txt, tlen, vt = pack_batch(txts, nwp)
pen = Penalties(2, 3, 1)
cert_bound = pen.o + pen.e * (W // 2 + 1)
cfg = PallasConfig(
    penalties=pen, max_steps=3000, wf_width=W, tile_batch=BT, band=-1,
    score_cap=min(3000, cert_bound) + 1, extend_span=SPAN, staged_extend=STAGED,
)
args = (
    jnp.asarray(pat), jnp.asarray(txt),
    jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
)
t0 = time.time()
out = align_batch_pallas(cfg, *args)
dist = np.asarray(out["distance"])
print(f"compile+run: {time.time()-t0:.1f}s")
fin = np.asarray(out["finished"])[:n]
dist = dist[:n]
ok = (dist == expect)
cert = dist < cert_bound
print(f"W={W} BT={BT} span={SPAN} staged={STAGED}: finished={fin.sum()}/{n} "
      f"golden={ok.sum()}/{n} certified={(cert & fin).sum()}/{n} "
      f"dmax={dist[fin].max(initial=0)} cert_bound={cert_bound}")
best = 0.0
for _ in range(2):
    t0 = time.time()
    out = align_batch_pallas(cfg, *args)
    np.asarray(out["distance"])
    best = max(best, n / (time.time() - t0))
print(f"throughput: {best:.1f} aln/s")
