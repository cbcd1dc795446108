"""Real-dynamics extension counters on the HiFi workload (HW): how many
extension calls, wide-stride body executions, scattered (full-width)
dispatches, compact dispatches, probe survivors, and active lanes the real
run performs — ground truth the timing-only ablations can't give (their
offsets don't advance, so their control flow is fake)."""
import os
import sys

sys.path.insert(0, ".")
import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/wfa_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from wfa_tpu.ops.engine_pallas import PallasConfig, align_batch_pallas
from wfa_tpu.ops.packing import pack_batch
from wfa_tpu.types import Penalties
from wfa_tpu.utils.io import read_seq_file

batch = read_seq_file(Path("tests/data/test_hifi.seq"))
pats = batch.patterns
txts = batch.texts
n = len(pats)
# Pad to a tile multiple
while len(pats) % 8:
    pats = pats + [pats[0]]
    txts = txts + [txts[0]]

lmax = max(max(len(p), len(t)) for p, t in zip(pats, txts))
nwp = ((lmax // 16 + 8 + 127) // 128) * 128
pat, plen, vp = pack_batch(pats, nwp)
txt, tlen, vt = pack_batch(txts, nwp)
args = (jnp.asarray(pat), jnp.asarray(txt), jnp.asarray(plen),
        jnp.asarray(tlen), jnp.asarray(vp & vt))

base = dict(penalties=Penalties(2, 3, 1), max_steps=3000, wf_width=512,
            tile_batch=8, band=25, extend_span=96, probe_staged=False)

ref = align_batch_pallas(PallasConfig(**base), *args)
cnt = align_batch_pallas(PallasConfig(**base, debug_counters=True), *args)
assert (np.asarray(ref["distance"]) == np.asarray(cnt["distance"])).all()
assert (np.asarray(ref["finished"]) == np.asarray(cnt["finished"])).all()

C = np.asarray(cnt["counters"])[::8]  # one row per tile
D = np.asarray(cnt["distance"]).reshape(-1, 8)
names = ["ext_calls", "stride_bodies", "scattered", "compact",
         "probe_survivors", "active_in"]
print(f"{'tile':>4} {'dmax':>5} " + " ".join(f"{s:>15}" for s in names))
for t in range(C.shape[0]):
    print(f"{t:>4} {D[t].max():>5} "
          + " ".join(f"{C[t, i]:>15}" for i in range(6)))
tot = C.sum(axis=0)
print("totals:", {names[i]: int(tot[i]) for i in range(6)})
calls = max(int(tot[0]), 1)
print(f"per ext call: strides {tot[1]/calls:.2f}  scattered share "
      f"{tot[2]/calls:.3f}  compact share {tot[3]/calls:.3f}  "
      f"survivors {tot[4]/calls:.2f}  active {tot[5]/calls:.1f}")
