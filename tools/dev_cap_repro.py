"""Repro: banded distance with a score_cap ABOVE every pair's distance must
finish every pair, identically to the uncapped run (observed on HW: HiFi
pairs with dist<=58 came back unfinished under score_cap=80)."""
import contextlib
import sys

sys.path.insert(0, ".")
import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from wfa_tpu.ops.engine_pallas import PallasConfig, align_batch_pallas
from wfa_tpu.ops.packing import pack_batch
from wfa_tpu.types import Penalties

rng = np.random.default_rng(7)
BASES = np.frombuffer(b"ACGT", np.uint8)


def mutate(seq, nsubs):
    s = seq.copy()
    pos = rng.choice(len(s), nsubs, replace=False)
    s[pos] = BASES[(np.searchsorted(BASES, s[pos]) + 1) % 4]
    return s


pats, txts = [], []
for i in range(8):
    p = BASES[rng.integers(0, 4, 1200)]
    t = mutate(p, 10 + 3 * i)   # distances ~2*(10..31) with x=2
    pats.append(p.tobytes())
    txts.append(t.tobytes())

nwp = ((1200 // 16 + 8 + 127) // 128) * 128
pat, plen, vp = pack_batch(pats, nwp)
txt, tlen, vt = pack_batch(txts, nwp)
args = (jnp.asarray(pat), jnp.asarray(txt), jnp.asarray(plen),
        jnp.asarray(tlen), jnp.asarray(vp & vt))

base = dict(penalties=Penalties(2, 3, 1), max_steps=500, wf_width=512,
            tile_batch=8, band=25)

on_tpu = jax.default_backend() != "cpu"
ctx = (contextlib.nullcontext() if on_tpu
       else pltpu.force_tpu_interpret_mode())
with ctx:
    ref = align_batch_pallas(PallasConfig(**base), *args)
    cap = align_batch_pallas(PallasConfig(**base, score_cap=100), *args)
rd, rf = np.asarray(ref["distance"]), np.asarray(ref["finished"])
cd, cf = np.asarray(cap["distance"]), np.asarray(cap["finished"])
print("uncapped:", rd, rf)
print("capped  :", cd, cf)
assert rf.all(), "uncapped run must finish"
assert (rd <= 70).all(), "distances should sit well under the cap"
assert cf.all() and (cd == rd).all(), "score_cap=100 changed results!"
print("OK")
