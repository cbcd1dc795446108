"""Per-step cost attribution for the banded distance kernel.

Runs the kernel on unalignable random pairs with a hard score_cap so every
tile executes exactly score_cap loop iterations, then ablates the extension
and the parent-window reads (timing-only debug knobs) to attribute the
per-step cost.  Results feed BASELINE.md's speed-of-light section.
"""
import sys
import time

sys.path.insert(0, ".")
import os

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/wfa_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

import jax.numpy as jnp
import numpy as np

from wfa_tpu.ops.engine_pallas import PallasConfig, align_batch_pallas
from wfa_tpu.ops.packing import pack_batch
from wfa_tpu.types import Penalties

CAP = 256
B = 64
L = 14000

rng = np.random.default_rng(5)
bases = np.frombuffer(b"ACGT", dtype=np.uint8)
pats = [rng.choice(bases, size=L).tobytes() for _ in range(B)]
txts = [rng.choice(bases, size=L).tobytes() for _ in range(B)]  # unrelated

nwp = ((L // 16 + 8 + 127) // 128) * 128
pat, plen, vp = pack_batch(pats, nwp)
txt, tlen, vt = pack_batch(txts, nwp)
pen = Penalties(2, 3, 1)
base = PallasConfig(
    penalties=pen, max_steps=100000, wf_width=512, tile_batch=8, band=25,
    score_cap=CAP,
)
args = (
    jnp.asarray(pat), jnp.asarray(txt),
    jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
)

variants = [
    ("exact-full", {"band": -1}),
    ("exact-no-extend", {"band": -1, "debug_skip_extend": True}),
]
for name, kw in variants:
    cfg = dataclasses.replace(base, **kw)
    out = align_batch_pallas(cfg, *args)
    np.asarray(out["distance"])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = align_batch_pallas(cfg, *args)
        np.asarray(out["distance"])
        best = min(best, time.time() - t0)
    steps = CAP * (B // 8)
    print(f"{name:10s}: {best*1e3:7.1f} ms  ({best/steps*1e6:6.2f} us/step"
          f" per 8-lane tile)")
