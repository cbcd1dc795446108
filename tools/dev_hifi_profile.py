"""Cost profile of the banded distance kernel on the REAL HiFi workload
(no forced score caps — prior rounds' ablations used random pairs with
forced caps, which mis-weights the extension: real HiFi pairs have
distances 12-58 and ~14k bases of total LCP extension per pair).

Sweeps extension span / first_span / staging variants; all variants produce
identical distances (asserted), so throughput differences isolate the
extension structure.
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

import dataclasses
from pathlib import Path

import jax.numpy as jnp
import numpy as np

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

base = dict(
    penalties=Penalties(2, 3, 1), max_steps=3000, wf_width=512,
    tile_batch=8, band=25, persistent_stage=0,
)

variants = [
    ("span96 -pstg", {"extend_span": 96, "probe_staged": False,
                      "uniform_serve": False}),
    ("probe-only -pstg (timing)", {"extend_span": 96,
                                   "probe_staged": False,
                                   "debug_probe_only": True,
                                   "score_cap": 80}),
    ("dispatch-only (timing)", {"extend_span": 96, "probe_staged": False,
                                "debug_stride_mode": 1, "score_cap": 80}),
    ("one-stride (timing)", {"extend_span": 96, "probe_staged": False,
                             "debug_stride_mode": 2, "score_cap": 80}),
    ("one-stride +unif (timing)", {"extend_span": 96, "probe_staged": False,
                                   "uniform_serve": True,
                                   "debug_stride_mode": 2, "score_cap": 80}),
    ("full -pstg capped (timing)", {"extend_span": 96, "probe_staged": False,
                                    "score_cap": 80}),
    ("skip-extend (timing only)", {"debug_skip_extend": True,
                                   "score_cap": 80}),
]
ref = None
for name, kw in variants:
    cfg = PallasConfig(**{**base, **kw})
    out = align_batch_pallas(cfg, *args)
    dist = np.asarray(out["distance"])
    fin = np.asarray(out["finished"])
    wrong = "debug" in str(kw)
    note = ""
    if not wrong:
        assert fin.all(), f"{name}: {(~fin).sum()} unfinished"
        if ref is None:
            ref = dist
        elif "wf_width" in kw:
            # A narrower band is a different heuristic; report instead of
            # asserting (W256 measured 4 mismatched distances on this set).
            note = f"  [{int((dist != ref).sum())} dist mismatches]"
        else:
            assert (dist == ref).all(), f"{name}: distance mismatch"
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        out = align_batch_pallas(cfg, *args)
        np.asarray(out["distance"])
        dt = time.time() - t0
        best = max(best, n / dt)
    print(f"{name:28s}: {best:6.0f} aln/s{note}", flush=True)
