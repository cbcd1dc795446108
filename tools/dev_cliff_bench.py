"""Measure the active_working_set > 32 penalty cliff (VERDICT r2 weak #6).

Penalty sets with max(x, o+e) >= 32 exceed the Pallas kernel's rolling
32-score existence bitmask and route to the XLA engine
(aligner.py PALLAS_MAX_AWS).  This measures the user-visible slowdown on
one representative workload: 512 x 1kbp pairs, 5% error, x=30 (Pallas)
vs x=40 (XLA route), distance mode.
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

for x in (30, 40):
    pen = Penalties(x, 6, 2)
    opts = AlignmentOptions(
        penalties=pen, compute_cigar=False, max_error=4000
    )
    t0 = time.time()
    res = align_pairs(pats, txts, opts)
    warm = time.time() - t0
    t0 = time.time()
    res = align_pairs(pats, txts, opts)
    dt = time.time() - t0
    aws = pen.active_working_set
    eng = "pallas" if aws <= 32 else "xla"
    print(
        f"x={x} aws={aws} engine={eng}: {n / dt:.0f} aln/s "
        f"(first call incl. compile {warm:.0f}s), "
        f"mean dist {np.mean([r.error for r in res]):.0f}",
        flush=True,
    )
