"""HBM-ring wide-exact benchmark (VERDICT r2 item 3 done-criterion).

Synthetic high-divergence long reads whose exact distances EXCEED the
W=6144 VMEM-ring certificate (dist >= o + e*(6144/2 + 1) = 3077 at
penalties 2,3,1) — pairs the round-2 build had to demote to the CPU
engine — now run on device through the HBM-ring kernel.  Checks scores
against the native CPU oracle and reports aln/s for both.

Usage: python tools/dev_ring_bench.py [n_pairs] [len] [err]
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

from wfa_tpu.aligner import align_pairs
from wfa_tpu.params import AlignmentOptions
from wfa_tpu.types import Penalties
from wfa_tpu import native

n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
L = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
err = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5

rng = np.random.default_rng(7)
bases = np.frombuffer(b"ACGT", dtype=np.uint8)
pats, txts = [], []
for _ in range(n):
    p = rng.choice(bases, size=L)
    t = p.copy()
    k = int(L * err)
    t[rng.choice(L, size=k, replace=False)] = rng.choice(bases, size=k)
    pats.append(bytes(p))
    txts.append(bytes(t))

pen = Penalties(2, 3, 1)
opts = AlignmentOptions(
    penalties=pen, max_error=4600, backend="pallas", cpu_fallback=False,
    data_parallel=False,
)

t0 = time.time()
res = align_pairs(pats, txts, opts)
t_warm = time.time() - t0
t0 = time.time()
res = align_pairs(pats, txts, opts)
t_dev = time.time() - t0

on_dev = sum(r is not None and r.finished_on_accelerator for r in res)
dists = [r.error if r is not None else -1 for r in res]
print(f"device: {on_dev}/{n} on accelerator, dists {dists[:8]}...")
print(f"device: {n / t_dev:.1f} aln/s (warm; first call {t_warm:.1f}s)")
assert on_dev == n, "ring mode should keep every pair on device"
assert min(d for d in dists) > 3077, (
    "workload too easy: distances must exceed the W=6144 certificate"
)

t0 = time.time()
cpu_scores, _, _ = native.cpu_align_batch(
    pats, txts, pen, np.ones(n, dtype=bool), compute_cigar=False
)
t_cpu = time.time() - t0
print(f"cpu oracle: {n / t_cpu:.2f} aln/s")
assert list(cpu_scores) == dists, "score mismatch vs CPU oracle!"
print(f"OK: golden scores; speedup {t_cpu / t_dev:.1f}x over 1 CPU core")
