"""Find the real device ceiling for the VMEM-resident wide EXACT window.

Round-2 pinned W at 6144 (tile 8, span 4, vmem_limit 24MB) by assumption;
this sweeps W x tile x vmem_limit upward and validates scores against the
CPU oracle on a high-divergence synthetic pair set whose distances exceed
the old certificate (dist > o + e*(6144/2+1) = 3076 at penalties 2,3,1).

Usage: python tools/dev_wide_sweep.py [quick]
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

from wfa_tpu.ops.engine_pallas import PallasConfig, align_batch_pallas
from wfa_tpu.ops.packing import pack_batch
from wfa_tpu.types import Penalties

import bench

# ~10kbp pairs at 35% error: distances ~4000-5000 — past the W=6144
# certificate (3076), previously CPU-fallback-only.
rng = np.random.default_rng(11)
bases = np.frombuffer(b"ACGT", dtype=np.uint8)
n = 8
pats = [rng.choice(bases, size=10000).tobytes() for _ in range(n)]
txts = bench._mutate_batch(rng, pats, 0.35)

pen = Penalties(2, 3, 1)
lmax = max(max(len(p), len(t)) for p, t in zip(pats, txts))
nwp = ((lmax // 16 + 8 + 127) // 128) * 128
pat, plen, vp = pack_batch(pats, nwp)
txt, tlen, vt = pack_batch(txts, nwp)
args = (jnp.asarray(pat), jnp.asarray(txt), jnp.asarray(plen),
        jnp.asarray(tlen), jnp.asarray(vp & vt))

oracle = None
if "--oracle" in sys.argv:
    from wfa_tpu import native
    t0 = time.time()
    od, _, _ = native.cpu_align_batch(
        pats, txts, pen, np.ones(n, dtype=np.int32), False
    )
    dt0 = time.time() - t0
    print(f"CPU oracle: {dt0:.1f}s ({n / dt0:.2f} aln/s), "
          f"dists {od.tolist()}", flush=True)
    oracle = od

quick = "quick" in sys.argv
sweeps = [
    # (W, tile, span, vmem_MB)
    (8192, 8, 4, 32),
    (8192, 8, 4, 64),
    (12288, 8, 4, 64),
    (16384, 8, 4, 64),
    (16384, 8, 2, 64),
    (24576, 8, 2, 96),
    (32768, 8, 2, 128),
]
if quick:
    sweeps = sweeps[:2]

for (W, tile, span, mb) in sweeps:
    cert = pen.o + pen.e * (W // 2 + 1)
    cfg = PallasConfig(
        penalties=pen, max_steps=min(cert + 1, 8192), wf_width=W,
        tile_batch=tile, extend_span=span, score_cap=min(cert + 1, 8192),
        vmem_limit_bytes=mb << 20,
    )
    try:
        t0 = time.time()
        out = align_batch_pallas(cfg, *args)
        dist = np.asarray(out["distance"])
        fin = np.asarray(out["finished"])
        t_compile = time.time() - t0
        t0 = time.time()
        out = align_batch_pallas(cfg, *args)
        np.asarray(out["distance"])
        dt = time.time() - t0
        ok = ""
        if oracle is not None:
            match = (dist[fin] == oracle[fin]).all() if fin.any() else True
            ok = f" oracle_match={match}"
        print(
            f"W={W} tile={tile} span={span} vmem={mb}MB: "
            f"{fin.sum()}/{n} finished, dists {dist.tolist()}, "
            f"{n / dt:.1f} aln/s (compile {t_compile:.0f}s){ok}",
            flush=True,
        )
    except Exception as ex:
        print(f"W={W} tile={tile} span={span} vmem={mb}MB: "
              f"FAILED {type(ex).__name__}: {str(ex)[:200]}", flush=True)
