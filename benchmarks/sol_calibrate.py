"""Speed-of-light calibration for BASELINE.md's roofline model.

Measures, on the attached TPU chip, the achieved throughput of the three
primitive operation classes the WFA kernels are built from:

1. plain int32 VPU ops on (8, 128) vregs (dependent hash chain),
2. `tpu.dynamic_gather` (take_along_axis) on (8, 128) int32 vregs,
3. vector->scalar sync (a jnp reduction feeding a scalar cond).

Methodology: the host link here has a large fixed dispatch->fetch latency
(~23 ms) and `block_until_ready` is unreliable, so each primitive is timed
at two iteration counts with a forced `np.asarray` fetch and the rate is
taken from the DIFFERENCE — the fixed overhead cancels.

Run: python benchmarks/sol_calibrate.py   (needs the TPU; ~1 min warm)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/wfa_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INNER = 16


def _timed_pair(make_fn, n1, n2, *args):
    """Best-of-3 forced-fetch times at iteration counts n1 < n2."""
    f1, f2 = make_fn(n1), make_fn(n2)
    np.asarray(f1(*args))
    np.asarray(f2(*args))
    t1 = t2 = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(f1(*args))
        t1 = min(t1, time.time() - t0)
        t0 = time.time()
        np.asarray(f2(*args))
        t2 = min(t2, time.time() - t0)
    return t1, t2


def bench_vpu_ops():
    """Dependent int32 hash chain: 8 vector ops per inner rep."""

    def make(iters):
        def kernel(x_ref, o_ref):
            def body(i, v):
                for _ in range(INNER):
                    v = v * 1103515245 + 12345
                    v = v ^ jax.lax.shift_right_logical(v, 5)
                    v = v + jax.lax.shift_left(v, 3)
                    v = jnp.maximum(v, v ^ 255)
                return v

            o_ref[:] = jax.lax.fori_loop(0, iters, body, x_ref[:])

        return jax.jit(lambda x: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )(x))

    n1, n2 = 200_000, 800_000
    t1, t2 = _timed_pair(make, n1, n2, jnp.zeros((8, 128), jnp.int32))
    dops = (n2 - n1) * INNER * 8
    ns = (t2 - t1) * 1e9 / dops
    print(f"VPU int32 vreg-ops (dependent chain): {1.0/ns:.2f} G/s "
          f"({ns:.2f} ns/op)  [t1={t1*1e3:.1f}ms t2={t2*1e3:.1f}ms]")
    return 1e9 / ns


def bench_gather():
    """Dependent dynamic_gather chain on one (8,128) vreg."""

    def make(iters):
        def kernel(x_ref, i_ref, o_ref):
            idx0 = i_ref[:]

            def body(i, v):
                for _ in range(INNER):
                    v = jnp.take_along_axis(
                        v, idx0 ^ (v & 127), axis=1
                    )
                return v

            o_ref[:] = jax.lax.fori_loop(0, iters, body, x_ref[:])

        return jax.jit(lambda x, i: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )(x, i))

    x = jnp.asarray(np.random.randint(0, 128, (8, 128)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, 128, (8, 128)), jnp.int32)
    n1, n2 = 50_000, 200_000
    t1, t2 = _timed_pair(make, n1, n2, x, idx)
    dg = (n2 - n1) * INNER
    ns = (t2 - t1) * 1e9 / dg
    print(f"dynamic_gather (8,128): {1e3/ns:.1f} M/s ({ns:.1f} ns/gather)  "
          f"[t1={t1*1e3:.1f}ms t2={t2*1e3:.1f}ms]")
    return 1e9 / ns


def bench_scalar_sync():
    """Vector reduce feeding a scalar branch, once per loop iteration."""

    def make(iters):
        def kernel(x_ref, o_ref):
            def body(i, v):
                m = jnp.max(v)
                return jax.lax.cond(m > 0, lambda: v + 1, lambda: v - 1)

            o_ref[:] = jax.lax.fori_loop(0, iters, body, x_ref[:])

        return jax.jit(lambda x: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )(x))

    n1, n2 = 20_000, 80_000
    t1, t2 = _timed_pair(make, n1, n2, jnp.ones((8, 128), jnp.int32))
    ns = (t2 - t1) * 1e9 / (n2 - n1)
    print(f"vector->scalar sync + cond: {ns:.0f} ns/sync  "
          f"[t1={t1*1e3:.1f}ms t2={t2*1e3:.1f}ms]")
    return 1e9 / ns


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}")
    bench_vpu_ops()
    bench_gather()
    bench_scalar_sync()
