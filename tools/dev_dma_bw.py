"""Measure achieved HBM<->VMEM DMA bandwidth with the access pattern an
HBM-resident wavefront ring would use: per score step, read 4 parent rows
and write 3 new rows, double-buffered so reads prefetch one step ahead.

Feeds BASELINE.md's analysis of whether an HBM-spill exact kernel
(reference: sequence_alignment_kernel.cu:51-78's gmem wavefront spill)
can beat the CPU fallback for ultra-wide wavefronts — per step the ring
moves 7 x BT x W x 4 bytes, so aln/s is bandwidth-bound at
BW / (7 * BT * W * 4 * steps).
"""
import functools
import json
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT, W = 8, 4096
READS, WRITES = 4, 3
ROWS = 64


def kernel(steps, x_ref, o_ref, buf, obuf, sem_r, sem_w, acc_ref):
    span = ROWS - READS - 1

    def rd(i, slot):
        row = jax.lax.rem(i, span)
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(row, READS)], buf.at[slot], sem_r.at[slot]
        )

    rd(jnp.int32(0), 0).start()

    def body(i, acc):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < steps)
        def _():
            rd(i + 1, 1 - slot).start()

        rd(i, slot).wait()
        vals = buf[slot]
        acc = acc + vals[0, :, 0:1]

        @pl.when(i >= 2)
        def _():
            # Retire the write issued two steps ago from this slot.
            pltpu.make_async_copy(
                obuf.at[slot],
                o_ref.at[pl.ds(jax.lax.rem(i - 2, span), WRITES)],
                sem_w.at[slot],
            ).wait()

        obuf[slot] = vals[:WRITES] + 1
        pltpu.make_async_copy(
            obuf.at[slot],
            o_ref.at[pl.ds(jax.lax.rem(i, span), WRITES)],
            sem_w.at[slot],
        ).start()
        return acc

    acc = jax.lax.fori_loop(
        0, steps, body, jnp.zeros((BT, 1), jnp.int32)
    )
    # Retire the last two in-flight writes (steps is static).
    for back in (2, 1):
        i = steps - back
        if i >= 0:
            pltpu.make_async_copy(
                obuf.at[i % 2],
                o_ref.at[pl.ds(i % span, WRITES)],
                sem_w.at[i % 2],
            ).wait()

    acc_ref[:, :] = acc


def run(steps):
    x = jnp.zeros((ROWS, BT, W), jnp.int32)
    fn = pl.pallas_call(
        functools.partial(kernel, steps),
        out_shape=[
            jax.ShapeDtypeStruct((ROWS, BT, W), jnp.int32),
            jax.ShapeDtypeStruct((BT, 1), jnp.int32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.TPUMemorySpace.ANY)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.TPUMemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.TPUMemorySpace.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, READS, BT, W), jnp.int32),
            pltpu.VMEM((2, WRITES, BT, W), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return fn(x)


t = {}
for steps in (256, 2048):
    _, acc = run(steps)          # compile + warm
    np.asarray(acc)
    t0 = time.time()
    _, acc = run(steps)
    np.asarray(acc)
    t[steps] = time.time() - t0
    print(f"steps={steps}: {t[steps] * 1e3:.1f} ms total", flush=True)

b_per_step = (READS + WRITES) * BT * W * 4
bw = b_per_step * (2048 - 256) / (t[2048] - t[256])
per_step_us = (t[2048] - t[256]) / (2048 - 256) * 1e6
print(json.dumps({
    "bytes_per_step": b_per_step,
    "per_step_us": round(per_step_us, 2),
    "achieved_GBps": round(bw / 1e9, 1),
}), flush=True)
