"""Trace-check the HW campaign's kernel configs WITHOUT hardware.

`jax.eval_shape` runs full JAX tracing of the Pallas kernels (shape math,
index arithmetic, config asserts, pallas_call plumbing) but stops before
Mosaic lowering — so every Python-/trace-level bug in a config the HW
campaign plans to launch (tools/hw_campaign.sh) surfaces here in seconds
on CPU, instead of burning scarce tunnel time.  Mosaic/VMEM failures
remain HW-only; this narrows the on-HW surprise surface to those.

Usage: python tools/dev_trace_check.py
"""
from __future__ import annotations

import functools
import sys
import traceback

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from wfa_tpu.ops.engine_pallas import PallasConfig, align_batch_pallas_impl
from wfa_tpu.ops.traceback_pallas import TracebackConfig, align_cigar_fused_impl
from wfa_tpu.types import Penalties

P = Penalties(2, 3, 1)


def args_for(b: int, nwp: int):
    return (
        jax.ShapeDtypeStruct((b, nwp), jnp.uint32),
        jax.ShapeDtypeStruct((b, nwp), jnp.uint32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )


def check(name: str, fn, *args) -> bool:
    try:
        jax.eval_shape(fn, *args)
        print(f"  ok   {name}")
        return True
    except Exception:
        print(f"  FAIL {name}")
        traceback.print_exc(limit=4)
        return False


def main() -> int:
    fails = 0
    hifi = args_for(400, 1024)   # HiFi x8 corpus shapes (~14 kbp)
    ring5k = args_for(16, 384)   # dev_ring_bench default (5 kbp)
    ring8k = args_for(16, 640)   # dev_ring_bench 8 kbp variant
    nano = args_for(128, 1408)   # nanopore 20 kbp burst reads

    print("== HiFi banded distance (dev_body2_bench variants) ==")
    for tsb in (0, -1):
        for ep in (False, True):
            cfg = PallasConfig(
                penalties=P, max_steps=3000, wf_width=512, tile_batch=8,
                band=25, two_score_body=tsb, extend_partial=ep,
            )
            fails += not check(
                f"banded dist tsb={tsb} ep={ep}",
                functools.partial(align_batch_pallas_impl, cfg), *hifi,
            )

    print("== HiFi banded CIGAR fused (bench.py secondary) ==")
    for tsb in (0, -1):
        cfg = PallasConfig(
            penalties=P, max_steps=3000, wf_width=512, tile_batch=8,
            band=25, compute_cigar=True, score_cap=1024, two_score_body=tsb,
        )
        tb = TracebackConfig(
            penalties=P, wf_width=512, score_cap=1024, banded=True,
            lo_pad=cfg.lo_pad,
        )
        fails += not check(
            f"banded CIGAR fused tsb={tsb}",
            functools.partial(align_cigar_fused_impl, cfg, tb), *hifi,
        )

    print("== HBM-ring exact (dev_ring_bench / bench.py ring metric) ==")
    # (W, tile, score_cap, args) — W=8064 is dev_ring_bench's default
    # max_error=4000 plan; 16384 is the WFA_TPU_RING_MAX_W ceiling with
    # the certificate-capped score loop; 12288 the documented fallback.
    for w, tile, cap, a in (
        (8064, 8, 0, ring5k),
        (12288, 8, 6148, ring8k),
        (16384, 8, 8196, ring8k),
    ):
        cfg = PallasConfig(
            penalties=P, max_steps=cap - 1 if cap else 4000, wf_width=w,
            tile_batch=tile, band=-1, ring_hbm=True,
        )
        fails += not check(
            f"ring dist W={w} tile={tile}",
            functools.partial(align_batch_pallas_impl, cfg), *a,
        )

    print("== HBM-ring CIGAR (wide exact CIGAR past the VMEM cap) ==")
    cfg = PallasConfig(
        penalties=P, max_steps=4000, wf_width=8064, tile_batch=8, band=-1,
        ring_hbm=True, compute_cigar=True, score_cap=4001,
    )
    tb = TracebackConfig(
        penalties=P, wf_width=8064, score_cap=4001, banded=False,
    )
    fails += not check(
        "ring CIGAR fused W=8064",
        functools.partial(align_cigar_fused_impl, cfg, tb), *ring5k,
    )

    print("== tile sweep (dev_tile_sweep) ==")
    for tile in (16, 32):
        cfg = PallasConfig(
            penalties=P, max_steps=3000, wf_width=512, tile_batch=tile,
            band=25,
        )
        fails += not check(
            f"banded dist tile={tile}",
            functools.partial(align_batch_pallas_impl, cfg),
            *args_for(tile * 8, 1024),
        )

    print("== nanopore burst (20 kbp banded, W up to 1024) ==")
    for w in (128, 512, 1024):
        cfg = PallasConfig(
            penalties=P, max_steps=4000, wf_width=w, tile_batch=8, band=25,
        )
        fails += not check(
            f"banded dist 20kbp W={w}",
            functools.partial(align_batch_pallas_impl, cfg), *nano,
        )

    print(f"\n{'ALL CONFIGS TRACE' if not fails else f'{fails} FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
