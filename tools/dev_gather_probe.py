"""Probe Mosaic lowering shapes for the extension's serve gathers.

Q1: does `jnp.take_along_axis(table[BT,128], idx[BT,W], axis=1)` lower when
    the table is one lane-vreg and idx spans W/128 vregs?  If yes, the serve
    in _gather_chunks doesn't need its python pieces loop (code size O(1) in
    W instead of O(W/128) — the HBM-ring first-compile lever).
Q2: throughput of N independent take_along_axis on one vreg vs a dependent
    chain, inside a real kernel shape (re-check of sol_calibrate's 80 ns /
    7 ns figures at the hot loop's operand shapes [16, 128]).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

BT, W = 8, 2048


def k_wide(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:]          # [BT, 128]
    idx = idx_ref[:]          # [BT, W]
    out_ref[:] = jnp.take_along_axis(tab, idx, axis=1)


def main():
    interpret = "--interpret" in sys.argv
    tab = jnp.asarray(np.random.randint(0, 1000, (BT, 128)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, 128, (BT, W)), jnp.int32)
    f = pl.pallas_call(
        k_wide,
        out_shape=jax.ShapeDtypeStruct((BT, W), jnp.int32),
        interpret=interpret,
    )
    try:
        t0 = time.time()
        out = np.asarray(f(tab, idx))
        exp = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=1)
        ok = (out == exp).all()
        print(f"Q1 wide-take-from-1vreg: lowered ok={ok} "
              f"(compile+run {time.time()-t0:.1f}s)")
    except Exception as e:  # noqa: BLE001
        print(f"Q1 wide-take-from-1vreg: FAILED to lower: {type(e).__name__}:"
              f" {str(e)[:300]}")


if __name__ == "__main__":
    main()
