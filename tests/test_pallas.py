"""Pallas kernel vs XLA engine equivalence (interpret mode on CPU; the real
TPU validation runs in benchmarks and the verify flow)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from wfa_tpu.ops.engine_pallas import PallasConfig, align_batch_pallas
from wfa_tpu.ops.engine_xla import EngineConfig, align_batch_device
from wfa_tpu.ops.packing import pack_batch
from wfa_tpu.types import Penalties

from test_engine import make_pairs


@pytest.mark.parametrize("band", [-1, 10])
def test_pallas_matches_xla(band):
    pen = Penalties(2, 3, 1)
    pairs = make_pairs(17, sizes=(10, 60, 120), errs=(0.0, 0.1))
    pairs = (pairs + pairs)[:16]
    nwp = 128
    pat, plen, vp = pack_batch([p for p, _ in pairs], nwp)
    txt, tlen, vt = pack_batch([t for _, t in pairs], nwp)
    args = (
        jnp.asarray(pat), jnp.asarray(txt),
        jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
    )
    pcfg = PallasConfig(
        penalties=pen, max_steps=100, wf_width=128, tile_batch=8, band=band
    )
    with pltpu.force_tpu_interpret_mode():
        out_p = align_batch_pallas(pcfg, *args)
        dp = np.asarray(out_p["distance"])
        fp = np.asarray(out_p["finished"])

    xcfg = EngineConfig(
        penalties=pen, max_steps=100, wf_width=128,
        compute_cigar=False, band=band,
    )
    out_x = align_batch_device(xcfg, *args)
    dx = np.asarray(out_x["distance"])
    fx = np.asarray(out_x["finished"])
    np.testing.assert_array_equal(fp, fx)
    np.testing.assert_array_equal(dp[fp], dx[fx])
