"""Sharded Pallas engine on the virtual CPU mesh (interpret mode, distance
only — the CIGAR kernels' DMAs don't run under the interpreter)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from wfa_tpu.ops.engine_pallas import PallasConfig, align_batch_pallas
from wfa_tpu.ops.packing import pack_batch
from wfa_tpu.parallel.mesh import align_batch_pallas_sharded, data_mesh
from wfa_tpu.types import Penalties


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >= 2 devices")
def test_sharded_pallas_matches_single_device():
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pats, txts = [], []
    for _ in range(16):
        p = rng.choice(bases, size=64)
        t = p.copy()
        t[rng.integers(0, 64, size=2)] = rng.choice(bases, size=2)
        pats.append(bytes(p))
        txts.append(bytes(t))
    pat, plen, vp = pack_batch(pats, 128)
    txt, tlen, vt = pack_batch(txts, 128)
    cfg = PallasConfig(
        penalties=Penalties(2, 3, 1), max_steps=32, wf_width=128, tile_batch=8
    )
    args = (
        jnp.asarray(pat), jnp.asarray(txt),
        jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
    )
    mesh = data_mesh(jax.devices()[:2])
    with pltpu.force_tpu_interpret_mode():
        sharded = align_batch_pallas_sharded(cfg, mesh, *args)
        single = align_batch_pallas(cfg, *args)
        ds = np.asarray(sharded["distance"])
        d1 = np.asarray(single["distance"])
        fs = np.asarray(sharded["finished"])
        f1 = np.asarray(single["finished"])
    np.testing.assert_array_equal(fs, f1)
    np.testing.assert_array_equal(ds[fs], d1[f1])
    assert fs.all()
