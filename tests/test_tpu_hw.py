"""Real-accelerator validation of the Pallas kernels (runs only when the
suite is invoked with WFA_TPU_TEST_HW=1 on a machine with a TPU attached;
the hermetic CPU run skips these — interpret-mode DMA is not exercisable).
"""
import numpy as np
import pytest
import jax

from test_engine import make_pairs

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU"
)


@requires_tpu
def test_pallas_golden_10K_on_hw():
    """Full 100 x 10kbp reference dataset (-e 3000, the reference's own
    README workload) through the production path: the wide exact Pallas
    kernel (W = 6016 >= 2*3000+1, untruncated window) must finish every
    pair ON DEVICE with golden scores — no CPU fallback."""
    import json
    from pathlib import Path

    from wfa_tpu.aligner import align_pairs
    from wfa_tpu.params import AlignmentOptions
    from wfa_tpu.types import Penalties
    from wfa_tpu.utils.io import read_seq_file

    data = Path(__file__).parent / "data"
    batch = read_seq_file(data / "seq_10K_n100.seq")
    golden = json.loads((data / "seq_10K_n100.golden.json").read_text())
    expect = [-v for v in golden["results_10K_n100_x2o3e1"]]
    opts = AlignmentOptions(
        penalties=Penalties(2, 3, 1), max_error=3000, backend="pallas"
    )
    res = align_pairs(batch.patterns, batch.texts, opts)
    assert [r.error for r in res] == expect
    assert all(r.finished_on_accelerator for r in res)


@requires_tpu
def test_pallas_golden_10K_p1_certified_on_hw():
    """The harder penalty set (3,5,2) on the 10kbp dataset: the needed exact
    window (2*4700+1) exceeds the VMEM cap, so the kernel runs TRUNCATED at
    W=6144 — but every golden distance (4216..4614) sits below the
    optimality certificate o + e*(W/2+1) = 6151, so all 100 pairs must
    still finish on device with provably exact golden scores."""
    import json
    from pathlib import Path

    from wfa_tpu.aligner import align_pairs
    from wfa_tpu.params import AlignmentOptions
    from wfa_tpu.types import Penalties
    from wfa_tpu.utils.io import read_seq_file

    data = Path(__file__).parent / "data"
    batch = read_seq_file(data / "seq_10K_n100.seq")
    golden = json.loads((data / "seq_10K_n100.golden.json").read_text())
    expect = [-v for v in golden["results_10K_n100_x3o5e2"]]
    opts = AlignmentOptions(
        penalties=Penalties(3, 5, 2), max_error=4700, backend="pallas"
    )
    res = align_pairs(batch.patterns, batch.texts, opts)
    assert [r.error for r in res] == expect
    assert all(r.finished_on_accelerator for r in res)


@requires_tpu
@pytest.mark.parametrize("band", [-1, 10])
def test_device_traceback_matches_host_decode(band):
    """The fused align + on-device-walk path must reproduce the host
    choice-table decoder's CIGARs bit-for-bit (banded and exact modes)."""
    import jax.numpy as jnp

    from wfa_tpu import native
    from wfa_tpu.ops.engine_pallas import PallasConfig, align_batch_pallas
    from wfa_tpu.ops.packing import pack_batch
    from wfa_tpu.ops.traceback_pallas import (
        TracebackConfig, align_cigar_fused,
    )
    from wfa_tpu.schedule import build_schedule
    from wfa_tpu.types import Penalties

    pen = Penalties(2, 3, 1)
    pairs = make_pairs(23, sizes=(12, 60, 110), errs=(0.0, 0.08))
    pairs = (pairs + pairs)[:16]
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    pat, plen, vp = pack_batch(pats, 128)
    txt, tlen, vt = pack_batch(txts, 128)
    sched = build_schedule(pen, 100, None)
    cfg = PallasConfig(
        penalties=pen, max_steps=100, wf_width=128, tile_batch=8,
        band=band, compute_cigar=True, score_cap=sched.unfinished_score + 1,
    )
    tb_cfg = TracebackConfig(
        penalties=pen, wf_width=cfg.wf_width, score_cap=cfg.score_cap,
        banded=band > 0, lo_pad=cfg.lo_pad if band > 0 else 0,
    )
    dev_args = (
        jnp.asarray(pat), jnp.asarray(txt),
        jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
    )
    arr = np.asarray(align_cigar_fused(cfg, tb_cfg, *dev_args))
    dist = arr[:, 0]
    fin = arr[:, 1] != 0
    n_ops = arr[:, 2]
    assert fin.all() and (n_ops >= 0).all()
    dev_cigars, _ = native.cigar_from_ops_batch(
        np.ascontiguousarray(arr[:, 4:]), n_ops, fin, pats, txts
    )

    out = align_batch_pallas(cfg, *dev_args)
    words = np.asarray(out["choice_words"])
    lo = np.asarray(out["lo_trace"]) if band > 0 else None
    ref_cigars, _ = native.traceback_batch_packed(
        words, lo, -(cfg.wf_width // 2), np.asarray(out["distance"]),
        np.asarray(out["finished"]), pats, txts, pen,
    )
    assert dev_cigars == ref_cigars
    assert (dist == np.asarray(out["distance"])).all()

    # The pure-Python stream decoder agrees with the native one.
    from wfa_tpu.traceback import recover_cigar_from_stream

    for b in range(4):
        assert (
            recover_cigar_from_stream(
                arr[b, 4:], int(n_ops[b]), pats[b], txts[b]
            )
            == dev_cigars[b]
        )


@requires_tpu
@pytest.mark.parametrize("band", [-1, 10])
def test_pallas_cigar_on_hw(band):
    import jax.numpy as jnp

    from wfa_tpu import native
    from wfa_tpu.ops.engine_pallas import PallasConfig, align_batch_pallas
    from wfa_tpu.ops.packing import pack_batch
    from wfa_tpu.schedule import build_schedule
    from wfa_tpu.types import Penalties
    from wfa_tpu.utils.verification import affine_score, check_cigar

    pen = Penalties(2, 3, 1)
    pairs = make_pairs(11, sizes=(12, 60, 110), errs=(0.0, 0.08))
    pairs = (pairs + pairs)[:16]
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    pat, plen, vp = pack_batch(pats, 128)
    txt, tlen, vt = pack_batch(txts, 128)
    sched = build_schedule(pen, 100, None)
    cfg = PallasConfig(
        penalties=pen, max_steps=100, wf_width=128, tile_batch=8,
        band=band, compute_cigar=True, score_cap=sched.unfinished_score + 1,
    )
    out = align_batch_pallas(
        cfg, jnp.asarray(pat), jnp.asarray(txt),
        jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
    )
    dist = np.asarray(out["distance"])
    fin = np.asarray(out["finished"])
    assert fin.all()
    words = np.asarray(out["choice_words"])
    lo = np.asarray(out["lo_trace"]) if band > 0 else None
    cigars, _ = native.traceback_batch_packed(
        words, lo, -(cfg.wf_width // 2), dist, fin, pats, txts, pen
    )
    for b, (p, t) in enumerate(pairs):
        assert check_cigar(cigars[b], p, t)
        assert affine_score(cigars[b], pen) == dist[b]


@requires_tpu
@pytest.mark.parametrize("band", [-1, 10])
def test_sharded_fused_cigar_on_hw(band):
    """The shard_map + fused align+walk composition — the exact code a real
    pod takes for the flagship CIGAR mode — compiles and runs on real
    hardware over a (possibly single-chip) device mesh, matching the
    unsharded fused call bit-for-bit."""
    import jax.numpy as jnp

    from wfa_tpu import native
    from wfa_tpu.ops.engine_pallas import PallasConfig
    from wfa_tpu.ops.packing import pack_batch
    from wfa_tpu.ops.traceback_pallas import (
        TracebackConfig, align_cigar_fused,
    )
    from wfa_tpu.parallel.mesh import align_cigar_fused_sharded, data_mesh
    from wfa_tpu.schedule import build_schedule
    from wfa_tpu.types import Penalties

    pen = Penalties(2, 3, 1)
    pairs = make_pairs(31, sizes=(20, 80, 120), errs=(0.0, 0.06))
    ndev = len(jax.local_devices())
    b = ((16 + 8 * ndev - 1) // (8 * ndev)) * (8 * ndev)
    pairs = (pairs * ((b // len(pairs)) + 1))[:b]
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    pat, plen, vp = pack_batch(pats, 128)
    txt, tlen, vt = pack_batch(txts, 128)
    sched = build_schedule(pen, 100, None)
    cfg = PallasConfig(
        penalties=pen, max_steps=100, wf_width=128, tile_batch=8,
        band=band, compute_cigar=True, score_cap=sched.unfinished_score + 1,
    )
    tb_cfg = TracebackConfig(
        penalties=pen, wf_width=cfg.wf_width, score_cap=cfg.score_cap,
        banded=band > 0, lo_pad=cfg.lo_pad if band > 0 else 0,
    )
    dev_args = (
        jnp.asarray(pat), jnp.asarray(txt),
        jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
    )
    mesh = data_mesh()
    arr_s = np.asarray(align_cigar_fused_sharded(cfg, tb_cfg, mesh, *dev_args))
    arr_1 = np.asarray(align_cigar_fused(cfg, tb_cfg, *dev_args))
    np.testing.assert_array_equal(arr_s, arr_1)
    fin = arr_s[:, 1] != 0
    n_ops = arr_s[:, 2]
    assert fin.all() and (n_ops >= 0).all()
    cigars, _ = native.cigar_from_ops_batch(
        np.ascontiguousarray(arr_s[:, 4:]), n_ops, fin, pats, txts
    )
    assert all(c is not None for c in cigars)
