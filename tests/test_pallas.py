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


def _xla_choices_to_packed(out_x, sched, W):
    """Re-layout the XLA engine's per-step choice table into the Pallas
    kernel's by-score nibble-packed format, to cross-validate the decoders."""
    choices = np.asarray(out_x["choices"])  # [S, B, W] u8
    lo_tr = np.asarray(out_x["lo_trace"])   # [S, B]
    S, B, _ = choices.shape
    max_score = int(sched.score[-1]) if sched.num_steps else 0
    C = max_score // 8 + 2
    words = np.zeros((C, B, W), dtype=np.int32)
    lo_by_score = np.zeros((B, max_score + 1), dtype=np.int32)
    for s in range(sched.num_steps):
        d = int(sched.score[s])
        words[d >> 3] |= choices[s].astype(np.int32) << (4 * (d & 7))
        lo_by_score[:, d] = lo_tr[s]
    return words, lo_by_score


@pytest.mark.parametrize("band", [-1, 10])
def test_packed_decoder_matches_step_decoder(band):
    """recover_cigar_packed (Python + native C++) on a re-layouted XLA choice
    table must reproduce the step-layout decoder's CIGARs exactly."""
    from wfa_tpu import native
    from wfa_tpu.schedule import build_schedule
    from wfa_tpu.traceback import recover_cigar, recover_cigar_packed
    from wfa_tpu.utils.verification import affine_score, check_cigar

    pen = Penalties(2, 3, 1)
    pairs = make_pairs(13, sizes=(8, 40, 100), errs=(0.0, 0.1))[:12]
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    nwp = 128
    pat, plen, vp = pack_batch(pats, nwp)
    txt, tlen, vt = pack_batch(txts, nwp)
    W = 128
    cfg = EngineConfig(
        penalties=pen, max_steps=80, wf_width=W, compute_cigar=True, band=band
    )
    out = align_batch_device(
        cfg, jnp.asarray(pat), jnp.asarray(txt),
        jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
    )
    dist = np.asarray(out["distance"])
    fin = np.asarray(out["finished"])
    sched = build_schedule(pen, 80, None)
    words, lo_by_score = _xla_choices_to_packed(out, sched, W)

    choices = np.asarray(out["choices"])
    lo_tr = np.asarray(out["lo_trace"])
    ref_cigars = []
    got_py = []
    for b in range(len(pairs)):
        if not fin[b]:
            ref_cigars.append(None)
            got_py.append(None)
            continue
        ref = recover_cigar(
            choices[:, b], lo_tr[:, b], sched, int(dist[b]), pats[b], txts[b]
        )
        got = recover_cigar_packed(
            words[:, b, :], lo_by_score[b], -(W // 2), pen,
            int(dist[b]), pats[b], txts[b],
        )
        assert got == ref, f"pair {b}: {got} != {ref}"
        assert check_cigar(got, pats[b], txts[b])
        assert affine_score(got, pen) == dist[b]
        ref_cigars.append(ref)
        got_py.append(got)

    if native.available():
        cigars, _ = native.traceback_batch_packed(
            words, lo_by_score, -(W // 2), dist, fin, pats, txts, pen
        )
        for b in range(len(pairs)):
            if fin[b]:
                assert cigars[b] == ref_cigars[b]


@pytest.mark.parametrize(
    "band,pen",
    [(-1, Penalties(2, 3, 1)), (10, Penalties(2, 3, 1)),
     (-1, Penalties(3, 5, 2)), (10, Penalties(4, 1, 2))],
    ids=["exact", "banded", "exact-x3o5e2", "banded-x4o1e2"],
)
def test_two_score_body_matches_one_score(band, pen):
    """The software-pipelined two-score kernel body (cfg.two_score_body,
    auto-on when min(x, o+e) >= 2) must reproduce the sequential one-score
    body bit-for-bit: identical `finished` and identical distances on
    finished lanes."""
    pairs = make_pairs(23, sizes=(6, 33, 90, 128), errs=(0.0, 0.05, 0.2))
    pairs = (pairs + pairs)[:24]
    nwp = 128
    pat, plen, vp = pack_batch([p for p, _ in pairs], nwp)
    txt, tlen, vt = pack_batch([t for _, t in pairs], nwp)
    args = (
        jnp.asarray(pat), jnp.asarray(txt),
        jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
    )
    outs = []
    for tsb in (0, -1):
        cfg = PallasConfig(
            penalties=pen, max_steps=90, wf_width=128, tile_batch=8,
            band=band, two_score_body=tsb,
        )
        if tsb != 0:
            assert cfg.stacked_scores == 2
        with pltpu.force_tpu_interpret_mode():
            out = align_batch_pallas(cfg, *args)
            outs.append(
                (np.asarray(out["distance"]), np.asarray(out["finished"]))
            )
    (d1, f1), (d2, f2) = outs
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(d1[f1], d2[f2])


def test_two_score_body_cigar_structure():
    """CIGAR-mode carry threading of the two-score body (chunk nibble
    packing parity, lo_buf spill) vs the one-score body.  The choice-table
    DMA can't run in interpret mode, so it is skipped (debug_skip_dma) and
    the comparison covers distance, finished, and the banded lo trace; the
    DMA'd table itself is validated by the HW tests."""
    from wfa_tpu.schedule import build_schedule

    pen = Penalties(2, 3, 1)
    pairs = make_pairs(19, sizes=(12, 50, 110), errs=(0.0, 0.08))
    pairs = (pairs + pairs)[:16]
    nwp = 128
    pat, plen, vp = pack_batch([p for p, _ in pairs], nwp)
    txt, tlen, vt = pack_batch([t for _, t in pairs], nwp)
    args = (
        jnp.asarray(pat), jnp.asarray(txt),
        jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
    )
    sched = build_schedule(pen, 90, None)
    outs = []
    for tsb in (0, -1):
        cfg = PallasConfig(
            penalties=pen, max_steps=90, wf_width=128, tile_batch=8,
            band=10, compute_cigar=True, score_cap=sched.unfinished_score + 1,
            two_score_body=tsb, debug_skip_dma=True,
        )
        with pltpu.force_tpu_interpret_mode():
            out = align_batch_pallas(cfg, *args)
            outs.append((
                np.asarray(out["distance"]), np.asarray(out["finished"]),
                np.asarray(out["lo_trace"]),
            ))
    (d1, f1, lo1), (d2, f2, lo2) = outs
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(d1[f1], d2[f2])
    # lo rows are only meaningful up to each lane's walk start (its
    # distance); compare the fully-spilled prefix rows.
    for b in range(len(pairs)):
        if f1[b]:
            np.testing.assert_array_equal(
                lo1[b, : d1[b] + 1], lo2[b, : d2[b] + 1], err_msg=f"b={b}"
            )


@pytest.mark.parametrize(
    "band,pen",
    [(-1, Penalties(2, 3, 1)), (10, Penalties(2, 3, 1)),
     (-1, Penalties(1, 0, 1)), (10, Penalties(4, 1, 2))],
    ids=["exact", "banded", "exact-o0", "banded-x4o1e2"],
)
def test_pallas_matches_xla(band, pen):
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


@pytest.mark.parametrize(
    "band,tsb",
    [(-1, 0), (10, 0), (-1, -1), (10, -1)],
    ids=["exact", "banded", "exact-body2", "banded-body2"],
)
def test_fused_walk_interpret_matches_host_decode(band, tsb):
    """Full CIGAR DMA path hermetically: align kernel (double-buffered
    choice spill) + on-device traceback walk, in TPU interpret mode, must
    reproduce the host packed-table decoder's CIGARs bit-for-bit.

    Interpret mode simulates the async copies (jax>=0.9 InterpretParams),
    so the exact code path a real chip takes — including the row-stage DMA
    streaming in the walk kernel — runs on CPU here; the HW twin of this
    test is tests/test_tpu_hw.py::test_device_traceback_matches_host_decode.
    """
    from wfa_tpu import native
    from wfa_tpu.ops.traceback_pallas import (
        TracebackConfig, align_cigar_fused,
    )
    from wfa_tpu.schedule import build_schedule

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
        two_score_body=tsb,
    )
    tb_cfg = TracebackConfig(
        penalties=pen, wf_width=cfg.wf_width, score_cap=cfg.score_cap,
        banded=band > 0, lo_pad=cfg.lo_pad if band > 0 else 0,
    )
    dev_args = (
        jnp.asarray(pat), jnp.asarray(txt),
        jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
    )
    with pltpu.force_tpu_interpret_mode():
        arr = np.asarray(align_cigar_fused(cfg, tb_cfg, *dev_args))
        out = align_batch_pallas(cfg, *dev_args)
    dist = arr[:, 0]
    fin = arr[:, 1] != 0
    n_ops = arr[:, 2]
    assert fin.all() and (n_ops >= 0).all()
    dev_cigars, _ = native.cigar_from_ops_batch(
        np.ascontiguousarray(arr[:, 4:]), n_ops, fin, pats, txts
    )

    words = np.asarray(out["choice_words"])
    lo = np.asarray(out["lo_trace"]) if band > 0 else None
    ref_cigars, _ = native.traceback_batch_packed(
        words, lo, -(cfg.wf_width // 2), np.asarray(out["distance"]),
        np.asarray(out["finished"]), pats, txts, pen,
    )
    assert dev_cigars == ref_cigars
    assert (dist == np.asarray(out["distance"])).all()


@pytest.mark.parametrize(
    "mode", ["ring", "partial"],
)
def test_ring_hbm_and_partial_extend_match_vmem(mode):
    """The HBM-ring exact engine (wavefront ring streamed through VMEM by
    async DMA — the wide-W mode whose ring does not fit VMEM) and the
    partial-serve staged extension must both be bit-identical to the VMEM
    one-score kernel, including high-divergence pairs (d up to ~160)."""
    pen = Penalties(2, 3, 1)
    pairs = make_pairs(31, sizes=(40, 150, 300), errs=(0.0, 0.08, 0.25))
    pairs = (pairs + pairs)[:16]
    nwp = 128
    pat, plen, vp = pack_batch([p for p, _ in pairs], nwp)
    txt, tlen, vt = pack_batch([t for _, t in pairs], nwp)
    args = (
        jnp.asarray(pat), jnp.asarray(txt),
        jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
    )
    base = dict(penalties=pen, max_steps=400, wf_width=768,
                tile_batch=8, band=-1, two_score_body=0)
    variant = dict(base)
    if mode == "ring":
        variant["ring_hbm"] = True
    else:
        variant["extend_partial"] = True
    outs = []
    for kw in (base, variant):
        cfg = PallasConfig(**kw)
        with pltpu.force_tpu_interpret_mode():
            out = align_batch_pallas(cfg, *args)
            outs.append(
                (np.asarray(out["distance"]), np.asarray(out["finished"]))
            )
    (d0, f0), (d1, f1) = outs
    np.testing.assert_array_equal(f0, f1)
    np.testing.assert_array_equal(d0[f0], d1[f1])


def test_ring_hbm_cigar_matches_vmem():
    """Ring + CIGAR: the HBM wavefront ring and the HBM choice-spill DMA
    coexist; the fused align+walk output (dist, n_ops, op streams) must be
    bit-identical to the VMEM-ring CIGAR kernel."""
    from wfa_tpu.ops.traceback_pallas import TracebackConfig, align_cigar_fused
    from wfa_tpu.schedule import build_schedule

    pen = Penalties(2, 3, 1)
    pairs = make_pairs(23, sizes=(12, 60, 110), errs=(0.0, 0.08))
    pairs = (pairs + pairs)[:16]
    pat, plen, vp = pack_batch([p for p, _ in pairs], 128)
    txt, tlen, vt = pack_batch([t for _, t in pairs], 128)
    args = (
        jnp.asarray(pat), jnp.asarray(txt),
        jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
    )
    sched = build_schedule(pen, 100, None)
    outs = []
    for ring in (False, True):
        cfg = PallasConfig(
            penalties=pen, max_steps=100, wf_width=128, tile_batch=8,
            band=-1, compute_cigar=True,
            score_cap=sched.unfinished_score + 1, ring_hbm=ring,
        )
        tb = TracebackConfig(
            penalties=pen, wf_width=128, score_cap=cfg.score_cap,
            banded=False, lo_pad=0,
        )
        with pltpu.force_tpu_interpret_mode():
            outs.append(np.asarray(align_cigar_fused(cfg, tb, *args)))
    a0, a1 = outs
    np.testing.assert_array_equal(a0[:, :3], a1[:, :3])
    for b in range(len(pairs)):
        nops = a0[b, 2]
        nw = (2 * nops + 31) // 32 if nops > 0 else 0
        np.testing.assert_array_equal(
            a0[b, 4 : 4 + nw], a1[b, 4 : 4 + nw], err_msg=f"b={b}"
        )


@pytest.mark.parametrize(
    "pen,tsb",
    [(Penalties(40, 3, 1), 0), (Penalties(40, 3, 1), -1),
     (Penalties(5, 30, 20), 0), (Penalties(63, 10, 1), 0)],
    ids=["x40", "x40-body2", "o30e20", "x63"],
)
def test_wide_working_set_on_pallas(pen, tsb):
    """Working sets of 33..64 scores (max(o+e,x)+1 > 32) run on the Pallas
    path via the two-word existence bitmask (round 3 — formerly a silent
    XLA-engine routing cliff); distances must match the XLA engine."""
    pairs = make_pairs(11, sizes=(20, 90), errs=(0.0, 0.1))
    pairs = (pairs + pairs)[:8]
    pat, plen, vp = pack_batch([p for p, _ in pairs], 128)
    txt, tlen, vt = pack_batch([t for _, t in pairs], 128)
    args = (
        jnp.asarray(pat), jnp.asarray(txt),
        jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
    )
    assert pen.active_working_set > 32
    for band in (-1, 10):
        pcfg = PallasConfig(
            penalties=pen, max_steps=700, wf_width=128, tile_batch=8,
            band=band, two_score_body=tsb,
        )
        with pltpu.force_tpu_interpret_mode():
            out_p = align_batch_pallas(pcfg, *args)
            dp = np.asarray(out_p["distance"])
            fp = np.asarray(out_p["finished"])
        xcfg = EngineConfig(
            penalties=pen, max_steps=700, wf_width=128,
            compute_cigar=False, band=band,
        )
        out_x = align_batch_device(xcfg, *args)
        dx = np.asarray(out_x["distance"])
        fx = np.asarray(out_x["finished"])
        np.testing.assert_array_equal(fp, fx, err_msg=f"band={band}")
        np.testing.assert_array_equal(dp[fp], dx[fx], err_msg=f"band={band}")
