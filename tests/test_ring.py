"""HBM-ring exact mode through the aligner: when the needed exact window
exceeds the VMEM ring cap, _run_tier_pallas must route to the ring_hbm
kernel (wavefront ring in HBM, rows streamed by DMA) instead of truncating,
and the scores must match the XLA reference engine bit-for-bit.

The VMEM cap is monkeypatched down so the route triggers at
interpret-mode-friendly sizes; the real cap only trips past W=6144 (10kbp+
workloads), which the HW suite covers.
"""
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from wfa_tpu.aligner import align_pairs
from wfa_tpu.params import AlignmentOptions
from wfa_tpu.types import Penalties

from test_engine import make_pairs


def test_ring_mode_routes_and_matches_xla(monkeypatch):
    import wfa_tpu.aligner as al
    import wfa_tpu.ops.engine_pallas as ep

    monkeypatch.setattr(al, "_wide_exact_cap", lambda aws, tile: 512)
    seen = []
    orig = ep.align_batch_pallas

    def recording(cfg, *args):
        seen.append(cfg)
        return orig(cfg, *args)

    monkeypatch.setattr(ep, "align_batch_pallas", recording)

    pairs = make_pairs(43, sizes=(120, 200), errs=(0.02, 0.25))
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    opts = AlignmentOptions(
        penalties=Penalties(2, 3, 1), max_error=400, backend="pallas",
        tile_batch=8, data_parallel=False,
    )
    with pltpu.force_tpu_interpret_mode():
        res = align_pairs(pats, txts, opts)

    # The 200bp tier needs W=640 > the patched cap -> ring; the 120bp tier
    # fits in VMEM and must NOT pay the ring DMAs.
    assert any(c.ring_hbm for c in seen), (
        "expected the ring_hbm route for W past the (patched) VMEM cap"
    )
    assert any(not c.ring_hbm for c in seen)
    # Window covers the whole needed width -> nothing may demote to CPU.
    assert all(r.finished_on_accelerator for r in res)

    ref = align_pairs(
        pats, txts,
        AlignmentOptions(
            penalties=Penalties(2, 3, 1), max_error=400, backend="xla",
            data_parallel=False,
        ),
    )
    assert [r.error for r in res] == [r.error for r in ref]


def test_ring_mode_cigar_matches_xla(monkeypatch):
    """CIGAR mode past the VMEM cap: ring kernel + choice DMA spill +
    on-device walk, routed by the aligner; CIGARs and scores must match the
    XLA reference engine."""
    import wfa_tpu.aligner as al
    import wfa_tpu.ops.engine_pallas as ep

    monkeypatch.setattr(al, "_wide_exact_cap", lambda aws, tile: 512)

    pairs = make_pairs(19, sizes=(200,), errs=(0.05, 0.22))
    pairs = (pairs + pairs)[:8]
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    kw = dict(
        penalties=Penalties(2, 3, 1), max_error=400, tile_batch=8,
        data_parallel=False, compute_cigar=True,
    )
    with pltpu.force_tpu_interpret_mode():
        res = align_pairs(pats, txts, AlignmentOptions(backend="pallas", **kw))
    assert all(r.finished_on_accelerator for r in res)

    ref = align_pairs(pats, txts, AlignmentOptions(backend="xla", **kw))
    assert [r.error for r in res] == [r.error for r in ref]
    assert [r.cigar for r in res] == [r.cigar for r in ref]
