"""Unit tests for the pure launch-geometry planner (_tier_geometry):
window truncation vs HBM-ring activation, tile shrink at extreme widths,
memory-budget-bounded call batches, certificate-capped score loops.
These rules previously lived inline in _run_tier_pallas and were only
integration-covered."""
import pytest

from wfa_tpu.aligner import (
    PALLAS_MAX_WIDTH,
    PALLAS_MAX_WIDTH_EXACT,
    PALLAS_MAX_WIDTH_RING,
    _TierPlan,
    _tier_geometry,
)
from wfa_tpu.params import AlignmentOptions
from wfa_tpu.types import Penalties

PEN = Penalties(2, 3, 1)


def geom(tier, wf_width, *, banded=False, cigar=False, max_error=None,
         n_pairs=64, tile=None, budget=None):
    opts = AlignmentOptions(
        penalties=PEN,
        band=25 if banded else -1,
        compute_cigar=cigar,
        tile_batch=tile,
        data_parallel=False,
        **({"memory_budget_bytes": budget} if budget else {}),
    )
    me = max_error if max_error is not None else (wf_width - 1) // 2
    plan = _TierPlan(tier, list(range(n_pairs)), wf_width,
                     tile or 8, tier // 16 + 1, None)
    band = 25 if banded else -1
    return _tier_geometry(plan, opts, me, band, 1, n_pairs)


def test_narrow_exact_stays_vmem():
    cfg, _, _, full, cert = geom(1024, 512)
    assert not cfg.ring_hbm and cfg.wf_width == 512
    assert full and cfg.score_cap == 0  # distance, untruncated


def test_wide_exact_vmem_window_certified():
    # Needs more than PALLAS_MAX_WIDTH but fits the VMEM ring budget.
    cfg, _, _, full, cert = geom(4096, 4096, max_error=2047)
    assert not cfg.ring_hbm
    assert PALLAS_MAX_WIDTH < cfg.wf_width <= PALLAS_MAX_WIDTH_EXACT
    assert cfg.vmem_limit_bytes > 0 and cfg.extend_span == 4


def test_ring_activates_past_vmem_cap():
    cfg, _, _, full, cert = geom(8192, 8064, max_error=4000)
    assert cfg.ring_hbm
    assert cfg.wf_width == 8064  # untruncated: needed <= ring max
    assert full and cfg.score_cap == 0
    assert cert == PEN.o + PEN.e * (8064 // 2 + 1)


def test_ring_truncates_at_ring_max_and_caps_scores():
    want = PALLAS_MAX_WIDTH_RING + 2048
    cfg, _, _, full, cert = geom(32768, want, max_error=(want - 1) // 2)
    assert cfg.ring_hbm and cfg.wf_width == PALLAS_MAX_WIDTH_RING
    assert not full
    # Truncated distance loop stops at the certificate bound.
    assert cfg.score_cap == cert + 1
    assert cert == PEN.o + PEN.e * (PALLAS_MAX_WIDTH_RING // 2 + 1)


def test_ring_tile_shrinks_with_width(monkeypatch):
    import wfa_tpu.aligner as al

    monkeypatch.setattr(al, "PALLAS_MAX_WIDTH_RING", 40960)
    cfg, *_ = geom(20000, 20096, max_error=10000)
    assert cfg.ring_hbm and cfg.tile_batch == 4  # 16384 < W <= 32768
    cfg, *_ = geom(33000, 33024, max_error=16500)
    assert cfg.ring_hbm and cfg.tile_batch == 2  # W > 32768
    # A user-pinned tile below the shrink is never raised.
    cfg, *_ = geom(33000, 33024, max_error=16500, tile=1)
    assert cfg.tile_batch <= 2


def test_ring_max_width_is_lane_multiple():
    assert PALLAS_MAX_WIDTH_RING % 128 == 0


def test_cigar_call_batch_respects_budget():
    # Tiny budget: the power-of-two call batch must keep the choice table
    # (+ ring, when active) within memory_budget_bytes.
    cfg, _, call_b, _, _ = geom(
        1024, 512, cigar=True, max_error=255, n_pairs=4096,
        budget=64 << 20,
    )
    bytes_per_lane = (cfg.score_cap // 8 + 2) * cfg.wf_width * 4
    assert call_b * bytes_per_lane <= (64 << 20) or call_b == cfg.tile_batch
    # Power-of-two multiple of the tile.
    assert call_b % cfg.tile_batch == 0 and (call_b & (call_b - 1)) == 0


def test_banded_geometry_unchanged_by_width_caps():
    cfg, _, _, full, _ = geom(16384, 512, banded=True, max_error=3000)
    assert not cfg.ring_hbm and cfg.wf_width == 512 and full
    assert cfg.band == 25


def test_distance_call_batch_capped():
    _, _, call_b, _, _ = geom(128, 512, max_error=255, n_pairs=100_000)
    assert call_b <= 16384


def test_geometry_invariants_fuzz():
    """Random tiers/options: the planner must always produce a constructible
    PallasConfig with lane-aligned width, budget-respecting call batches,
    and consistent ring/certificate decisions."""
    import random

    rng = random.Random(42)
    for _ in range(200):
        tier = rng.choice([128, 1024, 4096, 16384, 32768])
        me = rng.randint(16, tier)
        wf = 2 * me + 1
        banded = rng.random() < 0.4
        cigar = rng.random() < 0.5
        budget = rng.choice([64 << 20, 256 << 20, 1 << 30])
        if banded:
            wf = min(wf, rng.choice([128, 512, 1024]))
        cfg, nwp, call_b, full, cert = geom(
            tier, wf, banded=banded, cigar=cigar, max_error=me,
            n_pairs=rng.choice([8, 100, 5000]), budget=budget,
        )
        assert cfg.wf_width % 128 == 0
        assert nwp % 128 == 0
        assert call_b % cfg.tile_batch == 0
        assert cert == PEN.o + PEN.e * (cfg.wf_width // 2 + 1)
        if cfg.ring_hbm:
            assert not cfg.banded
            ring_b = 3 * PEN.active_working_set * cfg.wf_width * 4
            lane_b = ring_b + (
                (cfg.score_cap // 8 + 2) * cfg.wf_width * 4 if cigar else 0
            )
            assert (call_b * lane_b <= budget
                    or call_b == cfg.tile_batch), (call_b, lane_b, budget)
        if cigar:
            assert cfg.score_cap > 0
        if full and not banded:
            assert cfg.wf_width >= wf
