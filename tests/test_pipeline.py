"""Streaming pipeline must be result-identical to single-shot alignment."""
import numpy as np

from wfa_tpu.aligner import align_pairs
from wfa_tpu.params import AlignmentOptions
from wfa_tpu.pipeline import align_pairs_pipelined
from wfa_tpu.types import Penalties

from test_engine import make_pairs


def test_pipelined_matches_single_shot():
    pen = Penalties(2, 3, 1)
    pairs = make_pairs(23, sizes=(10, 60, 130), errs=(0.0, 0.1, 0.3))
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]

    opts1 = AlignmentOptions(penalties=pen, compute_cigar=True, max_error=64)
    ref = align_pairs(pats, txts, opts1)

    opts2 = AlignmentOptions(
        penalties=pen, compute_cigar=True, max_error=64, batch_size=5
    )
    got = align_pairs_pipelined(pats, txts, opts2)

    assert len(got) == len(ref)
    for r, g in zip(ref, got):
        assert g.error == r.error
        assert g.cigar == r.cigar


def test_pipelined_auto_max_error_consistent():
    pen = Penalties(2, 3, 1)
    pairs = make_pairs(5, sizes=(80,), errs=(0.05,))
    pats = [p for p, _ in pairs] * 4
    txts = [t for _, t in pairs] * 4
    opts = AlignmentOptions(penalties=pen, batch_size=7)
    got = align_pairs_pipelined(pats, txts, opts)
    ref = align_pairs(pats, txts, AlignmentOptions(penalties=pen))
    assert [g.error for g in got] == [r.error for r in ref]
