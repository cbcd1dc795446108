"""Device-engine correctness vs an independent Gotoh DP oracle, plus CIGAR
validation by replay (the strategy of the reference's check mode,
lib/align.cu:258-326, and tests/tools/check_cigars.py)."""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from wfa_tpu.ops.engine_xla import EngineConfig, align_batch_device
from wfa_tpu.ops.packing import pack_batch
from wfa_tpu.schedule import build_schedule
from wfa_tpu.traceback import recover_cigar
from wfa_tpu.types import Penalties
from wfa_tpu.utils.verification import affine_score, check_cigar, gotoh_distance


def make_pairs(seed, sizes=(1, 5, 30, 100), errs=(0.0, 0.05, 0.2)):
    rng = random.Random(seed)

    def mutate(s, err):
        out = list(s)
        for _ in range(int(len(s) * err)):
            op = rng.choice("XID")
            pos = rng.randrange(max(1, len(out)))
            if op == "X":
                out[pos] = rng.choice("ACGT")
            elif op == "I":
                out.insert(pos, rng.choice("ACGT"))
            elif len(out) > 1:
                del out[pos]
        return "".join(out)

    pairs = []
    for L in sizes:
        for err in errs:
            p = "".join(rng.choice("ACGT") for _ in range(L))
            pairs.append((p.encode(), mutate(p, err).encode()))
    pairs += [(b"A", b"TTTT"), (b"ACGT", b"ACGT"), (b"AAAA", b"TTTT")]
    return pairs


def run_engine(pairs, pen, max_steps=120, cigar=True, band=-1, width=None):
    lmax = max(max(len(p), len(t)) for p, t in pairs)
    nwords = (lmax + 2 + 15) // 16 + 1
    pat, plen, vp = pack_batch([p for p, _ in pairs], nwords)
    txt, tlen, vt = pack_batch([t for _, t in pairs], nwords)
    if width is None:
        w2 = min(max_steps, lmax + 2)
        width = 2 * w2 + 1
    cfg = EngineConfig(
        penalties=pen, max_steps=max_steps, wf_width=width,
        compute_cigar=cigar, band=band,
    )
    out = align_batch_device(
        cfg,
        jnp.asarray(pat), jnp.asarray(txt),
        jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
    )
    return cfg, {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize(
    "pen", [Penalties(1, 2, 1), Penalties(2, 3, 1), Penalties(3, 1, 4), Penalties(5, 3, 2), Penalties(1, 0, 1)]
)
def test_exact_scores_and_cigars_vs_oracle(pen):
    pairs = make_pairs(11)
    cfg, out = run_engine(pairs, pen)
    sched = build_schedule(pen, cfg.max_steps)
    for i, (p, t) in enumerate(pairs):
        ref = gotoh_distance(p, t, pen)
        assert out["finished"][i]
        assert out["distance"][i] == ref
        cig = recover_cigar(
            out["choices"][:, i], out["lo_trace"][:, i], sched,
            int(out["distance"][i]), p, t,
        )
        assert check_cigar(cig, p, t)
        assert affine_score(cig, pen) == ref


def test_unfinished_flag_when_max_steps_too_low():
    pen = Penalties(2, 3, 1)
    pairs = [(b"ACGT" * 25, b"TTTT" * 25)]
    _, out = run_engine(pairs, pen, max_steps=5, cigar=False)
    assert not out["finished"][0]


def test_invalid_pairs_not_finished():
    pen = Penalties(2, 3, 1)
    pairs = [(b"ACGTN", b"ACGT"), (b"ACGT", b"ACGT")]
    _, out = run_engine(pairs, pen, cigar=False)
    assert not out["finished"][0]
    assert out["finished"][1]
    assert out["distance"][1] == 0


def test_banded_finished_results_are_valid():
    pen = Penalties(2, 3, 1)
    pairs = make_pairs(23, sizes=(50, 120), errs=(0.0, 0.05))
    cfg, out = run_engine(pairs, pen, max_steps=200, band=25, width=65)
    sched = build_schedule(pen, 200)
    nfin = 0
    for i, (p, t) in enumerate(pairs):
        if not out["finished"][i]:
            continue
        nfin += 1
        ref = gotoh_distance(p, t, pen)
        # Banded is a heuristic: scores are >= optimal; CIGARs must replay.
        assert out["distance"][i] >= ref
        cig = recover_cigar(
            out["choices"][:, i], out["lo_trace"][:, i], sched,
            int(out["distance"][i]), p, t,
        )
        assert check_cigar(cig, p, t)
        assert affine_score(cig, pen) == out["distance"][i]
    assert nfin >= len(pairs) // 2


def test_banded_equals_exact_when_band_covers_everything():
    pen = Penalties(2, 3, 1)
    pairs = make_pairs(31, sizes=(20, 60), errs=(0.0, 0.1))
    _, exact = run_engine(pairs, pen, max_steps=150, cigar=False)
    # Window wider than 2*len+1 never clamps -> same result as exact.
    _, banded = run_engine(
        pairs, pen, max_steps=150, cigar=False, band=25, width=257
    )
    np.testing.assert_array_equal(exact["distance"], banded["distance"])
    np.testing.assert_array_equal(exact["finished"], banded["finished"])
