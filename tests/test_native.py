"""Native library tests: CPU fallback engine, batch traceback, readers.
Cross-validates C++ against the pure-Python implementations."""
from pathlib import Path

import numpy as np
import pytest

from wfa_tpu import native
from wfa_tpu.types import Penalties
from wfa_tpu.utils.io import read_fasta_pair, read_seq_file
from wfa_tpu.utils.verification import affine_score, check_cigar, gotoh_distance

DATA = Path(__file__).parent / "data"

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_oracle_matches_gotoh():
    import random

    rng = random.Random(2)
    pen = Penalties(2, 3, 1)
    for _ in range(20):
        p = "".join(rng.choice("ACGT") for _ in range(rng.randrange(1, 200)))
        t = "".join(rng.choice("ACGT") for _ in range(rng.randrange(1, 200)))
        assert native.cpu_align_single(p.encode(), t.encode(), pen) == \
            gotoh_distance(p.encode(), t.encode(), pen)


def test_batch_cigars_valid():
    import random

    rng = random.Random(4)
    pen = Penalties(3, 5, 2)
    pats, txts = [], []
    for _ in range(30):
        p = "".join(rng.choice("ACGT") for _ in range(rng.randrange(1, 300)))
        t = "".join(rng.choice("ACGT") for _ in range(rng.randrange(1, 300)))
        pats.append(p.encode())
        txts.append(t.encode())
    mask = np.ones(len(pats), dtype=np.int8)
    dist, cigars, status = native.cpu_align_batch(
        pats, txts, pen, mask, compute_cigar=True
    )
    for i in range(len(pats)):
        assert status[i] == 1
        assert dist[i] == gotoh_distance(pats[i], txts[i], pen)
        assert check_cigar(cigars[i], pats[i], txts[i])
        assert affine_score(cigars[i], pen) == dist[i]


def test_mask_skips_pairs():
    pen = Penalties(2, 3, 1)
    pats = [b"ACGT", b"ACGT"]
    txts = [b"ACGG", b"ACGT"]
    mask = np.array([0, 1], dtype=np.int8)
    dist, cigars, status = native.cpu_align_batch(
        pats, txts, pen, mask, compute_cigar=True
    )
    assert status[0] == 0 and status[1] == 1
    assert dist[1] == 0 and cigars[1] == "4M"


def test_native_traceback_matches_python():
    import random

    import jax.numpy as jnp

    from wfa_tpu.ops.engine_xla import EngineConfig, align_batch_device
    from wfa_tpu.ops.packing import pack_batch
    from wfa_tpu.schedule import build_schedule
    from wfa_tpu.traceback import recover_cigar

    rng = random.Random(9)
    pen = Penalties(2, 3, 1)
    pats, txts = [], []
    for _ in range(16):
        p = "".join(rng.choice("ACGT") for _ in range(rng.randrange(10, 150)))
        t = "".join(rng.choice("ACGT") for _ in range(rng.randrange(10, 150)))
        pats.append(p.encode())
        txts.append(t.encode())
    nwords = (150 + 2 + 15) // 16 + 1
    pat, plen, vp = pack_batch(pats, nwords)
    txt, tlen, vt = pack_batch(txts, nwords)
    cfg = EngineConfig(
        penalties=pen, max_steps=500, wf_width=2 * 152 + 1, compute_cigar=True
    )
    out = align_batch_device(
        cfg, jnp.asarray(pat), jnp.asarray(txt),
        jnp.asarray(plen), jnp.asarray(tlen), jnp.asarray(vp & vt),
    )
    dist = np.asarray(out["distance"])
    fin = np.asarray(out["finished"])
    choices = np.asarray(out["choices"])
    lo_trace = np.asarray(out["lo_trace"])
    sched = build_schedule(pen, 500)
    max_sc = int(sched.score[-1])
    sos = np.full(max_sc + 1, -1, dtype=np.int32)
    sos[sched.score] = np.arange(sched.num_steps, dtype=np.int32)
    cigars, status = native.traceback_batch(
        choices, lo_trace, sos, dist, fin, pats, txts, pen
    )
    for i in range(len(pats)):
        assert fin[i] and status[i] == 1
        py = recover_cigar(
            choices[:, i], lo_trace[:, i], sched, int(dist[i]), pats[i], txts[i]
        )
        assert cigars[i] == py


def test_readers_match_python():
    p, t = native.read_seq_native(DATA / "wfa.utest.seq")
    ref = read_seq_file(DATA / "wfa.utest.seq")
    assert p == ref.patterns and t == ref.texts

    pq, tq = native.read_fasta_native(
        DATA / "test_hifi.query.fasta", DATA / "test_hifi.target.fasta"
    )
    reff = read_fasta_pair(
        DATA / "test_hifi.query.fasta", DATA / "test_hifi.target.fasta"
    )
    assert pq == reff.patterns and tq == reff.texts
    assert len(pq) == 50


def test_stale_so_degrades_not_crashes(monkeypatch):
    """A prebuilt .so lacking a newly-added symbol must degrade to the
    Python fallbacks (NativeUnavailable from get_lib, available() False),
    not crash callers with AttributeError."""

    def _stale():
        raise AttributeError("undefined symbol: wfa_pack_batch")

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_and_bind", _stale)
    monkeypatch.setattr(native, "_try_build", lambda: None)
    assert native.available() is False
    with pytest.raises(native.NativeUnavailable):
        native.get_lib()
