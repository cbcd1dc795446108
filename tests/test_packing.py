"""Packing round-trip tests (port of the intent of the reference
tests/test_packing_kernel.cu: every base of every packed word must
round-trip)."""
import numpy as np
import pytest

from wfa_tpu.ops.packing import (
    BASES_PER_WORD,
    pack_ascii,
    pack_batch,
    pack_batch_jax,
    unpack_words,
    words_for_length,
)
from wfa_tpu.types import MAX_SEQ_LEN


@pytest.mark.parametrize("n", [1, 4, 15, 16, 17, 100, 1000])
def test_roundtrip(n):
    rng = np.random.default_rng(n)
    seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n)
    words, valid = pack_ascii(seq)
    assert valid
    assert words.shape[0] == words_for_length(n)
    back = unpack_words(words, n)
    np.testing.assert_array_equal(back, seq)


def test_first_base_in_high_bits():
    words, _ = pack_ascii(np.frombuffer(b"G" + b"A" * 15, dtype=np.uint8))
    # G encodes to 3 -> bits 30-31 of word 0.
    assert words[0] >> 30 == 3
    assert words[0] & ((1 << 30) - 1) == 0


def test_n_detection_routes_to_cpu():
    _, valid = pack_ascii(np.frombuffer(b"ACGTN", dtype=np.uint8))
    assert not valid


def test_too_long_routes_to_cpu():
    seq = np.full(MAX_SEQ_LEN, ord("A"), dtype=np.uint8)
    _, valid = pack_ascii(seq)
    assert not valid


def test_batch_and_jax_packing_agree():
    rng = np.random.default_rng(7)
    seqs = [
        bytes(rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n))
        for n in (3, 16, 33, 64)
    ]
    lmax = 64
    nwords = words_for_length(lmax)
    packed, lengths, valid = pack_batch(seqs, nwords)
    assert valid.all()

    ascii_batch = np.zeros((len(seqs), lmax), dtype=np.uint8)
    for i, s in enumerate(seqs):
        ascii_batch[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    jx = np.asarray(pack_batch_jax(ascii_batch, lengths))
    # Zero-padded ASCII packs padding bases as (0&6)>>1 == 0 ('A'); mask by
    # comparing only words fully/partially covered by the sequence and the
    # in-range 2-bit fields.
    for i, s in enumerate(seqs):
        back_np = unpack_words(packed[i], len(s))
        back_jx = unpack_words(jx[i], len(s))
        np.testing.assert_array_equal(back_np, back_jx)
        np.testing.assert_array_equal(back_np, np.frombuffer(s, dtype=np.uint8))


def test_packing_matches_reference_encoding():
    # (base & 6) >> 1: A->0, C->1, T->2, G->3
    # (reference lib/kernels/sequence_packing_kernel.cu:79).
    words, _ = pack_ascii(np.frombuffer(b"ACTG", dtype=np.uint8))
    assert (words[0] >> 24) & 0xFF == 0b00011011


def test_native_pack_batch_matches_numpy():
    """The fused C++ pack+validity pass must be bit-identical to the NumPy
    path on edge inputs: empty, sub-word, N content, lowercase, zero bytes,
    word-boundary lengths, and sequences longer than the buffer / MAX."""
    from wfa_tpu import native
    import wfa_tpu.ops.packing as pk

    if not native.available():
        import pytest

        pytest.skip("native library not built")
    tricky = [
        b"", b"A", b"ACGTN" * 10, b"acgt" * 7, bytes(17), b"ACGT" * 5000,
        b"A" * 33, b"C" * 16, b"G" * 15, b"T" * 40000,
    ]
    from wfa_tpu.types import MAX_SEQ_LEN

    for ow in (1, 4, 640):
        w_nat, l_nat, v_nat = native.pack_batch_native(
            tricky, ow, MAX_SEQ_LEN
        )
        avail = native.available
        native.available = lambda: False
        try:
            w_np, l_np, v_np = pk.pack_batch(tricky, ow)
        finally:
            native.available = avail
        np.testing.assert_array_equal(w_nat, w_np, err_msg=f"ow={ow}")
        np.testing.assert_array_equal(l_nat, l_np)
        np.testing.assert_array_equal(v_nat, v_np)
