"""2-bit sequence packing.

TPU-native equivalent of the reference packing kernel
(lib/kernels/sequence_packing_kernel.cu:28-116): each DNA base is encoded in
2 bits via ``(ascii & 6) >> 1`` (A->0, C->1, T->2, G->3) and 16 bases are
packed per uint32 word.  Unlike the CUDA kernel — which byte-swizzles so that
little-endian 32-bit loads see big-endian base order — we simply define the
packed layout directly: base ``i`` of a word occupies bits
``[30-2*(i%16), 31-2*(i%16)]`` (first base in the highest bits).  That makes
the LCP extension a pure ``xor`` + ``count_leading_zeros / 2`` on u32 lanes,
with no swizzle anywhere.

'N' (or any non-ACGT) detection routes the pair to the CPU fallback, same
policy as the reference (sequence_packing_kernel.cu:68-76), as does any
sequence of length >= MAX_SEQ_LEN (sequence_packing_kernel.cu:54-60).

Packing is a one-shot, bandwidth-bound transform over host-resident bytes, so
it runs vectorized on the host (NumPy) as part of batch preparation; the
packed u32 words are what we ship to the TPU.  A jittable JAX variant is
provided for fully on-device pipelines.
"""
from __future__ import annotations

import numpy as np

from ..types import MAX_SEQ_LEN

BASES_PER_WORD = 16

# Sticky gate for the native packing fast path: flipped off (with one
# logged warning) on the first failure instead of raising/catching per call.
_native_pack_ok = True

# Reverse of the 2-bit encoding, for round-trip tests (cf. UNPACK table in
# tests/test_packing_kernel.cu:31).
UNPACK = np.frombuffer(b"ACTG", dtype=np.uint8)

_ACGT = np.zeros(256, dtype=bool)
_ACGT[[ord(c) for c in "ACGTacgt"]] = True


def words_for_length(length: int) -> int:
    return (length + BASES_PER_WORD - 1) // BASES_PER_WORD


def pack_ascii(seq: np.ndarray, out_words: int | None = None) -> tuple[np.ndarray, bool]:
    """Pack an ASCII uint8 sequence into big-endian-ordered 2-bit u32 words.

    Returns (packed_words[uint32], valid).  ``valid`` is False when the
    sequence contains non-ACGT characters or is too long, in which case the
    caller must route the pair to the CPU engine.
    """
    seq = np.ascontiguousarray(seq, dtype=np.uint8)
    n = seq.shape[0]
    valid = bool(_ACGT[seq].all()) and n < MAX_SEQ_LEN
    nwords = words_for_length(n)
    if out_words is None:
        out_words = nwords
    codes2 = ((seq & 6) >> 1).astype(np.uint32)
    pad = nwords * BASES_PER_WORD - n
    if pad:
        codes2 = np.concatenate([codes2, np.zeros(pad, dtype=np.uint32)])
    codes2 = codes2.reshape(nwords, BASES_PER_WORD)
    shifts = np.arange(30, -2, -2, dtype=np.uint32)
    words = (codes2 << shifts).sum(axis=1, dtype=np.uint32)
    if out_words != nwords:
        out = np.zeros(out_words, dtype=np.uint32)
        out[: min(nwords, out_words)] = words[:out_words]
        words = out
    return words, valid


def pack_batch(
    seqs: list[bytes | np.ndarray], out_words: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack a batch of sequences into a dense [B, out_words] u32 array.

    Vectorized over the whole batch (one Python-level row copy per sequence,
    then NumPy bit ops over the padded matrix) — the host-side analog of the
    reference's one-block-per-sequence packing kernel grid
    (lib/sequence_packing.cu:96-116).

    Returns (packed[B, out_words] u32, lengths[B] i32, valid[B] bool).
    ``valid`` is False for non-ACGT content, length >= MAX_SEQ_LEN, or a
    sequence longer than the packed buffer.
    """
    b = len(seqs)
    seqs_b = [
        s if isinstance(s, (bytes, bytearray)) else bytes(s) for s in seqs
    ]
    global _native_pack_ok
    if _native_pack_ok:
        try:
            from .. import native

            if native.available():
                # One fused C++ pass (pack + validity); ~10x the NumPy path
                # on long-read batches, which matters because packing sits
                # on the host critical path of every device chunk.
                return native.pack_batch_native(
                    [bytes(s) for s in seqs_b], out_words, MAX_SEQ_LEN
                )
        except Exception:  # pragma: no cover - fall back to the NumPy path
            # Sticky disable + one warning: packing runs per chunk, and a
            # silent per-call raise/catch would hide losing the fast path.
            _native_pack_ok = False
            import logging

            logging.getLogger("wfa_tpu").warning(
                "native packing failed; using the NumPy path", exc_info=True
            )
    flat = np.frombuffer(b"".join(seqs_b), dtype=np.uint8)
    lengths = np.fromiter(
        (len(s) for s in seqs_b), dtype=np.int64, count=b
    )
    # Only do real work up to the longest sequence; the lane-aligned tail of
    # the output is plain zero padding.
    full_cap = out_words * BASES_PER_WORD
    content_words = min(
        out_words,
        (int(lengths.max(initial=0)) + BASES_PER_WORD - 1) // BASES_PER_WORD,
    )
    cap = content_words * BASES_PER_WORD
    starts = np.zeros(b, dtype=np.int64)
    if b > 1:
        np.cumsum(lengths[:-1], out=starts[1:])
    # Ragged -> padded matrix with one vectorized gather: read straight past
    # each row's end (clamped to the buffer) and zero the overhang.  int32
    # index math where the buffer allows — int64 broadcasting is an order of
    # magnitude slower on this host.
    itype = np.int32 if flat.size < 2**31 - cap - 1 else np.int64
    col = np.arange(max(cap, 1), dtype=itype)
    idx = np.minimum(
        starts.astype(itype)[:, None] + col, itype(max(flat.size - 1, 0))
    )
    mat = flat[idx] if flat.size else np.zeros((b, max(cap, 1)), np.uint8)
    mat *= col < lengths[:, None]
    lengths = lengths.astype(np.int32)

    in_buf = np.minimum(lengths, cap)
    acgt_count = _ACGT[mat].sum(axis=1, dtype=np.int64)
    valid = (
        (acgt_count == in_buf)
        & (lengths < MAX_SEQ_LEN)
        & (lengths <= full_cap)
    )

    # Build the big-endian-base-order words bytewise: byte j of a word holds
    # bases 4j..4j+3 in bit pairs (7-6, 5-4, 3-2, 1-0), so four strided u8
    # ops + a big-endian u32 view produce the packed array without a 16-wide
    # u32 reduction.
    cod = (mat[:, :cap] & 6) >> 1
    by = (
        (cod[:, 0::4] << 6)
        | (cod[:, 1::4] << 4)
        | (cod[:, 2::4] << 2)
        | cod[:, 3::4]
    )
    out = np.zeros((b, out_words), np.uint32)
    if cap:
        out[:, :content_words] = (
            np.ascontiguousarray(by).view(">u4").astype(np.uint32)
        ).reshape(b, content_words)
    return out, lengths, valid


def unpack_words(words: np.ndarray, length: int) -> np.ndarray:
    """Round-trip helper: packed u32 words -> ASCII uint8 sequence."""
    words = np.asarray(words, dtype=np.uint32)
    shifts = np.arange(30, -2, -2, dtype=np.uint32)
    codes = (words[:, None] >> shifts) & 3
    return UNPACK[codes.reshape(-1)[:length]]


def pack_batch_jax(ascii_batch, lengths):
    """Jittable packing: [B, Lmax] uint8 ASCII (zero padded) -> [B, W] uint32.

    On-device variant used when sequences are already device-resident; XLA
    vectorizes this across the VPU (no scalar loops).
    """
    import jax.numpy as jnp

    b, lmax = ascii_batch.shape
    nwords = words_for_length(lmax)
    pad = nwords * BASES_PER_WORD - lmax
    codes = ((ascii_batch & 6) >> 1).astype(jnp.uint32)
    if pad:
        codes = jnp.pad(codes, ((0, 0), (0, pad)))
    codes = codes.reshape(b, nwords, BASES_PER_WORD)
    shifts = jnp.arange(30, -2, -2, dtype=jnp.uint32)
    return (codes << shifts).sum(axis=2, dtype=jnp.uint32)
