"""Batched gap-affine WFA engine in pure JAX/XLA.

TPU-native re-design of the reference CUDA kernels
(lib/kernels/sequence_alignment_kernel.cu, sequence_distance_kernel.cu and
their _aband variants):

* The persistent-block + atomic work queue
  (common_alignment_kernels.cuh:123-126) becomes a dense batch dimension: all
  alignments of a tile advance together, with per-alignment ``done`` masks and
  a `lax.while_loop` that exits when every lane has finished.
* The runtime wavefront-existence tests
  (sequence_alignment_kernel.cu:584-610) become a host-precomputed static
  schedule (see wfa_tpu/schedule.py) — zero data-dependent control flow on
  device except termination.
* The per-diagonal backtrace bit-vectors + atomic linked-list offload
  (sequence_alignment_kernel.cu:33-49,101-123) become a dense per-step choice
  table (2 bits: M source; 1 bit each: I/D gap-open vs gap-extend), written
  with full-window vector stores.  CIGAR recovery decodes it after the fact
  (host C++/OpenMP or numpy) — same information, deterministic layout, no
  atomics.
* The 16-bases-per-u32 LCP extension (common_alignment_kernels.cuh:29-111)
  maps to `xor` + `lax.clz` over u32 lanes, vectorized across all diagonals of
  all alignments at once; the de-phased two-word load becomes a
  `take_along_axis` gather.
* The adaptive band (sequence_alignment_kernel_aband.cu:167-221) is a masked
  fixed-width window with a per-slot dynamic base; re-centering every ``band``
  scores via a first-tie-wins argmin of distance-to-target
  (common_alignment_kernels.cuh:113-121).

Tie-breaking matches the reference bit-for-bit: candidates are packed as
``(offset << 2) | op`` and compared as signed int32, reproducing the 64-bit
MAX_PB packs (GAP_EXTEND=2 beats GAP_OPEN=1; for M, DEL=3 beats SUB=2 beats
INS=1 on equal offsets; sequence_alignment_kernel.cu:165-289).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..schedule import WavefrontSchedule, build_schedule
from ..types import OFFSET_NULL, AffineOp, Penalties

INT32_MAX = np.int32(2**31 - 1)

# Choice encoding inside the u8 choice table.
M_FROM_X = 0
M_FROM_I = 1
M_FROM_D = 2
I_FROM_EXTEND_BIT = 2  # bit 2: I came from gap-extend (else gap-open)
D_FROM_EXTEND_BIT = 3  # bit 3: D came from gap-extend (else gap-open)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static (compile-time) engine configuration for one tile shape."""

    penalties: Penalties
    max_steps: int          # reference `max_error` / max_steps
    wf_width: int           # W: number of diagonals held per wavefront
    compute_cigar: bool
    band: int = -1          # <0: exact; >0: re-center every `band` scores
    # Optional cap on the highest score the schedule enumerates.  Safe for
    # exact mode when >= 2*o + e*(plen+tlen) of every pair in the tile (the
    # cost of the all-indels alignment bounds the optimum); bounds the choice
    # table's step dimension.
    score_limit: int | None = None

    @property
    def banded(self) -> bool:
        return self.band > 0


def _pack(offset: jnp.ndarray, op: int) -> jnp.ndarray:
    """(offset, op) -> signed int32 whose order is lexicographic, mirroring
    the reference MAX_PB over (offset<<32)|op packs."""
    return (offset << 2) | op


def _extend(
    offs: jnp.ndarray,     # [B, W] int32 candidate M offsets (pre-extension)
    k: jnp.ndarray,        # [B, W] int32 diagonal of each lane
    pat: jnp.ndarray,      # [B, NW+1] uint32 packed pattern (1 pad word)
    txt: jnp.ndarray,      # [B, NW+1] uint32 packed text
    plen: jnp.ndarray,     # [B, 1] int32
    tlen: jnp.ndarray,     # [B, 1] int32
) -> jnp.ndarray:
    """Vectorized LCP extension over every diagonal of every alignment.

    Mirrors WF_extend_kernel (common_alignment_kernels.cuh:29-111): compare 16
    packed bases per iteration via de-phased u32 words, xor, clz/2; the
    while-loop runs as long as *any* lane matched a full 16-base chunk.
    """
    v0 = offs - k
    h0 = offs
    invalid = (offs < 0) | (v0 > plen) | (h0 > tlen)

    def load16(words: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        """Fetch the 16 bases starting at base index `pos` as one u32."""
        idx = jax.lax.shift_right_logical(pos, 4)
        phase = (pos & 15).astype(jnp.uint32)
        w1 = jnp.take_along_axis(words, idx, axis=1)
        w2 = jnp.take_along_axis(words, idx + 1, axis=1)
        hi = w1 << (2 * phase)
        lo = jnp.where(phase == 0, jnp.uint32(0), w2 >> (32 - 2 * phase))
        return hi | lo

    def tail_mask(nxt: jnp.ndarray, limit: jnp.ndarray) -> jnp.ndarray:
        """Bits past the sequence end count as mismatches
        (common_alignment_kernels.cuh:88-93)."""
        over = jnp.maximum(nxt - limit, 0)
        sh = jnp.minimum(2 * over, 32).astype(jnp.uint32)
        full = jnp.uint32(0xFFFFFFFF)
        return jnp.where(sh == 32, jnp.uint32(0), full << sh)

    def cond(state):
        _, _, _, active = state
        return jnp.any(active)

    def body(state):
        v, h, acc, active = state
        # Clamp positions so gathers stay in range for inactive lanes.
        vc = jnp.clip(v, 0, plen)
        hc = jnp.clip(h, 0, tlen)
        wp = load16(pat, vc)
        wt = load16(txt, hc)
        diff = wp ^ wt
        diff = diff | ~tail_mask(vc + 16, plen) | ~tail_mask(hc + 16, tlen)
        eq = jax.lax.clz(diff) >> 1  # clz(0) == 32 -> eq == 16
        eq = jnp.where(active, eq, 0)
        acc = acc + eq
        v = v + eq
        h = h + eq
        active = active & (eq == 16) & (v < plen) & (h < tlen)
        return v, h, acc, active

    active0 = (~invalid) & (v0 < plen) & (h0 < tlen)
    _, _, acc, _ = jax.lax.while_loop(
        cond, body, (v0, h0, jnp.zeros_like(offs), active0)
    )
    return jnp.where(invalid, jnp.int32(OFFSET_NULL), offs + acc)


def _shift_hi(row: jnp.ndarray) -> jnp.ndarray:
    """row[k-1] aligned under k (pad with NULL on the left)."""
    return jnp.pad(row[:, :-1], ((0, 0), (1, 0)), constant_values=OFFSET_NULL)


def _shift_lo(row: jnp.ndarray) -> jnp.ndarray:
    """row[k+1] aligned under k (pad with NULL on the right)."""
    return jnp.pad(row[:, 1:], ((0, 0), (0, 1)), constant_values=OFFSET_NULL)


def _take_slot(buf: jnp.ndarray, slot: jnp.ndarray) -> jnp.ndarray:
    """buf[A, B, W] indexed at a dynamic ring slot; slot<0 -> all NULL."""
    row = jax.lax.dynamic_index_in_dim(
        buf, jnp.maximum(slot, 0), axis=0, keepdims=False
    )
    return jnp.where(slot < 0, jnp.int32(OFFSET_NULL), row)


def _window_gather(
    parent: jnp.ndarray,    # [B, W] parent window contents
    rel: jnp.ndarray,       # [B, W] index into the parent window for lane j
    parent_extent: jnp.ndarray,  # [B, 1] hi-lo of the parent window
) -> jnp.ndarray:
    """Banded-mode read of a parent window at per-alignment shifted positions
    (the TPU analog of aband get_offset's k>hi||k<lo NULL clamp,
    sequence_alignment_kernel_aband.cu:50-56)."""
    oob = (rel < 0) | (rel > parent_extent)
    safe = jnp.clip(rel, 0, parent.shape[1] - 1)
    vals = jnp.take_along_axis(parent, safe, axis=1)
    return jnp.where(oob, jnp.int32(OFFSET_NULL), vals)


@functools.partial(
    jax.jit,
    static_argnames=("cfg",),
)
def align_batch_device(
    cfg: EngineConfig,
    pat: jnp.ndarray,    # [B, NW] uint32 packed patterns
    txt: jnp.ndarray,    # [B, NW] uint32 packed texts
    plen: jnp.ndarray,   # [B] int32
    tlen: jnp.ndarray,   # [B] int32
    valid: jnp.ndarray,  # [B] bool — False routes to CPU (has_N / too long)
) -> dict[str, jnp.ndarray]:
    """Align one tile of B pairs; returns distances, finished flags and (in
    CIGAR mode) the per-step choice table + window bases for traceback."""
    sched = build_schedule(cfg.penalties, cfg.max_steps, cfg.score_limit)
    return _align_batch_impl(cfg, sched, pat, txt, plen, tlen, valid)


def _align_batch_impl(
    cfg: EngineConfig,
    sched: WavefrontSchedule,
    pat: jnp.ndarray,
    txt: jnp.ndarray,
    plen: jnp.ndarray,
    tlen: jnp.ndarray,
    valid: jnp.ndarray,
) -> dict[str, jnp.ndarray]:
    x, o, e = cfg.penalties.x, cfg.penalties.o, cfg.penalties.e
    A = cfg.penalties.active_working_set
    W = cfg.wf_width
    W2 = W // 2
    B = pat.shape[0]
    S = sched.num_steps

    # Pad packed sequences with one extra word so the two-word de-phased load
    # never reads out of bounds.
    pad = jnp.zeros((B, 1), dtype=jnp.uint32)
    patp = jnp.concatenate([pat, pad], axis=1)
    txtp = jnp.concatenate([txt, pad], axis=1)

    plen2 = plen[:, None].astype(jnp.int32)
    tlen2 = tlen[:, None].astype(jnp.int32)
    target_k = (tlen - plen).astype(jnp.int32)            # [B]
    target_off = tlen.astype(jnp.int32)                   # [B]

    # Schedule tables as device constants.
    d_of = jnp.asarray(sched.score)
    out_slot = jnp.asarray(sched.out_slot)
    mx_slot = jnp.asarray(sched.mx_slot)
    moe_slot = jnp.asarray(sched.moe_slot)
    ide_slot = jnp.asarray(sched.ide_slot)

    NULL = jnp.int32(OFFSET_NULL)
    null_state = jnp.full((A, B, W), NULL, dtype=jnp.int32)

    # ---- score 0: initial extension at k=0 (kernel lines 546-555). ----
    zero = jnp.zeros((B, 1), dtype=jnp.int32)
    init_off = _extend(zero, zero, patp, txtp, plen2, tlen2)[:, 0]  # [B]

    # Diagonal k=0 lives at window index k - lo: the exact engine centers its
    # fixed window at -W2; the banded window starts as the single diagonal 0
    # with base lo=0 (aband kernel init, lines 566-592).
    jcenter = 0 if cfg.banded else W2
    M0 = null_state.at[0, :, jcenter].set(init_off)

    done0 = (target_k == 0) & (init_off == target_off)
    done0 = done0 | ~valid
    finished0 = done0 & valid
    dist0 = jnp.zeros((B,), dtype=jnp.int32)

    if cfg.banded:
        # Per-slot window base/extent; slot 0 starts as the single diagonal 0
        # (aband kernel lines 566-577: hi=lo=0).
        lo0 = jnp.zeros((A, B), dtype=jnp.int32)
        ext0 = jnp.zeros((A, B), dtype=jnp.int32)
    else:
        lo0 = jnp.full((A, B), -W2, dtype=jnp.int32)
        ext0 = jnp.full((A, B), W - 1, dtype=jnp.int32)

    if cfg.compute_cigar:
        choices0 = jnp.zeros((S, B, W), dtype=jnp.uint8)
        lo_trace0 = jnp.zeros((S, B), dtype=jnp.int32)
    else:
        choices0 = jnp.zeros((0,), dtype=jnp.uint8)
        lo_trace0 = jnp.zeros((0,), dtype=jnp.int32)

    jrange = jnp.arange(W, dtype=jnp.int32)[None, :]      # [1, W]

    def step(state):
        (s, M, I, D, lo, ext, done, finished, dist, choices, lo_trace) = state
        d = d_of[s]
        oslot = out_slot[s]
        sx = mx_slot[s]
        soe = moe_slot[s]
        se = ide_slot[s]

        Mx = _take_slot(M, sx)
        Moe = _take_slot(M, soe)
        Ie = _take_slot(I, se)
        De = _take_slot(D, se)

        if cfg.banded:
            lo_x = jax.lax.dynamic_index_in_dim(lo, jnp.maximum(sx, 0), 0, False)
            ext_x = jax.lax.dynamic_index_in_dim(ext, jnp.maximum(sx, 0), 0, False)
            lo_oe = jax.lax.dynamic_index_in_dim(lo, jnp.maximum(soe, 0), 0, False)
            ext_oe = jax.lax.dynamic_index_in_dim(ext, jnp.maximum(soe, 0), 0, False)
            lo_e = jax.lax.dynamic_index_in_dim(lo, jnp.maximum(se, 0), 0, False)
            ext_e = jax.lax.dynamic_index_in_dim(ext, jnp.maximum(se, 0), 0, False)

            # New window bounds (aband next_MDI lines 167-205): grow, clamp to
            # width, and re-center every `band` scores once at full width.
            def hb(lo_p, ext_p, slot):
                hi_p = lo_p + ext_p
                return (
                    jnp.where(slot < 0, jnp.int32(-(2**20)), hi_p),
                    jnp.where(slot < 0, jnp.int32(2**20), lo_p),
                )
            hi_x_b, lo_x_b = hb(lo_x, ext_x, sx)
            hi_oe_b, lo_oe_b = hb(lo_oe, ext_oe, soe)
            hi_e_b, lo_e_b = hb(lo_e, ext_e, se)

            hi_ID = jnp.maximum(hi_oe_b, hi_e_b) + 1
            lo_ID = jnp.minimum(lo_oe_b, lo_e_b) - 1
            hi_n = jnp.maximum(hi_x_b, hi_ID)
            lo_n = jnp.minimum(lo_x_b, lo_ID)

            # Clamp: shrink hi first, alternately (aband lines 172-176).
            t = jnp.maximum((hi_n - lo_n) - (W - 1), 0)
            hi_n = hi_n - (t + 1) // 2
            lo_n = lo_n + t // 2

            # Re-center (aband lines 182-205): only when the M[d-x] window is
            # at full width and d % band == 0.
            full_width = ext_x >= (W - 1)
            is_mdi = (soe >= 0) | (se >= 0)
            recenter = full_width & ((d % cfg.band) == 0) & (sx >= 0) & is_mdi

            kx = lo_x[:, None] + jrange                   # parent diagonals
            d2t = jnp.where(
                Mx >= 0,
                jnp.maximum(plen2 - (Mx - kx), tlen2 - Mx),
                INT32_MAX,
            )
            # Exclude the last window cell (loop is `i < prev_hi`) and keep
            # first-tie-wins with the sentinel 2*(tlen+plen) at prev_lo.
            in_scan = jrange < ext_x[:, None]
            d2t = jnp.where(in_scan, d2t, INT32_MAX)
            sentinel = (2 * (tlen2 + plen2)).astype(jnp.int32)
            cand = jnp.concatenate([sentinel, d2t], axis=1)
            amin = jnp.argmin(cand, axis=1).astype(jnp.int32)
            center = lo_x + jnp.maximum(amin - 1, 0)
            lo_rc = center - W2
            lo_n = jnp.where(recenter, lo_rc, lo_n)
            hi_n = jnp.where(recenter, lo_rc + W - 1, hi_n)
            ext_n = hi_n - lo_n

            # Parent reads at per-alignment shifted positions: lane j of the
            # child window is diagonal k = lo_n + j.
            def read(parent, lo_p, ext_p, slot, dk):
                rel = (lo_n[:, None] - lo_p[:, None]) + jrange + dk
                vals = _window_gather(parent, rel, ext_p[:, None])
                return jnp.where(slot < 0, NULL, vals)

            I_open = read(Moe, lo_oe, ext_oe, soe, -1) + 1
            I_ext = read(Ie, lo_e, ext_e, se, -1) + 1
            D_open = read(Moe, lo_oe, ext_oe, soe, +1)
            D_ext = read(De, lo_e, ext_e, se, +1)
            X_off = read(Mx, lo_x, ext_x, sx, 0) + 1
            k_lane = lo_n[:, None] + jrange
            lane_live = jrange <= ext_n[:, None]
        else:
            lo_n = jnp.full((B,), -W2, dtype=jnp.int32)
            ext_n = jnp.full((B,), W - 1, dtype=jnp.int32)
            I_open = _shift_hi(Moe) + 1
            I_ext = _shift_hi(Ie) + 1
            D_open = _shift_lo(Moe)
            D_ext = _shift_lo(De)
            X_off = Mx + 1
            k_lane = jrange - W2
            lane_live = jnp.ones((B, W), dtype=bool)

        # ---- I/D/M recurrence with reference tie-breaking. ----
        I_pb = jnp.maximum(_pack(I_open, 1), _pack(I_ext, 2))
        I_new = I_pb >> 2
        D_pb = jnp.maximum(_pack(D_open, 1), _pack(D_ext, 2))
        D_new = D_pb >> 2

        M_pb = jnp.maximum(
            jnp.maximum(_pack(X_off, AffineOp.SUB), _pack(D_new, AffineOp.DEL)),
            _pack(I_new, AffineOp.INS),
        )
        M_cand = M_pb >> 2
        M_new = _extend(M_cand, k_lane, patp, txtp, plen2, tlen2)

        if cfg.banded:
            I_new = jnp.where(lane_live, I_new, NULL)
            D_new = jnp.where(lane_live, D_new, NULL)
            M_new = jnp.where(lane_live, M_new, NULL)

        # ---- termination (kernel lines 637-640; aband adds the overshoot
        # rule at lines 674-682). ----
        tk_abs = jnp.abs(target_k)
        rel_t = (target_k - lo_n)[:, None]
        m_at_t = _window_gather(M_new, rel_t, ext_n[:, None])[:, 0]
        reachable = tk_abs <= d
        hit = reachable & (m_at_t == target_off)
        newly = hit & ~done
        if cfg.banded:
            overshoot = reachable & (m_at_t > target_off)
            newly = (hit | overshoot) & ~done
            fin_now = hit
        else:
            fin_now = hit

        finished = jnp.where(newly, fin_now, finished)
        dist = jnp.where(newly, d, dist)
        done = done | newly

        # ---- commit to ring slot (skip updates for already-done lanes so a
        # finished alignment's final wavefront stays frozen for traceback). --
        live = ~done[:, None] | newly[:, None]
        Mo = jax.lax.dynamic_index_in_dim(M, oslot, 0, False)
        Io = jax.lax.dynamic_index_in_dim(I, oslot, 0, False)
        Do = jax.lax.dynamic_index_in_dim(D, oslot, 0, False)
        M = jax.lax.dynamic_update_index_in_dim(
            M, jnp.where(live, M_new, Mo), oslot, 0
        )
        I = jax.lax.dynamic_update_index_in_dim(
            I, jnp.where(live, I_new, Io), oslot, 0
        )
        D = jax.lax.dynamic_update_index_in_dim(
            D, jnp.where(live, D_new, Do), oslot, 0
        )
        if cfg.banded:
            lo_cur = jax.lax.dynamic_index_in_dim(lo, oslot, 0, False)
            ext_cur = jax.lax.dynamic_index_in_dim(ext, oslot, 0, False)
            lvec = live[:, 0]
            lo = jax.lax.dynamic_update_index_in_dim(
                lo, jnp.where(lvec, lo_n, lo_cur), oslot, 0
            )
            ext = jax.lax.dynamic_update_index_in_dim(
                ext, jnp.where(lvec, ext_n, ext_cur), oslot, 0
            )

        if cfg.compute_cigar:
            m_op = (M_pb & 3).astype(jnp.uint8)
            m_choice = jnp.where(
                m_op == AffineOp.SUB,
                jnp.uint8(M_FROM_X),
                jnp.where(m_op == AffineOp.INS, jnp.uint8(M_FROM_I), jnp.uint8(M_FROM_D)),
            )
            i_ext_bit = ((I_pb & 3) == 2).astype(jnp.uint8) << I_FROM_EXTEND_BIT
            d_ext_bit = ((D_pb & 3) == 2).astype(jnp.uint8) << D_FROM_EXTEND_BIT
            ch = m_choice | i_ext_bit | d_ext_bit
            choices = jax.lax.dynamic_update_index_in_dim(
                choices, ch, s, 0
            )
            lo_trace = jax.lax.dynamic_update_index_in_dim(
                lo_trace, lo_n, s, 0
            )

        return (s + 1, M, I, D, lo, ext, done, finished, dist, choices, lo_trace)

    def cond(state):
        s = state[0]
        done = state[6]
        return (s < S) & ~jnp.all(done)

    state0 = (
        jnp.int32(0), M0, null_state, null_state, lo0, ext0,
        done0, finished0, dist0, choices0, lo_trace0,
    )
    (s_end, M, I, D, lo, ext, done, finished, dist, choices, lo_trace) = (
        jax.lax.while_loop(cond, step, state0)
    )

    # Lanes that ran out of steps: unfinished, score = last score + 1
    # (reference exits the while with `distance` already incremented).
    timed_out = valid & ~done
    dist = jnp.where(timed_out, jnp.int32(sched.unfinished_score), dist)
    finished = jnp.where(timed_out, False, finished)
    finished = finished & valid
    dist = jnp.where(valid, dist, 0)

    out: dict[str, Any] = {"distance": dist, "finished": finished}
    if cfg.compute_cigar:
        out["choices"] = choices
        out["lo_trace"] = lo_trace
    return out
