"""Pallas TPU kernels for batched gap-affine WFA (distance + CIGAR modes).

This is the performance path; wfa_tpu/ops/engine_xla.py is the portable
reference implementation with identical semantics (cross-validated in tests).

Mapping of the reference CUDA kernel (lib/kernels/sequence_distance_kernel.cu)
onto the TPU, re-designed rather than translated:

* One grid step = one tile of ``BT`` alignments (sublanes) x ``W`` diagonals
  (lanes).  Replaces CUDA's one-block-per-alignment + atomic work pool with
  dense static batching.
* The whole M/I/D wavefront ring lives in **VMEM scratch** for the entire
  alignment — the analog of the reference's shared-memory center cache +
  global spill (sequence_alignment_kernel.cu:51-78), except VMEM is large
  enough that nothing spills.
* The wavefront-existence control flow (which scores are skipped / M-only /
  full MDI — reference lines 584-610) runs as **scalar bitmask arithmetic**
  inside the kernel: two rolling u32 bitmaps of M/I existence over the last 32
  scores replace both the reference's runtime `exist` flags and any schedule
  table.
* The 16-bases-per-u32 LCP extension (common_alignment_kernels.cuh:29-111) is
  `xor` + `clz` on u32 lanes; the unaligned two-word loads become
  `tpu.dynamic_gather` lane-shuffles.  Mosaic's gather only shuffles within a
  128-lane vreg, so wide gathers run as a dynamic-range loop over 128-word
  table chunks (`_gather_wide`), skipping chunks no lane needs.
* CIGAR mode records, per score and diagonal, a 4-bit backtrace choice
  (2 bits: M's winning source; 1 bit each: I/D gap-extend vs gap-open) —
  the same information as the reference's per-cell 2-bit backtrace vectors
  (sequence_alignment_kernel.cu:101-123), but with a deterministic dense
  layout instead of an atomic linked list.  Choices for 8 consecutive scores
  are nibble-packed into one int32 lane and spilled to an HBM output by
  double-buffered async DMA every 8 scores — the TPU-native analog of the
  reference's offload_backtrace smem->global flush (BT_IS_FULL cadence,
  sequence_alignment_kernel.cu:30-49).  Host code (C++/OpenMP) decodes the
  CIGARs after the fact.

Constraints: W and the packed-word count must be multiples of 128; offsets are
int32 lanes (int16 packing is a future optimization).
"""
from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import OFFSET_NULL, AffineOp, Penalties

NULL = np.int32(OFFSET_NULL)
LANE = 128


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


# Choice encoding inside each 4-bit nibble (must match ops/engine_xla.py).
M_FROM_X = 0
M_FROM_I = 1
M_FROM_D = 2
I_FROM_EXTEND_BIT = 2
D_FROM_EXTEND_BIT = 3

SCORES_PER_WORD = 8  # 4-bit choices nibble-packed per int32 choice word


@dataclasses.dataclass(frozen=True)
class PallasConfig:
    penalties: Penalties
    max_steps: int
    wf_width: int          # multiple of 128
    tile_batch: int = 8    # alignments per grid step (sublane dim)
    band: int = -1         # <0 exact; >0 banded re-center interval
    compute_cigar: bool = False
    # Hard cap on the score loop (required in CIGAR mode, where it bounds the
    # choice-table rows; optional in distance mode, where it stops lanes that
    # can no longer produce a certifiable result).  Must be >= the highest
    # score any lane may usefully reach — build_schedule(...).unfinished_score
    # or the width-certificate bound.
    score_cap: int = 0
    # LCP-extension strides (words of 16 bases): cheap first probe, then wide
    # strides for the (compacted) lanes still matching.  With active-lane
    # compaction the optimum is span=48 (HiFi banded sweep: 16->2080,
    # 24->2458, 32->2583, 48->2751, 64->2736, 96->2693, 112->2350 aln/s).
    extend_span: int = 48
    extend_first_span: int = 2
    # Staged extension: serve span loads from a per-row 256-word sequence
    # window gathered once per iteration (full-sweep fallback for lanes
    # outside the window).
    staged_extend: bool = True
    # Probe staging: when False (default since round 5) the first-span probe
    # skips the staged-window attempt and full-sweeps directly.  On real
    # long reads the active-lane spread is 260-830 words and never fits the
    # window (tools/dev_spread_sim.py), so staging pays its gathers + a
    # scalar sync for nothing (measured +4.5% off: 3,144 vs 3,010 aln/s on
    # HiFi); on short reads the table is 1-2 chunks and the full sweep is
    # cheaper than stage+serve anyway.
    probe_staged: bool = False
    # Uniform-rel fast path in the compacted wide stride: when every active
    # lane sits at the staged window's base word (the one-survivor case),
    # serve the span as static stage slices broadcast across lanes instead
    # of (span+1) x 2 serve gathers.  MEASURED NEGATIVE on HiFi (3,002 vs
    # 3,144 aln/s) — kept as an ablation, default off.
    uniform_serve: bool = False
    # Perf-debugging knobs: skip the HBM choice spill / lo recording, stub
    # out the LCP extension / parent-window reads (timing ablations only —
    # results are wrong with these set).
    debug_skip_dma: bool = False
    debug_skip_lo: bool = False
    debug_skip_extend: bool = False
    debug_skip_wread: bool = False
    debug_probe_only: bool = False
    # Timing-only decomposition of the post-probe stride machinery:
    # 1 = dispatch reductions + switch with no-op branches (isolates the
    #     dispatch); 2 = pick + exactly one wide-stride body, no while loop
    #     (isolates the serve); 0 = normal.
    debug_stride_mode: int = 0
    # Emit real-dynamics counters as an extra [B, 8] int32 output (results
    # stay correct): per tile, col 0 = extension calls, 1 = wide-stride body
    # executions, 2 = full_path (scattered) dispatches, 3 = compact
    # dispatches, 4 = sum of probe survivors, 5 = sum of active lanes
    # entering extension.
    debug_counters: bool = False
    debug_always_compute: bool = False
    # Mosaic scoped-VMEM limit override (bytes; 0 = compiler default 16 MiB).
    # Wide exact-CIGAR windows need slightly more stack for the staged
    # extension + choice-chunk carry.
    vmem_limit_bytes: int = 0
    # Two-score software-pipelined body: each loop iteration processes scores
    # (d, d+1) with ONE stacked [2*BT, W] LCP extension, amortizing the
    # extension's latency chains (80-85% of step time, BASELINE.md SOL) over
    # twice the sublanes.  Legal when min(x, o+e) >= 2: score d+1's
    # recurrence then reads only M rows <= d-1 plus the PRE-extension I/D
    # rows of score d, so the two extensions are independent.
    # -1 = auto (on when legal), 0 = off.  WFA_TPU_TWO_SCORE overrides the
    # default process-wide (kill-switch for HW A/B without code edits).
    two_score_body: int = int(os.environ.get("WFA_TPU_TWO_SCORE", "-1"))
    # HBM-resident wavefront ring (exact + distance-only): the M/I/D ring
    # lives in an HBM buffer and each score streams its 4 parent rows into
    # VMEM / its 3 new rows back out by async DMA.  This removes the VMEM
    # cap on W (3*A rows of [BT, W] never coexist on-chip — only 7), the
    # TPU-native analog of the reference's shared-memory-center + global
    # -spill scheme (sequence_alignment_kernel.cu:51-78) that keeps ANY
    # max_error on device.  Implies the partial-serve staged extension
    # (kernel code size linear in W, so wide windows stay compilable).
    ring_hbm: bool = False
    # Force the partial-serve staged extension on the VMEM paths too (ring
    # mode always uses it).  Candidate hot-path win: drops the staged
    # window's vector->scalar ``ok`` sync + fallback cond per extension
    # iteration; unserved lanes retry next iteration instead.
    extend_partial: bool = False
    # Persistent staged windows (round 5): the extension's per-row sequence
    # windows live in VMEM scratch across iterations AND scores — active
    # diagonals advance slowly and monotonically, so one gathered window
    # keeps serving for dozens of scores.  The common-path iteration is then
    # rel = idx - base -> window gather, with NO lane-reduction mins and NO
    # full-table gather sweep in the critical chain (the round-3 staged
    # loader paid both every iteration); out-of-window lanes retry next
    # iteration after a pl.when-guarded refresh re-bases the window.
    # MEASURED NEGATIVE on the real HiFi workload (888-1051 aln/s vs 2912
    # baseline, round 5): host-side simulation (tools/dev_spread_sim.py)
    # shows the active lanes' word-index spread is 260-830 words per step —
    # no VMEM-resident window can cover the probe, so the refresh fires
    # nearly every iteration and serves only a fraction of the lanes.  Kept
    # as an opt-in ablation (1 = on, 0 = off, default off).
    # WFA_TPU_PERSIST_STAGE overrides the default process-wide.
    persistent_stage: int = int(os.environ.get("WFA_TPU_PERSIST_STAGE", "0"))

    def __post_init__(self):
        assert self.wf_width % LANE == 0
        assert self.penalties.active_working_set <= 64, (
            "existence bitmask holds 64 scores; max(o+e,x)+1 must be <= 64"
        )
        if self.compute_cigar:
            assert self.score_cap > 0, "CIGAR mode requires score_cap"
        if self.ring_hbm:
            assert not self.banded, "ring_hbm is the wide-EXACT engine"

    @property
    def banded(self) -> bool:
        return self.band > 0

    @property
    def stacked_scores(self) -> int:
        if self.two_score_body == 0 or self.ring_hbm:
            return 1
        p = self.penalties
        return 2 if min(p.x, p.o + p.e) >= 2 else 1

    @property
    def num_chunks(self) -> int:
        """Choice-table rows: 8 scores per int32 nibble word, +1 slack row."""
        return self.score_cap // SCORES_PER_WORD + 2

    @property
    def lo_pad(self) -> int:
        """Padded by-score length of the banded lo_trace output."""
        return _round_up(self.score_cap + 2 * LANE, LANE)


def _tree_combine(parts, op):
    while len(parts) > 1:
        nxt = [
            op(parts[i], parts[i + 1])
            for i in range(0, len(parts) - 1, 2)
        ]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


def _gather_chunks(load_chunk, n_chunks: int, idx: jnp.ndarray, fill, dtype):
    """Generic wide per-lane gather: out[b, j] = table[b, idx[b, j]].

    ``load_chunk(tc)`` must return the [BT, 128] table chunk starting at lane
    tc*128 (tc is a python int — the sweep is static).  Mosaic's
    `tpu.dynamic_gather` only shuffles within one 128-lane vreg, so the
    gather sweeps every table chunk unconditionally.  The per-chunk results
    are merged with a masked-sum TREE, not a linear select fold: each lane is
    in range of exactly one (or zero) chunks, and the tree keeps the gathers
    independent so they pipeline through the shuffle unit — a dynamic gather
    has ~80 ns latency but ~7 ns issue throughput (sol_calibrate.py), so a
    linear fold serializes the whole sweep on latency.  Out-of-range lanes
    get ``fill``.
    """
    bt, w = idx.shape
    pieces = []
    for oc in range(w // LANE):
        idx_c = idx[:, oc * LANE : (oc + 1) * LANE]
        vals = []
        ins = []
        for tc in range(n_chunks):
            rel = idx_c - tc * LANE
            inr = (rel >= 0) & (rel < LANE)
            g = jnp.take_along_axis(
                load_chunk(tc), jnp.clip(rel, 0, LANE - 1), axis=1
            )
            vals.append(jnp.where(inr, g, jnp.zeros((), dtype)))
            ins.append(inr)
        if n_chunks == 0:
            pieces.append(jnp.full((bt, LANE), fill, dtype))
            continue
        tot = _tree_combine(vals, lambda a, b: a + b)
        anyin = _tree_combine(ins, lambda a, b: a | b)
        pieces.append(jnp.where(anyin, tot, jnp.full((), fill, dtype)))
    return jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]


def _gather_words(words_ref, idx: jnp.ndarray) -> jnp.ndarray:
    bt = idx.shape[0]
    rows = words_ref.shape[0]
    n_chunks = words_ref.shape[1] // LANE
    assert bt % rows == 0
    rep = bt // rows  # >1 when a stacked multi-score extension shares a tile

    def load_chunk(tc):
        c = words_ref[pl.ds(0, rows), pl.ds(tc * LANE, LANE)]
        if rep > 1:
            c = jnp.concatenate([c] * rep, axis=0)
        return c

    return _gather_chunks(load_chunk, n_chunks, idx, 0, jnp.uint32)


def _dephase(raw: list, phase: jnp.ndarray, nwords: int) -> list:
    """Combine ``nwords + 1`` consecutive raw words into ``nwords`` de-phased
    words (the reference's two-word shift trick,
    common_alignment_kernels.cuh:53-84, generalized to wider spans)."""
    out = []
    for i in range(nwords):
        hi = raw[i] << (2 * phase)
        lo = jnp.where(
            phase == 0, jnp.uint32(0), raw[i + 1] >> (32 - 2 * phase)
        )
        out.append(hi | lo)
    return out


def _load_span(words_ref, pos: jnp.ndarray, nwords: int) -> list:
    """``nwords`` consecutive de-phased u32 words (16 bases each) starting at
    base index `pos`, gathered with a full sweep over the sequence table."""
    idx = jax.lax.shift_right_logical(pos, 4)
    phase = (pos & 15).astype(jnp.uint32)
    raw = [_gather_words(words_ref, idx + i) for i in range(nwords + 1)]
    return _dephase(raw, phase, nwords)


# Staged sequence-window width in 128-word chunks; 1 measured best for the
# bench workloads (overridable per-process for long-read tuning).
_STAGE_CHUNKS = int(os.environ.get("WFA_STAGE_CHUNKS", "1"))


def _load_span_pair2_partial(pat_ref, txt_ref, vpos, hpos, nwords, active):
    """Partial-serve variant of _load_span_pair2_staged: instead of a scalar
    all-lanes-fit flag (whose miss falls back to a full-table sweep — code
    size (NWP/128)x(W/128), prohibitive at ring-mode widths), return a
    PER-LANE ``served`` mask.  Unserved lanes simply retry on the next
    extension iteration, when the window re-bases over the remaining active
    lanes — the minimum-index lane is always in window, so every round makes
    progress.  This also removes the staged path's vector->scalar ``ok``
    sync from the extension's critical path."""
    idx_v = jax.lax.shift_right_logical(vpos, 4)
    idx_t = jax.lax.shift_right_logical(hpos, 4)
    bigw = jnp.int32(1 << 24)
    mv = jnp.where(active > 0, idx_v, bigw)
    mt = jnp.where(active > 0, idx_t, bigw)
    bv = jnp.min(mv, axis=1, keepdims=True)
    # Anchor the text window to the lanes attaining the pattern-window base:
    # independent per-sequence minima can deadlock (the min-idx_v lane out of
    # the t-window and vice versa leaves NO lane in both windows, and the
    # caller's while loop would spin).  With the dependent base, the lane
    # attaining (min idx_v, then min idx_t among those) is served every
    # round, so progress is guaranteed.
    bt_ = jnp.min(jnp.where(mv == bv, mt, bigw), axis=1, keepdims=True)
    base_v = jnp.where(bv == bigw, 0, bv)
    base_t = jnp.where(bt_ == bigw, 0, bt_)
    rel_v = idx_v - base_v
    rel_t = idx_t - base_t
    need = nwords + 1
    cap = _STAGE_CHUNKS * LANE - need
    srv = jnp.where(
        (active > 0) & (rel_v >= 0) & (rel_v <= cap)
        & (rel_t >= 0) & (rel_t <= cap), 1, 0
    ).astype(jnp.int32)

    bt = idx_v.shape[0]
    lane_w = jax.lax.broadcasted_iota(
        jnp.int32, (bt, _STAGE_CHUNKS * LANE), 1
    )
    stage_v = _gather_words(pat_ref, base_v + lane_w)
    stage_t = _gather_words(txt_ref, base_t + lane_w)

    def serve(stage, rels):
        return [
            _gather_chunks(
                lambda tc: stage[:, tc * LANE : (tc + 1) * LANE],
                _STAGE_CHUNKS, rels + i, 0, jnp.uint32,
            )
            for i in range(need)
        ]

    raw_v = serve(stage_v, jnp.where(srv > 0, rel_v, 0))
    raw_t = serve(stage_t, jnp.where(srv > 0, rel_t, 0))
    return raw_v, raw_t, srv


_STAGE_SLACK = 8  # words of window kept below the active minimum at refresh


def _load_span_pair2_persist(pat_ref, txt_ref, pwin_ref, pbase_ref,
                             vpos, hpos, nwords, active):
    """Staged-window loads served from a PERSISTENT window (VMEM scratch)
    surviving across extension iterations and scores (PallasConfig.
    persistent_stage).  Per iteration the common path is just
    rel = idx - base -> gather from the resident window; out-of-window
    lanes return srv=0 (partial-serve semantics — they retry next
    iteration) and arm a pl.when-guarded refresh that re-bases the window
    at the active lanes' minimum (anchored text base so refresh rounds
    always make progress, see _load_span_pair2_partial; _STAGE_SLACK words
    below for band re-centering), writing pwin/pbase for the NEXT
    iteration — the refresh's reductions and full-table gather sweep never
    sit in the serving iteration's data path."""
    idx_v = jax.lax.shift_right_logical(vpos, 4)
    idx_t = jax.lax.shift_right_logical(hpos, 4)
    bt = idx_v.shape[0]
    sw = _STAGE_CHUNKS * LANE
    need = nwords + 1
    cap = sw - need
    base_v = pbase_ref[pl.ds(0, 1), :, :][0][:bt]
    base_t = pbase_ref[pl.ds(1, 1), :, :][0][:bt]
    rel_v = idx_v - base_v
    rel_t = idx_t - base_t
    act = active > 0
    inw = (rel_v >= 0) & (rel_v <= cap) & (rel_t >= 0) & (rel_t <= cap)
    srv = jnp.where(act & inw, 1, 0).astype(jnp.int32)

    def serve(seq, rels):
        def load_chunk(tc):
            return pwin_ref[pl.ds(seq, 1), :, pl.ds(tc * LANE, LANE)][0][:bt]

        return [
            _gather_chunks(load_chunk, _STAGE_CHUNKS,
                           jnp.where(srv > 0, rels, 0) + i, 0, jnp.uint32)
            for i in range(need)
        ]

    raw_v = serve(0, rel_v)
    raw_t = serve(1, rel_t)

    missing = jnp.max(jnp.where(act & ~inw, 1, 0))

    @pl.when(missing > 0)
    def _():
        bigw = jnp.int32(1 << 24)
        mv = jnp.where(act, idx_v, bigw)
        mt = jnp.where(act, idx_t, bigw)
        bv = jnp.min(mv, axis=1, keepdims=True)
        # Independent per-sequence bases serve EVERY active lane whenever
        # the spread fits the window (the common case).  When it overflows,
        # fall back to the anchored text base (min idx_t among the lanes
        # attaining min idx_v, see _load_span_pair2_partial): only that
        # guarantees some lane lands in BOTH windows, so refresh rounds
        # always make progress (independent bases can deadlock there).
        bt_i = jnp.min(mt, axis=1, keepdims=True)
        bt_a = jnp.min(jnp.where(mv == bv, mt, bigw), axis=1, keepdims=True)
        sp_v = jnp.max(jnp.where(act, idx_v, 0), axis=1, keepdims=True) - bv
        sp_t = jnp.max(jnp.where(act, idx_t, 0), axis=1, keepdims=True) - bt_i
        fits = (sp_v <= cap - _STAGE_SLACK) & (sp_t <= cap - _STAGE_SLACK)
        bt2 = jnp.where(fits, bt_i, bt_a)
        nb_v = jnp.maximum(jnp.where(bv == bigw, 0, bv) - _STAGE_SLACK, 0)
        nb_t = jnp.maximum(jnp.where(bt2 == bigw, 0, bt2) - _STAGE_SLACK, 0)
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (bt, sw), 1)
        pwin_ref[pl.ds(0, 1), pl.ds(0, bt), :] = _gather_words(
            pat_ref, nb_v + lane_w
        )[None]
        pwin_ref[pl.ds(1, 1), pl.ds(0, bt), :] = _gather_words(
            txt_ref, nb_t + lane_w
        )[None]
        pbase_ref[pl.ds(0, 1), pl.ds(0, bt), :] = nb_v[None]
        pbase_ref[pl.ds(1, 1), pl.ds(0, bt), :] = nb_t[None]

    return raw_v, raw_t, srv


def _load_span_pair2_switch(pat_ref, txt_ref, vpos, hpos, nwords, active,
                            uniform: bool, stats_ref=None):
    """3-way staged loader returning DEPHASED word lists (wps, wts).

    sel=2 (uniform fast path, only when ``uniform``): every active lane's
    word index equals the window base on both sequences — the compacted
    one-survivor case (real HiFi has at most ONE >=32b probe survivor per
    step, tools/dev_spread_sim.py), where the span serve needs NO gathers:
    raw word i is the static stage column i broadcast across lanes.  This
    removes the serve's (nwords+1) x 2 dependent-gather chain (~80 ns/link,
    BASELINE.md SOL) from the wide-stride critical path.
    sel=1: staged gather serve (spread fits the window).
    sel=0: full-table sweep fallback.
    One lane reduction + one scalar sync pick the branch (same sync count
    as the old ok-flag cond)."""
    idx_v = jax.lax.shift_right_logical(vpos, 4)
    idx_t = jax.lax.shift_right_logical(hpos, 4)
    bigw = jnp.int32(1 << 24)
    act = active > 0
    mv = jnp.where(act, idx_v, bigw)
    mt = jnp.where(act, idx_t, bigw)
    bv = jnp.min(mv, axis=1, keepdims=True)
    bt_ = jnp.min(mt, axis=1, keepdims=True)
    base_v = jnp.where(bv == bigw, 0, bv)
    base_t = jnp.where(bt_ == bigw, 0, bt_)
    rel_v = idx_v - base_v
    rel_t = idx_t - base_t
    need = nwords + 1
    over = jnp.maximum(jnp.where(act, rel_v, 0), jnp.where(act, rel_t, 0))
    max_over = jnp.max(over)
    cap = _STAGE_CHUNKS * LANE - need

    bt = idx_v.shape[0]
    w = idx_v.shape[1]
    phase_v = (vpos & 15).astype(jnp.uint32)
    phase_t = (hpos & 15).astype(jnp.uint32)

    def load_stage():
        lane_w = jax.lax.broadcasted_iota(
            jnp.int32, (bt, _STAGE_CHUNKS * LANE), 1
        )
        return (_gather_words(pat_ref, base_v + lane_w),
                _gather_words(txt_ref, base_t + lane_w))

    def full_branch():
        if stats_ref is not None:
            stats_ref[7] = stats_ref[7] + 1
        return (_load_span(pat_ref, vpos, nwords),
                _load_span(txt_ref, hpos, nwords))

    def gather_branch():
        if stats_ref is not None:
            stats_ref[6] = stats_ref[6] + 1
        stage_v, stage_t = load_stage()

        def serve(stage, rels):
            return [
                _gather_chunks(
                    lambda tc: stage[:, tc * LANE : (tc + 1) * LANE],
                    _STAGE_CHUNKS, rels + i, 0, jnp.uint32,
                )
                for i in range(need)
            ]

        raw_v = serve(stage_v, jnp.where(act, rel_v, 0))
        raw_t = serve(stage_t, jnp.where(act, rel_t, 0))
        return (_dephase(raw_v, phase_v, nwords),
                _dephase(raw_t, phase_t, nwords))

    if not uniform:
        ok = max_over <= cap
        return jax.lax.cond(ok, gather_branch, full_branch)

    def uniform_branch():
        stage_v, stage_t = load_stage()
        raw_v = [
            jnp.broadcast_to(stage_v[:, i : i + 1], (bt, w))
            for i in range(need)
        ]
        raw_t = [
            jnp.broadcast_to(stage_t[:, i : i + 1], (bt, w))
            for i in range(need)
        ]
        return (_dephase(raw_v, phase_v, nwords),
                _dephase(raw_t, phase_t, nwords))

    sel = jnp.where(
        max_over == 0, 2, jnp.where(max_over <= cap, 1, 0)
    ).astype(jnp.int32)
    return jax.lax.switch(sel, [full_branch, gather_branch, uniform_branch])


def _load_span_pair2_staged(pat_ref, txt_ref, vpos, hpos, nwords, active):
    """Staged variant of _load_span for both sequences at once: the active
    lanes of one extension iteration read words from a narrow range (lanes
    that survive an iteration all advanced by exactly 16*span bases, so the
    spread never grows), so gather one stage window per sequence and serve
    every span load from it — cutting the gather sweep from
    (W/128)x(NWP/128) per load to (W/128)x_STAGE_CHUNKS, behind a
    full-sweep fallback for the rare out-of-window case.

    The two sequences share TWO lane reductions total instead of four: the
    per-seq window bases come from one 3D min, the combined out-of-window
    check from one max (lane reductions cost ~166 ns each on this chip —
    sol_calibrate.py — and sit on the extension's critical path every score
    step).

    Returns (raw_p, raw_t lists of nwords+1 words, scalar ok flag)."""
    idx_v = jax.lax.shift_right_logical(vpos, 4)
    idx_t = jax.lax.shift_right_logical(hpos, 4)
    bigw = jnp.int32(1 << 24)
    mv = jnp.where(active > 0, idx_v, bigw)
    mt = jnp.where(active > 0, idx_t, bigw)
    # (A fused [BT,2,W] 3D min measured 2x the Mosaic stack footprint —
    # per-seq reduces stay, only the overflow check is shared.)
    bv = jnp.min(mv, axis=1, keepdims=True)
    bt_ = jnp.min(mt, axis=1, keepdims=True)
    base_v = jnp.where(bv == bigw, 0, bv)
    base_t = jnp.where(bt_ == bigw, 0, bt_)
    rel_v = idx_v - base_v
    rel_t = idx_t - base_t
    need = nwords + 1
    over = jnp.maximum(
        jnp.where(active > 0, rel_v, 0), jnp.where(active > 0, rel_t, 0)
    )
    ok = jnp.max(over) <= _STAGE_CHUNKS * LANE - need

    bt = idx_v.shape[0]
    lane_w = jax.lax.broadcasted_iota(
        jnp.int32, (bt, _STAGE_CHUNKS * LANE), 1
    )
    stage_v = _gather_words(pat_ref, base_v + lane_w)
    stage_t = _gather_words(txt_ref, base_t + lane_w)

    def serve(stage, rels):
        return [
            _gather_chunks(
                lambda tc: stage[:, tc * LANE : (tc + 1) * LANE],
                _STAGE_CHUNKS, rels + i, 0, jnp.uint32,
            )
            for i in range(need)
        ]

    raw_v = serve(stage_v, jnp.where(active > 0, rel_v, 0))
    raw_t = serve(stage_t, jnp.where(active > 0, rel_t, 0))
    return raw_v, raw_t, ok


def _tail_mask(nxt: jnp.ndarray, limit: jnp.ndarray) -> jnp.ndarray:
    over = jnp.maximum(nxt - limit, 0)
    sh = jnp.minimum(2 * over, 32).astype(jnp.uint32)
    full = jnp.uint32(0xFFFFFFFF)
    return jnp.where(sh == 32, jnp.uint32(0), full << sh)


def _extend(offs, k, pat_ref, txt_ref, plen, tlen,
            span: int = 8, first_span: int = 1, staged: bool = True,
            serve_partial: bool = False, pwin_ref=None, pbase_ref=None,
            probe_staged: bool = True, uniform_serve: bool = True,
            debug_probe_only: bool = False, debug_stride_mode: int = 0,
            stats_ref=None):
    """Vectorized LCP extension (WF_extend_kernel analog).

    Two-phase: the first probe compares only ``first_span`` words (most lanes
    mismatch within 16 bases — off-path diagonals of random DNA), then lanes
    that matched a full probe continue in ``span``-word strides (the on-path
    diagonal extends ~1/error_rate bases per step, so wide strides amortize
    the gather cost exactly where it pays).

    The `active` mask is carried as int32 — Mosaic cannot yield i1 vectors
    from loop bodies.
    """
    v0 = offs - k
    h0 = offs
    invalid = (offs < 0) | (v0 > plen) | (h0 > tlen)

    def make_body(nwords, use_staged=None, uniform=False):
        if use_staged is None:
            use_staged = staged
        nb = 16 * nwords

        def body(state):
            v, h, acc, active = state
            vc = jnp.clip(v, 0, plen)
            hc = jnp.clip(h, 0, tlen)
            srv = None
            if use_staged and serve_partial:
                raw_p, raw_t, srv = _load_span_pair2_partial(
                    pat_ref, txt_ref, vc, hc, nwords, active
                )
                wps = _dephase(raw_p, (vc & 15).astype(jnp.uint32), nwords)
                wts = _dephase(raw_t, (hc & 15).astype(jnp.uint32), nwords)
            elif use_staged and pwin_ref is not None:
                raw_p, raw_t, srv = _load_span_pair2_persist(
                    pat_ref, txt_ref, pwin_ref, pbase_ref, vc, hc, nwords,
                    active,
                )
                wps = _dephase(raw_p, (vc & 15).astype(jnp.uint32), nwords)
                wts = _dephase(raw_t, (hc & 15).astype(jnp.uint32), nwords)
            elif use_staged:
                wps, wts = _load_span_pair2_switch(
                    pat_ref, txt_ref, vc, hc, nwords, active, uniform,
                    stats_ref=stats_ref if nwords > first_span else None,
                )
            else:
                wps = _load_span(pat_ref, vc, nwords)
                wts = _load_span(txt_ref, hc, nwords)
            # First-mismatch position across the span: word i contributes
            # 16*i + clz(diff_i)/2 when it is the first mismatching word.
            eq = jnp.full(v.shape, nb, jnp.int32)
            found = jnp.zeros(v.shape, jnp.int32)
            for i in range(nwords):
                diff = wps[i] ^ wts[i]
                off16 = 16 * i
                diff = diff | ~_tail_mask(vc + off16 + 16, plen)
                diff = diff | ~_tail_mask(hc + off16 + 16, tlen)
                nz = diff != 0
                e_i = off16 + (jax.lax.clz(diff) >> 1).astype(jnp.int32)
                eq = jnp.where((found == 0) & nz, e_i, eq)
                found = jnp.where(nz, 1, found)
            if srv is None:
                eq = jnp.where(active > 0, eq, 0)
                acc = acc + eq
                v = v + eq
                h = h + eq
                active = jnp.where(
                    (eq == nb) & (v < plen) & (h < tlen), active, 0
                )
            else:
                # Unserved lanes contribute nothing and stay active — they
                # retry when the window re-bases next iteration.
                eq = jnp.where((active > 0) & (srv > 0), eq, 0)
                acc = acc + eq
                v = v + eq
                h = h + eq
                keep = (eq == nb) & (v < plen) & (h < tlen)
                active = jnp.where(
                    (srv > 0) & ~keep, 0, active
                )
            return v, h, acc, active

        return body

    def cond(state):
        return jnp.max(state[3]) > 0

    active0 = jnp.where(
        (~invalid) & (v0 < plen) & (h0 < tlen), 1, 0
    ).astype(jnp.int32)
    state = (v0, h0, jnp.zeros_like(offs), active0)
    if stats_ref is not None:
        stats_ref[0] = stats_ref[0] + 1
        stats_ref[5] = stats_ref[5] + jnp.sum(active0)
    if first_span and first_span < span:
        # The probe's staged window rarely fits on long diverse reads (the
        # active lanes' word-index spread is 260-830 words on real HiFi,
        # tools/dev_spread_sim.py), so probe_staged=False skips the doomed
        # stage attempt + scalar sync and goes straight to the full sweep.
        state = make_body(first_span, use_staged=staged and probe_staged)(
            state
        )
        if debug_probe_only:  # timing ablation only — results are wrong
            return jnp.where(invalid, NULL, offs + state[2])
        if stats_ref is not None:
            stats_ref[4] = stats_ref[4] + jnp.sum(state[3])

    w = offs.shape[1]
    if not (staged and w > LANE and first_span and first_span < span):
        _, _, acc, _ = jax.lax.while_loop(cond, make_body(span), state)
        return jnp.where(invalid, NULL, offs + acc)

    # Lane compaction for the wide-stride iterations: probe survivors matched
    # 16*first_span bases, which off the optimal path of random DNA is
    # vanishingly rare — live lanes cluster on adjacent diagonals.  Run the
    # main loop on one 128-lane window per row (gathers shrink by W/128x) and
    # add the result back; scattered survivors or none fall back / skip.
    v, h, acc0, active = state
    bt = offs.shape[0]
    lane_i = jax.lax.broadcasted_iota(jnp.int32, offs.shape, 1)
    bigw = jnp.int32(1 << 24)
    lo_l = jnp.min(jnp.where(active > 0, lane_i, bigw), axis=1, keepdims=True)
    hi_l = jnp.max(jnp.where(active > 0, lane_i, -1), axis=1, keepdims=True)
    base_l = jnp.clip(jnp.minimum(lo_l, w - LANE), 0, w - LANE)
    any_active = jnp.max(active) > 0
    fits = jnp.max(hi_l - base_l) < LANE

    def compact_path():
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (bt, LANE), 1)
        idx = base_l + lane_c

        def pick(arr):
            return _gather_chunks(
                lambda tc: arr[:, tc * LANE : (tc + 1) * LANE],
                w // LANE, idx, 0, arr.dtype,
            )

        v_c, h_c, a_c = pick(v), pick(h), pick(active)
        # Do-while: the common case is exactly one wide stride, so run the
        # body once unconditionally and let the while cond (a ~380 ns
        # vector->scalar sync) fire once at exit instead of enter + exit.
        wide0 = make_body(span, uniform=uniform_serve)
        if stats_ref is None:
            wide = wide0
        else:
            stats_ref[3] = stats_ref[3] + 1

            def wide(st):
                stats_ref[1] = stats_ref[1] + 1
                return wide0(st)

        st1 = wide((v_c, h_c, jnp.zeros_like(v_c), a_c))
        if debug_stride_mode == 2:  # timing only: no while loop
            acc_c = st1[2]
        else:
            _, _, acc_c, _ = jax.lax.while_loop(cond, wide, st1)
        rel = lane_i - base_l
        add = _gather_chunks(
            lambda tc: acc_c, 1,
            jnp.where((rel >= 0) & (rel < LANE), rel, -1),
            0, jnp.int32,
        )
        return acc0 + add

    def full_path():
        # Scattered survivors (repeats / homopolymers spread matching lanes
        # past one 128-lane window) run at FULL width — keep the stride
        # short there: a wide-span full-width body materializes (span+1) x
        # [BT, W] loads per iteration and its staged window rarely covers
        # the scattered lanes, so it degrades to full-sweep gathers.
        if debug_stride_mode == 2:
            return make_body(min(span, 8))(state)[2]
        nar0 = make_body(min(span, 8))
        if stats_ref is None:
            nar = nar0
        else:
            stats_ref[2] = stats_ref[2] + 1

            def nar(st):
                stats_ref[1] = stats_ref[1] + 1
                return nar0(st)

        _, _, acc_f, _ = jax.lax.while_loop(cond, nar, state)
        return acc_f

    # One 3-way dispatch instead of two nested conds: both reduces issue
    # together and a single branch select follows.
    sel = jnp.where(any_active, jnp.where(fits, 2, 1), 0).astype(jnp.int32)
    if debug_stride_mode == 1:  # timing only: dispatch without the strides
        acc = jax.lax.switch(
            sel, [lambda: acc0, lambda: acc0 + 1, lambda: acc0 + 2]
        )
    else:
        acc = jax.lax.switch(sel, [lambda: acc0, full_path, compact_path])
    return jnp.where(invalid, NULL, offs + acc)


def _pack(offset, op):
    return (offset << 2) | op


def _shift_k_minus_1(row):
    """row[k-1] under lane k: shift lanes right by one, NULL into lane 0."""
    rolled = pltpu.roll(row, 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.where(lane == 0, NULL, rolled)


def _shift_k_plus_1(row):
    rolled = pltpu.roll(row, row.shape[1] - 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.where(lane == row.shape[1] - 1, NULL, rolled)


def _wfa_kernel(cfg: PallasConfig):
    x, o, e = cfg.penalties.x, cfg.penalties.o, cfg.penalties.e
    A = cfg.penalties.active_working_set
    W = cfg.wf_width
    BT = cfg.tile_batch
    W2 = W // 2
    BIG = np.int32(1 << 20)
    banded = cfg.banded
    cigar = cfg.compute_cigar

    ring = cfg.ring_hbm
    sp = ring or cfg.extend_partial
    # Rolling existence bitmaps: NB u32 words cover the last 32*NB scores
    # (bit j of the chain == exist[d-1-j]).  Penalties are static, so the
    # word holding a given lag is selected at trace time — working sets up
    # to 64 scores stay on the Pallas path (the reference has no such
    # limit; one extra scalar word removes this build's former >32 cliff).
    NB = (A + 31) // 32

    def b_test(bits, k: int):
        """Bit for lag k (static python int >= 1) of a bitmap tuple."""
        if k <= 32:
            return (bits[0] >> (k - 1)) & jnp.uint32(1)
        return (bits[1] >> (k - 33)) & jnp.uint32(1)

    def b_shift(bits, bit):
        lo = (bits[0] << 1) | bit
        if NB == 1:
            return (lo,)
        return (lo, (bits[1] << 1) | (bits[0] >> 31))

    persist = cfg.staged_extend and not sp and cfg.persistent_stage != 0
    # probe_staged=False replaces the probe's staged-window attempt with an
    # UNCONDITIONAL full-table sweep (wins +4.5% at banded widths, see
    # PallasConfig).  At wide-exact widths that sweep materializes
    # (first_span+1) x 2 x [BT, W] u32 raw words on the Mosaic stack
    # (~8 MiB at W=16384) and blows the scoped-VMEM limit, so keep the
    # staged probe (whose full sweep lives inside a cond branch) there.
    probe_staged = cfg.probe_staged or ring or W > 2048

    def kernel(*refs):
        if cfg.debug_counters:
            # The counters output is the LAST output, the SMEM stats scratch
            # the LAST scratch; pop both before the per-mode destructuring.
            stats_ref = refs[-1]
            ns_other = ((4 if ring else 2) + (2 if cigar else 0)
                        + (2 if persist else 0))
            cnt_ref = refs[-(ns_other + 2)]
            refs = refs[:-(ns_other + 2)] + refs[-(ns_other + 1):-1]
        else:
            stats_ref = cnt_ref = None
        if persist:
            pbase_ref = refs[-1]
            pwin_ref = refs[-2]
            refs = refs[:-2]
        else:
            pwin_ref = pbase_ref = None
        if cigar and banded:
            (pat_ref, txt_ref, plen_ref, tlen_ref, valid_ref,
             dist_ref, fin_ref, choices_ref, lo_ref,
             state_ref, win_ref, stage_ref, sem) = refs
        elif cigar and ring:
            (pat_ref, txt_ref, plen_ref, tlen_ref, valid_ref,
             dist_ref, fin_ref, choices_ref, ring_ref,
             prow_ref, nrow_ref, rsem, wsem, stage_ref, sem) = refs
            state_ref = win_ref = None
        elif cigar:
            (pat_ref, txt_ref, plen_ref, tlen_ref, valid_ref,
             dist_ref, fin_ref, choices_ref,
             state_ref, win_ref, stage_ref, sem) = refs
        elif ring:
            (pat_ref, txt_ref, plen_ref, tlen_ref, valid_ref,
             dist_ref, fin_ref, ring_ref,
             prow_ref, nrow_ref, rsem, wsem) = refs
            state_ref = win_ref = None
        else:
            (pat_ref, txt_ref, plen_ref, tlen_ref, valid_ref,
             dist_ref, fin_ref, state_ref, win_ref) = refs
        gi = pl.program_id(0)
        if stats_ref is not None:
            for i in range(8):
                stats_ref[i] = 0
        plen = plen_ref[:]            # [BT, 1]
        tlen = tlen_ref[:]
        valid = valid_ref[:]          # [BT, 1] int32 0/1 (Mosaic dislikes
        target_k = tlen - plen        # narrow bool vectors, so masks are i32)
        target_off = tlen

        lane = jax.lax.broadcasted_iota(jnp.int32, (BT, W), 1)

        def ring_cp_in(i, mat, slot):
            """Parent-row fetch: HBM ring row (mat, slot) -> prow_ref[i]."""
            return pltpu.make_async_copy(
                ring_ref.at[mat * A + slot, pl.ds(gi * BT, BT), :],
                prow_ref.at[i], rsem.at[i],
            )

        def ring_cp_out(j, mat, slot):
            return pltpu.make_async_copy(
                nrow_ref.at[j],
                ring_ref.at[mat * A + slot, pl.ds(gi * BT, BT), :],
                wsem.at[j],
            )

        if persist:
            # Poison the window bases so the first extension refreshes
            # before serving (scratch is uninitialized per grid step).
            negb = jnp.full((1, pbase_ref.shape[1], 1), -(1 << 20), jnp.int32)
            pbase_ref[pl.ds(0, 1), :, :] = negb
            pbase_ref[pl.ds(1, 1), :, :] = negb

        if not ring:
            # Reset the whole ring to NULL (one row store per wavefront).
            null_row = jnp.full((1, BT, W), NULL, jnp.int32)
            for i in range(3 * A):
                state_ref[pl.ds(i, 1), :, :] = null_row
            zeros_w = jnp.zeros((1, BT, 1), jnp.int32)
            for i in range(2 * A):
                win_ref[pl.ds(i, 1), :, :] = zeros_w

        # Score 0: initial extension on diagonal 0.  The exact engine centers
        # its fixed window at -W2; the banded window starts as the single
        # diagonal 0 at index 0 (aband kernel init, lines 566-592).
        j0 = 0 if banded else W2
        k0_row = lane - j0
        offs0 = jnp.where(lane == j0, 0, NULL)
        m0 = _extend(offs0, k0_row, pat_ref, txt_ref, plen, tlen,
                     cfg.extend_span, cfg.extend_first_span,
                     cfg.staged_extend, serve_partial=sp,
                        probe_staged=probe_staged,
                        uniform_serve=cfg.uniform_serve,
                        debug_probe_only=cfg.debug_probe_only,
                        debug_stride_mode=cfg.debug_stride_mode,
                        stats_ref=stats_ref,
                     pwin_ref=pwin_ref, pbase_ref=pbase_ref)
        if ring:
            # The HBM ring needs no NULL reset: every read is masked by the
            # scalar existence bits, which are only set after the producing
            # score has written its rows.  Score 0's M row is the exception.
            nrow_ref[pl.ds(0, 1), :, :] = m0[None]
            cp0 = ring_cp_out(0, 0, jnp.int32(0))
            cp0.start()
            cp0.wait()
        else:
            state_ref[pl.ds(0, 1), :, :] = m0[None]

        init_off = jnp.max(
            jnp.where(lane == j0, m0, NULL), axis=1, keepdims=True
        )
        hit0 = jnp.where(
            (target_k == 0) & (init_off == target_off), 1, 0
        ).astype(jnp.int32)
        done0 = jnp.maximum(hit0, 1 - valid)
        fin0 = hit0 * valid
        dist0 = jnp.zeros((BT, 1), jnp.int32)

        def read_row(mat: int, slot):
            return state_ref[pl.ds(mat * A + slot, 1), :, :][0]

        def read_win(slot):
            lo = win_ref[pl.ds(slot, 1), :, :][0]
            ext = win_ref[pl.ds(A + slot, 1), :, :][0]
            return lo, ext

        def _flush_dma(slot, row):
            """Async copy of one staged choice row to the HBM choice table."""
            return pltpu.make_async_copy(
                stage_ref.at[slot],
                choices_ref.at[row, pl.ds(gi * BT, BT), :],
                sem.at[slot],
            )

        def body(carry):
            if cigar and banded:
                (d, steps, m_bits, i_bits, done, fin, dist, all_done,
                 chunk, lo_buf) = carry
            elif cigar:
                (d, steps, m_bits, i_bits, done, fin, dist, all_done,
                 chunk) = carry
            else:
                d, steps, m_bits, i_bits, done, fin, dist, all_done = carry
            # Existence of the parent scores from the rolling bitmaps
            # (bit j == exist[d-1-j]); shared with body2 so the encoding
            # can't drift between the loop bodies.
            m_x, gap_oe, gap_ie = exist_flags(d, m_bits, i_bits)
            gap = (gap_oe | gap_ie) != 0
            m_exist = gap | (m_x != 0)

            def compute(done, fin, dist):
                oslot = jax.lax.rem(d, A)
                sx = jax.lax.rem(d - x + A * 8, A)
                soe = jax.lax.rem(d - o - e + A * 8, A)
                se = jax.lax.rem(d - e + A * 8, A)
                if ring:
                    cps = [
                        ring_cp_in(0, 0, sx), ring_cp_in(1, 0, soe),
                        ring_cp_in(2, 1, se), ring_cp_in(3, 2, se),
                    ]
                    for c in cps:
                        c.start()
                    for c in cps:
                        c.wait()
                    Mx = prow_ref[pl.ds(0, 1), :, :][0]
                    Moe = prow_ref[pl.ds(1, 1), :, :][0]
                    Ie = prow_ref[pl.ds(2, 1), :, :][0]
                    De = prow_ref[pl.ds(3, 1), :, :][0]
                else:
                    Mx = read_row(0, sx)
                    Moe = read_row(0, soe)
                    Ie = read_row(1, se)
                    De = read_row(2, se)
                ok_x = m_x != 0
                ok_oe = gap_oe != 0
                ok_ie = gap_ie != 0
                if not banded:
                    Mxv = jnp.where(ok_x, Mx, NULL)
                    Moev = jnp.where(ok_oe, Moe, NULL)
                    Iev = jnp.where(ok_ie, Ie, NULL)
                    Dev = jnp.where(ok_ie, De, NULL)
                    I_open = _shift_k_minus_1(Moev) + 1
                    I_ext = _shift_k_minus_1(Iev) + 1
                    D_open = _shift_k_plus_1(Moev)
                    D_ext = _shift_k_plus_1(Dev)
                    X_off = Mxv + 1
                    k_row = lane - W2
                    lo_n = None
                    ext_n = None
                else:
                    lo_x, ext_x = read_win(sx)
                    lo_oe, ext_oe = read_win(soe)
                    lo_e, ext_e = read_win(se)

                    def bounds(lo_p, ext_p, ok):
                        hi_p = jnp.where(ok, lo_p + ext_p, -BIG)
                        lo_b = jnp.where(ok, lo_p, BIG)
                        return hi_p, lo_b

                    hi_x_b, lo_x_b = bounds(lo_x, ext_x, ok_x)
                    hi_oe_b, lo_oe_b = bounds(lo_oe, ext_oe, ok_oe)
                    hi_e_b, lo_e_b = bounds(lo_e, ext_e, ok_ie)

                    hi_id = jnp.maximum(hi_oe_b, hi_e_b) + 1
                    lo_id = jnp.minimum(lo_oe_b, lo_e_b) - 1
                    hi_n = jnp.maximum(hi_x_b, hi_id)
                    lo_n = jnp.minimum(lo_x_b, lo_id)
                    # Clamp to the band width, shrinking hi first
                    # (aband lines 172-176).
                    t = jnp.maximum((hi_n - lo_n) - (W - 1), 0)
                    hi_n = hi_n - (t + 1) // 2
                    lo_n = lo_n + t // 2

                    # Re-center every `band` scores when the M[d-x] window is
                    # at full width (aband lines 182-205), MDI steps only.
                    recenter_step = jax.lax.rem(d, cfg.band) == 0
                    do_rc = jnp.where(
                        (ext_x >= W - 1) & recenter_step & gap & ok_x, 1, 0
                    )
                    kx = lo_x + lane
                    d2t = jnp.where(
                        Mx >= 0,
                        jnp.maximum(plen - (Mx - kx), tlen - Mx),
                        BIG,
                    )
                    d2t = jnp.where(lane < ext_x, d2t, BIG)
                    sentinel = 2 * (tlen + plen)
                    mval = jnp.min(d2t, axis=1, keepdims=True)
                    first = jnp.min(
                        jnp.where(d2t == mval, lane, BIG),
                        axis=1, keepdims=True,
                    )
                    center = jnp.where(mval < sentinel, lo_x + first, lo_x)
                    lo_n = jnp.where(do_rc != 0, center - W2, lo_n)
                    hi_n = jnp.where(do_rc != 0, center - W2 + W - 1, hi_n)
                    ext_n = hi_n - lo_n

                    def load_row(mat, slot):
                        return state_ref[pl.ds(mat * A + slot, 1), :, :][0]

                    def wread_gather(row, lo_p, ext_p, ok, dk):
                        # Per-alignment dynamic-shift read of a parent window:
                        # child lane j is diagonal lo_n + j; parent index is
                        # that diagonal minus the parent's base (the TPU
                        # analog of aband get_offset's k>hi||k<lo NULL clamp).
                        rel = (lo_n - lo_p) + lane + dk
                        vals = _gather_chunks(
                            lambda tc: row[:, tc * LANE : (tc + 1) * LANE],
                            W // LANE,
                            jnp.where((rel >= 0) & (rel <= ext_p), rel, -1),
                            NULL, jnp.int32,
                        )
                        return jnp.where(ok, vals, NULL)

                    row_oe = load_row(0, soe)
                    row_ie = load_row(1, se)
                    row_de = load_row(2, se)
                    row_x = load_row(0, sx)

                    if cfg.debug_skip_wread:
                        I_open = jnp.where(ok_oe, row_oe, NULL) + 1
                        I_ext = jnp.where(ok_ie, row_ie, NULL) + 1
                        D_open = jnp.where(ok_oe, row_oe, NULL)
                        D_ext = jnp.where(ok_ie, row_de, NULL)
                        X_off = jnp.where(ok_x, row_x, NULL) + 1
                    else:
                        I_open = wread_gather(
                            row_oe, lo_oe, ext_oe, ok_oe, -1
                        ) + 1
                        I_ext = wread_gather(
                            row_ie, lo_e, ext_e, ok_ie, -1
                        ) + 1
                        D_open = wread_gather(row_oe, lo_oe, ext_oe, ok_oe, +1)
                        D_ext = wread_gather(row_de, lo_e, ext_e, ok_ie, +1)
                        X_off = wread_gather(row_x, lo_x, ext_x, ok_x, 0) + 1
                    k_row = lo_n + lane

                I_pb = jnp.maximum(_pack(I_open, 1), _pack(I_ext, 2))
                I_new = I_pb >> 2
                D_pb = jnp.maximum(_pack(D_open, 1), _pack(D_ext, 2))
                D_new = D_pb >> 2
                M_pb = jnp.maximum(
                    jnp.maximum(
                        _pack(X_off, int(AffineOp.SUB)),
                        _pack(D_new, int(AffineOp.DEL)),
                    ),
                    _pack(I_new, int(AffineOp.INS)),
                )
                if cfg.debug_skip_extend:
                    M_new = M_pb >> 2
                else:
                    M_new = _extend(
                        M_pb >> 2, k_row, pat_ref, txt_ref, plen, tlen,
                        cfg.extend_span, cfg.extend_first_span,
                        cfg.staged_extend, serve_partial=sp,
                        probe_staged=probe_staged,
                        uniform_serve=cfg.uniform_serve,
                        debug_probe_only=cfg.debug_probe_only,
                        debug_stride_mode=cfg.debug_stride_mode,
                        stats_ref=stats_ref,
                        pwin_ref=pwin_ref, pbase_ref=pbase_ref,
                    )

                if banded:
                    lane_live = lane <= ext_n
                    I_new = jnp.where(lane_live, I_new, NULL)
                    D_new = jnp.where(lane_live, D_new, NULL)
                    M_new = jnp.where(lane_live, M_new, NULL)

                # Termination: M[target_k] == target_offset; banded adds the
                # overshoot -> unfinished rule (aband lines 674-682).
                m_at_t = jnp.max(
                    jnp.where(k_row == target_k, M_new, NULL),
                    axis=1, keepdims=True,
                )
                reach = jnp.abs(target_k) <= d
                hit = reach & (m_at_t == target_off)
                if banded:
                    stop = reach & (m_at_t >= target_off)
                else:
                    stop = hit
                newly = jnp.where(stop, 1 - done, 0).astype(jnp.int32)
                newfin = jnp.where(hit, newly, 0)
                fin = jnp.maximum(fin, newfin)
                dist = jnp.where(newly != 0, d, dist)
                done = jnp.maximum(done, newly)

                if ring:
                    # No freeze merge: a finished sublane's dist/fin are
                    # already latched (newly==0 forever after), its rows are
                    # never consulted for the result, and other sublanes
                    # only read their own row slices — so unconditional
                    # writes are safe and skip a read-modify-write of HBM.
                    nrow_ref[pl.ds(0, 1), :, :] = M_new[None]
                    nrow_ref[pl.ds(1, 1), :, :] = I_new[None]
                    nrow_ref[pl.ds(2, 1), :, :] = D_new[None]
                    wcps = [
                        ring_cp_out(0, 0, oslot),
                        ring_cp_out(1, 1, oslot),
                        ring_cp_out(2, 2, oslot),
                    ]
                    for c in wcps:
                        c.start()
                    # Drain before returning: the next compute() reads the
                    # ring immediately, and with x==e the slot written here
                    # is a parent one score later (RAW through HBM).
                    for c in wcps:
                        c.wait()
                else:
                    # Freeze finished lanes' slots (last wavefront is kept).
                    live = (done == 0) | (newly != 0)
                    old_m = state_ref[pl.ds(oslot, 1), :, :][0]
                    old_i = state_ref[pl.ds(A + oslot, 1), :, :][0]
                    old_d = state_ref[pl.ds(2 * A + oslot, 1), :, :][0]
                    state_ref[pl.ds(oslot, 1), :, :] = jnp.where(
                        live, M_new, old_m
                    )[None]
                    state_ref[pl.ds(A + oslot, 1), :, :] = jnp.where(
                        live, I_new, old_i
                    )[None]
                    state_ref[pl.ds(2 * A + oslot, 1), :, :] = jnp.where(
                        live, D_new, old_d
                    )[None]
                if banded:
                    old_lo = win_ref[pl.ds(oslot, 1), :, :][0]
                    old_ext = win_ref[pl.ds(A + oslot, 1), :, :][0]
                    win_ref[pl.ds(oslot, 1), :, :] = jnp.where(
                        live, lo_n, old_lo
                    )[None]
                    win_ref[pl.ds(A + oslot, 1), :, :] = jnp.where(
                        live, ext_n, old_ext
                    )[None]
                if not cigar:
                    return done, fin, dist
                # 4-bit backtrace choice per lane (encoding shared with the
                # XLA engine and with body2 via _mk_choice).
                ch = _mk_choice(M_pb, I_pb, D_pb)
                if banded:
                    return done, fin, dist, ch, lo_n
                return done, fin, dist, ch

            if cigar and banded:
                zero_pass = lambda done, fin, dist: (
                    done, fin, dist,
                    jnp.zeros((BT, W), jnp.int32), jnp.zeros((BT, 1), jnp.int32),
                )
            elif cigar:
                zero_pass = lambda done, fin, dist: (
                    done, fin, dist, jnp.zeros((BT, W), jnp.int32),
                )
            else:
                zero_pass = lambda done, fin, dist: (done, fin, dist)

            if cfg.debug_always_compute:
                out = compute(done, fin, dist)
            else:
                out = jax.lax.cond(
                    m_exist, compute, zero_pass, done, fin, dist
                )
            if cigar and banded:
                done, fin, dist, ch, lo_val = out
            elif cigar:
                done, fin, dist, ch = out
            else:
                done, fin, dist = out

            if cigar:
                # Nibble-pack this score's choices into the rolling chunk and
                # spill a full row of 8 scores to HBM by double-buffered DMA
                # (offload_backtrace analog).
                chunk = chunk | (ch << (4 * (d & 7)))
                fi = d >> 3          # flush index when d & 7 == 7
                do_flush = (d & 7) == 7

                if not cfg.debug_skip_dma:
                    @pl.when(do_flush)
                    def _():
                        slot = fi & 1

                        @pl.when(fi >= 2)
                        def _():
                            _flush_dma(slot, fi - 2).wait()

                        stage_ref[pl.ds(slot, 1), :, :] = chunk[None]
                        _flush_dma(slot, fi).start()

                chunk = jnp.where(do_flush, 0, chunk)

            if cigar and banded and not cfg.debug_skip_lo:
                # Buffer the per-score window base; spill 128 scores at a time
                # with one aligned lane store.
                lane128 = jax.lax.broadcasted_iota(jnp.int32, (BT, LANE), 1)
                lo_buf = jnp.where(lane128 == (d & (LANE - 1)), lo_val, lo_buf)

                @pl.when((d & (LANE - 1)) == LANE - 1)
                def _():
                    base = pl.multiple_of((d >> 7) * LANE, LANE)
                    lo_ref[:, pl.ds(base, LANE)] = lo_buf

            steps = steps + jnp.where(gap, 1, 0)
            m_bits = b_shift(m_bits, jnp.where(m_exist, jnp.uint32(1), jnp.uint32(0)))
            i_bits = b_shift(i_bits, jnp.where(gap, jnp.uint32(1), jnp.uint32(0)))
            # The all-done reduce (a vector->scalar sync) runs every 4th
            # score; the loop may overrun by up to 3 scores, which is
            # harmless (finished lanes are frozen, spill rows have slack).
            all_done = jax.lax.cond(
                (d & 3) == 3, lambda: jnp.min(done), lambda: all_done
            )
            if cigar and banded:
                return (d + 1, steps, m_bits, i_bits, done, fin, dist,
                        all_done, chunk, lo_buf)
            if cigar:
                return (d + 1, steps, m_bits, i_bits, done, fin, dist,
                        all_done, chunk)
            return d + 1, steps, m_bits, i_bits, done, fin, dist, all_done

        # ---- Two-score software-pipelined body (cfg.stacked_scores == 2) ----
        # Processes scores (d, d+1) per iteration with one stacked [2*BT, W]
        # extension.  Legality (min(x, o+e) >= 2) guarantees score d+1's
        # recurrence never reads M(d); its e==1 parents I/D(d) are forwarded
        # in-register PRE-extension, exactly matching what the ring would
        # hold.  Gating: score d+1 is suppressed (ok1) when the sequential
        # loop would have exited after score d (steps/score_cap bounds), so
        # `finished` matches the one-score body bit-for-bit.

        def exist_flags(d, mb, ib):
            u0 = jnp.uint32(0)
            m_x = jnp.where(d >= x, b_test(mb, x), u0)
            g_oe = jnp.where(d >= o + e, b_test(mb, o + e), u0)
            g_ie = jnp.where(d >= e, b_test(ib, e), u0)
            return m_x, g_oe, g_ie

        def recurrence(d, m_x, gap_oe, gap_ie, in_reg):
            """Pre-extension recurrence products for score d (the reference's
            next_MDI minus WF_extend).  ``in_reg`` forwards (I_row, D_row[,
            lo, ext]) of score d-e when that score is the body's first score
            (e == 1); None reads the ring."""
            gap = (gap_oe | gap_ie) != 0
            ok_x = m_x != 0
            ok_oe = gap_oe != 0
            ok_ie = gap_ie != 0
            sx = jax.lax.rem(d - x + A * 8, A)
            soe = jax.lax.rem(d - o - e + A * 8, A)
            se = jax.lax.rem(d - e + A * 8, A)
            Mx = read_row(0, sx)
            Moe = read_row(0, soe)
            if in_reg is None:
                Ie = read_row(1, se)
                De = read_row(2, se)
            else:
                Ie, De = in_reg[0], in_reg[1]
            if not banded:
                Mxv = jnp.where(ok_x, Mx, NULL)
                Moev = jnp.where(ok_oe, Moe, NULL)
                Iev = jnp.where(ok_ie, Ie, NULL)
                Dev = jnp.where(ok_ie, De, NULL)
                I_open = _shift_k_minus_1(Moev) + 1
                I_ext = _shift_k_minus_1(Iev) + 1
                D_open = _shift_k_plus_1(Moev)
                D_ext = _shift_k_plus_1(Dev)
                X_off = Mxv + 1
                k_row = lane - W2
                lo_n = None
                ext_n = None
            else:
                lo_x, ext_x = read_win(sx)
                lo_oe, ext_oe = read_win(soe)
                if in_reg is None:
                    lo_se, ext_se = read_win(se)
                else:
                    lo_se, ext_se = in_reg[2], in_reg[3]

                def bounds(lo_p, ext_p, ok):
                    hi_p = jnp.where(ok, lo_p + ext_p, -BIG)
                    lo_b = jnp.where(ok, lo_p, BIG)
                    return hi_p, lo_b

                hi_x_b, lo_x_b = bounds(lo_x, ext_x, ok_x)
                hi_oe_b, lo_oe_b = bounds(lo_oe, ext_oe, ok_oe)
                hi_e_b, lo_e_b = bounds(lo_se, ext_se, ok_ie)

                hi_id = jnp.maximum(hi_oe_b, hi_e_b) + 1
                lo_id = jnp.minimum(lo_oe_b, lo_e_b) - 1
                hi_n = jnp.maximum(hi_x_b, hi_id)
                lo_n = jnp.minimum(lo_x_b, lo_id)
                t = jnp.maximum((hi_n - lo_n) - (W - 1), 0)
                hi_n = hi_n - (t + 1) // 2
                lo_n = lo_n + t // 2

                recenter_step = jax.lax.rem(d, cfg.band) == 0
                do_rc = jnp.where(
                    (ext_x >= W - 1) & recenter_step & gap & ok_x, 1, 0
                )
                kx = lo_x + lane
                d2t = jnp.where(
                    Mx >= 0,
                    jnp.maximum(plen - (Mx - kx), tlen - Mx),
                    BIG,
                )
                d2t = jnp.where(lane < ext_x, d2t, BIG)
                sentinel = 2 * (tlen + plen)
                mval = jnp.min(d2t, axis=1, keepdims=True)
                first = jnp.min(
                    jnp.where(d2t == mval, lane, BIG),
                    axis=1, keepdims=True,
                )
                center = jnp.where(mval < sentinel, lo_x + first, lo_x)
                lo_n = jnp.where(do_rc != 0, center - W2, lo_n)
                hi_n = jnp.where(do_rc != 0, center - W2 + W - 1, hi_n)
                ext_n = hi_n - lo_n

                def wread_gather(row, lo_p, ext_p, ok, dk):
                    rel = (lo_n - lo_p) + lane + dk
                    vals = _gather_chunks(
                        lambda tc: row[:, tc * LANE : (tc + 1) * LANE],
                        W // LANE,
                        jnp.where((rel >= 0) & (rel <= ext_p), rel, -1),
                        NULL, jnp.int32,
                    )
                    return jnp.where(ok, vals, NULL)

                if cfg.debug_skip_wread:
                    I_open = jnp.where(ok_oe, Moe, NULL) + 1
                    I_ext = jnp.where(ok_ie, Ie, NULL) + 1
                    D_open = jnp.where(ok_oe, Moe, NULL)
                    D_ext = jnp.where(ok_ie, De, NULL)
                    X_off = jnp.where(ok_x, Mx, NULL) + 1
                else:
                    I_open = wread_gather(Moe, lo_oe, ext_oe, ok_oe, -1) + 1
                    I_ext = wread_gather(Ie, lo_se, ext_se, ok_ie, -1) + 1
                    D_open = wread_gather(Moe, lo_oe, ext_oe, ok_oe, +1)
                    D_ext = wread_gather(De, lo_se, ext_se, ok_ie, +1)
                    X_off = wread_gather(Mx, lo_x, ext_x, ok_x, 0) + 1
                k_row = lo_n + lane

            I_pb = jnp.maximum(_pack(I_open, 1), _pack(I_ext, 2))
            I_new = I_pb >> 2
            D_pb = jnp.maximum(_pack(D_open, 1), _pack(D_ext, 2))
            D_new = D_pb >> 2
            M_pb = jnp.maximum(
                jnp.maximum(
                    _pack(X_off, int(AffineOp.SUB)),
                    _pack(D_new, int(AffineOp.DEL)),
                ),
                _pack(I_new, int(AffineOp.INS)),
            )
            if banded:
                lane_live = lane <= ext_n
                I_new = jnp.where(lane_live, I_new, NULL)
                D_new = jnp.where(lane_live, D_new, NULL)
            return (M_pb, I_pb, D_pb, I_new, D_new, k_row, lo_n, ext_n)

        def settle(d, exist, k_row, ext_n, M_new, I_new, D_new, lo_n,
                   done, fin, dist):
            """Termination test + freeze-masked state writes for one score."""
            if banded:
                M_new = jnp.where(lane <= ext_n, M_new, NULL)
            m_at_t = jnp.max(
                jnp.where(k_row == target_k, M_new, NULL),
                axis=1, keepdims=True,
            )
            reach = jnp.abs(target_k) <= d
            hit = reach & (m_at_t == target_off)
            if banded:
                stop = reach & (m_at_t >= target_off)
            else:
                stop = hit
            exist_i = jnp.where(exist, 1, 0).astype(jnp.int32)
            newly = jnp.where(stop, 1 - done, 0).astype(jnp.int32) * exist_i
            newfin = jnp.where(hit, newly, 0)
            fin = jnp.maximum(fin, newfin)
            dist = jnp.where(newly != 0, d, dist)
            done = jnp.maximum(done, newly)

            oslot = jax.lax.rem(d, A)
            live = ((done == 0) | (newly != 0)) & exist
            old_m = state_ref[pl.ds(oslot, 1), :, :][0]
            old_i = state_ref[pl.ds(A + oslot, 1), :, :][0]
            old_d = state_ref[pl.ds(2 * A + oslot, 1), :, :][0]
            state_ref[pl.ds(oslot, 1), :, :] = jnp.where(
                live, M_new, old_m
            )[None]
            state_ref[pl.ds(A + oslot, 1), :, :] = jnp.where(
                live, I_new, old_i
            )[None]
            state_ref[pl.ds(2 * A + oslot, 1), :, :] = jnp.where(
                live, D_new, old_d
            )[None]
            if banded:
                old_lo = win_ref[pl.ds(oslot, 1), :, :][0]
                old_ext = win_ref[pl.ds(A + oslot, 1), :, :][0]
                win_ref[pl.ds(oslot, 1), :, :] = jnp.where(
                    live, lo_n, old_lo
                )[None]
                win_ref[pl.ds(A + oslot, 1), :, :] = jnp.where(
                    live, ext_n, old_ext
                )[None]
            return done, fin, dist

        def _mk_choice(M_pb, I_pb, D_pb):
            m_op = M_pb & 3
            m_choice = jnp.where(
                m_op == int(AffineOp.SUB),
                M_FROM_X,
                jnp.where(m_op == int(AffineOp.INS), M_FROM_I, M_FROM_D),
            )
            return (
                m_choice
                | (((I_pb & 3) == 2).astype(jnp.int32) << I_FROM_EXTEND_BIT)
                | (((D_pb & 3) == 2).astype(jnp.int32) << D_FROM_EXTEND_BIT)
            )

        def body2(carry):
            if cigar and banded:
                (d, steps, m_bits, i_bits, done, fin, dist, all_done,
                 chunk, lo_buf) = carry
            elif cigar:
                (d, steps, m_bits, i_bits, done, fin, dist, all_done,
                 chunk) = carry
            else:
                d, steps, m_bits, i_bits, done, fin, dist, all_done = carry

            u0, u1 = jnp.uint32(0), jnp.uint32(1)
            m_x0, goe0, gie0 = exist_flags(d, m_bits, i_bits)
            gap0 = (goe0 | gie0) != 0
            ex0 = gap0 | (m_x0 != 0)
            steps1 = steps + jnp.where(gap0, 1, 0)
            mb1 = b_shift(m_bits, jnp.where(ex0, u1, u0))
            ib1 = b_shift(i_bits, jnp.where(gap0, u1, u0))
            ok1 = steps1 < cfg.max_steps - 1
            if cfg.score_cap > 0:
                ok1 = ok1 & (d + 1 < cfg.score_cap)
            m_x1, goe1, gie1 = exist_flags(d + 1, mb1, ib1)
            m_x1 = jnp.where(ok1, m_x1, u0)
            goe1 = jnp.where(ok1, goe1, u0)
            gie1 = jnp.where(ok1, gie1, u0)
            gap1 = (goe1 | gie1) != 0
            ex1 = gap1 | (m_x1 != 0)

            def compute2(done, fin, dist):
                r0 = recurrence(d, m_x0, goe0, gie0, None)
                in_reg = (r0[3], r0[4], r0[6], r0[7]) if e == 1 else None
                r1 = recurrence(d + 1, m_x1, goe1, gie1, in_reg)
                offs2 = jnp.concatenate([r0[0] >> 2, r1[0] >> 2], axis=0)
                k2 = jnp.concatenate([r0[5], r1[5]], axis=0)
                if cfg.debug_skip_extend:
                    M2 = offs2
                else:
                    pl2 = jnp.concatenate([plen, plen], axis=0)
                    tl2 = jnp.concatenate([tlen, tlen], axis=0)
                    M2 = _extend(
                        offs2, k2, pat_ref, txt_ref, pl2, tl2,
                        cfg.extend_span, cfg.extend_first_span,
                        cfg.staged_extend, serve_partial=sp,
                        probe_staged=probe_staged,
                        uniform_serve=cfg.uniform_serve,
                        debug_probe_only=cfg.debug_probe_only,
                        debug_stride_mode=cfg.debug_stride_mode,
                        stats_ref=stats_ref,
                        pwin_ref=pwin_ref, pbase_ref=pbase_ref,
                    )
                done, fin, dist = settle(
                    d, ex0, r0[5], r0[7], M2[:BT], r0[3], r0[4], r0[6],
                    done, fin, dist,
                )
                done, fin, dist = settle(
                    d + 1, ex1, r1[5], r1[7], M2[BT:], r1[3], r1[4], r1[6],
                    done, fin, dist,
                )
                if not cigar:
                    return done, fin, dist
                # Mask by per-score existence so the choice/lo tables match
                # the one-score body bit-for-bit (it writes zeros for
                # nonexistent scores via zero_pass; the walk never visits
                # them, but bit parity keeps cross-body table comparisons
                # and the corrupt-walk detector deterministic).
                z = jnp.zeros((BT, W), jnp.int32)
                ch0 = jnp.where(ex0, _mk_choice(r0[0], r0[1], r0[2]), z)
                ch1 = jnp.where(ex1, _mk_choice(r1[0], r1[1], r1[2]), z)
                if banded:
                    z1 = jnp.zeros((BT, 1), jnp.int32)
                    lo0 = jnp.where(ex0, r0[6], z1)
                    lo1 = jnp.where(ex1, r1[6], z1)
                    return done, fin, dist, ch0, ch1, lo0, lo1
                return done, fin, dist, ch0, ch1

            if cigar and banded:
                zero2 = lambda done, fin, dist: (
                    done, fin, dist,
                    jnp.zeros((BT, W), jnp.int32), jnp.zeros((BT, W), jnp.int32),
                    jnp.zeros((BT, 1), jnp.int32), jnp.zeros((BT, 1), jnp.int32),
                )
            elif cigar:
                zero2 = lambda done, fin, dist: (
                    done, fin, dist,
                    jnp.zeros((BT, W), jnp.int32), jnp.zeros((BT, W), jnp.int32),
                )
            else:
                zero2 = lambda done, fin, dist: (done, fin, dist)

            if cfg.debug_always_compute:
                out = compute2(done, fin, dist)
            else:
                out = jax.lax.cond(
                    ex0 | ex1, compute2, zero2, done, fin, dist
                )
            if cigar and banded:
                done, fin, dist, ch0, ch1, lo0, lo1 = out
            elif cigar:
                done, fin, dist, ch0, ch1 = out
            else:
                done, fin, dist = out

            if cigar:
                # d is always odd here (bodies start at d=1, advance by 2),
                # so a chunk boundary (d & 7 == 7) can only fall on the FIRST
                # score of the body; score d+1 (even) never completes a chunk.
                chunk = chunk | (ch0 << (4 * (d & 7)))
                fi = d >> 3
                do_flush = (d & 7) == 7

                if not cfg.debug_skip_dma:
                    @pl.when(do_flush)
                    def _():
                        slot = fi & 1

                        @pl.when(fi >= 2)
                        def _():
                            _flush_dma(slot, fi - 2).wait()

                        stage_ref[pl.ds(slot, 1), :, :] = chunk[None]
                        _flush_dma(slot, fi).start()

                chunk = jnp.where(do_flush, 0, chunk)
                chunk = chunk | (ch1 << (4 * ((d + 1) & 7)))

            if cigar and banded and not cfg.debug_skip_lo:
                # Same parity argument: the 128-score spill boundary only
                # falls on the body's first score.
                lane128 = jax.lax.broadcasted_iota(jnp.int32, (BT, LANE), 1)
                lo_buf = jnp.where(lane128 == (d & (LANE - 1)), lo0, lo_buf)

                @pl.when((d & (LANE - 1)) == LANE - 1)
                def _():
                    base = pl.multiple_of((d >> 7) * LANE, LANE)
                    lo_ref[:, pl.ds(base, LANE)] = lo_buf

                lo_buf = jnp.where(
                    lane128 == ((d + 1) & (LANE - 1)), lo1, lo_buf
                )

            steps2 = steps1 + jnp.where(gap1, 1, 0)
            mb2 = b_shift(mb1, jnp.where(ex1, u1, u0))
            ib2 = b_shift(ib1, jnp.where(gap1, u1, u0))
            all_done = jax.lax.cond(
                (d & 3) == 3, lambda: jnp.min(done), lambda: all_done
            )
            if cigar and banded:
                return (d + 2, steps2, mb2, ib2, done, fin, dist,
                        all_done, chunk, lo_buf)
            if cigar:
                return (d + 2, steps2, mb2, ib2, done, fin, dist,
                        all_done, chunk)
            return d + 2, steps2, mb2, ib2, done, fin, dist, all_done

        def cond(carry):
            d, steps, all_done = carry[0], carry[1], carry[7]
            alive = (steps < cfg.max_steps - 1) & (all_done == 0)
            if cfg.score_cap > 0:
                alive = alive & (d < cfg.score_cap)
            return alive

        u0 = jnp.uint32(0)
        carry0 = [jnp.int32(1), jnp.int32(1),
                  (jnp.uint32(1),) + (u0,) * (NB - 1), (u0,) * NB,
                  done0, fin0, dist0, jnp.min(done0)]
        if cigar:
            carry0.append(jnp.zeros((BT, W), jnp.int32))
        if cigar and banded:
            carry0.append(jnp.zeros((BT, LANE), jnp.int32))
        loop_body = body2 if cfg.stacked_scores == 2 else body
        final = jax.lax.while_loop(cond, loop_body, tuple(carry0))
        d_end, _, _, _, done, fin, dist = final[:7]

        if cigar and not cfg.debug_skip_dma:
            # Flush the trailing partial chunk, then drain outstanding DMAs.
            chunk_last = final[8]
            fi_last = d_end >> 3
            has_resid = (d_end & 7) != 0

            @pl.when(has_resid)
            def _():
                slot = fi_last & 1

                @pl.when(fi_last >= 2)
                def _():
                    _flush_dma(slot, fi_last - 2).wait()

                stage_ref[pl.ds(slot, 1), :, :] = chunk_last[None]
                _flush_dma(slot, fi_last).start()

            total = fi_last + jnp.where(has_resid, 1, 0)

            @pl.when(total >= 1)
            def _():
                _flush_dma((total - 1) & 1, 0).wait()

            @pl.when(total >= 2)
            def _():
                _flush_dma((total - 2) & 1, 0).wait()

        if cigar and banded:
            lo_last = final[9]

            @pl.when((d_end & (LANE - 1)) != 0)
            def _():
                base = pl.multiple_of((d_end >> 7) * LANE, LANE)
                lo_ref[:, pl.ds(base, LANE)] = lo_last

        # Unfinished lanes report the score after the last processed
        # iteration, like the reference's exit path.
        timed_out = (valid != 0) & (done == 0)
        dist = jnp.where(timed_out, d_end, dist)
        fin = fin * valid
        dist = dist * valid
        dist_ref[:] = dist
        fin_ref[:] = fin

        if cnt_ref is not None:
            for i in range(8):
                cnt_ref[:, pl.ds(i, 1)] = jnp.full(
                    (BT, 1), stats_ref[i], jnp.int32
                )

    return kernel


def align_batch_pallas_impl(
    cfg: PallasConfig,
    pat: jnp.ndarray,    # [B, NWP] uint32, NWP % 128 == 0
    txt: jnp.ndarray,
    plen: jnp.ndarray,   # [B] int32
    tlen: jnp.ndarray,
    valid: jnp.ndarray,  # [B] bool
):
    """Unjitted kernel invocation — composable under jit / shard_map."""
    B, NWP = pat.shape
    BT = cfg.tile_batch
    assert B % BT == 0 and NWP % LANE == 0
    grid = (B // BT,)
    A = cfg.penalties.active_working_set

    tile_spec = lambda w: pl.BlockSpec(
        (BT, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_specs = [tile_spec(1), tile_spec(1)]
    out_shape = [
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
    ]
    if cfg.compute_cigar:
        # The by-score choice table lives in HBM; the kernel streams rows into
        # it by DMA from a 2-slot VMEM staging buffer.
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct((cfg.num_chunks, B, cfg.wf_width), jnp.int32)
        )
        if cfg.banded:
            out_specs.append(tile_spec(cfg.lo_pad))
            out_shape.append(jax.ShapeDtypeStruct((B, cfg.lo_pad), jnp.int32))
    if cfg.ring_hbm:
        # M/I/D ring in HBM (an ANY-space output the kernel DMAs through);
        # VMEM holds only 4 parent rows + 3 staging rows, so W is bounded by
        # HBM, not VMEM.
        scratch = [
            pltpu.VMEM((4, BT, cfg.wf_width), jnp.int32),
            pltpu.VMEM((3, BT, cfg.wf_width), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((3,)),
        ]
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct((3 * A, B, cfg.wf_width), jnp.int32)
        )
    else:
        scratch = [
            pltpu.VMEM((3 * A, BT, cfg.wf_width), jnp.int32),
            pltpu.VMEM((2 * A, BT, 1), jnp.int32),
        ]
    if cfg.compute_cigar:
        scratch += [
            pltpu.VMEM((2, BT, cfg.wf_width), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if (cfg.staged_extend and not (cfg.ring_hbm or cfg.extend_partial)
            and cfg.persistent_stage != 0):
        # Persistent staged sequence windows + their per-row word bases
        # (appended LAST; the kernel pops them off the end of *refs).
        btx = BT * cfg.stacked_scores
        scratch += [
            pltpu.VMEM((2, btx, _STAGE_CHUNKS * LANE), jnp.uint32),
            pltpu.VMEM((2, btx, 1), jnp.int32),
        ]

    if cfg.debug_counters:
        out_specs.append(tile_spec(8))
        out_shape.append(jax.ShapeDtypeStruct((B, 8), jnp.int32))
        scratch.append(pltpu.SMEM((8,), jnp.int32))

    kernel = _wfa_kernel(cfg)
    extra = {}
    if cfg.vmem_limit_bytes:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=cfg.vmem_limit_bytes
        )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tile_spec(NWP), tile_spec(NWP),
            tile_spec(1), tile_spec(1), tile_spec(1),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        **extra,
    )(
        pat, txt,
        plen[:, None].astype(jnp.int32),
        tlen[:, None].astype(jnp.int32),
        valid[:, None].astype(jnp.int32),
    )
    res = {"distance": out[0][:, 0], "finished": out[1][:, 0] != 0}
    if cfg.compute_cigar:
        res["choice_words"] = out[2]
        if cfg.banded:
            res["lo_trace"] = out[3]
    if cfg.debug_counters:
        res["counters"] = out[-1]
    return res


align_batch_pallas = jax.jit(align_batch_pallas_impl, static_argnames=("cfg",))
