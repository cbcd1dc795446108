"""On-device backtrace extraction for the Pallas CIGAR engine.

The round-1 pipeline fetched the engine's whole dense choice table to the host
and walked it there — O(score_cap/8 · W) int32 per alignment across the
host↔device link, which dwarfed device compute time.  The reference never pays
that cost: its kernel walks each finished alignment's backtrace chain on the
GPU and ships only the alignment's own blocks
(lib/kernels/sequence_alignment_kernel.cu:659-683, result region sized
BT_OFFLOADED_RESULT_ELEMENTS = 2s/16 words, lib/wfa_types.h:59-64).

This kernel is the TPU-native analog: after the alignment kernel finishes, it
re-walks the DP backwards **on device** and emits one compact 2-bit op stream
per alignment — O(2·distance) ops ≈ 250 bytes instead of ~130 KB for a typical
long read.  The host then only replays the op stream into a run-length CIGAR
(native/traceback.cpp `wfa_cigar_from_ops_batch`).

Design (TPU-first, not a CUDA translation):

* ``TB`` alignments walk in **lane lockstep** per grid step: the walk state
  (d, k, mat, op count) lives in [TB, 1] vectors, every update is a masked
  vector select — no per-alignment scalar loops.
* The choice table stays in HBM.  Walks visit score rows in non-increasing
  order, so the kernel processes "row stages": at each stage it holds one
  row slab [TB, W] in VMEM (double-buffered async DMA, speculative prefetch
  of row-1 — the next row is r-1 whenever max(x, o+e) <= 8) and steps exactly
  the alignments whose current score lives in that row.
* The 4-bit choice of score d sits at nibble (d & 7) of word [d>>3, b, j],
  j = k - lo(d); ops append into a per-alignment accumulator word and spill
  into the [TB, OPW] output block by a one-hot lane select.

Error handling: a corrupt walk (j outside the window, op-stream overflow, or
a walk that does not close at the origin) reports n_ops = -1 for that
alignment and the host routes the pair to the CPU fallback engine.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import AffineOp, Penalties
from .engine_pallas import LANE, _gather_chunks, _round_up

M_FROM_X = 0
M_FROM_I = 1
M_FROM_D = 2

OPS_PER_WORD = 16  # 2-bit ops per int32 stream word


def ops_stream_words(score_cap: int) -> int:
    """Stream words per alignment.  Every op either lowers the score by >= 1
    or is a mat-switch SUB followed by a lowering op, so ops <= 2·dist + 1."""
    return _round_up((2 * score_cap + 1 + OPS_PER_WORD) // OPS_PER_WORD, LANE)


@dataclasses.dataclass(frozen=True)
class TracebackConfig:
    penalties: Penalties
    wf_width: int        # W of the choice table (multiple of 128)
    score_cap: int       # rows C = score_cap // 8 + 2 (engine num_chunks)
    banded: bool         # True: per-score lo_trace input; False: lo = -W/2
    lo_pad: int = 0      # padded lo_trace length (banded only)
    tile_batch: int = 8  # alignments walked in lockstep per grid step

    def __post_init__(self):
        assert self.wf_width % LANE == 0
        if self.banded:
            assert self.lo_pad % LANE == 0 and self.lo_pad > 0

    @property
    def num_chunks(self) -> int:
        return self.score_cap // 8 + 2

    @property
    def opw(self) -> int:
        return ops_stream_words(self.score_cap)


def _pick1(chunk: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[b, 0] = chunk[b, idx[b, 0]] — Mosaic's dynamic gather wants the
    index array shaped like the input, so broadcast and keep lane 0."""
    bt, w = chunk.shape
    full = jnp.take_along_axis(
        chunk, jnp.broadcast_to(idx, (bt, w)), axis=1
    )
    return full[:, :1]


def _traceback_kernel(cfg: TracebackConfig):
    x = cfg.penalties.x
    oe = cfg.penalties.o + cfg.penalties.e
    e = cfg.penalties.e
    W = cfg.wf_width
    TB = cfg.tile_batch
    W2 = W // 2
    OPW = cfg.opw

    def kernel(*refs):
        if cfg.banded:
            (choices_ref, lo_ref, dist_ref, fin_ref, tk_ref,
             ops_ref, nops_ref, row_buf, sem) = refs
        else:
            (choices_ref, dist_ref, fin_ref, tk_ref,
             ops_ref, nops_ref, row_buf, sem) = refs
        gi = pl.program_id(0)

        def dma_row(r, slot):
            return pltpu.make_async_copy(
                choices_ref.at[r, pl.ds(gi * TB, TB), :],
                row_buf.at[slot],
                sem.at[slot],
            )

        dist = dist_ref[:]          # [TB, 1]
        fin = fin_ref[:]
        tk = tk_ref[:]
        walk = jnp.where((fin != 0) & (dist > 0), 1, 0)

        d0 = jnp.where(walk != 0, dist, 0)
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (TB, OPW), 1)
        opbuf0 = jnp.zeros((TB, OPW), jnp.int32)
        z = jnp.zeros((TB, 1), jnp.int32)
        need0 = jnp.max(jnp.where(d0 > 0, d0 >> 3, -1))

        def stage(need, r, slot, pf):
            """Ensure choice row `need` is resident; returns (slot, pf)."""

            def change():
                def use_pf():
                    dma_row(pf, slot ^ 1).wait()
                    return slot ^ 1

                def fresh():
                    # Free the prefetch slot first, then fetch synchronously.
                    @pl.when(pf >= 0)
                    def _():
                        dma_row(pf, slot ^ 1).wait()

                    dma_row(need, slot ^ 1).start()
                    dma_row(need, slot ^ 1).wait()
                    return slot ^ 1

                ns = jax.lax.cond(pf == need, use_pf, fresh)
                npf = need - 1

                @pl.when(npf >= 0)
                def _():
                    dma_row(npf, ns ^ 1).start()

                return ns, jnp.maximum(npf, -1)

            return jax.lax.cond(
                need != r, change, lambda: (slot, pf)
            )

        # Walk steps taken between row-stage checks: all-vector masked steps
        # are cheap; the stage check costs a vector->scalar sync, so amortize
        # it (steps on lanes that already left the row are masked no-ops).
        STEPS_PER_CHECK = 4

        def body(carry):
            d, k, mat, p, acc, err, opbuf, r, slot, pf, need = carry
            slot, pf = stage(need, r, slot, pf)
            r = need

            if cfg.banded:
                wb = pl.multiple_of((r * 8) // LANE * LANE, LANE)
                lo_win = lo_ref[:, pl.ds(wb, LANE)]
            else:
                lo_v = jnp.full((TB, 1), -W2, jnp.int32)
            # One slab read per stage; the inner steps gather from values.
            slab = row_buf[pl.ds(slot, 1), :, :][0]

            if not cfg.banded and W > LANE:
                # Exact mode: j = k + W/2 drifts by at most 1 per step, so a
                # 128-lane window extracted once per body covers every step
                # — the per-step gather then touches one chunk instead of
                # sweeping W/128 (the wide-exact walk's dominant cost at
                # W ~ 6k).
                jw = jnp.clip(k + W2 - LANE // 2, 0, W - LANE)
                lane128 = jax.lax.broadcasted_iota(jnp.int32, (TB, LANE), 1)
                jwin = _gather_chunks(
                    lambda tc: slab[:, tc * LANE : (tc + 1) * LANE],
                    W // LANE, jw + lane128, 0, jnp.int32,
                )
            else:
                jw = None

            for _ in range(STEPS_PER_CHECK):
                live = (d > 0) & (err == 0)
                in_row = jnp.where(live & ((d >> 3) == r), 1, 0)

                # Window base lo(d) for this score.
                if cfg.banded:
                    rel = jnp.clip(d - wb, 0, LANE - 1)
                    lo_v = _pick1(lo_win, rel)

                j = k - lo_v
                bad = (in_row != 0) & ((j < 0) | (j >= W))
                err = jnp.where(bad, 1, err)
                in_row = jnp.where(bad, 0, in_row)

                if jw is not None:
                    rel_w = j - jw
                    bad_w = (in_row != 0) & (
                        (rel_w < 0) | (rel_w >= LANE)
                    )
                    err = jnp.where(bad_w, 1, err)
                    in_row = jnp.where(bad_w, 0, in_row)
                    word = _pick1(jwin, jnp.clip(rel_w, 0, LANE - 1))
                else:
                    # Banded: the window base can jump at recenters, so
                    # sweep the slab chunks — all share the in-chunk index
                    # (j & 127), the chunk is selected by j >> 7.
                    jin = j & (LANE - 1)
                    jch = jax.lax.shift_right_logical(j, 7)
                    word = jnp.zeros((TB, 1), jnp.int32)
                    for tc in range(W // LANE):
                        g = _pick1(slab[:, tc * LANE : (tc + 1) * LANE], jin)
                        word = jnp.where(jch == tc, g, word)
                ch = (word >> (4 * (d & 7))) & 0xF

                is_m = mat == 0
                is_i = mat == 1
                c2 = ch & 3
                ext = jnp.where(is_i, (ch >> 2) & 1, (ch >> 3) & 1)
                op = jnp.where(
                    is_m, int(AffineOp.SUB),
                    jnp.where(is_i, int(AffineOp.INS), int(AffineOp.DEL)),
                )
                d_dec = jnp.where(
                    is_m,
                    jnp.where(c2 == M_FROM_X, x, 0),
                    jnp.where(ext != 0, e, oe),
                )
                new_mat = jnp.where(
                    is_m,
                    jnp.where(
                        c2 == M_FROM_X, 0, jnp.where(c2 == M_FROM_I, 1, 2)
                    ),
                    jnp.where(ext != 0, mat, 0),
                )
                dk = jnp.where(is_m, 0, jnp.where(is_i, -1, 1))

                on = in_row != 0
                d = jnp.where(on, d - d_dec, d)
                k = jnp.where(on, k + dk, k)
                mat = jnp.where(on, new_mat, mat)
                acc = jnp.where(
                    on, acc | (op << (2 * (p & (OPS_PER_WORD - 1)))), acc
                )
                # One-hot spill of each alignment's current stream word; stale
                # rewrites of finished lanes are harmless.
                opbuf = jnp.where(lane_w == (p >> 4), acc, opbuf)
                full = on & ((p & (OPS_PER_WORD - 1)) == OPS_PER_WORD - 1)
                acc = jnp.where(full, 0, acc)
                p = jnp.where(on, p + 1, p)
                err = jnp.where(on & (p >= OPW * OPS_PER_WORD), 1, err)

            need = jnp.max(jnp.where((d > 0) & (err == 0), d >> 3, -1))
            return d, k, mat, p, acc, err, opbuf, r, slot, pf, need

        def cond(carry):
            return carry[10] >= 0

        d, k, mat, p, acc, err, opbuf, r, slot, pf, _ = jax.lax.while_loop(
            cond, body,
            (d0, tk, z, z, z, z, opbuf0,
             jnp.int32(-1), jnp.int32(0), jnp.int32(-1), need0),
        )

        # Drain the outstanding speculative prefetch, if any.
        @pl.when(pf >= 0)
        def _():
            dma_row(pf, slot ^ 1).wait()

        ok = (err == 0) & (d == 0) & (k == 0) & (mat == 0)
        ops_ref[:, :] = opbuf
        nops_ref[:] = jnp.where(walk != 0, jnp.where(ok, p, -1), 0)

    return kernel


def traceback_batch_device_impl(
    cfg: TracebackConfig,
    choice_words: jnp.ndarray,      # [C, B, W] int32 (engine output, HBM)
    lo_trace: jnp.ndarray | None,   # [B, lo_pad] int32 (banded) or None
    dist: jnp.ndarray,              # [B] int32
    fin: jnp.ndarray,               # [B] bool/int32
    target_k: jnp.ndarray,          # [B] int32 (= tlen - plen)
):
    """Unjitted invocation — composable under jit / shard_map.

    Returns {"ops": [B, OPW] int32 (backward-ordered 2-bit op streams),
    "n_ops": [B] int32 (op count; -1 = corrupt walk -> CPU fallback; 0 = no
    walk: distance 0 or unfinished)}.
    """
    C, B, W = choice_words.shape
    TB = cfg.tile_batch
    assert B % TB == 0 and W == cfg.wf_width
    grid = (B // TB,)

    tile_spec = lambda w: pl.BlockSpec(
        (TB, w), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    args = [choice_words]
    if cfg.banded:
        in_specs.append(tile_spec(cfg.lo_pad))
        args.append(lo_trace)
    in_specs += [tile_spec(1), tile_spec(1), tile_spec(1)]
    args += [
        dist[:, None].astype(jnp.int32),
        fin[:, None].astype(jnp.int32),
        target_k[:, None].astype(jnp.int32),
    ]

    out = pl.pallas_call(
        _traceback_kernel(cfg),
        grid=grid,
        in_specs=in_specs,
        out_specs=[tile_spec(cfg.opw), tile_spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((B, cfg.opw), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, TB, W), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(*args)
    return {"ops": out[0], "n_ops": out[1][:, 0]}


traceback_batch_device = jax.jit(
    traceback_batch_device_impl, static_argnames=("cfg",)
)


def align_cigar_fused_impl(cfg, tb_cfg, pat, txt, plen, tlen, valid):
    """Alignment kernel + on-device traceback walk in one traced program,
    returning a SINGLE fetchable array: [B, 4 + OPW] int32 with lanes
    0..3 = (distance, finished, n_ops, 0) and the op stream after.

    One dispatch + one device-to-host fetch per call batch — host-link
    round-trips are the dominant fixed cost per batch on tunneled setups
    (~tens of ms on axon), so everything the host needs crosses in one go.
    """
    from .engine_pallas import align_batch_pallas_impl

    out = align_batch_pallas_impl(cfg, pat, txt, plen, tlen, valid)
    tb = traceback_batch_device_impl(
        tb_cfg,
        out["choice_words"],
        out.get("lo_trace") if tb_cfg.banded else None,
        out["distance"],
        out["finished"],
        (tlen - plen).astype(jnp.int32),
    )
    stats = jnp.stack(
        [
            out["distance"],
            out["finished"].astype(jnp.int32),
            tb["n_ops"],
            jnp.zeros_like(tb["n_ops"]),
        ],
        axis=1,
    )
    return jnp.concatenate([stats, tb["ops"]], axis=1)


align_cigar_fused = jax.jit(
    align_cigar_fused_impl, static_argnames=("cfg", "tb_cfg")
)
