"""Public aligner API — the L5 layer of the framework.

Role-equivalent to the reference's aligner object and batch orchestration
(lib/aligner.c:114-260 `wfagpu_add_sequences` / `wfagpu_align`, and
lib/align.cu:42-481 `launch_alignments`), redesigned for TPU execution:

* Pairs are **binned by length tier** (powers of two) instead of using the
  first batch's sizes for buffer sizing (lib/align.cu:83-94): each tier
  compiles one static-shape engine and runs dense tiles, replacing the
  persistent-kernel work pool with grid batching.
* Unfinished / N-containing / oversized pairs go to the native CPU fallback
  engine exactly like the reference routes them to WFA2-lib
  (lib/align.cu:236-249, sequence_packing_kernel.cu:68-76).
* CIGARs for device-finished pairs are decoded from the engine's choice
  tables by the native OpenMP decoder (utils/cigar.c analog).

Like the reference, the CPU fallback runs the WFA-adaptive heuristic when the
device ran banded (utils/wfa_cpu.c:48) and exact otherwise; the pure-Python
fallback engine is always exact.
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np

from . import native
from .ops.packing import pack_batch
from .params import (
    AUTO_BAND_INTERVAL,
    AlignmentOptions,
    default_band_width,
    default_max_error,
)
from .schedule import build_schedule
from .types import MAX_SEQ_LEN, AlignmentResult, Penalties
from .utils.logger import LOG
from .utils.presort import MIN_PRESORT_TIER

_MIN_TIER = 64

# Widest wavefront window for the BANDED Pallas kernel (the banded parent
# window reads gather-sweep W/128 chunks per recurrence input; wider bands
# fall back to the XLA engine).
PALLAS_MAX_WIDTH = 1024

# Widest window for the EXACT Pallas kernel, whose recurrence uses cheap
# lane rolls instead of window gathers — the TPU analog of the reference's
# smem-center + HBM-spill wide wavefronts
# (lib/kernels/sequence_alignment_kernel.cu:51-78).  At 6144 diagonals the
# 100x10kbp golden set (-e 3000) runs fully on device with an untruncated
# window (2*3000+1 <= 6144); bounded by Mosaic's scoped-VMEM stack, which
# scales with tile * W * extend_span.
PALLAS_MAX_WIDTH_EXACT = 6144
_WIDE_EXACT_RING_BUDGET = 6 << 20  # bytes for the 3*A M/I/D VMEM ring

# Widest window for the HBM-ring exact engine (distance mode): the M/I/D
# ring lives in HBM and rows stream through VMEM by async DMA
# (PallasConfig.ring_hbm), so W is bounded by compile size / HBM, not the
# VMEM ring budget — the full analog of the reference's
# smem-center + global-spill contract that keeps any max_error on device
# (sequence_alignment_kernel.cu:51-78).
PALLAS_MAX_WIDTH_RING = max(
    128, int(os.environ.get("WFA_TPU_RING_MAX_W", "16384")) // 128 * 128
)


def _wide_exact_cap(active_working_set: int, tile: int) -> int:
    """Widest exact window whose wavefront ring fits the VMEM budget."""
    w = _WIDE_EXACT_RING_BUDGET // (3 * active_working_set * tile * 4)
    return max(
        PALLAS_MAX_WIDTH, min(PALLAS_MAX_WIDTH_EXACT, w // 128 * 128)
    )


def _tier_of(length: int) -> int:
    t = _MIN_TIER
    while length + 2 > t:
        t *= 2
    return t


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@dataclasses.dataclass
class _TierPlan:
    tier: int
    indices: list[int]
    wf_width: int
    tile_batch: int
    nwords: int
    score_limit: int | None


def _plan_tiers(
    lens: np.ndarray, opts: AlignmentOptions, max_error: int,
    cost_hint: np.ndarray | None = None,
) -> list[_TierPlan]:
    pen = opts.penalties
    tiers: dict[int, list[int]] = {}
    for i, L in enumerate(lens):
        tiers.setdefault(_tier_of(int(L)), []).append(i)

    plans = []
    for tier, idxs in sorted(tiers.items()):
        # Order within the tier so each device tile holds alignments of
        # similar cost — tiles run until their slowest lane finishes.  The
        # estimated-divergence hint groups by predicted *distance* (oracle
        # distance ordering measured 1.74x on diverse 14kbp batches;
        # utils/presort.py), with length as the tie-break / fallback.
        if cost_hint is not None:
            idxs.sort(key=lambda i: (-cost_hint[i], -int(lens[i])))
        else:
            idxs.sort(key=lambda i: -int(lens[i]))
        if opts.banded:
            width = opts.band_width or default_band_width(max_error)
            w = min(width, 2 * (tier + 2) + 1)
            score_limit = None
        else:
            w2 = min(max_error, tier + 2)
            w = 2 * w2 + 1
            # Cost of the all-indels alignment bounds the optimum, so the
            # schedule never needs scores beyond it for this tier.
            score_limit = 2 * pen.o + pen.e * 2 * (tier + 2) + pen.x
        sched = build_schedule(pen, max_error, score_limit if not opts.banded else None)
        if opts.compute_cigar:
            # Choice-table bytes per alignment, times 3 for XLA's lane padding
            # and the while-loop's double-buffered carry — undersizing this
            # can OOM the device on long-read exact-CIGAR tiles.
            per_lane = sched.num_steps * w * 3
        else:
            per_lane = 3 * pen.active_working_set * w * 4 * 2
        per_lane = max(per_lane, 1)
        tile = opts.tile_batch or max(
            8, min(2048, opts.memory_budget_bytes // per_lane)
        )
        if opts.compute_cigar and w >= 2048:
            # Very wide exact-CIGAR XLA tiles carry a GB-scale choice table
            # through the while loop; keep them small (observed to exhaust
            # the device past ~24 lanes at 10kbp).
            tile = min(tile, 16)
        tile = min(_round_up(len(idxs), 8), _round_up(tile, 8))
        nwords = tier // 16 + 1
        plans.append(_TierPlan(tier, idxs, w, tile, nwords, score_limit))
    return plans


def _tier_geometry(plan, opts, max_error: int, band: int, ndev: int,
                   n_pairs: int):
    """Pure launch-geometry planning for one Pallas tier: window width and
    truncation/ring decisions, tile height, score cap, per-call batch under
    the memory budget, extension stride.  Host-only arithmetic (no device
    work) so the planner rules are unit-testable in isolation
    (tests/test_geometry.py).

    Returns (PallasConfig, nwp, call_b, full_window, cert_bound)."""
    from .ops.engine_pallas import LANE, PallasConfig

    pen = opts.penalties
    # Tile height: wide tiles amortize per-step cost but run until their
    # slowest lane finishes; short low-error workloads prefer 32 (100bp:
    # 96k -> 133k aln/s; 1kbp: 10.8k -> 12.6k), long high-error ones 8
    # (HiFi banded: 473 at 8 vs 317 at 16 — finish-time variance dominates).
    tile = opts.tile_batch or (32 if max_error <= 512 else 8)
    nwp = _round_up(plan.tier // 16 + 8, LANE)
    w = _round_up(plan.wf_width, LANE)
    cigar = opts.compute_cigar

    # Exact mode runs windows up to PALLAS_MAX_WIDTH_EXACT diagonals (the
    # recurrence is lane rolls, so width costs no gathers) — wide enough
    # that e.g. the 10kbp golden set at max_error 3000 runs UNtruncated on
    # device.  Wavefronts wider than the VMEM-bounded cap are truncated
    # with a post-hoc certificate: leaving a centered ±W/2 window costs at
    # least o + e*(W/2+1), so any result with dist < that bound is provably
    # optimal (truncation only removes paths).  Uncertified pairs demote to
    # the CPU fallback.
    full_window = opts.banded or w >= plan.wf_width
    wide_exact = False
    ring_mode = False
    if not opts.banded:
        tile = min(tile, 8) if w > PALLAS_MAX_WIDTH else tile
        w_cap = _wide_exact_cap(pen.active_working_set, tile)
        if w > w_cap:
            # Needed window exceeds the VMEM ring budget: stream the ring
            # through HBM instead of truncating (distance and CIGAR; the
            # truncation certificate still applies past the ring cap).
            ring_mode = True
            w = min(w, PALLAS_MAX_WIDTH_RING)
            # VMEM working set is ~12 rows of [tile, W] (7 streamed ring
            # rows + extension temporaries); shrink the tile with W.
            if w > 32768:
                tile = min(tile, 2)
            elif w > 16384:
                tile = min(tile, 4)
        else:
            w = min(w, w_cap)
        wide_exact = w > PALLAS_MAX_WIDTH
        full_window = w >= plan.wf_width
    cert_bound = pen.o + pen.e * (w // 2 + 1)

    if cigar:
        sched = build_schedule(
            pen, max_error, plan.score_limit if not opts.banded else None
        )
        score_cap = sched.unfinished_score + 1
        if not full_window:
            # Scores past the certificate bound can never certify; cap the
            # loop and the choice table accordingly.
            score_cap = min(score_cap, cert_bound + 1)
        # The HBM choice table is (score_cap/8) x B x W int32; bound the
        # per-call batch by the memory budget (lib/align.cu's per-batch
        # backtrace-pool sizing analog).  call_b is itself the largest
        # power-of-two bucket (of tile*ndev) whose table fits the budget, so
        # the later shape bucketing can never round a chunk past the budget.
        bytes_per_lane = (score_cap // 8 + 2) * w * 4
        if ring_mode:
            bytes_per_lane += 3 * pen.active_working_set * w * 4
        budget_lanes = opts.memory_budget_bytes // max(bytes_per_lane, 1)
        call_b = tile * ndev
        while call_b * 2 <= min(budget_lanes, 4096):
            call_b *= 2
    else:
        # Distance mode, truncated window: results past the certificate
        # bound demote to CPU anyway, so stop the loop there.  The per-call
        # batch is capped: one giant program costs minutes of remote compile
        # and tens of seconds of executable load per process, while capped
        # calls pipeline through the dispatch-all-then-fetch loop below.
        score_cap = cert_bound + 1 if not full_window else 0
        call_b = min(_round_up(n_pairs, tile), 16384)
        if ring_mode:
            # The HBM ring is 3*A x B x W int32 per call; bound the per-call
            # batch by the memory budget, power-of-two-bucketed so the shape
            # bucketing below can never round a chunk past the budget.
            ring_bpl = 3 * pen.active_working_set * w * 4
            budget_lanes = opts.memory_budget_bytes // max(ring_bpl, 1)
            cb = tile * ndev
            while cb * 2 <= min(budget_lanes, 16384):
                cb *= 2
            call_b = min(call_b, cb)

    # Extension stride: no wider than the sequences can extend, and bounded
    # by VMEM (the extension buffers scale with tile * span).
    span = max(8, min(48, plan.tier // 16 + 2))
    if tile >= 32:
        span = min(span, 16)
    if wide_exact:
        # The full-sweep fallback body materializes (span+1) x [tile, W]
        # temporaries; at W ~ 6k only a short stride fits the Mosaic
        # scoped-VMEM stack (span 4 measured: 100x10kbp golden at 254 aln/s
        # vs 3.8 on the CPU engine).
        span = 4
    cfg = PallasConfig(
        penalties=pen,
        max_steps=max_error,
        wf_width=w,
        tile_batch=tile,
        band=band,
        compute_cigar=cigar,
        score_cap=score_cap,
        extend_span=span,
        ring_hbm=ring_mode,
        # The two-score stacked body doubles the extension's [BT, W]
        # temporaries; at wide-exact widths (W up to 6144) that overflows
        # the Mosaic scoped-VMEM stack (measured 28.75 MiB vs the 24 MiB
        # limit on the 100x10kbp golden set).  Its measured win is on the
        # narrow banded path (+4.2% at W=512); keep wide exact one-score.
        # (WFA_TPU_TWO_SCORE still overrides the non-wide default.)
        two_score_body=0 if wide_exact
        else int(os.environ.get("WFA_TPU_TWO_SCORE", "-1")),
        # Wide exact windows sit just past Mosaic's 16 MiB default scoped
        # VMEM once the sequence table or the choice-chunk carry grows
        # (measured: 16.7 MiB for 10kbp CIGAR, 16.6 MiB for 20kbp distance).
        # Ring mode at W=16384 measures 25.52 MiB of scoped stack on HW
        # (7 streamed ring rows + extension temporaries); give it headroom.
        vmem_limit_bytes=(32 << 20) if ring_mode
        else (24 << 20) if wide_exact else 0,
    )
    return cfg, nwp, call_b, full_window, cert_bound


def _probe_distances(
    patterns, texts, run_idx, pen, max_error: int, band: int
) -> np.ndarray | None:
    """Two-pass ordered tiling, pass 1: MEASURED distances from a cheap
    narrow-band (W=128) distance-only device run, used as the main pass's
    tile-ordering hint (AlignmentOptions.probe_order).  Unfinished pairs
    (band overflow / non-ACGT) get a +inf-like hint so they tile together
    in the most-expensive bucket.  Returns None if the probe can't run
    (packing or kernel failure) — callers fall back to the host estimate."""
    import jax.numpy as jnp

    from .ops.engine_pallas import PallasConfig, align_batch_pallas

    try:
        pats = [patterns[i] for i in run_idx]
        txts = [texts[i] for i in run_idx]
        n = len(pats)
        bsz = _round_up(n, 8)
        pats += [b""] * (bsz - n)
        txts += [b""] * (bsz - n)
        lmax = max(max(len(p), len(t)) for p, t in zip(pats, txts))
        nwp = _round_up(lmax // 16 + 8, 128)
        pat_w, p_len, p_ok = pack_batch(pats, nwp)
        txt_w, t_len, t_ok = pack_batch(txts, nwp)
        cfg = PallasConfig(
            penalties=pen, max_steps=max_error, wf_width=128,
            tile_batch=8, band=band if band > 0 else AUTO_BAND_INTERVAL,
        )
        out = align_batch_pallas(
            cfg, jnp.asarray(pat_w), jnp.asarray(txt_w),
            jnp.asarray(p_len), jnp.asarray(t_len),
            jnp.asarray(p_ok & t_ok),
        )
        dist = np.asarray(out["distance"])[:n].astype(np.float64)
        fin = np.asarray(out["finished"])[:n] != 0
        dist[~fin] = float(1 << 30)
        return dist
    except Exception as ex:  # pragma: no cover - device-specific
        LOG.warning("probe_order pass failed (%s); using host estimate", ex)
        return None


def _run_tier_pallas(
    patterns, texts, idxs, plan, opts, max_error, band, results, need_cpu
):
    """Run one length tier through the Pallas TPU kernels (distance or CIGAR
    mode; CIGAR decodes the kernel's nibble-packed choice table on the host,
    native OpenMP decoder when available)."""
    import jax
    import jax.numpy as jnp

    from .ops.engine_pallas import align_batch_pallas

    pen = opts.penalties
    cigar = opts.compute_cigar
    # Local (per-process) device count: the batch reaching this function is
    # already host-sharded in multi-host runs, so sharding spans local chips.
    ndev = jax.local_device_count() if opts.data_parallel else 1
    cfg, nwp, call_b, full_window, cert_bound = _tier_geometry(
        plan, opts, max_error, band, ndev, len(idxs)
    )
    w, tile, score_cap, ring_mode = (
        cfg.wf_width, cfg.tile_batch, cfg.score_cap, cfg.ring_hbm
    )
    LOG.debug(
        "pallas tier=%d pairs=%d W=%d nwp=%d band=%d cigar=%s score_cap=%d "
        "call_b=%d full_window=%s cert_bound=%d devices=%d",
        plan.tier, len(idxs), w, nwp, band, cigar, score_cap, call_b,
        full_window, cert_bound, ndev,
    )

    def _bucket(n: int) -> int:
        """Round the device batch up to a power-of-two bucket so the number
        of distinct compiled shapes stays logarithmic in the batch size."""
        n = _round_up(n, tile * ndev)
        b = tile * ndev
        while b < n:
            b *= 2
        return b

    host_tb = os.environ.get("WFA_TPU_HOST_TRACEBACK", "0") == "1"
    dev_tb = cigar and not host_tb
    mesh = None
    if ndev > 1:
        from .parallel.mesh import data_mesh

        mesh = data_mesh()
    if dev_tb:
        # Compact CIGAR path: the alignment kernel and the on-device
        # backward walk run as ONE fused program per chunk, and everything
        # the host needs — distances, finished flags, op counts and the
        # per-alignment 2-bit op streams (O(2·distance) bytes, the analog of
        # the reference's per-alignment result regions,
        # sequence_alignment_kernel.cu:659-683) — crosses the host link in a
        # single fetch.
        from .ops.traceback_pallas import TracebackConfig

        tb_cfg = TracebackConfig(
            penalties=pen, wf_width=w, score_cap=score_cap,
            banded=opts.banded,
            lo_pad=cfg.lo_pad if opts.banded else 0,
        )

    # Phase 1: dispatch every chunk asynchronously; phase 2: fetch + decode.
    # The host-link sync latency of each fetch then overlaps the remaining
    # chunks' device compute (the TPU analog of the reference's
    # dual-stream copy/compute overlap, lib/align.cu:329-378).  In the
    # host-traceback debug path each pending handle pins a full
    # budget-sized HBM choice table, so pending depth is capped at 2
    # there — unbounded accumulation would multiply device memory use by
    # the chunk count and defeat the budget sizing.
    # Ring mode adds a budget-sized HBM ring OUTPUT per dispatched chunk
    # (allocated at dispatch, freed when the handle drops), so its pending
    # depth is capped like the host-traceback path.
    max_pending = 2 if (cigar and host_tb) or ring_mode else len(idxs) + 1

    def _consume(item):
        chunk, bsz, pats, txts, handle = item
        cigars: list[str | None] = [None] * bsz
        if dev_tb:
            arr = np.asarray(handle)
            dist = arr[:, 0]
            fin = arr[:, 1] != 0
            n_ops = arr[:, 2]
            ops_w = np.ascontiguousarray(arr[:, 4:])
            if native.available():
                cigars, _ = native.cigar_from_ops_batch(
                    ops_w, n_ops, fin, pats, txts
                )
            else:
                from .traceback import recover_cigar_from_stream

                cigars = [
                    recover_cigar_from_stream(
                        ops_w[b], int(n_ops[b]), pats[b], txts[b]
                    )
                    if fin[b] and n_ops[b] >= 0
                    else None
                    for b in range(bsz)
                ]
        elif not cigar:
            arr = np.asarray(handle)
            dist = arr[:, 0]
            fin = arr[:, 1] != 0
        else:
            # Host decode of the dense choice table (measurement/debug path,
            # WFA_TPU_HOST_TRACEBACK=1): fetch only the rows the traceback
            # can reach — device-side slice before the D2H transfer.
            out = handle
            dist = np.asarray(out["distance"])
            fin = np.asarray(out["finished"])
            dmax = int(dist[fin].max(initial=0))
            rows = min(out["choice_words"].shape[0], dmax // 8 + 2)
            words = np.asarray(out["choice_words"][:rows])
            lo = None
            if opts.banded:
                lo_w = min(
                    out["lo_trace"].shape[1], _round_up(dmax + 2, 128)
                )
                lo = np.asarray(out["lo_trace"][:, :lo_w])
            lo_const = -(w // 2)
            if native.available():
                cigars, _ = native.traceback_batch_packed(
                    words, lo, lo_const, dist, fin, pats, txts, pen
                )
            else:
                from .traceback import recover_cigar_packed

                cigars = [
                    recover_cigar_packed(
                        words[:, b, :],
                        lo[b] if lo is not None else None,
                        lo_const, pen, int(dist[b]), pats[b], txts[b],
                    )
                    if fin[b]
                    else None
                    for b in range(bsz)
                ]

        for b, i in enumerate(chunk):
            ok = fin[b] and (full_window or int(dist[b]) < cert_bound)
            if cigar and ok and cigars[b] is None:
                ok = False  # corrupt device walk -> CPU fallback
            if ok:
                results[i] = AlignmentResult(
                    error=int(dist[b]),
                    cigar=cigars[b] or "",
                    finished_on_accelerator=True,
                )
            else:
                need_cpu[i] = True

    pending = []
    for start in range(0, len(idxs), call_b):
        # Drain BEFORE dispatching so at most `max_pending` budget-sized
        # device buffers are ever live (the new dispatch included).
        while len(pending) >= max_pending:
            _consume(pending.pop(0))
        chunk = idxs[start : start + call_b]
        bsz = _bucket(len(chunk))
        pats = [patterns[i] for i in chunk] + [b""] * (bsz - len(chunk))
        txts = [texts[i] for i in chunk] + [b""] * (bsz - len(chunk))

        pat_w, p_len, p_ok = pack_batch(pats, nwp)
        txt_w, t_len, t_ok = pack_batch(txts, nwp)
        valid = p_ok & t_ok

        dev_args = (
            jnp.asarray(pat_w), jnp.asarray(txt_w),
            jnp.asarray(p_len), jnp.asarray(t_len), jnp.asarray(valid),
        )
        if dev_tb:
            if ndev > 1:
                from .parallel.mesh import align_cigar_fused_sharded

                handle = align_cigar_fused_sharded(
                    cfg, tb_cfg, mesh, *dev_args
                )
            else:
                from .ops.traceback_pallas import align_cigar_fused

                handle = align_cigar_fused(cfg, tb_cfg, *dev_args)
        else:
            if ndev > 1:
                from .parallel.mesh import align_batch_pallas_sharded

                out = align_batch_pallas_sharded(cfg, mesh, *dev_args)
            else:
                out = align_batch_pallas(cfg, *dev_args)
            if not cigar:
                # One fetch per chunk instead of two.
                handle = jnp.stack(
                    [out["distance"], out["finished"].astype(jnp.int32)],
                    axis=1,
                )
            else:
                handle = out
        pending.append((chunk, bsz, pats, txts, handle))

    for item in pending:
        _consume(item)


def align_pairs(
    patterns: list[bytes],
    texts: list[bytes],
    options: AlignmentOptions | None = None,
) -> list[AlignmentResult]:
    """Align a batch of (pattern, text) pairs; the functional core API."""
    import jax.numpy as jnp

    from .ops.engine_xla import EngineConfig, align_batch_device

    opts = options or AlignmentOptions()
    pen = opts.penalties
    n = len(patterns)
    if n == 0:
        return []
    if len(texts) != n:
        raise ValueError("patterns and texts must have equal length")

    max_error = opts.max_error or default_max_error(
        len(patterns[0]), len(texts[0]), pen
    )

    lens = np.array(
        [max(len(p), len(t)) for p, t in zip(patterns, texts)], dtype=np.int64
    )
    results: list[AlignmentResult | None] = [None] * n
    need_cpu = np.zeros(n, dtype=bool)

    # Pairs the device engine cannot take at all.
    oversized = np.array(
        [
            len(p) >= MAX_SEQ_LEN or len(t) >= MAX_SEQ_LEN
            for p, t in zip(patterns, texts)
        ]
    )
    need_cpu |= oversized
    device_idx = [i for i in range(n) if not oversized[i]]

    band = opts.resolved_band() if opts.banded else -1

    # Engine choice: the Pallas kernels are the TPU fast path (distance and
    # CIGAR); the XLA engine is the portable reference implementation.
    use_pallas = opts.backend == "pallas"
    if opts.backend == "auto":
        import jax

        use_pallas = jax.default_backend() == "tpu"
    # The Pallas kernel's rolling existence bitmasks hold 64 scores (two u32
    # words; round 3 — was 32); even larger working sets
    # (max(o+e, x) + 1 > 64) run on the XLA engine.
    if pen.active_working_set > 64:
        use_pallas = False
        import jax

        if (
            opts.backend != "xla"  # explicit XLA request bypasses the reroute
            and jax.default_backend() not in ("cpu",)
            and not os.environ.get("WFA_TPU_FORCE_XLA_TPU")
        ):
            # The XLA engine's gather-heavy program has crashed the axon TPU
            # worker (measured round 3: x=70 distance on 512x1kbp killed the
            # worker process); on an accelerator route these rare penalty
            # sets to the native CPU engine instead.  WFA_TPU_FORCE_XLA_TPU=1
            # or an explicit backend='xla' restores the old behavior.
            if opts.cpu_fallback:
                LOG.warning(
                    "active_working_set %d > 64: routing to the CPU engine "
                    "(the portable XLA engine is unstable on this "
                    "accelerator; pass backend='xla' to override)",
                    pen.active_working_set,
                )
                need_cpu |= ~oversized  # oversized were already CPU-bound
                device_idx = []
            else:
                # With cpu_fallback disabled the reroute would fabricate
                # error=0 placeholders (the reference never fabricates
                # results — unfinished pairs are always recomputed,
                # lib/align.cu:236-249); run the XLA engine instead.
                LOG.warning(
                    "active_working_set %d > 64 with cpu_fallback=False: "
                    "running the XLA engine on this accelerator (it has "
                    "crashed TPU workers on such penalty sets before)",
                    pen.active_working_set,
                )

    def _device_pass(run_idx: list[int], err: int) -> None:
        # Divergence-ordered tiling for long reads (see utils/presort.py).
        # Both device engines run fixed tiles until the slowest lane finishes
        # (Pallas: dense tiles + done masks; XLA: tile_batch chunks in
        # align_batch_device), so cost-ordered tiles reclaim finish-time
        # variance on either; the native CPU fallback schedules per-pair
        # dynamically and never sees the hints.
        hints = None
        dev_lens = lens[run_idx]
        if dev_lens.size and int(dev_lens.max()) >= MIN_PRESORT_TIER:
            if opts.probe_order and use_pallas:
                hints = _probe_distances(
                    patterns, texts, run_idx, pen, err, band
                )
            if hints is None:
                from .utils.presort import divergence_scores

                hints = divergence_scores(
                    [patterns[i] for i in run_idx],
                    [texts[i] for i in run_idx],
                    dev_lens,
                )

        for plan in _plan_tiers(dev_lens, opts, err, hints):
            idxs = [run_idx[j] for j in plan.indices]
            # Banded windows wider than the Pallas gather cap fall back to
            # the XLA engine; exact mode always runs on Pallas (wide windows
            # get width-capped + certified inside _run_tier_pallas).
            w_pad = _round_up(plan.wf_width, 128)
            if use_pallas and (not opts.banded or w_pad <= PALLAS_MAX_WIDTH):
                _run_tier_pallas(
                    patterns, texts, idxs, plan, opts, err, band,
                    results, need_cpu,
                )
                continue
            cfg = EngineConfig(
                penalties=pen,
                max_steps=err,
                wf_width=plan.wf_width,
                compute_cigar=opts.compute_cigar,
                band=band,
                score_limit=plan.score_limit if not opts.banded else None,
            )
            sched = build_schedule(pen, err, cfg.score_limit)
            step_of_score = None
            if opts.compute_cigar:
                max_sc = int(sched.score[-1]) if sched.num_steps else 0
                step_of_score = np.full(max_sc + 1, -1, dtype=np.int32)
                step_of_score[sched.score] = np.arange(
                    sched.num_steps, dtype=np.int32
                )

            import jax

            ndev = jax.local_device_count() if opts.data_parallel else 1
            for start in range(0, len(idxs), plan.tile_batch):
                chunk = idxs[start : start + plan.tile_batch]
                bsz = _round_up(plan.tile_batch, 8 * ndev)
                pats = [patterns[i] for i in chunk]
                pats += [b""] * (bsz - len(chunk))
                txts = [texts[i] for i in chunk]
                txts += [b""] * (bsz - len(chunk))

                pat_w, p_len, p_ok = pack_batch(pats, plan.nwords)
                txt_w, t_len, t_ok = pack_batch(txts, plan.nwords)
                valid = p_ok & t_ok

                dev_args = (
                    jnp.asarray(pat_w),
                    jnp.asarray(txt_w),
                    jnp.asarray(p_len),
                    jnp.asarray(t_len),
                    jnp.asarray(valid),
                )
                if ndev > 1:
                    from .parallel.mesh import align_batch_sharded, data_mesh

                    out = align_batch_sharded(cfg, data_mesh(), *dev_args)
                else:
                    out = align_batch_device(cfg, *dev_args)
                dist = np.asarray(out["distance"])
                fin = np.asarray(out["finished"])

                cigars: list[str | None] = [None] * bsz
                if opts.compute_cigar:
                    # Fetch only steps the traceback can reach (device-side
                    # slice before the D2H transfer).
                    dmax = int(dist[fin].max(initial=0))
                    smax = int(
                        step_of_score[min(dmax, len(step_of_score) - 1)]
                    )
                    rows = min(out["choices"].shape[0], smax + 2)
                    choices = np.asarray(out["choices"][:rows])
                    lo_trace = np.asarray(out["lo_trace"][:rows])
                    if native.available():
                        cigars, _ = native.traceback_batch(
                            choices, lo_trace, step_of_score, dist, fin,
                            pats, txts, pen,
                        )
                    else:
                        from .traceback import recover_cigar

                        cigars = [
                            recover_cigar(
                                choices[:, b], lo_trace[:, b], sched,
                                int(dist[b]), pats[b], txts[b],
                            )
                            if fin[b]
                            else None
                            for b in range(bsz)
                        ]

                for b, i in enumerate(chunk):
                    if fin[b]:
                        results[i] = AlignmentResult(
                            error=int(dist[b]),
                            cigar=cigars[b] or "",
                            finished_on_accelerator=True,
                        )
                    else:
                        need_cpu[i] = True

    # Escalating on-device retry tier: pairs the device left unfinished at
    # ``max_error`` get up to ``device_retries`` further device passes at a
    # doubled error budget (wider band / window) before the host takes over.
    # The reference recomputes every unfinished pair on the CPU
    # (lib/align.cu:236-249); results here stay exactly as correct — a pair
    # either finishes on device under the bigger budget or still falls back.
    # Only ACGT-clean pairs re-enter (non-ACGT can never finish on device),
    # and the budget never escalates past the all-indel cost bound.
    err_cap = 2 * pen.o + pen.e * 2 * int(lens.max(initial=0)) + pen.x
    todo = device_idx
    attempt_err = max_error
    for attempt in range(max(0, opts.device_retries) + 1):
        if not todo:
            break
        if attempt:
            LOG.debug(
                "device retry %d: %d unfinished pairs at max_error %d",
                attempt, len(todo), attempt_err,
            )
            for i in todo:
                need_cpu[i] = False
        _device_pass(todo, attempt_err)
        failed = [i for i in todo if need_cpu[i]]
        nxt = min(attempt_err * 2, err_cap)
        if nxt <= attempt_err:
            break
        attempt_err = nxt
        from .ops.packing import _ACGT

        todo = [
            i for i in failed
            if _ACGT[np.frombuffer(patterns[i], np.uint8)].all()
            and _ACGT[np.frombuffer(texts[i], np.uint8)].all()
        ]

    # ---- CPU fallback pass (lib/align.cu:236-249 analog). ----
    cpu_idx = np.flatnonzero(need_cpu)
    if cpu_idx.size and opts.cpu_fallback:
        LOG.debug("CPU fallback for %d/%d pairs", cpu_idx.size, n)
        cpats = [patterns[i] for i in cpu_idx]
        ctxts = [texts[i] for i in cpu_idx]
        mask = np.ones(len(cpats), dtype=np.int8)
        if native.available():
            # Heuristic (WFA-adaptive) CPU pass iff the device ran banded,
            # exact otherwise — utils/wfa_cpu.c:40-48 semantics.
            dist, cigs, _ = native.cpu_align_batch(
                cpats, ctxts, pen, mask, opts.compute_cigar,
                adaptive=opts.banded,
            )
        else:
            from .utils.cpu_wfa import align_one_py

            dist = np.zeros(len(cpats), dtype=np.int32)
            cigs = []
            for j, (p, t) in enumerate(zip(cpats, ctxts)):
                d, c = align_one_py(p, t, pen, opts.compute_cigar)
                dist[j] = d
                cigs.append(c)
        for j, i in enumerate(cpu_idx):
            results[i] = AlignmentResult(
                error=int(dist[j]),
                cigar=(cigs[j] or "") if opts.compute_cigar else "",
                finished_on_accelerator=False,
            )
    elif cpu_idx.size:
        LOG.warning(
            "%d pairs unfinished on device and cpu_fallback is disabled; "
            "their results carry finished=False placeholders",
            cpu_idx.size,
        )
        for i in cpu_idx:
            results[i] = AlignmentResult(
                error=0, cigar="", finished_on_accelerator=False,
                finished=False,
            )

    return results  # type: ignore[return-value]


class WfaAligner:
    """Stateful convenience wrapper (wfagpu_initialize_aligner /
    wfagpu_add_sequences / wfagpu_align, lib/aligner.h:49-63)."""

    def __init__(self, options: AlignmentOptions | None = None):
        self.options = options or AlignmentOptions()
        self._patterns: list[bytes] = []
        self._texts: list[bytes] = []
        self.results: list[AlignmentResult] = []

    def add_sequences(self, pattern: bytes | str, text: bytes | str) -> None:
        if isinstance(pattern, str):
            pattern = pattern.encode()
        if isinstance(text, str):
            text = text.encode()
        self._patterns.append(pattern)
        self._texts.append(text)

    def __len__(self) -> int:
        return len(self._patterns)

    def align(self) -> list[AlignmentResult]:
        # Honors options.batch_size via the streaming pipeline
        # (wfagpu_set_batch_size semantics, lib/aligner.c:212).
        from .pipeline import align_pairs_pipelined

        self.results = align_pairs_pipelined(
            self._patterns, self._texts, self.options
        )
        return self.results
