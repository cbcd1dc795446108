"""Static wavefront schedule.

The reference GPU kernel decides *at runtime*, per score ``d``, whether the
wavefront at ``d`` exists and whether it needs the full M/I/D recurrence or
only the mismatch recurrence (lib/kernels/sequence_alignment_kernel.cu:584-626).
That decision depends only on the penalties ``(x, o, e)`` — never on the
sequences — because a wavefront exists iff its score is reachable as a
non-negative integer combination of {x, o+e, e-chains}:

    GAP_exist(d) = M_exist(d-o-e) or I_exist(d-e)
    M_exist(d)   = GAP_exist(d) or M_exist(d-x)        (M_exist(0) = True)
    I_exist(d)   = GAP_exist(d)                        (the kernel marks I/D
                                                        existent iff next_MDI
                                                        ran at d)

We therefore precompute the whole control schedule on the host once per
(penalties, max_steps) pair, turning the TPU kernel's control flow into a
static program: a list of "real" steps, each annotated with its score, its
step kind (M-only vs full MDI), and the ring slots + validity of each parent.
This removes every data-dependent branch from the device code except the
termination test — the idiomatic way to express WFA on a machine compiled by
XLA (static shapes, `lax.while_loop` over a precomputed table).

The step/score bookkeeping mirrors tools semantics exactly, including the
quirk that `steps` counts only full-MDI computations plus one
(lib/kernels/sequence_alignment_kernel.cu:566-654): the loop runs
`while steps < max_steps - 1`, `steps` starts at 1, and only `next_MDI`
iterations increment it.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np

from .types import Penalties

# Step kinds.
STEP_M_ONLY = 0  # only the mismatch recurrence contributes (next_M)
STEP_MDI = 1     # full M/I/D recurrence (next_MDI)


@dataclasses.dataclass(frozen=True)
class WavefrontSchedule:
    """Host-precomputed static schedule for the score loop.

    All arrays have length ``num_steps`` (number of *computed* wavefronts; the
    skipped, non-existent scores in between are folded into the bookkeeping).

    Ring slots are ``score % ring_size`` with ``ring_size = max(o+e, x) + 1``
    (reference: sequence_alignment_kernel.cu:394).  A parent slot index of
    ``-1`` means "that parent wavefront does not exist at this step" — the
    engine substitutes OFFSET_NULL offsets for it, which is mathematically
    what the reference achieves by only ever reading slots whose data is NULL
    or stale-but-harmless.
    """

    penalties: Penalties
    max_steps: int
    num_steps: int
    # Score ("distance") of the wavefront computed at step s.
    score: np.ndarray          # int32[num_steps]
    # STEP_M_ONLY or STEP_MDI.
    kind: np.ndarray           # int32[num_steps]
    # Ring slot written at step s (score % ring).
    out_slot: np.ndarray       # int32[num_steps]
    # Parent ring slots, -1 if nonexistent: M at d-x, M at d-o-e, I/D at d-e.
    mx_slot: np.ndarray        # int32[num_steps]
    moe_slot: np.ndarray       # int32[num_steps]
    ide_slot: np.ndarray       # int32[num_steps]
    # Index of this step among MDI steps (for choice-table rows), -1 for
    # M-only steps.
    mdi_index: np.ndarray      # int32[num_steps]
    num_mdi_steps: int
    # Score the reference reports when the kernel gives up unfinished:
    # the score after the last processed iteration + 1.
    unfinished_score: int

    @property
    def ring_size(self) -> int:
        return self.penalties.active_working_set


@functools.lru_cache(maxsize=64)
def _existence(x: int, o: int, e: int, up_to: int) -> tuple[np.ndarray, np.ndarray]:
    """M/I existence bitmaps for scores 0..up_to (inclusive)."""
    m = np.zeros(up_to + 1, dtype=bool)
    i = np.zeros(up_to + 1, dtype=bool)
    m[0] = True
    for d in range(1, up_to + 1):
        gap = (d - o - e >= 0 and m[d - o - e]) or (d - e >= 0 and i[d - e])
        i[d] = gap
        m[d] = gap or (d - x >= 0 and m[d - x])
    return m, i


@functools.lru_cache(maxsize=64)
def build_schedule(
    penalties: Penalties, max_steps: int, score_limit: int | None = None
) -> WavefrontSchedule:
    """Simulate the reference score loop's control flow host-side.

    Mirrors lib/kernels/sequence_alignment_kernel.cu:566-657: distance and
    steps both start at 1 after the initial extension; each loop iteration
    processes one score; `steps` increments only on next_MDI; the loop runs
    while ``steps < max_steps - 1``.
    """
    x, o, e = penalties.x, penalties.o, penalties.e
    ring = penalties.active_working_set
    # Upper bound on scores we may touch: each processed iteration advances
    # score by at least 1 and there are < max_steps MDI steps; between MDI
    # steps at most max(x, o+e) skipped/M-only scores occur.
    score_cap = max_steps * (max(x, o + e) + 1) + ring + 2
    m_exist, i_exist = _existence(x, o, e, score_cap)

    scores: list[int] = []
    kinds: list[int] = []

    d = 1
    steps = 1
    while steps < max_steps - 1 and (score_limit is None or d <= score_limit):
        gap = i_exist[d]
        m = m_exist[d]
        if gap:
            scores.append(d)
            kinds.append(STEP_MDI)
            steps += 1
        elif m:
            scores.append(d)
            kinds.append(STEP_M_ONLY)
        # Non-existent scores are pure bookkeeping (distance++ only).
        d += 1
        if d >= score_cap:  # pragma: no cover - defensive
            break

    score = np.asarray(scores, dtype=np.int32)
    kind = np.asarray(kinds, dtype=np.int32)
    n = len(scores)

    out_slot = (score % ring).astype(np.int32)

    def parent(delta: int, exist: np.ndarray) -> np.ndarray:
        pd = score - delta
        ok = (pd >= 0) & exist[np.clip(pd, 0, None)]
        return np.where(ok, (score - delta) % ring, -1).astype(np.int32)

    mx_slot = parent(x, m_exist)
    moe_slot = parent(o + e, m_exist)
    ide_slot = parent(e, i_exist)

    mdi_index = np.where(kind == STEP_MDI, np.cumsum(kind == STEP_MDI) - 1, -1)
    mdi_index = mdi_index.astype(np.int32)

    unfinished = int(score[-1]) + 1 if n else 1

    return WavefrontSchedule(
        penalties=penalties,
        max_steps=max_steps,
        num_steps=n,
        score=score,
        kind=kind,
        out_slot=out_slot,
        mx_slot=mx_slot,
        moe_slot=moe_slot,
        ide_slot=ide_slot,
        mdi_index=mdi_index,
        num_mdi_steps=int((kind == STEP_MDI).sum()),
        unfinished_score=unfinished,
    )
