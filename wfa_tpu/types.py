"""Core types for the TPU-native WFA engine.

Mirrors the reference's core data model (lib/wfa_types.h:28-64,
lib/affine_penalties.h:25-30, lib/alignment_results.h:30-48) but as Python
dataclasses.  The offset contract is kept: offsets are signed 16-bit values on
the optimized path, so the maximum supported sequence length is 2^15
(lib/wfa_types.h:28-32).
"""
from __future__ import annotations

import dataclasses
from enum import IntEnum

# Maximum sequence length supported by the aligner (reference:
# lib/wfa_types.h:31 `MAX_SEQ_LEN (1UL << 15)`).
MAX_SEQ_LEN = 1 << 15

# Sentinel for "this wavefront cell does not exist" (reference:
# lib/kernels/common_alignment_kernels.cuh:27 `OFFSET_NULL -32000`).
OFFSET_NULL = -32000


class AffineOp(IntEnum):
    """2-bit alignment-op encoding (reference: lib/wfa_types.h:44-49)."""

    NOOP = 0
    INS = 1
    SUB = 2
    DEL = 3


# ASCII rendering of ops in CIGARs (reference: lib/wfa_types.h:51).
OPS_ASCII = ("?", "I", "X", "D")


class GapOp(IntEnum):
    """Gap provenance for I/D cells (reference: lib/wfa_types.h:53-56).

    GAP_EXTEND > GAP_OPEN so that offset ties prefer gap-extension, exactly
    like the reference's packed 64-bit max (MAX_PB at
    lib/kernels/sequence_alignment_kernel.cu:177-178).
    """

    OPEN = 1
    EXTEND = 2


@dataclasses.dataclass(frozen=True)
class Penalties:
    """Gap-affine penalties; match is always 0 (lib/affine_penalties.h:25-30)."""

    x: int = 2  # mismatch
    o: int = 3  # gap open
    e: int = 1  # gap extend

    def __post_init__(self) -> None:
        for name in ("x", "o", "e"):
            v = getattr(self, name)
            if v < 0:
                # The reference CLI takes |v| (tools/aligner.c:277-279).
                object.__setattr__(self, name, -v)
        if self.x == 0 or self.e == 0:
            raise ValueError("penalties x and e must be > 0")

    @property
    def active_working_set(self) -> int:
        """Ring size: wavefronts kept live = max(o+e, x)+1 (reference:
        lib/kernels/sequence_alignment_kernel.cu:394)."""
        return max(self.o + self.e, self.x) + 1


@dataclasses.dataclass
class AlignmentResult:
    """Public per-alignment result (reference: lib/alignment_results.h:30-48).

    ``error`` is the positive alignment distance; the CLI prints its negation
    (tools/aligner.c:506-508).  ``cigar`` is the run-length ASCII CIGAR
    ("10M2X3I...") or empty in distance-only mode.
    """

    error: int = 0
    cigar: str = ""
    finished_on_accelerator: bool = True
    # False only when the device could not finish the pair and the CPU
    # fallback was disabled (opts.cpu_fallback=False): ``error``/``cigar``
    # are then placeholders, mirroring the reference kernel's
    # alignment_result_t.finished=false contract (lib/alignment_results.h:37)
    # — the reference always recomputes such pairs (lib/align.cu:236-249);
    # with the recompute path disabled, the flag is the honest signal.
    finished: bool = True


@dataclasses.dataclass
class KernelResult:
    """Internal kernel result (reference: lib/alignment_results.h:37-42)."""

    distance: int
    finished: bool
