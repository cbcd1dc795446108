"""Minimal API walkthrough with auto-derived options.

Python analog of the reference's examples/auto_example.c: create an aligner,
add sequence pairs, align with default (auto-derived) options, print
score + CIGAR per pair.

Run:  python examples/auto_example.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wfa_tpu import AlignmentOptions, Penalties, WfaAligner

PAIRS = [
    ("GATTACA", "GATCACA"),
    ("ACGTACGTACGTACGT", "ACGTACGTTCGTACGT"),
    (
        "TCTTTACTCGCGCGTTGGAGAAATACAATAGT",
        "TCTATACTGCGCGTTTGGAGAAATAAAATAGT",
    ),
]


def main() -> int:
    # Options mirror wfagpu_set_default_options: penalties (x=2, o=3, e=1),
    # auto max_error from the first pair, CIGAR on.
    aligner = WfaAligner(
        AlignmentOptions(penalties=Penalties(2, 3, 1), compute_cigar=True)
    )
    for pattern, text in PAIRS:
        aligner.add_sequences(pattern, text)

    results = aligner.align()
    for (pattern, text), res in zip(PAIRS, results):
        print(f"pattern: {pattern}")
        print(f"text:    {text}")
        print(f"score:   {-res.error}   cigar: {res.cigar}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
