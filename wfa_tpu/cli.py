"""Command-line aligner — flag-for-flag port of the reference CLI surface
(tools/aligner.c:60-187), TPU backend.

Usage examples (cf. tools/aligner.c:211-216):
    wfa.affine.tpu -i sequences.seq -b 1000 -o scores.out
    wfa.affine.tpu -i sequences.seq -B auto -o scores-banded.out
    wfa.affine.tpu -Q queries.fasta -T targets.fasta -x -o cigars.out

Output format matches tools/aligner.c:497-509: per alignment one line
``-error<TAB>cigar`` (``-O`` appends pattern and text columns).
"""
from __future__ import annotations

import argparse
import sys
import time

from . import native
from .params import AlignmentOptions
from .pipeline import align_pairs_pipelined
from .types import Penalties
from .utils.io import SequenceBatch, read_fasta_pair, read_seq_file
from .utils.logger import LOG, set_verbosity


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="wfa.affine.tpu",
        description="Batch gap-affine pairwise alignment (WFA) on TPU",
    )
    p.add_argument("-i", "--input-seq", help=".seq file (alternating >pattern / <text lines)")
    p.add_argument("-Q", "--input-fasta-query", help="FASTA with query (pattern) sequences")
    p.add_argument("-T", "--input-fasta-target", help="FASTA with target (text) sequences")
    p.add_argument("-n", "--num-alignments", type=int, help="number of alignments to read (default: all)")
    p.add_argument("-g", "--affine-penalties", default=None, help="penalties x,o,e (default 2,3,1)")
    p.add_argument("-x", "--compute-cigar", action="store_true", help="compute the optimal alignment path (CIGAR)")
    p.add_argument("-c", "--check", action="store_true", help="check alignment correctness against the CPU oracle")
    p.add_argument("-e", "--max-distance", type=int, help="maximum error the kernel computes (default: ~10%% of first pair)")
    p.add_argument("-b", "--batch-size", type=int, help="alignments per pipeline batch")
    p.add_argument("-B", "--band", default=None, help="banded (heuristic) execution; value = re-centering interval, 'auto' = 25")
    p.add_argument("-t", "--band-width", type=int, default=None, help="band window width in diagonals (reference: threads per block)")
    p.add_argument("-w", "--workers", type=int, default=None, help="accepted for compatibility; the TPU engine sizes its own grid")
    p.add_argument("-o", "--output-file", help="output file for results")
    p.add_argument("-p", "--print-output", action="store_true", help="print output to stderr")
    p.add_argument("-O", "--output-verbose", action="store_true", help="append pattern/text columns to the output")
    p.add_argument("--backend", choices=["auto", "xla", "pallas"], default="auto", help="device engine selection")
    p.add_argument("--profile", metavar="DIR", help="write a JAX profiler trace of the alignment run to DIR")
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def _parse_penalties(arg: str | None) -> Penalties:
    """Parse ``-g x,o,e`` or raise ValueError (the reference CLI parses or
    errors out, tools/aligner.c:265-283)."""
    if not arg:
        return Penalties(2, 3, 1)
    parts = arg.split(",")
    try:
        if len(parts) != 3:
            raise ValueError
        x, o, e = (int(v) for v in parts)
    except ValueError:
        raise ValueError(
            f"Invalid penalties {arg!r}: expected x,o,e (e.g. -g 2,3,1)."
        ) from None
    return Penalties(abs(x), abs(o), abs(e))


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.verbose:
        set_verbosity("DEBUG")

    # Persistent XLA compilation cache: kernel compiles survive across CLI
    # invocations (the analog of the reference building its cubins once).
    import os

    # WFA_TPU_PLATFORM=cpu forces the JAX platform before first device use
    # (the JAX_PLATFORMS env var is ignored by some remote-TPU plugins, so
    # this goes through jax.config); useful for running the CLI on hosts
    # whose accelerator is absent or unreachable.
    platform = os.environ.get("WFA_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    cache_dir = os.environ.get(
        "WFA_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "wfa_tpu_xla"),
    )
    if cache_dir and cache_dir != "0":
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Device detection banner (tools/aligner.c:189-204 analog).
    from .utils.device_query import describe
    from .utils.timers import device_trace, timed

    LOG.info("Detected %s", describe())

    try:
        pen = _parse_penalties(args.affine_penalties)
    except ValueError as exc:
        LOG.error("%s", exc)
        return 1

    with timed("file read"):
        if args.input_seq:
            if native.available():
                pats, txts = native.read_seq_native(args.input_seq)
                batch = SequenceBatch(pats, txts)
                if args.num_alignments:
                    batch = SequenceBatch(
                        batch.patterns[: args.num_alignments],
                        batch.texts[: args.num_alignments],
                    )
            else:
                batch = read_seq_file(args.input_seq, args.num_alignments)
        elif args.input_fasta_query and args.input_fasta_target:
            if native.available():
                pats, txts = native.read_fasta_native(
                    args.input_fasta_query, args.input_fasta_target
                )
                n = args.num_alignments or len(pats)
                batch = SequenceBatch(pats[:n], txts[:n])
            else:
                batch = read_fasta_pair(
                    args.input_fasta_query, args.input_fasta_target,
                    args.num_alignments,
                )
        else:
            LOG.error("No input file provided.")
            return 1

    LOG.info("Penalties: M=0, X=%d, O=%d, E=%d.", pen.x, pen.o, pen.e)

    max_error = args.max_distance
    if max_error is None and len(batch):
        # CLI default: ~10% error of the first pair, floor 20
        # (tools/aligner.c:319-338).
        max_error = int(
            max(len(batch.texts[0]), len(batch.patterns[0])) * 0.1
        ) * max(pen.x, pen.o, pen.e)
        max_error = max(max_error, 20)
        if max_error > 8000:
            LOG.warning(
                "Automatically generated maximum error is very high; consider"
                " limiting it with '-e'."
            )
        LOG.info("No maximum error provided by the user, using %d", max_error)
    elif max_error is not None and max_error <= 0:
        LOG.error("Maximum error supported by the kernel must be > 0.")
        return 1

    band = -1
    if args.band is not None:
        band = 25 if args.band == "auto" else int(args.band)
        if band < 0:
            LOG.error("Band must be positive (band=%d).", band)
            return 1
        if band == 0:
            band = 25

    # Multi-host run: each process aligns its strided shard of the input and
    # writes a per-process output file (merge offline or with
    # parallel.distributed.allgather_scores).  max_error above was derived
    # from the global first pair, so every host compiles identical shapes.
    import jax

    if jax.process_count() > 1:
        from .parallel.distributed import shard_batch

        pats, txts, args.output_file = shard_batch(
            batch.patterns, batch.texts, args.output_file
        )
        batch = SequenceBatch(pats, txts)
        LOG.info(
            "multi-host: process %d/%d aligning %d pairs",
            jax.process_index(), jax.process_count(), len(batch),
        )

    # Default pipeline batch = N/10 (lib/alignment_parameters.h:100-103).
    batch_size = args.batch_size
    if batch_size is None and len(batch) >= 20:
        batch_size = max(1, len(batch) // 10)

    opts = AlignmentOptions(
        penalties=pen,
        max_error=max_error,
        compute_cigar=args.compute_cigar,
        batch_size=batch_size,
        band=band if args.band is not None else -1,
        band_width=args.band_width,
        backend=args.backend,
    )

    t0 = time.time()
    with device_trace(args.profile):
        results = align_pairs_pipelined(batch.patterns, batch.texts, opts)
    wall = time.time() - t0
    print(
        f"Alignment computed. Wall time: {wall:.3f}s "
        f"({len(results) / wall:.3f} alignments per second)"
    )

    if args.check:
        # One OpenMP batch call against the exact CPU oracle (the reference
        # checks each batch in an OpenMP loop, lib/align.cu:258-326) instead
        # of a per-pair Python loop.  A score off the optimum counts as
        # incorrect even in banded mode — like the reference, where recall is
        # the reported metric for the heuristic.
        import numpy as np

        from .utils.verification import affine_score, check_cigar

        t0 = time.time()
        if native.available():
            mask = np.ones(len(batch), dtype=np.int8)
            oracle, _, _ = native.cpu_align_batch(
                batch.patterns, batch.texts, pen, mask, False, adaptive=False
            )
        else:
            from .utils.cpu_wfa import align_one_py

            oracle = np.array([
                align_one_py(p, t, pen, False)[0]
                for p, t in zip(batch.patterns, batch.texts)
            ])
        ncorrect = nincorrect = noptimal = 0
        for i, r in enumerate(results):
            ok = True
            if args.compute_cigar:
                ok = check_cigar(r.cigar, batch.patterns[i], batch.texts[i])
                ok = ok and affine_score(r.cigar, pen) == r.error
            optimal = r.error == oracle[i]
            noptimal += optimal
            ok = ok and optimal
            ncorrect += ok
            nincorrect += not ok
        dt = max(time.time() - t0, 1e-9)
        LOG.info(
            "Verification computed. Wall time: %.3fs (%.3f alignments per "
            "second checked)", dt, len(results) / dt,
        )
        LOG.warning("correct=%d incorrect=%d", ncorrect, nincorrect)
        print(f"correct={ncorrect} incorrect={nincorrect}", file=sys.stderr)
        if opts.banded and results:
            print(
                f"recall={100.0 * noptimal / len(results):.2f}%"
                f" ({noptimal}/{len(results)} scores optimal)",
                file=sys.stderr,
            )

    if args.output_file or args.print_output:
        from .utils.io import write_alignments

        fp = sys.stderr if args.print_output else open(args.output_file, "w")
        try:
            write_alignments(fp, results, batch, verbose=args.output_verbose)
        finally:
            if not args.print_output:
                fp.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
