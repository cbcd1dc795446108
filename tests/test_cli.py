"""CLI end-to-end golden tests — the analog of the reference's shell tests
(tests/test-aligner.sh:11-48 driving the binary and diffing output files, and
tests/test-fasta.sh:11-23 grepping check-mode output).

These invoke ``wfa_tpu.cli.main`` in-process on the reference's own corpus and
diff the produced output files against the golden ``.alg`` score files, so the
output-file format, the ``-o``/``-p``/``-c`` paths, penalties parsing and the
batch default are all covered hermetically (XLA engine + CPU fallback).
"""
from pathlib import Path

import pytest

from wfa_tpu.cli import main

DATA = Path(__file__).parent / "data"


def golden_scores(tag):
    path = DATA / "results" / f"test.score.affine.{tag}.alg"
    return [
        line.split()[0]
        for line in path.read_text().splitlines()
        if line.strip()
    ]


def out_scores(path):
    return [
        line.split("\t")[0]
        for line in Path(path).read_text().splitlines()
        if line.strip()
    ]


# Low max-error runs: the small tiers finish on the (XLA) engine, everything
# else exercises the CPU-recovery path — exactly the reference's test3
# (test-aligner.sh:27).  Scores must still be optimal for every pair.
@pytest.mark.parametrize(
    "pen,tag,max_e",
    [("1,2,1", "p0", 25), ("3,1,4", "p1", 60), ("5,3,2", "p2", 60)],
)
def test_cli_seq_golden(tmp_path, pen, tag, max_e):
    out = tmp_path / "res.out"
    rc = main([
        "-i", str(DATA / "wfa.utest.seq"), "-g", pen, "-e", str(max_e),
        "-o", str(out),
    ])
    assert rc == 0
    assert out_scores(out) == golden_scores(tag)


def test_cli_cigar_check(tmp_path, capsys):
    """-x -c: CIGARs self-check against the exact oracle (correct=N)."""
    out = tmp_path / "res.out"
    rc = main([
        "-i", str(DATA / "wfa.utest.seq"), "-n", "50", "-g", "1,2,1",
        "-e", "100", "-x", "-c", "-o", str(out),
    ])
    assert rc == 0
    assert "correct=50 incorrect=0" in capsys.readouterr().err
    lines = Path(out).read_text().splitlines()
    assert len(lines) == 50
    # CIGAR column is present and non-empty in -x mode.
    assert all(len(line.split("\t")) >= 2 and line.split("\t")[1]
               for line in lines)
    assert [line.split("\t")[0] for line in lines] == golden_scores("p0")[:50]


def test_cli_print_output_and_batch(tmp_path, capsys):
    """-p prints to stderr; -b exercises the multi-batch pipeline path."""
    rc = main([
        "-i", str(DATA / "wfa.utest.seq"), "-n", "40", "-g", "1,2,1",
        "-e", "25", "-b", "11", "-p",
    ])
    assert rc == 0
    err_lines = [
        line for line in capsys.readouterr().err.splitlines()
        if line.startswith("-") or line.startswith("0\t")
    ]
    assert [line.split("\t")[0] for line in err_lines] == \
        golden_scores("p0")[:40]


def test_cli_fasta_check(capsys):
    """test-fasta.sh analog: HiFi FASTA pairs, banded distance + check mode
    must report every score optimal (correct=50) and print recall."""
    rc = main([
        "-Q", str(DATA / "test_hifi.query.fasta"),
        "-T", str(DATA / "test_hifi.target.fasta"),
        "-e", "3000", "-B", "auto", "-c",
    ])
    assert rc == 0
    err = capsys.readouterr().err
    assert "correct=50 incorrect=0" in err
    assert "recall=100.00%" in err


def test_cli_output_verbose(tmp_path):
    """-O appends pattern and text columns (tools/aligner.c:497-505)."""
    out = tmp_path / "res.out"
    rc = main([
        "-i", str(DATA / "wfa.utest.seq"), "-n", "5", "-g", "1,2,1",
        "-e", "25", "-x", "-O", "-o", str(out),
    ])
    assert rc == 0
    for line in Path(out).read_text().splitlines():
        cols = line.split("\t")
        assert len(cols) == 4
        assert set(cols[2]) <= set("ACGTNacgtn")
        assert set(cols[3]) <= set("ACGTNacgtn")


def test_cli_errors(capsys):
    assert main(["-g", "1,2,1"]) == 1            # no input file
    assert main([
        "-i", str(DATA / "wfa.utest.seq"), "-e", "0",
    ]) == 1                                       # bad max error
    assert main([
        "-i", str(DATA / "wfa.utest.seq"), "-B", "-3",
    ]) == 1                                       # bad band


def test_cli_malformed_penalties_exit_nonzero():
    """A malformed -g must fail, not silently run with defaults
    (tools/aligner.c:265-283 parses or errors)."""
    for bad in ["1,2", "a,b,c", "1,2,3,4", "1;2;3"]:
        assert main([
            "-i", str(DATA / "wfa.utest.seq"), "-n", "1", "-g", bad,
        ]) == 1, bad
    from wfa_tpu.cli import _parse_penalties

    assert _parse_penalties(None).x == 2          # default path intact
    p = _parse_penalties("-5,3,2")
    assert (p.x, p.o, p.e) == (5, 3, 2)           # abs() like the reference
