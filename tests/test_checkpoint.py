"""CLI checkpoint/resume: per-chunk journaling, replay on restart, torn-tail
tolerance, and key mismatch refusal. (The reference has no durable resume —
SURVEY.md §5.)"""
import json

import numpy as np
import pytest

from opal_tpu import cli
from opal_tpu.matrices import ScoreMatrix


@pytest.fixture
def files(tmp_path):
    sm = ScoreMatrix.blosum50()
    alpha = sm.alphabet
    rng = np.random.default_rng(41)
    qf = tmp_path / "q.fa"
    qf.write_text(">q\n" + "".join(
        alpha[j] for j in rng.integers(0, 20, size=30)) + "\n")
    dbf = tmp_path / "db.fa"
    dbf.write_text("".join(
        f">t{i}\n" + "".join(alpha[j] for j in rng.integers(0, 20, size=50))
        + "\n" for i in range(12)
    ))
    return str(qf), str(dbf), str(tmp_path / "ckpt.jsonl")


ARGS = ["--backend", "xla", "--chunk-residues", "200", "-x", "2"]


def _run(qf, dbf, ck, capsys, extra=()):
    rc = cli.main([*ARGS, *extra, "--checkpoint", ck, qf, dbf])
    out = capsys.readouterr().out
    assert rc == 0
    return [l for l in out.splitlines() if l.startswith("#")]


def test_checkpoint_resume_identical_output(files, capsys):
    qf, dbf, ck = files
    first = _run(qf, dbf, ck, capsys)
    # multiple chunks were journaled
    recs = open(ck).read().splitlines()
    assert len(recs) >= 3  # header + >=2 chunks

    # full re-run: everything restored, zero search
    second = _run(qf, dbf, ck, capsys)
    assert second == first

    # simulate an interrupted run: drop the last chunk record (+ a torn tail)
    with open(ck, "w") as f:
        f.write("\n".join(recs[:-1]) + "\n" + recs[-1][: len(recs[-1]) // 2])
    third = _run(qf, dbf, ck, capsys)
    assert third == first
    # journal was repaired/completed
    assert len(open(ck).read().splitlines()) == len(recs)


def test_checkpoint_key_mismatch_refused(files, capsys):
    qf, dbf, ck = files
    _run(qf, dbf, ck, capsys)
    rc = cli.main([*ARGS, "-o", "9", "--checkpoint", ck, qf, dbf])
    err = capsys.readouterr().err
    assert rc == 1
    assert "different search" in err


def test_checkpoint_chunking_mismatch_refused(files, capsys):
    qf, dbf, ck = files
    _run(qf, dbf, ck, capsys)
    # different chunk budget => different chunk boundaries => refuse
    rc = cli.main(["--backend", "xla", "--chunk-residues", "333", "-x", "2",
                   "--checkpoint", ck, qf, dbf])
    assert rc == 1
    assert "different search" in capsys.readouterr().err


def test_checkpoint_gcups_counts_only_computed(files, capsys):
    qf, dbf, ck = files
    args = ["--backend", "xla", "--chunk-residues", "200", "-x", "0",
            "--checkpoint", ck + ".g", qf, dbf]
    cli.main(args)
    capsys.readouterr()
    cli.main(args)  # fully restored run: no search happened
    out = capsys.readouterr().out
    gcups = [l for l in out.splitlines() if l.startswith("GCUPS")]
    assert gcups and gcups[0].endswith("0.00")


def test_checkpoint_random_truncation_fuzz(files, capsys):
    """Any byte-truncation of the journal must resume to identical output."""
    import random

    qf, dbf, ck = files
    first = _run(qf, dbf, ck, capsys)
    full = open(ck, "rb").read()
    header_len = full.index(b"\n") + 1
    rnd = random.Random(7)
    for _ in range(6):
        cut = rnd.randrange(header_len, len(full))
        with open(ck, "wb") as f:
            f.write(full[:cut])
        out = _run(qf, dbf, ck, capsys)
        assert out == first, cut
        full = open(ck, "rb").read()  # journal repaired/extended


def test_checkpoint_with_all_queries(tmp_path, capsys):
    sm = ScoreMatrix.blosum50()
    alpha = sm.alphabet
    rng = np.random.default_rng(91)
    qf = tmp_path / "qs.fa"
    qf.write_text("".join(
        f">q{i}\n" + "".join(alpha[j] for j in rng.integers(0, 20, size=25))
        + "\n" for i in range(3)
    ))
    dbf = tmp_path / "db2.fa"
    dbf.write_text("".join(
        f">t{i}\n" + "".join(alpha[j] for j in rng.integers(0, 20, size=40))
        + "\n" for i in range(10)
    ))
    ck = str(tmp_path / "mq.jsonl")
    args = ["--backend", "xla", "--chunk-residues", "150", "-x", "0",
            "--all-queries", "--checkpoint", ck, str(qf), str(dbf)]
    rc = cli.main(args)
    first = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith(("#", "Query"))]
    assert rc == 0 and first.count("Query #0: 25 residues") >= 2  # per chunk
    rc = cli.main(args)
    out = capsys.readouterr().out
    second = [l for l in out.splitlines() if l.startswith(("#", "Query"))]
    assert rc == 0
    assert second == first
    assert "restored from checkpoint" in out
