"""Multi-query stacked search: correctness of the segmented SW kernel
(interpret mode on CPU), the public multi API, and the CLI --all-queries
flag. The stacked kernel is a new TPU-native capability with no reference
equivalent (the reference CLI reads only the first query sequence,
src/opal_aligner.cpp:106-110)."""
import io

import numpy as np
import pytest

from opal_tpu.constants import MODE_HW, MODE_NW, MODE_OV, MODE_SW, SEARCH_SCORE
from opal_tpu.engine.pallas_backend import PallasBackend
from opal_tpu.engine.search import (
    Engine,
    search_database_arrays,
    search_database_multi_arrays,
)
from opal_tpu.oracle import search_oracle

from util import random_problem


def _random_setup(seed, n_queries=4, n_seqs=60):
    rng = np.random.default_rng(seed)
    A = 20
    matrix = rng.integers(-4, 6, size=(A, A), dtype=np.int32)
    np.fill_diagonal(matrix, rng.integers(3, 9, size=A))
    queries = [
        rng.integers(0, A, size=int(n), dtype=np.uint8)
        for n in rng.integers(4, 150, size=n_queries)
    ]
    db = [
        rng.integers(0, A, size=int(rng.integers(5, 250)), dtype=np.uint8)
        for _ in range(n_seqs)
    ]
    return queries, db, matrix


def _interpret_engine(block_size=64):
    eng = Engine(backend="pallas", block_size=block_size)
    eng._backend = PallasBackend(interpret=True)
    return eng


@pytest.mark.parametrize("mode", [MODE_SW, MODE_NW, MODE_HW, MODE_OV])
def test_stacked_kernel_matches_oracle_interpret(mode):
    queries, db, matrix = _random_setup(11 + mode)
    eng = _interpret_engine()
    outs = search_database_multi_arrays(
        queries, db, 4, 2, matrix, mode=mode, engine=eng
    )
    assert len(outs) == len(queries)
    for q, out in zip(queries, outs):
        want = search_oracle(q, db, 4, 2, matrix, mode, SEARCH_SCORE)
        np.testing.assert_array_equal(
            out["score"], np.array([r.score for r in want])
        )


def test_stacked_kernel_single_query_and_gap_variants():
    queries, db, matrix = _random_setup(12, n_queries=2, n_seqs=30)
    eng = _interpret_engine()
    for go, ge in ((3, 1), (5, 5), (11, 1)):
        outs = search_database_multi_arrays(
            queries, db, go, ge, matrix, engine=eng
        )
        for q, out in zip(queries, outs):
            want = search_oracle(q, db, go, ge, matrix, MODE_SW, SEARCH_SCORE)
            np.testing.assert_array_equal(
                out["score"], np.array([r.score for r in want])
            )


def test_multi_api_fallback_paths_match_single():
    queries, db, matrix = _random_setup(13, n_queries=3, n_seqs=25)
    eng = Engine(backend="xla", block_size=32)
    # XLA backend has no stacked path: must fall back per query
    outs = search_database_multi_arrays(
        queries, db, 3, 1, matrix, mode=MODE_NW, engine=eng
    )
    for q, out in zip(queries, outs):
        single = search_database_arrays(
            q, db, 3, 1, matrix, mode=MODE_NW, engine=eng
        )
        np.testing.assert_array_equal(out["score"], single["score"])


def test_multi_respects_value_bound_gate():
    # a query long enough to overflow the segmented-scan bound must be
    # handled (via fallback), not silently wrong
    rng = np.random.default_rng(14)
    A = 4
    matrix = np.full((A, A), -1, np.int32)
    np.fill_diagonal(matrix, 2**14)  # worst-case score >> 2^18
    queries = [rng.integers(0, A, size=40, dtype=np.uint8) for _ in range(2)]
    db = [rng.integers(0, A, size=60, dtype=np.uint8) for _ in range(10)]
    eng = _interpret_engine()
    outs = search_database_multi_arrays(queries, db, 3, 1, matrix, engine=eng)
    for q, out in zip(queries, outs):
        want = search_oracle(q, db, 3, 1, matrix, MODE_SW, SEARCH_SCORE)
        np.testing.assert_array_equal(
            out["score"], np.array([r.score for r in want])
        )


def test_cli_all_queries(tmp_path, capsys):
    from opal_tpu import cli

    queries, db, matrix = _random_setup(15, n_queries=3, n_seqs=8)
    from opal_tpu.matrices import ScoreMatrix

    sm = ScoreMatrix.blosum50()
    alpha = sm.alphabet
    qf = tmp_path / "q.fa"
    dbf = tmp_path / "db.fa"
    rng = np.random.default_rng(16)
    qf.write_text("".join(
        f">q{i}\n" + "".join(alpha[j] for j in rng.integers(0, 20, size=30))
        + "\n" for i in range(3)
    ))
    dbf.write_text("".join(
        f">t{i}\n" + "".join(alpha[j] for j in rng.integers(0, 20, size=50))
        + "\n" for i in range(5)
    ))
    rc = cli.main(["--all-queries", "--backend", "xla", str(qf), str(dbf)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Read 3 query sequences" in out
    assert out.count("Query #") == 3
    assert out.count("\n#0:") == 3  # one result line per query section

    # single-query output must not contain the multi-query headers
    rc = cli.main(["--backend", "xla", str(qf), str(dbf)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Query #" not in out


def test_cli_all_queries_score_end(tmp_path, capsys):
    """--all-queries -x 1 (the stacked score+end CLI branch): each query
    section's result lines must equal its own single-query run."""
    from opal_tpu import cli
    from opal_tpu.matrices import ScoreMatrix

    sm = ScoreMatrix.blosum50()
    alpha = sm.alphabet
    qf = tmp_path / "q.fa"
    dbf = tmp_path / "db.fa"
    rng = np.random.default_rng(61)
    qtexts = ["".join(alpha[j] for j in rng.integers(0, 20, size=n))
              for n in (18, 31)]
    qf.write_text("".join(f">q{i}\n{t}\n" for i, t in enumerate(qtexts)))
    dbf.write_text("".join(
        f">t{i}\n" + "".join(alpha[j] for j in rng.integers(0, 20, size=40))
        + "\n" for i in range(6)
    ))
    rc = cli.main(["--all-queries", "-x", "1", "--backend", "xla",
                   str(qf), str(dbf)])
    out = capsys.readouterr().out
    assert rc == 0
    sections = out.split("Query #")[1:]
    assert len(sections) == 2
    for qi, sec in enumerate(sections):
        got = [l for l in sec.splitlines() if l.startswith("#")
               and not l.startswith("#<")]
        sq = tmp_path / f"q{qi}.fa"
        sq.write_text(f">q\n{qtexts[qi]}\n")
        rc = cli.main(["-x", "1", "--backend", "xla", str(sq), str(dbf)])
        want = [l for l in capsys.readouterr().out.splitlines()
                if l.startswith("#") and not l.startswith("#<")]
        assert rc == 0 and got == want, qi


@pytest.mark.parametrize("mode", [MODE_SW, MODE_NW, MODE_HW, MODE_OV])
def test_stacked_kernel_score_end_matches_oracle_interpret(mode):
    """Score+end (x1) stacking: per-segment trackers (SW per-cell (m, c)
    tie-break, HW/OV argcol, OV PLRM end disambiguation) must reproduce
    the reference end semantics for every stacked query."""
    from opal_tpu.constants import SEARCH_SCORE_END

    queries, db, matrix = _random_setup(41 + mode)
    eng = _interpret_engine()
    outs = search_database_multi_arrays(
        queries, db, 4, 2, matrix, mode=mode,
        search_type=SEARCH_SCORE_END, engine=eng
    )
    assert len(outs) == len(queries)
    for q, out in zip(queries, outs):
        want = search_oracle(q, db, 4, 2, matrix, mode, SEARCH_SCORE_END)
        np.testing.assert_array_equal(
            out["score"], np.array([r.score for r in want])
        )
        for i, w in enumerate(want):
            if mode == MODE_SW and w.score == 0:
                assert out["end_q"][i] == -1 and out["end_t"][i] == -1, i
                continue
            assert (out["end_t"][i], out["end_q"][i]) == (
                w.end_location_target, w.end_location_query), (i, mode)


def test_stacked_score_end_tie_heavy():
    """x1 stacking under a tie-heavy 0/2 matrix: the segmented emit-time
    tie-break must match the oracle for every segment."""
    from opal_tpu.constants import SEARCH_SCORE_END

    rng = np.random.default_rng(77)
    A = 3
    matrix = np.where(np.eye(A, dtype=np.int32), 2, 0).astype(np.int32)
    queries = [rng.integers(0, A, int(n)).astype(np.uint8)
               for n in rng.integers(5, 60, size=4)]
    db = [rng.integers(0, A, int(rng.integers(4, 150))).astype(np.uint8)
          for _ in range(30)]
    eng = _interpret_engine()
    for mode in (MODE_SW, MODE_HW, MODE_OV):
        outs = search_database_multi_arrays(
            queries, db, 1, 1, matrix, mode=mode,
            search_type=SEARCH_SCORE_END, engine=eng
        )
        for q, out in zip(queries, outs):
            want = search_oracle(q, db, 1, 1, matrix, mode,
                                 SEARCH_SCORE_END)
            for i, w in enumerate(want):
                assert out["score"][i] == w.score, (i, mode)
                if mode == MODE_SW and w.score == 0:
                    continue
                assert (out["end_t"][i], out["end_q"][i]) == (
                    w.end_location_target, w.end_location_query), (i, mode)


def test_length_aware_packing_fewer_launches(monkeypatch):
    """A long query interleaved between short ones must not break the
    stackable group: packing sorts by 16-quantized length first (VERDICT
    r2 #4), so [short, LONG, short, short] runs as one stacked launch of
    the shorts + one single launch — not 4 sequential launches. Results
    stay in arrival order and oracle-exact."""
    rng = np.random.default_rng(21)
    A = 4
    matrix = np.full((A, A), -1, np.int32)
    np.fill_diagonal(matrix, 3)
    db = [rng.integers(0, A, size=int(rng.integers(10, 60)), dtype=np.uint8)
          for _ in range(20)]
    # MULTI_AREA_BUDGET caps q_total at block_size=16... keep shorts tiny
    # and the long one big enough that any group containing it rejects
    from opal_tpu.engine import pallas_kernels as pk
    long_len = 200
    queries = [
        rng.integers(0, A, size=n, dtype=np.uint8)
        for n in (24, long_len, 30, 17)
    ]
    eng = _interpret_engine()
    backend = eng._resolve_backend()
    calls = {"multi": 0, "sizes": []}
    orig = type(backend).dispatch_multi

    def spy(self, qprofiles, *a, **kw):
        calls["multi"] += 1
        calls["sizes"].append([qp.shape[1] for qp in qprofiles])
        return orig(self, qprofiles, *a, **kw)

    monkeypatch.setattr(type(backend), "dispatch_multi", spy)
    # make the long query unstackable WITH the shorts (block_size=64:
    # the shorts' padded rows sum to 96, +208 for the long one busts it)
    monkeypatch.setattr(pk, "MULTI_AREA_BUDGET", 96 * 64 + 8)
    outs = search_database_multi_arrays(
        queries, db, 3, 1, matrix, engine=eng)
    assert calls["multi"] == 1, calls
    assert sorted(calls["sizes"][0]) == [17, 24, 30]
    for q, out in zip(queries, outs):
        want = search_oracle(q, db, 3, 1, matrix, MODE_SW, SEARCH_SCORE)
        np.testing.assert_array_equal(
            out["score"], np.array([r.score for r in want]))
