"""Band-relative traceback storage: bit-identical to full storage, native
matches the Python fallback, and memory actually shrinks to O(band * T)
(the reference keeps the full Q*T cell matrix — src/opal.cpp:1263)."""
import numpy as np
import pytest

from opal_tpu import _native
from opal_tpu.constants import MODE_HW, MODE_NW, MODE_OV, MODE_SW
from opal_tpu.oracle import search_oracle
from opal_tpu.traceback import align_pair_reverse_trick, find_alignment

from util import check_alignment, random_problem

MODES = [MODE_SW, MODE_NW, MODE_HW, MODE_OV]


@pytest.mark.parametrize("mode", MODES)
def test_native_matches_python_fallback(mode):
    rng = np.random.default_rng(31 + mode)
    query, db, matrix = random_problem(
        rng, n_seqs=6, query_len=70, min_len=30, max_len=160
    )
    from opal_tpu.constants import SEARCH_SCORE_END

    want = search_oracle(query, db, 3, 1, matrix, mode, SEARCH_SCORE_END)
    for t, w in zip(db, want):
        if mode == MODE_SW and w.score == 0:
            continue
        args = (
            query[: w.end_location_query + 1][::-1],
            t[: w.end_location_target + 1][::-1],
            3, 1, matrix, w.score, mode,
        )
        nat = find_alignment(*args, use_native=True)
        py = find_alignment(*args, use_native=False)
        assert nat[0] == py[0] == w.score
        assert nat[1] == py[1] and nat[2] == py[2]
        np.testing.assert_array_equal(nat[3], py[3])


def test_banded_equals_full_band():
    rng = np.random.default_rng(77)
    query, db, matrix = random_problem(
        rng, n_seqs=5, query_len=60, min_len=40, max_len=120
    )
    from opal_tpu.constants import SEARCH_SCORE_END

    want = search_oracle(query, db, 5, 2, matrix, MODE_SW, SEARCH_SCORE_END)
    for t, w in zip(db, want):
        if w.score == 0:
            continue
        aq = query[: w.end_location_query + 1][::-1]
        at = t[: w.end_location_target + 1][::-1]
        banded = find_alignment(aq, at, 5, 2, matrix, w.score, MODE_SW,
                                use_native=False)
        full = find_alignment(aq, at, 5, 2, matrix, w.score, MODE_SW,
                              full_band=True, use_native=False)
        assert banded[0] == full[0]
        assert banded[1:3] == full[1:3]
        np.testing.assert_array_equal(banded[3], full[3])


def test_long_similar_pair_uses_narrow_band_memory():
    if _native._get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(8)
    A = 20
    matrix = np.full((A, A), -2, np.int32)
    np.fill_diagonal(matrix, 5)
    Q = 4000
    query = rng.integers(0, A, size=Q, dtype=np.uint8)
    target = query.copy()
    mut = rng.integers(0, Q, size=40)
    target[mut] = (target[mut] + 1) % A  # a few mismatches: high score
    from opal_tpu.constants import SEARCH_SCORE_END
    from opal_tpu.result import SearchResult

    w = search_oracle(query, [target], 3, 1, matrix, MODE_SW,
                      SEARCH_SCORE_END)[0]
    _native._work["size"] = 0  # reset the cached work buffers
    _native._work["H"] = _native._work["E"] = _native._work["F"] = None
    sq, st, ops = align_pair_reverse_trick(
        query, target, 3, 1, matrix, w.score,
        w.end_location_query, w.end_location_target, MODE_SW,
    )
    allocated = _native._work["size"]
    assert allocated > 0, "native path did not run"
    full = (w.end_location_query + 1) * (w.end_location_target + 1)
    assert allocated < full / 4, (allocated, full)
    res = SearchResult(
        score_set=1, score=w.score,
        end_location_query=w.end_location_query,
        end_location_target=w.end_location_target,
        start_location_query=sq, start_location_target=st,
        alignment=ops, alignment_length=len(ops),
    )
    check_alignment(query, target, res, 3, 1, matrix, MODE_SW)


def test_zero_gap_penalties_alignment():
    # go == ge == 0: the closed-form band math divides by the gap costs;
    # must fall back to the full band and produce a replay-valid alignment
    rng = np.random.default_rng(55)
    query, db, matrix = random_problem(
        rng, n_seqs=4, query_len=17, min_len=5, max_len=65
    )
    from opal_tpu.constants import SEARCH_ALIGNMENT
    from opal_tpu.engine.search import Engine, search_database

    eng = Engine(backend="xla", block_size=8)
    for mode in MODES:
        res = search_database(query, db, 0, 0, matrix, mode=mode,
                              search_type=SEARCH_ALIGNMENT, engine=eng)
        for t, r in zip(db, res):
            if r.alignment is None:
                continue
            check_alignment(query, t, r, 0, 0, matrix, mode)


def test_alignment_rejects_gap_ext_above_gap_open():
    # ge > go: gap model is not reversal-invariant (the reference's
    # reverse-pass assert would abort); must raise a clear error while
    # score searches still work
    rng = np.random.default_rng(56)
    query, db, matrix = random_problem(
        rng, n_seqs=3, query_len=15, min_len=10, max_len=40
    )
    from opal_tpu.constants import SEARCH_ALIGNMENT, SEARCH_SCORE
    from opal_tpu.engine.search import Engine, search_database

    eng = Engine(backend="xla", block_size=8)
    with pytest.raises(ValueError, match="gap_ext <= gap_open"):
        search_database(query, db, 2, 5, matrix, mode=MODE_SW,
                        search_type=SEARCH_ALIGNMENT, engine=eng)
    res = search_database(query, db, 2, 5, matrix, mode=MODE_SW,
                          search_type=SEARCH_SCORE, engine=eng)
    want = search_oracle(query, db, 2, 5, matrix, MODE_SW, SEARCH_SCORE)
    assert [r.score for r in res] == [w.score for w in want]


def test_align_top_k_matches_full_run():
    rng = np.random.default_rng(60)
    query, db, matrix = random_problem(
        rng, n_seqs=20, query_len=40, min_len=20, max_len=90
    )
    from opal_tpu.constants import SEARCH_ALIGNMENT
    from opal_tpu.engine.search import Engine, search_database
    from opal_tpu.ranking import rank_scores

    eng = Engine(backend="xla", block_size=8)
    full = search_database(query, db, 3, 1, matrix, mode=MODE_SW,
                           search_type=SEARCH_ALIGNMENT, engine=eng)
    topk = search_database(query, db, 3, 1, matrix, mode=MODE_SW,
                           search_type=SEARCH_ALIGNMENT, engine=eng,
                           align_top_k=5)
    order = set(rank_scores(np.array([r.score for r in full]), 5).tolist())
    for i, (f, t) in enumerate(zip(full, topk)):
        assert t.score == f.score and t.end_location_query == f.end_location_query
        if i in order:
            assert t.start_location_query == f.start_location_query
            np.testing.assert_array_equal(
                t.alignment if t.alignment is not None else np.zeros(0),
                f.alignment if f.alignment is not None else np.zeros(0),
            )
        else:
            assert t.alignment is None
            assert t.start_location_query == -1


def test_hw_narrow_band_last_row_anchor_regression():
    """Regression (x2 soak, seed 563430931): with a narrow band, the HW
    early-stop tracked the band-edge cell as the "last row"; when the band
    excluded row Q-1 the backtrace anchored out-of-band and emitted a
    garbage path with a correct score (the reference shares the flaw —
    its assert checks only the score). Replay validation must reject the
    banded path and the full-band retry must produce a valid one."""
    from opal_tpu.constants import MODE_HW, SEARCH_ALIGNMENT

    rng = np.random.default_rng(563430931)
    A = int(rng.integers(2, 26))
    matrix = rng.integers(-6, 8, size=(A, A), dtype=np.int32)
    go = int(rng.integers(1, 14))
    ge = int(rng.integers(1, go + 1))
    Q = int(rng.integers(2, 120))
    query = rng.integers(0, A, size=Q, dtype=np.uint8)
    db = [rng.integers(0, A, size=int(rng.integers(2, 250)), dtype=np.uint8)
          for _ in range(int(rng.integers(3, 40)))]
    from opal_tpu.engine.search import Engine, search_database

    eng = Engine(backend="xla", block_size=64)
    res = search_database(query, db, go, ge, matrix, mode=MODE_HW,
                          search_type=SEARCH_ALIGNMENT, engine=eng)
    want = search_oracle(query, db, go, ge, matrix, MODE_HW, 1)
    for i, (r, w) in enumerate(zip(res, want)):
        assert r.score == w.score, i
        if r.alignment is not None:
            check_alignment(query, db[i], r, go, ge, matrix, MODE_HW)


@pytest.mark.parametrize("mode", MODES)
def test_checkpointed_storage_bit_identical(mode, monkeypatch):
    """Checkpointed (O(band*sqrt(T))) storage must reproduce the full-store
    native path bit-exactly: same score, end location, AND op path, across
    modes, banded and full-band geometries."""
    if _native._get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(91 + mode)
    query, db, matrix = random_problem(
        rng, n_seqs=8, query_len=80, min_len=40, max_len=220
    )
    from opal_tpu.constants import SEARCH_SCORE_END

    want = search_oracle(query, db, 3, 1, matrix, mode, SEARCH_SCORE_END)
    n_checked = 0
    for t, w in zip(db, want):
        if mode == MODE_SW and w.score == 0:
            continue
        for full_band in (False, True):
            args = (
                query[: w.end_location_query + 1][::-1],
                t[: w.end_location_target + 1][::-1],
                3, 1, matrix, w.score, mode,
            )
            monkeypatch.delenv("OPAL_TPU_TB_FULL_CELLS", raising=False)
            full = find_alignment(*args, full_band=full_band)
            # force checkpointing for every pair (ck = ceil(sqrt(T)))
            monkeypatch.setenv("OPAL_TPU_TB_FULL_CELLS", "1")
            ckpt = find_alignment(*args, full_band=full_band)
            assert ckpt[0] == full[0] == w.score
            assert (ckpt[1], ckpt[2]) == (full[1], full[2])
            np.testing.assert_array_equal(ckpt[3], full[3])
            n_checked += 1
    assert n_checked >= 4


def test_checkpointed_memory_shrinks(monkeypatch):
    """With checkpointing forced, the allocated window+checkpoint buffers
    must be far below the full band area."""
    if _native._get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(12)
    A = 20
    matrix = np.full((A, A), -2, np.int32)
    np.fill_diagonal(matrix, 5)
    Q = 600
    query = rng.integers(0, A, size=Q, dtype=np.uint8)
    target = rng.integers(0, A, size=3000, dtype=np.uint8)
    from opal_tpu.constants import SEARCH_SCORE_END
    from opal_tpu.result import SearchResult

    w = search_oracle(query, [target], 3, 1, matrix, MODE_SW,
                      SEARCH_SCORE_END)[0]
    monkeypatch.setenv("OPAL_TPU_TB_FULL_CELLS", "1")
    _native._work["size"] = 0
    _native._work["ksize"] = 0
    _native._work["H"] = _native._work["E"] = _native._work["F"] = None
    _native._work["Hk"] = _native._work["Ek"] = _native._work["Fk"] = None
    sq, st, ops = align_pair_reverse_trick(
        query, target, 3, 1, matrix, w.score,
        w.end_location_query, w.end_location_target, MODE_SW,
    )
    allocated = _native._work["size"] + _native._work["ksize"]
    assert allocated > 0, "native path did not run"
    full = (w.end_location_query + 1) * (w.end_location_target + 1)
    assert allocated < full / 5, (allocated, full)
    res = SearchResult(
        score_set=1, score=w.score,
        end_location_query=w.end_location_query,
        end_location_target=w.end_location_target,
        start_location_query=sq, start_location_target=st,
        alignment=ops, alignment_length=len(ops),
    )
    check_alignment(query, target, res, 3, 1, matrix, MODE_SW)


def test_replay_batch_matches_scalar_replay():
    """_replay_batch must equal _replay segment-by-segment, including
    empty paths and paths that walk out of the matrix (valid=False)."""
    import numpy as np

    from opal_tpu.traceback import _replay, _replay_batch

    rng = np.random.default_rng(99)
    A = 8
    matrix = rng.integers(-4, 6, size=(A, A)).astype(np.int64)
    query = rng.integers(0, A, size=60, dtype=np.uint8)
    targets, sq, st, ops_list = [], [], [], []
    for k in range(50):
        t = rng.integers(0, A, size=int(rng.integers(1, 80)), dtype=np.uint8)
        targets.append(t)
        n_ops = int(rng.integers(0, 50))
        ops_list.append(rng.integers(0, 4, size=n_ops).astype(np.uint8))
        sq.append(int(rng.integers(0, len(query))))
        st.append(int(rng.integers(0, len(t))))
    counts = np.array([len(o) for o in ops_list])
    cat = (np.concatenate(ops_list) if counts.sum()
           else np.zeros(0, np.uint8))
    scores, reqs, rets, valid = _replay_batch(
        query, targets, sq, st, cat, counts, 3, 1, matrix)
    for k in range(50):
        got = _replay(query, targets[k], sq[k], st[k], ops_list[k],
                      3, 1, matrix)
        if got[0] is None:
            assert not valid[k], k
        else:
            assert valid[k], (k, got)
            assert (scores[k], reqs[k], rets[k]) == got, (k, got)
