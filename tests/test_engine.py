"""Randomized differential tests: batched engine vs scalar oracle
(the reference's load-bearing test idea, SURVEY.md §4 / src/test.cpp)."""
import numpy as np
import pytest

from opal_tpu.constants import (
    MODE_HW,
    MODE_NW,
    MODE_OV,
    MODE_SW,
    SEARCH_ALIGNMENT,
    SEARCH_SCORE,
    SEARCH_SCORE_END,
)
from opal_tpu.engine.search import Engine, search_database
from opal_tpu.oracle import search_oracle

from util import check_alignment, random_problem

MODES = [MODE_SW, MODE_NW, MODE_HW, MODE_OV]


@pytest.fixture(scope="module")
def engine():
    return Engine(backend="xla", block_size=16)


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("go,ge", [(3, 1), (11, 1), (5, 5), (1, 4)])
def test_scores_and_ends_vs_oracle(mode, go, ge, engine):
    rng = np.random.default_rng(1000 + mode * 10 + go)
    query, db, matrix = random_problem(
        rng, n_seqs=37, query_len=90, min_len=10, max_len=300
    )
    got = search_database(
        query, db, go, ge, matrix, mode=mode,
        search_type=SEARCH_SCORE_END, engine=engine,
    )
    want = search_oracle(query, db, go, ge, matrix, mode, SEARCH_SCORE_END)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g.score == w.score, f"seq {i}: score {g.score} != {w.score}"
        we_q = -1 if w.end_location_query is None else w.end_location_query
        assert g.end_location_query == we_q, f"seq {i} end_q"
        assert g.end_location_target == w.end_location_target or (
            mode == MODE_SW and g.score == 0
        ), f"seq {i} end_t"


@pytest.mark.parametrize("mode", MODES)
def test_score_only(mode, engine):
    rng = np.random.default_rng(5)
    query, db, matrix = random_problem(rng, n_seqs=21, query_len=50, max_len=150)
    got = search_database(
        query, db, 3, 1, matrix, mode=mode, search_type=SEARCH_SCORE, engine=engine
    )
    want = search_oracle(query, db, 3, 1, matrix, mode, SEARCH_SCORE)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g.score == w.score, f"seq {i}"
        assert g.end_location_query == -1
        assert g.start_location_query == -1
        assert g.alignment is None and g.alignment_length == -1


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("go,ge", [(3, 1), (11, 1), (5, 5)])
def test_alignment_validity(mode, go, ge, engine):
    """Full-alignment search: ops replay to the reported score/locations."""
    rng = np.random.default_rng(2000 + mode)
    query, db, matrix = random_problem(
        rng, n_seqs=17, query_len=60, min_len=15, max_len=200
    )
    got = search_database(
        query, db, go, ge, matrix, mode=mode,
        search_type=SEARCH_ALIGNMENT, engine=engine,
    )
    want = search_oracle(query, db, go, ge, matrix, mode, SEARCH_SCORE_END)
    n_checked = 0
    for i, (g, w, t) in enumerate(zip(got, want, db)):
        assert g.score == w.score, f"seq {i}"
        if mode == MODE_SW and g.score == 0:
            assert g.alignment is None
            continue
        check_alignment(query, t, g, go, ge, matrix, mode)
        n_checked += 1
    assert n_checked > 0


def test_skip_semantics(engine):
    """Pre-filled results are not recomputed; their values feed the
    alignment pass (reference: src/opal.h:118-122)."""
    rng = np.random.default_rng(77)
    query, db, matrix = random_problem(rng, n_seqs=9, query_len=40, max_len=80)
    first = search_database(
        query, db, 3, 1, matrix, mode=MODE_SW,
        search_type=SEARCH_SCORE_END, engine=engine,
    )
    # Poison one result: if skip works, the poisoned score survives and the
    # alignment pass uses it (we pick a real score from another sequence so
    # the traceback still succeeds).
    donor = max(range(len(db)), key=lambda i: first[i].score)
    reused = search_database(
        query, db, 3, 1, matrix, mode=MODE_SW,
        search_type=SEARCH_SCORE_END, engine=engine, results=first,
    )
    assert reused is first
    # Now run ALIGNMENT with prefilled results: should not change scores.
    before = [r.score for r in first]
    out = search_database(
        query, db, 3, 1, matrix, mode=MODE_SW,
        search_type=SEARCH_ALIGNMENT, engine=engine, results=first,
    )
    assert [r.score for r in out] == before
    for r, t in zip(out, db):
        if r.score > 0:
            check_alignment(query, t, r, 3, 1, matrix, MODE_SW)


def test_single_sequence_and_tiny(engine):
    """Edge shapes: single-letter query/target, single-sequence DB."""
    matrix = np.array([[2, -1], [-1, 2]], dtype=np.int32)
    query = np.array([0], dtype=np.uint8)
    db = [np.array([0], dtype=np.uint8), np.array([1], dtype=np.uint8)]
    for mode in MODES:
        got = search_database(
            query, db, 3, 1, matrix, mode=mode,
            search_type=SEARCH_SCORE_END, engine=engine,
        )
        want = search_oracle(query, db, 3, 1, matrix, mode, SEARCH_SCORE_END)
        for g, w in zip(got, want):
            assert g.score == w.score


def test_readme_toy_example(engine):
    """The reference README's 4-sequence usage example
    (reference: README.md:33-69: SW, alphabet 4, gaps 3/1); expected scores
    verified against the reference library."""
    matrix = np.array(
        [2, -1, -3, 0, -1, 4, -5, -1, -3, -5, 1, -10, 0, -1, -10, 4],
        dtype=np.int32,
    ).reshape(4, 4)
    query = np.array([0, 1, 3, 2, 1, 0, 3, 0, 1, 1], dtype=np.uint8)
    db = [
        np.array([1, 3, 2, 3, 0, 0, 1, 0, 2, 2, 1, 2, 3, 2], dtype=np.uint8),
        np.array([2, 1, 1, 3, 2, 0, 0, 2, 2, 0, 2, 1], dtype=np.uint8),
        np.array([0, 0, 2, 1, 0, 3, 1, 1, 2, 3, 2, 1, 0], dtype=np.uint8),
        np.array([2, 3, 3, 3, 1, 1, 2, 2, 0], dtype=np.uint8),
    ]
    got = search_database(
        query, db, 3, 1, matrix, mode=MODE_SW,
        search_type=SEARCH_SCORE, engine=engine,
    )
    assert [r.score for r in got] == [14, 10, 16, 12]


def test_long_query_lane_width_downshift(monkeypatch):
    """Queries whose DP state overflows VMEM at the configured lane width
    stay on the pallas path: by default via query-panel streaming at FULL
    width; under OPAL_TPU_NO_PANELS=1 via the legacy lane-width downshift.
    Budget shrunk so a small query triggers it."""
    from opal_tpu.engine import pallas_kernels as pk
    from opal_tpu.engine.pallas_backend import PallasBackend

    monkeypatch.setattr(pk, "VMEM_STATE_BUDGET", 131072)
    backend = PallasBackend(interpret=True)
    # Q_pad=48 state fits at B=128 (max_q_pad=80) but not 512 (16)
    assert pk.max_q_pad(512, 3) < 48 <= pk.max_q_pad(128, 3)
    # default policy: stay at full width, stream query panels
    assert backend.preferred_block_size(40, 3, 1, 4, 3, 3, 512) == 512
    # legacy policy (A/B escape hatch): downshift the lane width; run the
    # rest of the test under it (the panel path e2e is test_panels.py)
    monkeypatch.setenv("OPAL_TPU_NO_PANELS", "1")
    assert backend.preferred_block_size(40, 3, 1, 4, 3, 3, 512) == 128

    eng = Engine(backend="pallas", block_size=512)
    eng._backend = backend
    rng = np.random.default_rng(5)
    query, db, matrix = random_problem(
        rng, n_seqs=12, query_len=40, min_len=5, max_len=70)
    res = search_database(query, db, 3, 1, matrix, mode=MODE_SW,
                          search_type=SEARCH_SCORE_END, engine=eng)
    want = search_oracle(query, db, 3, 1, matrix, MODE_SW, SEARCH_SCORE_END)
    for i, (r, w) in enumerate(zip(res, want)):
        assert r.score == w.score, i
    # the resident cache must hold the re-blocked width (SW score+end
    # needs 4 state arrays — H, E, m, c: Q_pad=48 first fits at B=128)
    per_b, = eng._resident_cache.values()
    assert 128 in per_b and per_b[128].block_size == 128


def test_pipelined_multipart_gather(monkeypatch):
    """The split-stream gather (payload pipelining) must produce identical
    results to the single-launch path, including block->sequence mapping."""
    from opal_tpu.engine.pallas_backend import PallasBackend

    backend = PallasBackend(interpret=True)
    monkeypatch.setattr(PallasBackend, "SPLIT_PAYLOAD_BYTES", 64)
    eng = Engine(backend="pallas", block_size=16)
    eng._backend = backend
    rng = np.random.default_rng(11)
    query, db, matrix = random_problem(
        rng, n_seqs=150, query_len=30, min_len=5, max_len=90)
    res = search_database(query, db, 3, 1, matrix, mode=MODE_SW,
                          search_type=SEARCH_SCORE_END, engine=eng)
    want = search_oracle(query, db, 3, 1, matrix, MODE_SW, SEARCH_SCORE_END)
    for i, (r, w) in enumerate(zip(res, want)):
        assert r.score == w.score, i
        if w.score != 0:
            assert (r.end_location_query, r.end_location_target) == (
                w.end_location_query, w.end_location_target), i
    # confirm the dispatch actually split
    ddb = eng._get_resident(db)
    assert len(ddb.flat_parts(4)) > 1


def test_empty_db_and_full_skip_edges(engine):
    """Empty databases and fully-skipped searches must not crash, for all
    search types including align_top_k."""
    matrix = np.array([[2, -1], [-1, 2]], dtype=np.int32)
    query = np.array([0, 1, 0], dtype=np.uint8)
    out = search_database(query, [], 3, 1, matrix, mode=MODE_SW,
                          search_type=SEARCH_ALIGNMENT, engine=engine,
                          align_top_k=5)
    assert out == []
    db = [np.array([0, 1], dtype=np.uint8)]
    pre = search_database(query, db, 3, 1, matrix, mode=MODE_SW,
                          search_type=SEARCH_SCORE_END, engine=engine)
    again = search_database(query, db, 3, 1, matrix, mode=MODE_SW,
                            search_type=SEARCH_ALIGNMENT, engine=engine,
                            results=pre, align_top_k=1)
    assert again[0].score == pre[0].score


def test_narrow_width_ceiling_capped():
    """B=128 long-query configs are capped at the validated 3-array VMEM
    envelope regardless of how few state arrays the config needs (compiler
    temporaries bind before the state budget there)."""
    from opal_tpu.engine import pallas_kernels as pk

    assert pk.max_q_pad(128, 2) == pk.max_q_pad(128, 3)
    assert pk.max_q_pad(256, 2) > pk.max_q_pad(256, 3)


def test_resident_cache_detects_inplace_mutation():
    """The resident-DB cache must not serve stale letters after the caller
    mutates the same list object in place (and, by the same fingerprint,
    after id() reuse of an equal-length list)."""
    rng = np.random.default_rng(77)
    query, db, matrix = random_problem(
        rng, n_seqs=8, query_len=30, min_len=10, max_len=60
    )
    eng = Engine(backend="xla", block_size=4)
    first = search_database(query, db, 3, 1, matrix, engine=eng)
    # mutate sequence 0 in place: same list id, same length
    db[0] = db[0].copy()
    db[0][:] = (db[0] + 1) % matrix.shape[0]
    second = search_database(query, db, 3, 1, matrix, engine=eng)
    want = search_oracle(query, db, 3, 1, matrix, MODE_SW, SEARCH_SCORE)
    assert second[0].score == want[0].score
    # and a genuinely different equal-length list is never served stale
    db2 = [d.copy() for d in db]
    db2[1][:] = (db2[1] + 2) % matrix.shape[0]
    third = search_database(query, db2, 3, 1, matrix, engine=eng)
    want2 = search_oracle(query, db2, 3, 1, matrix, MODE_SW, SEARCH_SCORE)
    assert [r.score for r in third] == [w.score for w in want2]


def test_resident_cache_lru_multi_db(monkeypatch):
    """Alternating between a few DBs through the convenience API must NOT
    re-upload on every call: the resident cache is a bounded LRU (size 4),
    not a single slot."""
    from opal_tpu.engine import device_db as ddb_mod
    from opal_tpu.engine import search as search_mod

    rng = np.random.default_rng(88)
    query, dbA, matrix = random_problem(
        rng, n_seqs=6, query_len=24, min_len=10, max_len=40
    )
    dbB = [d.copy() for d in dbA]
    dbB[0][:] = (dbB[0] + 1) % matrix.shape[0]

    uploads = []
    real_init = ddb_mod.DeviceDatabase.__init__

    def counting_init(self, db, *a, **kw):
        uploads.append(len(db))
        return real_init(self, db, *a, **kw)

    monkeypatch.setattr(ddb_mod.DeviceDatabase, "__init__", counting_init)
    eng = Engine(backend="xla", block_size=4)
    for _ in range(3):  # alternate A/B three times
        ra = search_database(query, dbA, 3, 1, matrix, engine=eng)
        rb = search_database(query, dbB, 3, 1, matrix, engine=eng)
    assert len(uploads) == 2, f"expected 2 uploads, saw {len(uploads)}"
    wa = search_oracle(query, dbA, 3, 1, matrix, MODE_SW, SEARCH_SCORE)
    wb = search_oracle(query, dbB, 3, 1, matrix, MODE_SW, SEARCH_SCORE)
    assert [r.score for r in ra] == [w.score for w in wa]
    assert [r.score for r in rb] == [w.score for w in wb]
    # eviction: pushing >4 distinct DBs drops the oldest, keeps the cache
    # bounded, and a re-search of an evicted DB still returns right answers
    dbs = []
    for k in range(5):
        dbk = [d.copy() for d in dbA]
        dbk[1][:] = (dbk[1] + k + 2) % matrix.shape[0]
        dbs.append(dbk)
        search_database(query, dbk, 3, 1, matrix, engine=eng)
    assert len(eng._resident_cache) == search_mod._RESIDENT_LRU_SIZE
    again = search_database(query, dbA, 3, 1, matrix, engine=eng)  # evicted
    assert [r.score for r in again] == [w.score for w in wa]
