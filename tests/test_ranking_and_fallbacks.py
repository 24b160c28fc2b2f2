"""Ranking utilities and engine fallback paths (long queries, ge > go)."""
import numpy as np
import pytest

from opal_tpu.constants import MODE_SW, SEARCH_SCORE, SEARCH_SCORE_END
from opal_tpu.engine.search import Engine, search_database
from opal_tpu.oracle import search_oracle
from opal_tpu.ranking import merge_shard_scores, rank_scores, top_k_results

from util import random_problem


def test_rank_scores_deterministic():
    s = np.array([5, 9, 9, 1, 9])
    order = rank_scores(s)
    assert order.tolist() == [1, 2, 4, 0, 3]  # ties by original index
    assert rank_scores(s, top_k=2).tolist() == [1, 2]


def test_top_k_results():
    from opal_tpu.result import SearchResult

    rs = []
    for sc in (3, 7, 7, 1):
        r = SearchResult()
        r.set_score(sc)
        rs.append(r)
    top = top_k_results(rs, 2)
    assert [i for i, _ in top] == [1, 2]


def test_merge_shard_scores():
    rows = [np.array([5, 2, -(2**31)]), np.array([7, -(2**31), -(2**31)])]
    merged = merge_shard_scores(rows, [2, 1])
    assert merged.tolist() == [5, 2, 7]


def test_ge_greater_than_go_fallback():
    """gap_ext > gap_open invalidates the prefix-scan rewrite; the engine
    must route to the sequential path and stay correct."""
    rng = np.random.default_rng(8)
    query, db, matrix = random_problem(
        rng, n_seqs=7, query_len=30, min_len=10, max_len=60
    )
    eng = Engine(backend="xla", block_size=8)
    got = search_database(
        query, db, 1, 4, matrix, mode=MODE_SW,
        search_type=SEARCH_SCORE_END, engine=eng,
    )
    want = search_oracle(query, db, 1, 4, matrix, MODE_SW, SEARCH_SCORE_END)
    for g, w in zip(got, want):
        assert g.score == w.score


def test_pallas_backend_fallback_paths():
    """PallasBackend.supports gates the kernel; unsupported configs route
    through the XLA twin (verified on CPU via the backend object)."""
    from opal_tpu.engine.pallas_backend import PallasBackend

    b = PallasBackend()
    assert not b.supports(Q=30, gap_open=1, gap_ext=4)    # ge > go
    assert not b.supports(Q=5000, gap_open=3, gap_ext=1)  # query too long
    assert b.supports(Q=512, gap_open=3, gap_ext=1)
    qprep = b.prepare_query(np.zeros((4, 30), np.int32), 1, 4)
    assert qprep[0] == "xla"
