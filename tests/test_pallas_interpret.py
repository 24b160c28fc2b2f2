"""Pallas kernel logic validated on CPU via interpret mode.

The real kernels run only on TPU; interpret mode executes the same kernel
jaxpr on CPU so CI covers the kernel's tracker/masking/prefix-scan logic
against the oracle (slow — small shapes only)."""
import numpy as np
import pytest

from opal_tpu.constants import (
    MODE_HW,
    MODE_NW,
    MODE_OV,
    MODE_SW,
    SEARCH_SCORE,
    SEARCH_SCORE_END,
)
from opal_tpu.engine import pallas_kernels as pk
from opal_tpu.oracle import search_oracle

from util import random_problem

MODES = [MODE_SW, MODE_NW, MODE_HW, MODE_OV]


def run_kernel(mode, search_type, query, db, matrix, go, ge, B=128):
    import jax
    import jax.numpy as jnp

    Q = len(query)
    T = pk._round_up(max(len(s) for s in db), pk.T_CHUNK)
    letters = np.full((1, T, B), pk.PAD_LETTER, np.int8)
    lengths = np.zeros((1, 1, B), np.int32)
    for i, s in enumerate(db):
        letters[0, : len(s), i] = s
        lengths[0, 0, i] = len(s)
    qp = pk.prepare_qp(matrix[np.asarray(query, np.int64)].T, ge)
    fn = pk.build_pallas_score_fn(
        mode, search_type, Q, go, ge, B=B, interpret=True
    )
    tr = np.asarray(fn(
        jnp.asarray(qp, jnp.bfloat16),
        jnp.asarray(letters),
        jnp.asarray(lengths),
    ))
    return pk.finalize_trackers(
        tr[0], mode, search_type, Q, lengths[0, 0]
    )


@pytest.mark.parametrize("mode", MODES)
def test_interpret_scores_and_ends(mode):
    rng = np.random.default_rng(17 + mode)
    query, db, matrix = random_problem(
        rng, n_seqs=9, query_len=25, min_len=8, max_len=50
    )
    out = run_kernel(mode, SEARCH_SCORE_END, query, db, matrix, 3, 1)
    want = search_oracle(query, db, 3, 1, matrix, mode, SEARCH_SCORE_END)
    for i, w in enumerate(want):
        assert out["score"][i] == w.score, i
        if mode == MODE_SW and w.score == 0:
            continue
        assert out["end_q"][i] == w.end_location_query, i
        assert out["end_t"][i] == w.end_location_target, i


def test_interpret_score_only():
    rng = np.random.default_rng(3)
    query, db, matrix = random_problem(
        rng, n_seqs=5, query_len=20, min_len=10, max_len=40
    )
    out = run_kernel(MODE_SW, SEARCH_SCORE, query, db, matrix, 5, 2)
    want = search_oracle(query, db, 5, 2, matrix, MODE_SW, SEARCH_SCORE)
    for i, w in enumerate(want):
        assert out["score"][i] == w.score, i


@pytest.mark.parametrize("mode", MODES)
def test_interpret_ragged_stream(mode):
    """The production dispatch path (single ragged pallas_call with
    scalar-prefetched chunk metadata) on CPU via interpret mode."""
    from opal_tpu.engine.pallas_backend import PallasBackend
    from opal_tpu.engine.search import Engine, search_database

    rng = np.random.default_rng(23 + mode)
    query, db, matrix = random_problem(
        rng, n_seqs=40, query_len=21, min_len=5, max_len=150
    )
    eng = Engine(backend="pallas", block_size=16)
    eng._backend = PallasBackend(interpret=True)
    res = search_database(query, db, 3, 1, matrix, mode=mode,
                          search_type=SEARCH_SCORE_END, engine=eng)
    want = search_oracle(query, db, 3, 1, matrix, mode, SEARCH_SCORE_END)
    for i, (r, w) in enumerate(zip(res, want)):
        assert r.score == w.score, i
        if mode == MODE_SW and w.score == 0:
            continue
        assert (r.end_location_query, r.end_location_target) == (
            w.end_location_query, w.end_location_target), i


def test_interpret_ragged_with_flags():
    from opal_tpu.engine.pallas_backend import PallasBackend
    from opal_tpu.engine.search import Engine, search_database

    rng = np.random.default_rng(29)
    query, db, matrix = random_problem(
        rng, n_seqs=12, query_len=18, min_len=8, max_len=70
    )
    eng = Engine(backend="pallas", block_size=8, precision="adaptive")
    eng._backend = PallasBackend(interpret=True)
    res = search_database(query, db, 3, 1, matrix, mode=MODE_SW,
                          search_type=SEARCH_SCORE, engine=eng)
    want = search_oracle(query, db, 3, 1, matrix, MODE_SW, SEARCH_SCORE)
    assert [r.score for r in res] == [w.score for w in want]
    assert eng.last_search_stats is not None
    assert len(eng.last_search_stats["precision_bits"]) == len(db)


@pytest.mark.parametrize("go,ge", [(3, 1), (1, 1), (1, 0), (0, 0)])
def test_interpret_sw_end_tiebreaks(go, ge):
    """SW end tracking resolves ties per the reference (best score at the
    smallest end_t, then smallest end_q). The per-cell first-attainment
    scheme must survive tie-heavy inputs: a 3-letter alphabet with a
    0/1-valued matrix produces many equal-scoring cells, and go==ge==0 is
    the one config where pad-column F-chain values can TIE the best
    (emit-side c < len filter)."""
    rng = np.random.default_rng(101 + go * 7 + ge)
    n, A = 14, 3
    matrix = np.where(np.eye(A, dtype=np.int32), 2, 0).astype(np.int32)
    query = rng.integers(0, A, 30).astype(np.uint8)
    db = [rng.integers(0, A, int(rng.integers(4, 140))).astype(np.uint8)
          for _ in range(n)]
    out = run_kernel(MODE_SW, SEARCH_SCORE_END, query, db, matrix, go, ge)
    want = search_oracle(query, db, go, ge, matrix, MODE_SW,
                         SEARCH_SCORE_END)
    for i, w in enumerate(want):
        assert out["score"][i] == w.score, i
        if w.score == 0:
            continue
        assert (out["end_t"][i], out["end_q"][i]) == (
            w.end_location_target, w.end_location_query), i
