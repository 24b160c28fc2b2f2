"""SW score+end packed-key scheme (pallas_kernels.sw_end_packed_ok).

The packed scheme folds the per-cell (running max, first-attainment
column) pair into one f32 key per cell plus a once-per-chunk merge into
[1, B] lane trackers. These tests pin its exactness against both the
scalar oracle and the classic per-cell (m, c) scheme, on the tie-heavy
shapes where the reference tie-break (best score at smallest end_t, then
smallest end_q — reference: src/opal.h:44-46) actually bites: plateaus
from zero gap penalties, 0/1 matrices, and sequences spanning T_CHUNK
boundaries.
"""
import numpy as np
import pytest

from opal_tpu.constants import MODE_SW, SEARCH_SCORE_END
from opal_tpu.engine import pallas_kernels as pk
from opal_tpu.engine.pallas_backend import PallasBackend
from opal_tpu.engine.search import Engine, search_database
from opal_tpu.oracle import search_oracle


def _engine(B=8):
    eng = Engine(backend="pallas", block_size=B)
    eng._backend = PallasBackend(interpret=True)
    return eng


def _run(query, db, go, ge, matrix, scheme, monkeypatch):
    monkeypatch.setenv("OPAL_TPU_SW_END_PACKED", scheme)
    res = search_database(query, db, go, ge, matrix, mode=MODE_SW,
                          search_type=SEARCH_SCORE_END, engine=_engine())
    return [(r.score, r.end_location_query, r.end_location_target)
            for r in res]


def test_gate_and_state_arrays():
    # within the f32 exactness bound -> packed; beyond -> classic
    assert pk.sw_end_packed_ok(110, 15, 1)
    assert pk.sw_end_packed_ok(513, 15, 1)
    assert not pk.sw_end_packed_ok(40000, 15, 1)  # titin x BLOSUM
    assert not pk.sw_end_packed_ok(1000, 300, 1)  # huge matrix entries
    # packed drops the 4th VMEM state array (c), restoring score-only's 3
    assert pk.n_state_arrays(MODE_SW, SEARCH_SCORE_END, False, True) == 3
    assert pk.n_state_arrays(MODE_SW, SEARCH_SCORE_END, False, False) == 4


def test_plateau_spanning_chunks(monkeypatch):
    # go == ge == 0 with an all-match pair: H plateaus at the maximum from
    # column Q-1 through the end of a 100-column sequence (crossing the
    # T_CHUNK=64 boundary); first attainment must be kept across the
    # chunk-boundary merge.
    A = 2
    matrix = np.array([[2, -1], [-1, 2]], np.int32)
    query = np.zeros(20, np.uint8)
    db = [np.zeros(100, np.uint8), np.zeros(63, np.uint8),
          np.zeros(64, np.uint8), np.zeros(65, np.uint8)]
    for scheme in ("1", "0"):
        got = _run(query, db, 0, 0, matrix, scheme, monkeypatch)
        want = search_oracle(query, db, 0, 0, matrix, MODE_SW,
                             SEARCH_SCORE_END)
        for i, w in enumerate(want):
            assert got[i] == (w.score, w.end_location_query,
                              w.end_location_target), (scheme, i)


def test_packed_matches_classic_and_oracle_tie_heavy(monkeypatch):
    rng = np.random.default_rng(20260817)
    for trial in range(12):
        A = 2
        # 0/1-scored matrices + tiny/zero gaps maximize score plateaus
        matrix = np.array([[1, 0], [0, 1]], np.int32) if trial % 2 else \
            np.array([[2, -1], [-1, 1]], np.int32)
        go, ge = [(1, 1), (0, 0), (2, 1)][trial % 3]
        Q = (17, 64)[trial % 2]
        query = rng.integers(0, A, size=Q, dtype=np.uint8)
        db = [rng.integers(0, A, size=int(m), dtype=np.uint8)
              for m in rng.integers(1, 140, size=8)]
        packed = _run(query, db, go, ge, matrix, "1", monkeypatch)
        classic = _run(query, db, go, ge, matrix, "0", monkeypatch)
        assert packed == classic, trial
        want = search_oracle(query, db, go, ge, matrix, MODE_SW,
                             SEARCH_SCORE_END)
        for i, w in enumerate(want):
            assert packed[i][0] == w.score, (trial, i)
            if w.score > 0:
                assert packed[i][1:] == (w.end_location_query,
                                         w.end_location_target), (trial, i)


def test_zero_score_lanes_agree(monkeypatch):
    matrix = np.full((2, 2), -5, np.int32)
    query = np.ones(17, np.uint8)
    db = [np.zeros(70, np.uint8), np.zeros(3, np.uint8)]
    packed = _run(query, db, 1, 1, matrix, "1", monkeypatch)
    classic = _run(query, db, 1, 1, matrix, "0", monkeypatch)
    assert packed == classic
    assert all(s == 0 for s, _, _ in packed)
