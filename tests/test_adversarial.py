"""Adversarial property tests for the kernel's exactness arguments:
algebraic padding (PAD_LETTER), segment isolation (SEG_M offsets), the bf16
profile gate, and chunk/block boundary shapes. Each targets a specific
potential leak the proofs rely on excluding."""
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
from opal_tpu.engine.pallas_backend import PallasBackend
from opal_tpu.engine.search import (
    Engine,
    search_database,
    search_database_multi_arrays,
)
from opal_tpu.oracle import search_oracle

MODES = [MODE_SW, MODE_NW, MODE_HW, MODE_OV]


def _engine():
    eng = Engine(backend="pallas", block_size=32)
    eng._backend = PallasBackend(interpret=True)
    return eng


def test_segment_isolation_no_score_leakage():
    """q1 aligns perfectly everywhere (huge scores); q2 matches nothing.
    If F/diag leaked across the segment boundary, q2's scores would be
    inflated by q1's DP values."""
    A = 4
    matrix = np.full((A, A), -3, np.int32)
    np.fill_diagonal(matrix, 9)
    db = [np.zeros(120, np.uint8) for _ in range(10)]  # all letter 0
    q_hot = np.zeros(90, np.uint8)          # 90 * 9 = 810 score everywhere
    q_cold = np.full(40, 1, np.uint8)       # only mismatches
    eng = _engine()
    for order in ([q_hot, q_cold], [q_cold, q_hot]):
        outs = search_database_multi_arrays(order, db, 3, 1, matrix,
                                            engine=eng)
        for q, out in zip(order, outs):
            want = search_oracle(q, db, 3, 1, matrix, MODE_SW, SEARCH_SCORE)
            np.testing.assert_array_equal(
                out["score"], [r.score for r in want]
            )


@pytest.mark.parametrize("mode", MODES)
def test_segment_isolation_all_modes_adjacent_extremes(mode):
    rng = np.random.default_rng(101 + mode)
    A = 6
    matrix = rng.integers(-6, 3, size=(A, A), dtype=np.int32)
    np.fill_diagonal(matrix, 11)
    db = [rng.integers(0, A, size=int(rng.integers(3, 140)), dtype=np.uint8)
          for _ in range(14)]
    # lengths around the 16-row segment quantum: 15/16/17 stress boundaries
    queries = [rng.integers(0, A, size=n, dtype=np.uint8)
               for n in (15, 16, 17, 31)]
    eng = _engine()
    outs = search_database_multi_arrays(queries, db, 5, 2, matrix,
                                        mode=mode, engine=eng)
    for q, out in zip(queries, outs):
        want = search_oracle(q, db, 5, 2, matrix, mode, SEARCH_SCORE)
        np.testing.assert_array_equal(out["score"], [r.score for r in want])


def test_bf16_gate_boundary_matrices():
    """Matrix entries at the bf16-exactness edge: 255 (+ge=1 => 256, still
    exact, pallas path) and 256 (+ge => 257, must fall back to XLA).
    Both must be exact."""
    rng = np.random.default_rng(7)
    A = 4
    db = [rng.integers(0, A, size=50, dtype=np.uint8) for _ in range(6)]
    q = rng.integers(0, A, size=20, dtype=np.uint8)
    for diag in (255, 256):
        matrix = np.full((A, A), -1, np.int32)
        np.fill_diagonal(matrix, diag)
        eng = _engine()
        res = search_database(q, db, 3, 1, matrix, mode=MODE_SW,
                              search_type=SEARCH_SCORE, engine=eng)
        want = search_oracle(q, db, 3, 1, matrix, MODE_SW, SEARCH_SCORE)
        assert [r.score for r in res] == [w.score for w in want], diag


@pytest.mark.parametrize("mode", MODES)
def test_chunk_and_block_boundary_lengths(mode):
    """Target lengths exactly at/around the T_CHUNK quantum and DB sizes
    at/around the lane width: padding/reset logic edges."""
    rng = np.random.default_rng(55 + mode)
    A = 8
    matrix = rng.integers(-4, 7, size=(A, A), dtype=np.int32)
    q = rng.integers(0, A, size=23, dtype=np.uint8)
    db = [rng.integers(0, A, size=n, dtype=np.uint8)
          for n in (63, 64, 65, 127, 128, 129, 1, 2)]
    db = db * 5  # 40 seqs over a 32-lane block: one full + one partial block
    eng = _engine()
    res = search_database(q, db, 2, 1, matrix, mode=mode,
                          search_type=SEARCH_SCORE_END, engine=eng)
    want = search_oracle(q, db, 2, 1, matrix, mode, SEARCH_SCORE_END)
    for i, (r, w) in enumerate(zip(res, want)):
        assert r.score == w.score, i
        if not (mode == MODE_SW and w.score == 0):
            assert (r.end_location_query, r.end_location_target) == (
                w.end_location_query, w.end_location_target), i


def test_pad_row_no_leak_query_at_quantum_edge():
    """Query length 15 in a 16-row pad: the single pad row sits directly
    above real DP rows of the next... (single-query case: above nothing) —
    its F values must never surface in the score."""
    rng = np.random.default_rng(9)
    A = 4
    matrix = np.full((A, A), -2, np.int32)
    np.fill_diagonal(matrix, 13)  # big matches make pad-row F values large
    q = rng.integers(0, A, size=15, dtype=np.uint8)
    db = [rng.integers(0, A, size=n, dtype=np.uint8) for n in (40, 64, 100)]
    eng = _engine()
    for mode in MODES:
        res = search_database(q, db, 1, 1, matrix, mode=mode,
                              search_type=SEARCH_SCORE, engine=eng)
        want = search_oracle(q, db, 1, 1, matrix, mode, SEARCH_SCORE)
        assert [r.score for r in res] == [w.score for w in want], mode
