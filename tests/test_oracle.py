"""Oracle self-consistency: the vectorized oracle must equal the scalar
cell-loop transcription of the DP for all modes and gap configurations
(including gap_ext > gap_open, which exercises the fallback path)."""
import numpy as np
import pytest

from opal_tpu.constants import MODE_HW, MODE_NW, MODE_OV, MODE_SW
from opal_tpu.oracle import dp_matrix, dp_matrix_slow

from util import random_problem

MODES = [MODE_SW, MODE_NW, MODE_HW, MODE_OV]


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("go,ge", [(3, 1), (11, 1), (5, 5), (1, 4), (0, 0)])
def test_vectorized_oracle_matches_scalar(mode, go, ge):
    rng = np.random.default_rng(42 + mode)
    query, db, matrix = random_problem(rng, n_seqs=4, query_len=33, max_len=60)
    for target in db:
        fast = dp_matrix(query, target, go, ge, matrix, mode)
        slow = dp_matrix_slow(query, target, go, ge, matrix, mode)
        np.testing.assert_array_equal(fast, slow)


@pytest.mark.parametrize("mode", MODES)
def test_oracle_blosum(mode, blosum50):
    rng = np.random.default_rng(7)
    q = rng.integers(0, 24, size=40, dtype=np.uint8)
    t = rng.integers(0, 24, size=70, dtype=np.uint8)
    fast = dp_matrix(q, t, 3, 1, blosum50.matrix, mode)
    slow = dp_matrix_slow(q, t, 3, 1, blosum50.matrix, mode)
    np.testing.assert_array_equal(fast, slow)
