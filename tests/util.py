"""Shared test helpers: random problem generation (mirroring the reference
self-test's setup, reference: src/test.cpp:35-54) and the alignment replay
checker (reference: checkAlignment, src/test.cpp:348-422)."""
from __future__ import annotations

import numpy as np

from opal_tpu.constants import (
    ALIGN_DEL,
    ALIGN_INS,
    ALIGN_MATCH,
    ALIGN_MISMATCH,
    MODE_NW,
    MODE_HW,
)


def random_problem(
    rng: np.random.Generator,
    n_seqs: int = 30,
    query_len: int = 120,
    min_len: int = 20,
    max_len: int = 400,
    alphabet_len: int = 4,
    match: int = 3,
    mismatch: int = -1,
):
    """Random query/db/matrix in the style of the reference self-test:
    simple +match/-mismatch matrix, uniform random sequences."""
    query = rng.integers(0, alphabet_len, size=query_len, dtype=np.uint8)
    db = [
        rng.integers(
            0, alphabet_len, size=int(rng.integers(min_len, max_len + 1)),
            dtype=np.uint8,
        )
        for _ in range(n_seqs)
    ]
    matrix = np.full((alphabet_len, alphabet_len), mismatch, dtype=np.int32)
    np.fill_diagonal(matrix, match)
    return query, db, matrix


def check_alignment(query, target, res, gap_open, gap_ext, matrix, mode):
    """Replay the op string and verify its internal consistency: moves stay
    in-matrix, MATCH/MISMATCH agree with letter equality, replayed end equals
    the reported end, and the recomputed affine-gap score equals the reported
    score. Port of checkAlignment (reference: src/test.cpp:348-422)."""
    q = np.asarray(query)
    t = np.asarray(target)
    ops = res.alignment
    assert ops is not None and len(ops) == res.alignment_length
    r = res.start_location_query
    c = res.start_location_target
    assert 0 <= r < len(q) and 0 <= c < len(t), (r, c)

    score = 0
    prev = None
    qi, ti = r, c
    for k, op in enumerate(ops):
        if op in (ALIGN_MATCH, ALIGN_MISMATCH, ALIGN_DEL):
            assert qi < len(q), f"op {k} leaves the matrix (query)"
        if op in (ALIGN_MATCH, ALIGN_MISMATCH, ALIGN_INS):
            assert ti < len(t), f"op {k} leaves the matrix (target)"
        if op in (ALIGN_MATCH, ALIGN_MISMATCH):
            same = q[qi] == t[ti]
            assert (op == ALIGN_MATCH) == bool(same), f"op {k} letter mismatch"
            score += int(matrix[q[qi], t[ti]])
            qi += 1
            ti += 1
        elif op == ALIGN_DEL:
            score -= gap_open if prev != ALIGN_DEL else gap_ext
            qi += 1
        elif op == ALIGN_INS:
            score -= gap_open if prev != ALIGN_INS else gap_ext
            ti += 1
        else:
            raise AssertionError(f"bad op {op}")
        prev = op

    assert qi - 1 == res.end_location_query, (qi - 1, res.end_location_query)
    assert ti - 1 == res.end_location_target, (ti - 1, res.end_location_target)
    # Free end-gaps never appear in the op string; the score must match for
    # every mode since NW/HW op strings span the penalized regions fully.
    assert score == res.score, (score, res.score)
    # Mode-specific span checks.
    if mode == MODE_NW:
        assert r == 0 and c == 0
        assert qi == len(q) and ti == len(t)
    if mode == MODE_HW:
        assert r == 0 and qi == len(q)
