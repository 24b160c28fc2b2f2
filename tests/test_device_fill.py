"""Batched device alignment fill (engine/device_fill.py) bit-exactness.

The device path must reconstruct EXACTLY the paths the host per-pair
path produces (align_pair_reverse_trick -> find_alignment -> C fill) —
same ops byte-for-byte, same start coordinates — across modes, bands,
adversarial ties, and degenerate shapes; lanes it cannot handle must be
absent from its output (host fallback), never wrong.
"""
import numpy as np
import pytest

from opal_tpu.constants import (
    MODE_HW,
    MODE_NW,
    MODE_OV,
    MODE_SW,
    SEARCH_SCORE_END,
)
from opal_tpu.engine.device_fill import align_winners_device
from opal_tpu.engine.search import Engine, search_database_arrays
from opal_tpu.matrices import ScoreMatrix
from opal_tpu.traceback import AlignmentError, align_pair_reverse_trick


@pytest.fixture(scope="module")
def setup():
    sm = ScoreMatrix.blosum50()
    A = sm.matrix.shape[0]
    rng = np.random.default_rng(23)
    q = rng.integers(0, A - 4, size=90, dtype=np.uint8)
    db = [rng.integers(0, A - 4, size=int(rng.integers(4, 260)),
                       dtype=np.uint8) for _ in range(120)]
    # adversarial: repeats of query prefixes (ties), tiny targets
    for i in range(0, 120, 9):
        db[i] = q[: int(rng.integers(3, 90))].copy()
    db[5] = q[:1].copy()
    return sm, q, db


def _winners(q, db, sm, mode, engine):
    out = search_database_arrays(q, db, 3, 1, sm.matrix, mode=mode,
                                 search_type=SEARCH_SCORE_END,
                                 engine=engine)
    return [
        (i, int(out["score"][i]), int(out["end_q"][i]),
         int(out["end_t"][i]))
        for i in range(len(db))
        if not (mode == MODE_SW and out["score"][i] == 0)
    ]


@pytest.mark.parametrize("mode", [MODE_SW, MODE_NW, MODE_HW, MODE_OV])
def test_device_fill_matches_host_path(setup, mode):
    sm, q, db = setup
    eng = Engine(backend="xla", block_size=128)
    winners = _winners(q, db, sm, mode, eng)
    got = align_winners_device(q, db, 3, 1, sm.matrix, mode, winners,
                               lanes=64)
    n_checked = 0
    for i, score, eq, et in winners:
        try:
            want = align_pair_reverse_trick(
                q, db[i], 3, 1, sm.matrix, score, eq, et, mode)
        except AlignmentError:
            assert i not in got  # host can't either; device must skip
            continue
        if i not in got:
            continue  # fallback lane: host path will handle it
        sq, st, ops = got[i]
        assert (sq, st) == (want[0], want[1]), (mode, i)
        np.testing.assert_array_equal(ops, want[2], err_msg=f"m{mode} i{i}")
        n_checked += 1
    # the device path must actually cover the vast majority
    assert n_checked >= 0.9 * len(winners), (n_checked, len(winners))


def test_device_fill_gap_param_sweep(setup):
    """go/ge grids incl. go == ge (band math edge) and larger gaps."""
    sm, q, db = setup
    eng = Engine(backend="xla", block_size=128)
    for go, ge in ((5, 5), (10, 2), (1, 1), (7, 3)):
        out = search_database_arrays(q, db, go, ge, sm.matrix,
                                     mode=MODE_SW,
                                     search_type=SEARCH_SCORE_END,
                                     engine=eng)
        winners = [(i, int(out["score"][i]), int(out["end_q"][i]),
                    int(out["end_t"][i]))
                   for i in range(len(db)) if out["score"][i] > 0]
        got = align_winners_device(q, db, go, ge, sm.matrix, MODE_SW,
                                   winners, lanes=64)
        for i, score, eq, et in winners[:40]:
            if i not in got:
                continue
            want = align_pair_reverse_trick(
                q, db[i], go, ge, sm.matrix, score, eq, et, MODE_SW)
            assert (got[i][0], got[i][1]) == (want[0], want[1])
            np.testing.assert_array_equal(got[i][2], want[2])


@pytest.mark.parametrize("mode", [MODE_SW, MODE_NW, MODE_HW, MODE_OV])
def test_alignment_pass_env_knob(setup, monkeypatch, mode):
    """OPAL_TPU_DEVICE_FILL=1 routes alignment_pass through the device
    fill; whole search_database outputs must be identical to the host
    path, field by field."""
    from opal_tpu.constants import SEARCH_ALIGNMENT
    from opal_tpu.engine.search import search_database

    sm, q, db = setup
    eng = Engine(backend="xla", block_size=128)

    def run():
        return search_database(q, db, 3, 1, sm.matrix, mode=mode,
                               search_type=SEARCH_ALIGNMENT, engine=eng)

    monkeypatch.delenv("OPAL_TPU_DEVICE_FILL", raising=False)
    host = run()
    monkeypatch.setenv("OPAL_TPU_DEVICE_FILL", "1")
    dev = run()
    for a, b in zip(host, dev):
        assert (a.score, a.score_set) == (b.score, b.score_set)
        assert (a.start_location_query, a.start_location_target) == (
            b.start_location_query, b.start_location_target)
        assert (a.end_location_query, a.end_location_target) == (
            b.end_location_query, b.end_location_target)
        if a.alignment is None:
            assert b.alignment is None
        else:
            np.testing.assert_array_equal(a.alignment, b.alignment)


def test_device_fill_f32_matches_int32(setup, monkeypatch):
    """The f32 DP lane (2x VPU) must be bit-identical to int32 within
    its exactness gate (F32_BOUND)."""
    sm, q, db = setup
    eng = Engine(backend="xla", block_size=128)
    winners = _winners(q, db, sm, MODE_SW, eng)
    monkeypatch.setenv("OPAL_TPU_DEVICE_FILL_F32", "1")
    a = align_winners_device(q, db, 3, 1, sm.matrix, MODE_SW, winners,
                             lanes=64)
    monkeypatch.setenv("OPAL_TPU_DEVICE_FILL_F32", "0")
    b = align_winners_device(q, db, 3, 1, sm.matrix, MODE_SW, winners,
                             lanes=64)
    assert set(a) == set(b) and len(a) >= 0.9 * len(winners)
    for i in a:
        assert a[i][:2] == b[i][:2]
        np.testing.assert_array_equal(a[i][2], b[i][2])


def test_device_fill_rejects_ge_gt_go(setup):
    sm, q, db = setup
    assert align_winners_device(q, db, 1, 5, sm.matrix, MODE_SW,
                                [(0, 10, 5, 5)]) == {}
    assert align_winners_device(q, db, 0, 0, sm.matrix, MODE_SW,
                                [(0, 10, 5, 5)]) == {}
