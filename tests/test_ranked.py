"""Device-side top-k ranked emission (engine/ranked.py).

The ranked path must select EXACTLY the rows host ranking selects —
including the reference tie-break (score desc, DB index asc) under
adversarial score ties — across backends, modes, stream parts, stacked
multi-query launches, and mesh shards.
"""
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
from opal_tpu.engine.search import (
    Engine,
    search_database_arrays,
    search_database_multi_arrays,
)
from opal_tpu.matrices import ScoreMatrix
from opal_tpu.ranking import rank_scores


@pytest.fixture(scope="module")
def setup():
    sm = ScoreMatrix.blosum50()
    A = sm.matrix.shape[0]
    rng = np.random.default_rng(41)
    db = [
        rng.integers(0, A - 4, size=int(rng.integers(5, 150)),
                     dtype=np.uint8)
        for _ in range(400)
    ]
    q = rng.integers(0, A - 4, size=64, dtype=np.uint8)
    return sm, db, q, rng


def _check(full, ranked, k, track_end):
    order = rank_scores(full["score"], k)
    np.testing.assert_array_equal(ranked["index"], order)
    np.testing.assert_array_equal(ranked["score"], full["score"][order])
    if track_end:
        np.testing.assert_array_equal(ranked["end_q"], full["end_q"][order])
        np.testing.assert_array_equal(ranked["end_t"], full["end_t"][order])


@pytest.mark.parametrize("mode", [MODE_SW, MODE_NW, MODE_HW, MODE_OV])
@pytest.mark.parametrize("st", [SEARCH_SCORE, SEARCH_SCORE_END])
def test_topk_matches_host_ranking_interpret(setup, mode, st):
    sm, db, q, _ = setup
    eng = Engine(backend="pallas-interpret", block_size=128)
    full = search_database_arrays(q, db, 3, 1, sm.matrix, mode=mode,
                                  search_type=st, engine=eng)
    ranked = search_database_arrays(q, db, 3, 1, sm.matrix, mode=mode,
                                    search_type=st, engine=eng, top_k=21)
    _check(full, ranked, 21, st != SEARCH_SCORE)


def test_topk_tie_break_and_k_edges(setup):
    """Adversarial ties: identical sequences must rank by DB index asc;
    k spanning the tie class, k > n, and k == 1 all stay exact."""
    sm, _, q, rng = setup
    A = sm.matrix.shape[0]
    base = rng.integers(0, A - 4, size=40, dtype=np.uint8)
    db = [base.copy() for _ in range(120)] + [
        rng.integers(0, A - 4, size=int(rng.integers(5, 120)),
                     dtype=np.uint8)
        for _ in range(150)
    ]
    order = rng.permutation(len(db))
    db = [db[i] for i in order]
    eng = Engine(backend="pallas-interpret", block_size=128)
    full = search_database_arrays(q, db, 3, 1, sm.matrix, mode=MODE_SW,
                                  search_type=SEARCH_SCORE_END, engine=eng)
    for k in (1, 50, 119, 120, 121, 270, 1000):
        ranked = search_database_arrays(
            q, db, 3, 1, sm.matrix, mode=MODE_SW,
            search_type=SEARCH_SCORE_END, engine=eng, top_k=k)
        _check(full, ranked, k, True)
        assert len(ranked["index"]) == min(k, len(db))


def test_topk_xla_backend_host_fallback(setup):
    """The XLA backend has no device tracker layout; top_k must fall back
    to host ranking with identical output shape and content."""
    sm, db, q, _ = setup
    eng = Engine(backend="xla", block_size=128)
    full = search_database_arrays(q, db, 3, 1, sm.matrix, mode=MODE_SW,
                                  search_type=SEARCH_SCORE_END, engine=eng)
    ranked = search_database_arrays(q, db, 3, 1, sm.matrix, mode=MODE_SW,
                                    search_type=SEARCH_SCORE_END,
                                    engine=eng, top_k=13)
    _check(full, ranked, 13, True)


@pytest.mark.parametrize("st", [SEARCH_SCORE, SEARCH_SCORE_END])
def test_topk_multi_query_stacked(setup, st):
    """Stacked multi-query launches rank per segment on device."""
    sm, db, q, rng = setup
    A = sm.matrix.shape[0]
    qs = [rng.integers(0, A - 4, size=int(L), dtype=np.uint8)
          for L in (30, 45, 60, 33)]
    eng = Engine(backend="pallas-interpret", block_size=128)
    fulls = search_database_multi_arrays(qs, db, 3, 1, sm.matrix,
                                         mode=MODE_SW, search_type=st,
                                         engine=eng)
    rankeds = search_database_multi_arrays(qs, db, 3, 1, sm.matrix,
                                           mode=MODE_SW, search_type=st,
                                           engine=eng, top_k=9)
    for full, ranked in zip(fulls, rankeds):
        _check(full, ranked, 9, st != SEARCH_SCORE)


@pytest.mark.parametrize("mode", [MODE_SW, MODE_OV])
def test_topk_mesh_sharded(setup, mode):
    """Per-device selection under shard_map + host union merge is exact
    on the 8-virtual-device mesh."""
    import jax
    from jax.sharding import Mesh

    from opal_tpu.parallel.shard import DB_AXIS

    sm, db, q, _ = setup
    mesh = Mesh(np.array(jax.devices()), (DB_AXIS,))
    eng = Engine(backend="pallas-interpret", block_size=128, mesh=mesh)
    full = search_database_arrays(q, db, 3, 1, sm.matrix, mode=mode,
                                  search_type=SEARCH_SCORE_END, engine=eng)
    ranked = search_database_arrays(q, db, 3, 1, sm.matrix, mode=mode,
                                    search_type=SEARCH_SCORE_END,
                                    engine=eng, top_k=17)
    _check(full, ranked, 17, True)


def test_topk_multihost_single_process(setup, tmp_path):
    """MultiHostSearch.ranked(top_k) takes the device-ranked gather path
    and must match the full-table ranking."""
    from opal_tpu.parallel.multihost import MultiHostSearch

    sm, db, q, _ = setup
    alpha = sm.alphabet
    p = tmp_path / "shard0.fa"
    p.write_text("".join(
        f">s{i}\n" + "".join(alpha[j] for j in seq) + "\n"
        for i, seq in enumerate(db)
    ))
    mh = MultiHostSearch([str(p)], sm,
                         engine=Engine(backend="pallas-interpret",
                                       block_size=128))
    for st in (SEARCH_SCORE, SEARCH_SCORE_END):
        full = mh.ranked(q, search_type=st)
        topk = mh.ranked(q, search_type=st, top_k=7)
        assert topk == full[:7]


def test_topk_empty_db():
    sm = ScoreMatrix.blosum50()
    eng = Engine(backend="pallas-interpret", block_size=128)
    ranked = search_database_arrays(
        np.zeros(8, np.uint8), [], 3, 1, sm.matrix, mode=MODE_SW,
        search_type=SEARCH_SCORE, engine=eng, top_k=5)
    assert len(ranked["index"]) == 0 and len(ranked["score"]) == 0


def test_empty_db_score_end_all_paths():
    """An empty database must return the expected (empty) columns on
    every path — score+end and SW zero masking included (regression:
    the masking block KeyError'd when no blocks produced columns)."""
    from opal_tpu.constants import SEARCH_SCORE_END
    from opal_tpu.engine.search import search_database_multi_arrays

    sm = ScoreMatrix.blosum50()
    q = np.zeros(8, np.uint8)
    for backend in ("xla", "pallas-interpret"):
        eng = Engine(backend=backend, block_size=128)
        for topk in (0, 5):
            out = search_database_arrays(
                q, [], 3, 1, sm.matrix, mode=MODE_SW,
                search_type=SEARCH_SCORE_END, engine=eng, top_k=topk)
            for c in ("score", "end_q", "end_t"):
                assert len(out[c]) == 0, (backend, topk, c)
            if topk:
                assert len(out["index"]) == 0
        multi = search_database_multi_arrays(
            [q, q], [], 3, 1, sm.matrix, mode=MODE_SW,
            search_type=SEARCH_SCORE_END, engine=eng)
        assert all(len(m["score"]) == 0 for m in multi)
