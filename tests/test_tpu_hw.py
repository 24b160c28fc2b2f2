"""Real-TPU hardware suite (`OPAL_TPU_HW_TESTS=1 pytest -m tpu`).

A compact CI-style lane validating the pallas kernels ON the real chip:
golden CLI parity, a randomized soak slice vs the oracle, a ragged
multi-block stream config, and the mesh-sharded path (1-device mesh).
The default CPU run skips all of these (see conftest).
"""
import numpy as np
import pytest

from conftest import REF_DATA

pytestmark = pytest.mark.tpu

GOLDEN = "tests/golden"


def _result_lines(text):
    return [l for l in text.splitlines()
            if l.startswith("#") and not l.startswith("#<")]


@pytest.mark.parametrize("mode,x", [
    ("SW", 1), ("NW", 1), ("HW", 1), ("OV", 1), ("SW", 2), ("SW", 0),
])
def test_cli_golden_on_tpu(mode, x, capsys):
    """CLI end-to-end on the real chip vs reference-binary goldens."""
    from opal_tpu.cli import main

    rc = main([
        "-a", mode, "-o", "3", "-e", "1", "-x", str(x),
        f"{REF_DATA}/query/O74807.fasta",
        f"{REF_DATA}/db/uniprot_sprot15.fasta",
    ])
    assert rc == 0
    got = _result_lines(capsys.readouterr().out)
    want = _result_lines(open(
        f"{GOLDEN}/O74807__uniprot_sprot15__{mode}_x{x}_o3_e1.txt").read())
    assert got == want


@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_soak_slice_on_tpu(mode):
    """Randomized differential slice vs the scalar oracle on hardware
    (the pallas path, score + end locations)."""
    from opal_tpu.constants import SEARCH_SCORE_END
    from opal_tpu.engine.search import Engine, search_database
    from opal_tpu.oracle import search_oracle

    rng = np.random.default_rng(4242 + mode)
    A = 24
    matrix = rng.integers(-4, 6, size=(A, A), dtype=np.int32)
    matrix = (matrix + matrix.T) // 2
    np.fill_diagonal(matrix, rng.integers(2, 9, size=A))
    query = rng.integers(0, A, size=int(rng.integers(30, 200)),
                         dtype=np.uint8)
    db = [rng.integers(0, A, size=int(rng.integers(5, 500)),
                       dtype=np.uint8) for _ in range(64)]
    eng = Engine(backend="pallas", block_size=1024)
    got = search_database(query, db, 4, 2, matrix, mode=mode,
                          search_type=SEARCH_SCORE_END, engine=eng)
    want = search_oracle(query, db, 4, 2, matrix, mode, SEARCH_SCORE_END)
    for i, (g, w) in enumerate(zip(got, want)):
        assert (g.score, g.end_location_query, g.end_location_target) == (
            w.score, w.end_location_query, w.end_location_target), i


def test_ragged_multiblock_on_tpu():
    """A DB spanning several ragged blocks (multi-part pipelined fetch)
    must stay oracle-exact on hardware."""
    from opal_tpu.constants import MODE_SW, SEARCH_SCORE
    from opal_tpu.engine.search import Engine, search_database_arrays
    from opal_tpu.oracle import search_oracle

    rng = np.random.default_rng(7)
    A = 20
    matrix = np.full((A, A), -1, np.int32)
    np.fill_diagonal(matrix, 3)
    query = rng.integers(0, A, size=120, dtype=np.uint8)
    db = [rng.integers(0, A, size=int(rng.integers(10, 900)),
                       dtype=np.uint8) for _ in range(3000)]
    eng = Engine(backend="pallas", block_size=512)
    out = search_database_arrays(query, db, 3, 1, matrix, mode=MODE_SW,
                                 search_type=SEARCH_SCORE, engine=eng)
    want = search_oracle(query, db[:40], 3, 1, matrix, MODE_SW, SEARCH_SCORE)
    for i, w in enumerate(want):
        assert out["score"][i] == w.score, i


@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_stacked_multi_x1_on_tpu(mode):
    """Stacked multi-query score+end (SEG_M row segments share one DP
    pass) must stay oracle-exact on the real chip — covers the per-cell
    SW end-tracking and per-segment NW/HW/OV trackers."""
    from opal_tpu.constants import MODE_SW, SEARCH_SCORE_END
    from opal_tpu.engine.search import Engine, search_database_multi_arrays
    from opal_tpu.oracle import search_oracle

    rng = np.random.default_rng(99 + mode)
    A = 24
    matrix = rng.integers(-4, 6, size=(A, A), dtype=np.int32)
    matrix = (matrix + matrix.T) // 2
    np.fill_diagonal(matrix, rng.integers(2, 9, size=A))
    queries = [rng.integers(0, A, size=int(n), dtype=np.uint8)
               for n in (60, 111, 155)]
    db = [rng.integers(0, A, size=int(rng.integers(5, 400)),
                       dtype=np.uint8) for _ in range(80)]
    eng = Engine(backend="pallas", block_size=1024)
    outs = search_database_multi_arrays(queries, db, 3, 1, matrix,
                                        mode=mode,
                                        search_type=SEARCH_SCORE_END,
                                        engine=eng)
    for qi, (q, out) in enumerate(zip(queries, outs)):
        want = search_oracle(q, db, 3, 1, matrix, mode, SEARCH_SCORE_END)
        for i, w in enumerate(want):
            assert int(out["score"][i]) == w.score, (qi, i)
            if not (mode == MODE_SW and w.score == 0):
                assert (int(out["end_q"][i]), int(out["end_t"][i])) == (
                    w.end_location_query, w.end_location_target), (qi, i)


def test_mesh_sharded_on_tpu():
    """The shard_map pallas path compiled for the real chip (1-device
    mesh: same program as a pod slice, minus cross-chip lanes)."""
    from opal_tpu.constants import MODE_SW, SEARCH_SCORE_END
    from opal_tpu.engine.search import Engine, search_database
    from opal_tpu.oracle import search_oracle
    from opal_tpu.parallel.shard import db_mesh

    import jax

    mesh = db_mesh(jax.devices()[:1])
    rng = np.random.default_rng(11)
    A = 24
    matrix = np.full((A, A), -2, np.int32)
    np.fill_diagonal(matrix, 4)
    query = rng.integers(0, A, size=90, dtype=np.uint8)
    db = [rng.integers(0, A, size=int(rng.integers(20, 400)),
                       dtype=np.uint8) for _ in range(500)]
    eng = Engine(backend="pallas", block_size=256, mesh=mesh)
    got = search_database(query, db, 3, 1, matrix, mode=MODE_SW,
                          search_type=SEARCH_SCORE_END, engine=eng)
    assert eng._get_resident(db)._flat_sharded is not None
    want = search_oracle(query, db[:30], 3, 1, matrix, MODE_SW,
                         SEARCH_SCORE_END)
    for i, w in enumerate(want):
        g = got[i]
        assert (g.score, g.end_location_query, g.end_location_target) == (
            w.score, w.end_location_query, w.end_location_target), i
