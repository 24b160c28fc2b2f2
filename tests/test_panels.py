"""Query-panel streaming validated on CPU via interpret mode.

Panels remove the VMEM query-length ceiling (VERDICT r2 #1): the query's
rows are split into panels that each sweep the whole chunk stream,
chaining per-column boundary rows through HBM
(pallas_kernels.build_pallas_panel_fn_raw). These tests force the panel
dispatch path (OPAL_TPU_FORCE_PANELS) with tiny panel heights
(OPAL_TPU_PANEL_ROWS) so multi-panel chaining and the host-side tracker
merge (finalize_trackers_panels) run against the oracle on small shapes.
Reference semantics under test: tie-breaks "smallest end in target, then
in query" (src/opal.h:44-46) and OV end disambiguation
(src/opal.cpp:845-850,881-904) across panel boundaries."""
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
from opal_tpu.engine.search import Engine
from opal_tpu.oracle import search_oracle

from util import random_problem

MODES = [MODE_SW, MODE_NW, MODE_HW, MODE_OV]


@pytest.fixture
def panel_env(monkeypatch):
    """Force the panel dispatch path with 32-row panels."""
    monkeypatch.setenv("OPAL_TPU_FORCE_PANELS", "1")
    monkeypatch.setenv("OPAL_TPU_PANEL_ROWS", "32")


def run_panels(query, db, matrix, go, ge, mode, search_type,
               with_flags=False, block_size=128):
    eng = Engine(backend="pallas-interpret", block_size=block_size)
    idx, cols = eng.score_blocks(
        np.asarray(query, np.uint8), [np.asarray(s, np.uint8) for s in db],
        go, ge, matrix, mode, search_type, with_flags=with_flags)
    order = np.argsort(idx)
    return {k: np.asarray(v)[order] for k, v in cols.items()}


def check_vs_oracle(query, db, matrix, go, ge, mode, search_type, out):
    want = search_oracle(query, db, go, ge, matrix, mode, search_type)
    for i, w in enumerate(want):
        assert out["score"][i] == w.score, (mode, i)
        if search_type == SEARCH_SCORE:
            continue
        if mode == MODE_SW and w.score == 0:
            continue
        assert out["end_q"][i] == w.end_location_query, (mode, i)
        assert out["end_t"][i] == w.end_location_target, (mode, i)


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("search_type", [SEARCH_SCORE, SEARCH_SCORE_END])
def test_panels_vs_oracle(panel_env, mode, search_type):
    """Q=80 split into 32/32/16-row panels, all modes x both depths."""
    rng = np.random.default_rng(1000 + mode * 10 + search_type)
    query, db, matrix = random_problem(
        rng, n_seqs=11, query_len=80, min_len=8, max_len=90)
    out = run_panels(query, db, matrix, 3, 1, mode, search_type)
    check_vs_oracle(query, db, matrix, 3, 1, mode, search_type, out)


@pytest.mark.parametrize("go,ge", [(2, 2), (4, 0), (0, 0)])
def test_panels_edge_gap_configs(panel_env, go, ge):
    """go==ge and ge==0 stress the boundary-row math (F-chain seeds)."""
    rng = np.random.default_rng(77 + go * 10 + ge)
    query, db, matrix = random_problem(
        rng, n_seqs=7, query_len=70, min_len=10, max_len=60)
    for mode in MODES:
        out = run_panels(query, db, matrix, go, ge, mode, SEARCH_SCORE_END)
        check_vs_oracle(query, db, matrix, go, ge, mode,
                        SEARCH_SCORE_END, out)


@pytest.mark.parametrize("mode", MODES)
def test_panels_with_flags(panel_env, monkeypatch, mode):
    """Overflow-flag trackers merge across panels (cascade feed): exact
    key-for-key parity with the non-panel pallas path."""
    rng = np.random.default_rng(55 + mode)
    query, db, matrix = random_problem(
        rng, n_seqs=6, query_len=48, min_len=10, max_len=50)
    out = run_panels(query, db, matrix, 3, 1, mode, SEARCH_SCORE,
                     with_flags=True)
    monkeypatch.setenv("OPAL_TPU_FORCE_PANELS", "0")
    base = run_panels(query, db, matrix, 3, 1, mode, SEARCH_SCORE,
                      with_flags=True)
    assert set(out) == set(base), mode
    for k in base:
        assert np.array_equal(out[k], base[k]), (mode, k)


def test_panels_single_panel(monkeypatch):
    """FORCE_PANELS without PANEL_ROWS: one panel (first == final)."""
    monkeypatch.setenv("OPAL_TPU_FORCE_PANELS", "1")
    rng = np.random.default_rng(5)
    query, db, matrix = random_problem(
        rng, n_seqs=5, query_len=30, min_len=10, max_len=40)
    out = run_panels(query, db, matrix, 3, 1, MODE_SW, SEARCH_SCORE_END)
    check_vs_oracle(query, db, matrix, 3, 1, MODE_SW,
                    SEARCH_SCORE_END, out)


def test_panels_uneven_tail(panel_env):
    """Last panel shorter than 16 rows (Q=65 -> 32/32/1)."""
    rng = np.random.default_rng(6)
    query, db, matrix = random_problem(
        rng, n_seqs=6, query_len=65, min_len=5, max_len=70)
    for mode in MODES:
        out = run_panels(query, db, matrix, 3, 1, mode, SEARCH_SCORE_END)
        check_vs_oracle(query, db, matrix, 3, 1, mode,
                        SEARCH_SCORE_END, out)


def test_panels_tie_break_cross_panel(panel_env):
    """A repeated motif makes the same best score attainable in several
    panels; the merge must keep the smallest end_t then end_q."""
    motif = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.uint8)
    query = np.tile(motif, 12)  # 96 rows -> 3 panels, motif in each
    db = [np.tile(motif, 3), motif.copy(), np.tile(motif, 2)]
    A = 4
    matrix = np.full((A, A), -1, np.int32)
    np.fill_diagonal(matrix, 3)
    out = run_panels(query, db, matrix, 3, 1, MODE_SW, SEARCH_SCORE_END)
    check_vs_oracle(query, db, matrix, 3, 1, MODE_SW,
                    SEARCH_SCORE_END, out)
    out = run_panels(query, db, matrix, 3, 1, MODE_OV, SEARCH_SCORE_END)
    check_vs_oracle(query, db, matrix, 3, 1, MODE_OV,
                    SEARCH_SCORE_END, out)


def test_panel_gate_routes_long_query():
    """Without FORCE/NO knobs, a query beyond the VMEM ceiling routes to
    panels (not XLA) when panel_ok holds."""
    from opal_tpu.engine.pallas_backend import PallasBackend

    be = PallasBackend(interpret=True)
    assert be.panel_ok(100_000, 3, 1, A=24, profile_absmax=3)
    # bf16 profile gate still routes to XLA
    assert not be.panel_ok(100, 3, 1, A=24, profile_absmax=300)
    # f32 DP-range gate
    assert not be.panel_ok(3_000_000, 3, 1, A=24, profile_absmax=3)
    # ge > go is never a pallas config
    assert not be.panel_ok(100, 1, 3, A=24, profile_absmax=3)
