"""Differential validation of the precision-cascade flags (VERDICT r3 #6).

``classify_precision`` (opal_tpu/engine/cascade.py) derives, from exact
f32 DP extremes, which sequences the reference's char (int8) and short
(int16) kernels would have overflowed on. The char SW set was already
differentially pinned via the public ``opalSearchDatabaseCharSW``; the
NW/HW/OV char/short sets and the SW short set are internal reference
state — tools/ref_overflow_harness.cpp compiles the reference source
with a driver that exposes each stage's ``calculated[]`` array (the
exact flag set, /root/reference/src/opal.cpp:983-1021).

These tests assert EXACT set equality (not the docstring's old
"conservative" claim) on adversarial score ranges: saturating-boundary
dives (NW init columns past -128), high-identity databases pushed over
+127/+32767, and mixed-length stress. Empirical result (20 configs x
4 modes explored, all zero-diff): the analytic conditions coincide with
the saturated kernels' detection because values are exact up to the
first saturation event, and that event fires the minE/minF/maxH check
in the same column (see cascade.py docstring).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from opal_tpu.constants import (
    MODE_HW,
    MODE_NW,
    MODE_OV,
    MODE_SW,
    SEARCH_SCORE,
)
from opal_tpu.engine.cascade import classify_precision
from opal_tpu.engine.search import Engine

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    if not os.path.exists(os.path.join(REF_SRC, "opal.cpp")):
        pytest.skip("reference source not mounted")
    exe = str(tmp_path_factory.mktemp("refovf") / "ref_overflow")
    r = subprocess.run(
        ["g++", "-std=c++11", "-O3", "-march=native", f"-I{REF_SRC}",
         os.path.join(REPO, "tools", "ref_overflow_harness.cpp"),
         "-o", exe],
        capture_output=True, text=True, timeout=600)
    if r.returncode != 0:
        pytest.skip(f"harness build failed: {r.stderr[-400:]}")
    return exe


@pytest.fixture(scope="module")
def engine():
    return Engine(backend="xla", block_size=128)


def ref_stage_flags(exe, mode, go, ge, matrix, query, db):
    """Run the harness; returns {stage_name: calculated bool array}."""
    A = matrix.shape[0]
    lines = [f"{mode} 0 {go} {ge} {A} {len(query)} {len(db)}",
             " ".join(map(str, matrix.reshape(-1))),
             " ".join(map(str, query))]
    for s in db:
        lines.append(f"{len(s)} " + " ".join(map(str, s)))
    out = subprocess.run([exe], input="\n".join(lines),
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-400:]
    stages = {}
    for ln in out.stdout.splitlines():
        parts = ln.split()
        if parts[0] == "stage":
            stages[parts[1]] = np.array([int(x) for x in parts[2:]],
                                        bool)
    return stages


def our_precision(engine, mode, go, ge, matrix, query, db):
    idx, cols = engine.score_blocks(
        query, db, go, ge, matrix, mode, SEARCH_SCORE, with_flags=True)
    n = len(db)
    flags = {k: np.empty(n, np.int64) for k in cols if k != "score"}
    for k in flags:
        flags[k][idx] = cols[k]
    return classify_precision(flags, mode)


def make_case(rng, diag, offd, qlen, maxlen, n):
    A = 8
    m = np.full((A, A), offd, np.int32)
    np.fill_diagonal(m, diag)
    q = rng.integers(0, A, qlen, dtype=np.uint8)
    db = [rng.integers(0, A, int(L), dtype=np.uint8)
          for L in rng.integers(5, maxlen, n)]
    for i in range(0, n, 7):  # high-identity rows push scores up
        db[i] = q[: int(rng.integers(5, qlen))].copy()
    return m, q, db


# (go, ge, diag, offd, qlen, maxlen): spans no-overflow, char-only
# overflow (high diag, long NW boundary dives), and short overflow
# (diag=100 on a 700-residue query: identical prefixes score > 32767).
CASES = [
    (3, 1, 5, -4, 120, 300),
    (3, 1, 40, -4, 120, 300),
    (1, 1, 5, -5, 120, 900),
    (10, 7, 90, -90, 120, 400),
    (3, 1, 100, -2, 700, 1200),
]


@pytest.mark.parametrize("mode", [MODE_NW, MODE_HW, MODE_OV, MODE_SW])
def test_stage_flags_match_reference_exactly(harness, engine, mode):
    rng = np.random.default_rng(17)
    ch, sh = ("swChar", "swShort") if mode == MODE_SW else ("char",
                                                            "short")
    for go, ge, diag, offd, qlen, maxlen in CASES:
        m, q, db = make_case(rng, diag, offd, qlen, maxlen, n=80)
        prec = our_precision(engine, mode, go, ge, m, q, db)
        ref = ref_stage_flags(harness, mode, go, ge, m, q, db)
        np.testing.assert_array_equal(
            prec > 8, ~ref[ch],
            err_msg=f"char-stage flag set differs "
                    f"(go={go} ge={ge} diag={diag} off={offd} q={qlen})")
        np.testing.assert_array_equal(
            prec > 16, ~ref[sh],
            err_msg=f"short-stage flag set differs "
                    f"(go={go} ge={ge} diag={diag} off={offd} q={qlen})")
