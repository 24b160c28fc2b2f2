"""Adaptive-precision cascade semantics: analytic overflow flags, CharSW API,
and overflow-strategy simulation (reference: src/opal.cpp:496-535,
:1522-1546)."""
import os
import subprocess

import numpy as np
import pytest

from opal_tpu.constants import MODE_HW, MODE_SW, OVERFLOW_BUCKETS, OVERFLOW_SIMPLE, SEARCH_SCORE
from opal_tpu.engine.cascade import (
    CHAR_SW_LIMIT,
    classify_precision,
    search_database_char_sw,
    simulate_overflow_method,
)
from opal_tpu.engine.search import Engine
from opal_tpu.oracle import dp_matrix

from util import random_problem


@pytest.fixture(scope="module")
def engine():
    return Engine(backend="xla", block_size=16)


def oracle_max_ulhp(query, target, go, ge, matrix):
    """Max over cells of the diagonal candidate ulH + P, from the oracle
    H matrix (ulH[r,c] = H[r-1,c-1], boundary 0 for SW)."""
    H = dp_matrix(query, target, go, ge, matrix, MODE_SW)
    P = np.asarray(matrix, np.int64)[np.asarray(query, np.int64)][
        :, np.asarray(target, np.int64)
    ]
    ul = np.zeros_like(H)
    ul[1:, 1:] = H[:-1, :-1]
    return int((ul + P).max())


def test_flags_match_oracle(engine):
    rng = np.random.default_rng(4)
    # +5/-1 on alphabet 4 drifts positive: plenty of char overflows
    query, db, matrix = random_problem(
        rng, n_seqs=25, query_len=70, min_len=20, max_len=250,
        match=5, mismatch=-1,
    )
    idx, cols = engine.score_blocks(
        query, db, 3, 1, matrix, MODE_SW, SEARCH_SCORE, with_flags=True
    )
    got = {int(i): int(v) for i, v in zip(idx, cols["max_ulhp"])}
    for i, t in enumerate(db):
        want = oracle_max_ulhp(query, t, 3, 1, matrix)
        assert got[i] == want, (i, got[i], want)


def test_char_sw_flags(engine):
    rng = np.random.default_rng(5)
    query, db, matrix = random_problem(
        rng, n_seqs=12, query_len=60, min_len=20, max_len=150,
        match=5, mismatch=-1,
    )
    db.append(np.tile(query, 3))  # guaranteed char overflow
    res = search_database_char_sw(query, db, 3, 1, matrix, engine=engine)
    n_over = 0
    for r, t in zip(res, db):
        flag = oracle_max_ulhp(query, t, 3, 1, matrix) >= CHAR_SW_LIMIT
        if flag:
            assert r.score_set == 0 and r.score == -1
            n_over += 1
        else:
            H = dp_matrix(query, t, 3, 1, matrix, MODE_SW)
            assert r.score_set == 1 and r.score == max(0, int(H.max()))
    assert n_over >= 1


def test_classify_precision_sw():
    flags = {"max_ulhp": np.array([10, 127, 128, 32766, 32767, 100000])}
    prec = classify_precision(flags, MODE_SW)
    np.testing.assert_array_equal(prec, [8, 8, 16, 16, 32, 32])


def test_classify_precision_nw_conservative():
    flags = {
        "max_ulhp": np.zeros(4, np.int64),
        "min_e": np.array([0, -200, 0, -40000]),
        "min_f": np.array([0, 0, 0, 0]),
        "max_h": np.array([50, 50, 40000, 50]),
    }
    prec = classify_precision(flags, MODE_HW)
    np.testing.assert_array_equal(prec, [8, 16, 32, 32])


def test_simulate_overflow_method():
    prec = np.full(2500, 8, np.int32)
    prec[[3, 1500]] = 32
    simple = simulate_overflow_method(prec, OVERFLOW_SIMPLE)
    assert simple.sum() == 2
    buckets = simulate_overflow_method(prec, OVERFLOW_BUCKETS)
    # whole 1024-seq buckets 0 and 1 escalate; bucket 2 untouched
    assert buckets[:2048].all() and not buckets[2048:].any()


REF_SRC = "/root/reference/src"


@pytest.mark.skipif(
    not os.path.exists(f"{REF_SRC}/opal.cpp"), reason="reference not mounted"
)
def test_char_sw_vs_reference_binary(engine, tmp_path):
    """Differential test against the reference opalSearchDatabaseCharSW."""
    harness = tmp_path / "harness"
    cpp = tmp_path / "h.cpp"
    cpp.write_text(
        '#include <cstdio>\n#include <vector>\n#include "opal.h"\n'
        "int main(){int qlen,n,alpha,go,ge;"
        'scanf("%d %d %d %d %d",&qlen,&n,&alpha,&go,&ge);'
        "std::vector<unsigned char> q(qlen);"
        'for(int i=0;i<qlen;i++){int x;scanf("%d",&x);q[i]=x;}'
        "std::vector<int> m(alpha*alpha);"
        'for(int i=0;i<alpha*alpha;i++)scanf("%d",&m[i]);'
        "std::vector<std::vector<unsigned char>> s(n);"
        "std::vector<unsigned char*> db(n);std::vector<int> L(n);"
        'for(int i=0;i<n;i++){int l;scanf("%d",&l);s[i].resize(l);'
        'for(int j=0;j<l;j++){int x;scanf("%d",&x);s[i][j]=x;}'
        "db[i]=s[i].data();L[i]=l;}"
        "std::vector<OpalSearchResult> r(n);"
        "std::vector<OpalSearchResult*> rp(n);"
        "for(int i=0;i<n;i++){opalInitSearchResult(&r[i]);rp[i]=&r[i];}"
        "opalSearchDatabaseCharSW(q.data(),qlen,db.data(),n,L.data(),"
        "go,ge,m.data(),alpha,rp.data());"
        'for(int i=0;i<n;i++)printf("%d %d\\n",r[i].scoreSet,r[i].score);'
        "return 0;}"
    )
    build = subprocess.run(
        ["g++", "-std=c++11", "-O2", "-march=native", f"-I{REF_SRC}",
         "-o", str(harness), str(cpp), f"{REF_SRC}/opal.cpp"],
        capture_output=True,
    )
    if build.returncode != 0:
        pytest.skip("cannot build reference harness")

    rng = np.random.default_rng(123)
    go, ge = 4, 2
    query, db, matrix = random_problem(
        rng, n_seqs=30, query_len=50, min_len=10, max_len=180,
        match=4, mismatch=-2,
    )
    db.append(np.tile(query, 4))
    lines = [
        f"{len(query)} {len(db)} {matrix.shape[0]} {go} {ge}",
        " ".join(map(str, query)),
        " ".join(map(str, matrix.reshape(-1))),
    ]
    for s in db:
        lines.append(f"{len(s)} " + " ".join(map(str, s)))
    ref = subprocess.run(
        [str(harness)], input="\n".join(lines), capture_output=True, text=True
    ).stdout.strip().splitlines()
    want = [tuple(map(int, ln.split())) for ln in ref]
    res = search_database_char_sw(query, db, go, ge, matrix, engine=engine)
    got = [(r.score_set, r.score) for r in res]
    assert got == want


def test_bucket_escalation_counts():
    from opal_tpu.engine.cascade import bucket_escalation_counts

    prec = np.full(2500, 8, np.int32)
    prec[3] = 16
    prec[1030] = 32
    prec[1031] = 16
    out = bucket_escalation_counts(prec)
    assert out["n"].tolist() == [1024, 1024, 452]
    assert out["over8"].tolist() == [1, 2, 0]
    assert out["over16"].tolist() == [0, 1, 0]


def test_search_stats_all_stages(engine):
    """last_search_stats documents all three cascade stages and the
    per-bucket escalation summary, consistent with simulate_overflow_method
    for both strategies (reference: src/opal.cpp:512-529)."""
    from opal_tpu.engine.search import search_database

    rng = np.random.default_rng(41)
    query, db, matrix = random_problem(
        rng, n_seqs=30, query_len=80, min_len=20, max_len=260,
        match=5, mismatch=-1,
    )
    for method in (OVERFLOW_SIMPLE, OVERFLOW_BUCKETS):
        eng = Engine(backend="xla", block_size=16, precision="adaptive")
        search_database(query, db, 3, 1, matrix, mode=MODE_SW,
                        overflow_method=method, engine=eng)
        stats = eng.last_search_stats
        assert stats["overflow_method"] == method
        prec_db = np.full(len(db), 8, np.int32)
        for i, b in stats["precision_bits"].items():
            prec_db[i] = b
        np.testing.assert_array_equal(
            stats["rerun_mask_stage8"],
            simulate_overflow_method(prec_db, method, 8))
        np.testing.assert_array_equal(
            stats["rerun_mask_stage16"],
            simulate_overflow_method(prec_db, method, 16))
        counts = stats["precision_counts"]
        assert sum(counts.values()) == len(db)
        assert counts[16] + counts[32] > 0  # +5/-1 drifts into overflow
        be = stats["bucket_escalations"]
        assert be["n"].sum() == len(db)
        assert be["over8"].sum() == counts[16] + counts[32]
        assert be["over16"].sum() == counts[32]
