#!/usr/bin/env python3
"""Randomized differential soak against the scalar oracle, on real hardware.

The checked-in successor of the ad-hoc soak scripts behind BENCH_REPORT's
9,500+ trial tally. Each trial draws a random problem (alphabet, matrix,
gap penalties, query from a fixed pool of lengths, adversarial database
length mixture) and checks the engine against the NumPy oracle:

- score (+ end locations) for all 4 modes, search types 0/1;
- full-alignment trials (search type 2): score/start/end vs oracle plus
  replay validation of the op string (the reference self-test's
  checkAlignment methodology, reference: src/test.cpp:348-422);
- stacked multi-query score trials vs per-query oracle;
- skip-semantics trials (pre-set results must be preserved, others filled);
- gap configs include ge == go, ge > go (XLA fallback path; alignment
  search must raise), and go == ge == 0 full-band fallback.

Query lengths come from a fixed pool so kernel compiles stay bounded
(distinct Q = distinct kernel); with JAX_COMPILATION_CACHE_DIR set, reruns
hit the persistent cache. Exits non-zero on first failure with the trial
seed for reproduction (--seed <trial_seed> --trials 1).
"""
import argparse
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opal_tpu.constants import (  # noqa: E402
    MODE_HW, MODE_NW, MODE_OV, MODE_SW,
    SEARCH_ALIGNMENT, SEARCH_SCORE, SEARCH_SCORE_END,
)
from opal_tpu.engine.search import (  # noqa: E402
    Engine, search_database, search_database_multi_arrays,
)
from opal_tpu.oracle import search_oracle  # noqa: E402
from opal_tpu.result import SearchResult  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from util import check_alignment  # noqa: E402

MODES = (MODE_NW, MODE_HW, MODE_OV, MODE_SW)

# Fixed query-length pool: tiny, sublane-tile edges, typical, long.
Q_POOL = (1, 15, 17, 64, 110, 300)
# --long mode pool: exercises query-panel streaming (multi-panel chains,
# incl. lengths past the old B=128 VMEM ceiling ~43k) and, under
# OPAL_TPU_NO_PANELS=1, the legacy lane-width downshift, vs the oracle.
Q_POOL_LONG = (1500, 3000, 6000, 13000, 34000, 60000)

# Adversarial target lengths: chunk/quantum/block edges and degenerates.
EDGE_LENS = (1, 2, 63, 64, 65, 127, 128, 129, 191, 320)


# --tiny mode (pallas-interpret soaking on CPU): interpret-mode execution
# is ~1000x slower per cell, so shrink every dimension to keep trials in
# the seconds range while still crossing the T_CHUNK=64 chunk boundary.
Q_POOL_TINY = (1, 15, 17, 64)
EDGE_LENS_TINY = (1, 2, 63, 64, 65, 70)


def random_db(rng, n, A, max_len=260, edge_lens=EDGE_LENS):
    lens = []
    for _ in range(n):
        if rng.random() < 0.35:
            lens.append(int(rng.choice(edge_lens)))
        else:
            lens.append(int(rng.integers(1, max_len + 1)))
    return [rng.integers(0, A, size=m, dtype=np.uint8) for m in lens]


def random_matrix(rng):
    A = int(rng.integers(2, 25))
    kind = rng.random()
    if kind < 0.4:
        match = int(rng.integers(1, 14))
        mismatch = int(rng.integers(-8, 1))
        m = np.full((A, A), mismatch, np.int32)
        np.fill_diagonal(m, match)
    elif kind < 0.9:
        m = rng.integers(-8, 13, size=(A, A)).astype(np.int32)
    else:
        # probe the bf16 profile gate boundary (entries near 256)
        m = rng.integers(200, 261, size=(A, A)).astype(np.int32)
        m -= rng.integers(0, 2) * 300  # sometimes large negative
    return A, m


def random_gaps(rng):
    r = rng.random()
    if r < 0.70:
        go = int(rng.integers(1, 14))
        ge = int(rng.integers(1, go + 1))
    elif r < 0.80:
        go = ge = int(rng.integers(1, 10))
    elif r < 0.90:
        ge = int(rng.integers(2, 12))
        go = int(rng.integers(1, ge))   # ge > go: XLA fallback
    else:
        go = ge = 0
    return go, ge


def run_trial(seed, engine, long_queries=False, tiny=False):
    rng = np.random.default_rng(seed)
    A, matrix = random_matrix(rng)
    go, ge = random_gaps(rng)
    pool = (Q_POOL_TINY if tiny
            else Q_POOL_LONG if long_queries else Q_POOL)
    Q = int(rng.choice(pool))
    query = rng.integers(0, A, size=Q, dtype=np.uint8)
    n = int(rng.integers(6, 25)) if tiny else int(rng.integers(10, 120))
    db = random_db(rng, n, A,
                   max_len=80 if tiny else 260,
                   edge_lens=EDGE_LENS_TINY if tiny else EDGE_LENS)
    mode = int(rng.choice(MODES))
    kind = rng.random()

    if kind < 0.55:  # score / score+end
        st = SEARCH_SCORE if rng.random() < 0.5 else SEARCH_SCORE_END
        res = search_database(query, db, go, ge, matrix, mode=mode,
                              search_type=st, engine=engine)
        want = search_oracle(query, db, go, ge, matrix, mode, st)
        for i, (r, w) in enumerate(zip(res, want)):
            assert r.score == w.score, (i, r.score, w.score)
            if st != SEARCH_SCORE and not (mode == MODE_SW and w.score == 0):
                assert (r.end_location_query, r.end_location_target) == (
                    w.end_location_query, w.end_location_target), i
        return f"score m{mode} x{int(st)} Q{Q} n{n} go{go} ge{ge}"

    if kind < 0.75:  # full alignment + replay validation
        if ge > go:
            try:
                search_database(query, db, go, ge, matrix, mode=mode,
                                search_type=SEARCH_ALIGNMENT, engine=engine)
            except ValueError:
                return f"align-reject m{mode} go{go} ge{ge}"
            raise AssertionError("ge>go alignment search did not raise")
        topk = int(rng.integers(0, 6)) if rng.random() < 0.4 else 0
        res = search_database(query, db, go, ge, matrix, mode=mode,
                              search_type=SEARCH_ALIGNMENT, engine=engine,
                              align_top_k=topk)
        want = search_oracle(query, db, go, ge, matrix, mode,
                             SEARCH_SCORE_END)
        aligned = 0
        for i, (r, w) in enumerate(zip(res, want)):
            assert r.score == w.score, (i, r.score, w.score)
            if r.alignment is not None:
                check_alignment(query, db[i], r, go, ge, matrix, mode)
                aligned += 1
        if topk == 0 and mode == MODE_SW:
            need = sum(1 for w in want if w.score > 0)
            assert aligned == need, (aligned, need)
        return f"align m{mode} Q{Q} n{n} go{go} ge{ge} top{topk} ok{aligned}"

    if kind < 0.9:  # stacked multi-query, score-only or score+end
        if ge > go or go == 0:
            return "skip-multi"
        st = SEARCH_SCORE if rng.random() < 0.5 else SEARCH_SCORE_END
        nq = int(rng.integers(2, 7))
        queries = [rng.integers(0, A, size=int(rng.choice(pool)),
                                dtype=np.uint8) for _ in range(nq)]
        outs = search_database_multi_arrays(
            queries, db, go, ge, matrix, mode=mode,
            search_type=st, engine=engine)
        for qi, (q, out) in enumerate(zip(queries, outs)):
            want = search_oracle(q, db, go, ge, matrix, mode, st)
            got = out["score"]
            for i, w in enumerate(want):
                assert got[i] == w.score, (qi, i, int(got[i]), w.score)
                if st != SEARCH_SCORE and not (
                        mode == MODE_SW and w.score == 0):
                    assert (int(out["end_q"][i]), int(out["end_t"][i])) == (
                        w.end_location_query, w.end_location_target
                    ), (qi, i)
        return f"multi m{mode} x{int(st)} nq{nq} n{n} go{go} ge{ge}"

    # skip semantics: pre-set results are trusted and untouched
    st = SEARCH_SCORE_END
    pre = [SearchResult() for _ in range(n)]
    skip_idx = set(int(i) for i in
                   rng.choice(n, size=max(1, n // 3), replace=False))
    for i in skip_idx:
        pre[i].set_score(-12345)
        pre[i].end_location_query = 7
        pre[i].end_location_target = 9
    res = search_database(query, db, go, ge, matrix, mode=mode,
                          search_type=st, results=pre, engine=engine)
    want = search_oracle(query, db, go, ge, matrix, mode, st)
    for i, (r, w) in enumerate(zip(res, want)):
        if i in skip_idx:
            assert r.score == -12345 and r.end_location_query == 7, i
        else:
            assert r.score == w.score, (i, r.score, w.score)
    return f"skip m{mode} Q{Q} n{n} nskip{len(skip_idx)}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--precision", default="int32",
                    choices=("int32", "adaptive"),
                    help="adaptive soaks the precision-cascade driver "
                    "(char->short->int rerun bookkeeping) too")
    ap.add_argument("--block-size", type=int, default=256)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--long", action="store_true",
                    help="long-query pool (downshift / narrow-width paths)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny problem sizes: makes --backend "
                    "pallas-interpret soaking feasible on CPU (use with "
                    "--block-size 128)")
    args = ap.parse_args()

    engine = Engine(backend=args.backend, block_size=args.block_size,
                    precision=args.precision)
    root = np.random.SeedSequence(args.seed)
    seeds = root.generate_state(args.trials)
    t0 = time.time()
    for k, s in enumerate(seeds):
        try:
            tag = run_trial(int(s), engine, long_queries=args.long,
                            tiny=args.tiny)
        except Exception:
            print(f"FAIL trial {k} seed {int(s)}")
            traceback.print_exc()
            return 1
        if args.verbose or (k + 1) % 50 == 0:
            dt = time.time() - t0
            print(f"[{k + 1}/{args.trials}] {dt:.0f}s  last: {tag}",
                  flush=True)
    print(f"OK: {args.trials} trials, 0 failures, "
          f"{time.time() - t0:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
