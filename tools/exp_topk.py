#!/usr/bin/env python3
"""Device-side top-k A/B at production scale (VERDICT r3 #2).

In one process on the real chip, vs a Swiss-Prot-scale synthetic DB:
  full   — whole-database tracker download + host rank_scores
  topk   — device-side selection (engine/ranked.py), O(k) download
for SW x0 and x1 at short and mid query lengths. Done bar: x1
short-query e2e GCUPS within ~15% of x0; warm single-query serving
latency <= ~120 ms (the payload tax was ~80% of the 267 ms r3 number).
Also asserts the two paths pick identical rows."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-seqs", type=int, default=541762)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from make_synth_db import make_db_arrays
    from opal_tpu.constants import MODE_SW, SEARCH_SCORE, SEARCH_SCORE_END
    from opal_tpu.engine.search import Engine, search_database_arrays
    from opal_tpu.matrices import ScoreMatrix
    from opal_tpu.ranking import rank_scores

    sm = ScoreMatrix.blosum50()
    lut = sm.letter_index()
    db = [lut[s] for s in make_db_arrays(args.n_seqs)]
    total = sum(len(s) for s in db)
    eng = Engine(backend="pallas", block_size=1024)
    eng.upload(db)
    rng = np.random.default_rng(1)
    print(f"db: {len(db)} seqs, {total/1e6:.1f}M residues, "
          f"top_k={args.top_k}", flush=True)

    for qlen in (110, 513):
        query = rng.integers(0, 20, size=qlen, dtype=np.uint8)
        for st, tag in ((SEARCH_SCORE, "x0"), (SEARCH_SCORE_END, "x1")):
            kw = dict(mode=MODE_SW, search_type=st, engine=eng)
            # warm both paths (compile + resident caches)
            full = search_database_arrays(query, db, 3, 1, sm.matrix, **kw)
            topk = search_database_arrays(query, db, 3, 1, sm.matrix,
                                          top_k=args.top_k, **kw)
            order = rank_scores(full["score"], args.top_k)
            assert np.array_equal(topk["index"], order), (qlen, tag)
            assert np.array_equal(topk["score"], full["score"][order])
            t_full = min(_t(lambda: search_database_arrays(
                query, db, 3, 1, sm.matrix, **kw)) for _ in range(args.reps))
            t_topk = min(_t(lambda: search_database_arrays(
                query, db, 3, 1, sm.matrix, top_k=args.top_k, **kw))
                for _ in range(args.reps))
            g_full = qlen * total / t_full / 1e9
            g_topk = qlen * total / t_topk / 1e9
            print(f"  Q={qlen:4d} {tag}: full {t_full*1e3:7.1f} ms "
                  f"({g_full:6.1f} GCUPS)   topk {t_topk*1e3:7.1f} ms "
                  f"({g_topk:6.1f} GCUPS)   speedup {t_full/t_topk:4.2f}x",
                  flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
