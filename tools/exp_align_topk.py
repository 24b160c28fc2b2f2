#!/usr/bin/env python3
"""Alignment-pass cost at production scale (VERDICT r2 #3).

Measures, on the real chip with a Swiss-Prot-scale synthetic DB:
  x1   — score+end search (SearchResult list assembly included)
  x2   — same + align_top_k=K banded reverse reconstructions on host
and reports the alignment pass's marginal cost (x2 - x1). Done bar:
align_top_k=1000 at 541k-seq scale adds <= 1 s end-to-end."""
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
    ap.add_argument("--top-k", type=int, default=1000)
    ap.add_argument("--qlen", type=int, default=513)  # P18080 scale
    args = ap.parse_args()

    from make_synth_db import make_db_arrays
    from opal_tpu.constants import (
        MODE_SW,
        SEARCH_ALIGNMENT,
        SEARCH_SCORE_END,
    )
    from opal_tpu.engine.search import Engine, search_database
    from opal_tpu.matrices import ScoreMatrix

    sm = ScoreMatrix.blosum50()
    lut = sm.letter_index()
    db = [lut[s] for s in make_db_arrays(args.n_seqs)]  # ASCII -> indices
    total = sum(len(s) for s in db)
    rng = np.random.default_rng(1)
    query = rng.integers(0, 20, size=args.qlen, dtype=np.uint8)
    eng = Engine(backend="pallas", block_size=1024)
    eng.upload(db)
    print(f"db: {len(db)} seqs, {total/1e6:.1f}M residues", flush=True)

    def timed(tag, **kw):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            res = search_database(query, db, 3, 1, sm.matrix, mode=MODE_SW,
                                  engine=eng, **kw)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"  {tag}: {best:.2f} s", flush=True)
        return best, res

    t1, _ = timed("x1 score+end           ",
                  search_type=SEARCH_SCORE_END)
    t2, res = timed(f"x2 align_top_k={args.top_k:5d}   ",
                    search_type=SEARCH_ALIGNMENT, align_top_k=args.top_k)
    n_al = sum(1 for r in res if r.alignment is not None)
    print(f"  alignment pass marginal: {t2 - t1:.2f} s "
          f"({n_al} paths, {n_al / max(t2 - t1, 1e-9):,.0f}/s)", flush=True)

    # Direct (variance-free) timing of the two x2-only stages on the x2
    # result set: the ranking and the per-pair reconstruction loop. The
    # x2-x1 marginal above conflates these with two full scans' worth of
    # tunnel timing noise.
    from opal_tpu.engine.search import alignment_pass
    from opal_tpu.ranking import rank_scores

    all_scores = np.array([r.score if r.score_set else -(2**62)
                           for r in res])
    t0 = time.perf_counter()
    align_set = rank_scores(all_scores, args.top_k)
    t_rank = time.perf_counter() - t0
    cand = sorted(align_set.tolist())
    t0 = time.perf_counter()
    alignment_pass(query, db, 3, 1, sm.matrix, MODE_SW, res, cand)
    t_align = time.perf_counter() - t0
    print(f"  direct: rank {t_rank:.3f} s, alignment_pass {t_align:.2f} s "
          f"({len(cand) / max(t_align, 1e-9):,.0f} pairs/s)", flush=True)


if __name__ == "__main__":
    main()
