#!/usr/bin/env python3
"""Hardware probe: panel-height sweep for query-panel streaming.

The per-cell op count includes the max-plus scan's 3*ceil(log2(P)) term,
so shorter panels have cheaper columns; but each panel sweep re-pays the
per-column fixed costs and the 2-row boundary traffic. This sweeps
OPAL_TPU_PANEL_ROWS in-process (the knob is read at dispatch time) to
find the sweet spot. Interleaved repetitions, best-of timing (see
CLAUDE.md on tunnel noise)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=16000)
    ap.add_argument("--db-seqs", type=int, default=8000)
    ap.add_argument("--mode", default="SW")
    ap.add_argument("--st", type=int, default=0)
    ap.add_argument("--rows", default="default,1504,1024,768,512,256")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    os.environ["OPAL_TPU_FORCE_PANELS"] = "1"
    from opal_tpu.constants import MODE_CODES
    from opal_tpu.engine.search import Engine, search_database_arrays

    mode = MODE_CODES[args.mode]
    rng = np.random.default_rng(99)
    A = 24
    matrix = np.full((A, A), -1, np.int32)
    np.fill_diagonal(matrix, 3)
    db = [rng.integers(0, A, rng.integers(100, 700), dtype=np.uint8)
          for _ in range(args.db_seqs)]
    n_res = sum(len(t) for t in db)
    query = rng.integers(0, A, args.q, dtype=np.uint8)
    cells = args.q * n_res
    print(f"db: {len(db)} seqs, {n_res/1e6:.2f}M residues; Q={args.q} "
          f"mode={args.mode} x{args.st} cells={cells/1e9:.1f}G", flush=True)

    eng = Engine()
    rows_list = args.rows.split(",")
    best = {r: None for r in rows_list}
    ref_scores = None
    for rep in range(args.reps):
        for r in rows_list:
            if r == "default":
                os.environ.pop("OPAL_TPU_PANEL_ROWS", None)
            else:
                os.environ["OPAL_TPU_PANEL_ROWS"] = r
            t0 = time.perf_counter()
            out = search_database_arrays(
                query, db, 3, 1, matrix, mode=mode,
                search_type=args.st, engine=eng)
            sc = np.asarray(out["score"])
            dt = time.perf_counter() - t0
            if rep == 0 and ref_scores is None:
                ref_scores = sc
            elif not np.array_equal(sc, ref_scores):
                print(f"  MISMATCH at rows={r}!", flush=True)
            if rep > 0:  # rep 0 is the compile pass
                b = best[r]
                best[r] = dt if b is None else min(b, dt)
            print(f"  rep{rep} rows={r:>8}: {dt:6.3f}s "
                  f"{cells/dt/1e9:7.1f} GCUPS", flush=True)
    os.environ.pop("OPAL_TPU_PANEL_ROWS", None)
    print("\nbest-of (excluding compile rep):")
    for r in rows_list:
        if best[r]:
            print(f"  rows={r:>8}: {cells/best[r]/1e9:7.1f} GCUPS")


if __name__ == "__main__":
    main()
