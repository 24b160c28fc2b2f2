#!/usr/bin/env python3
"""Hardware probe: query-panel streaming vs the legacy paths.

Measures GCUPS (real cells = Q * total_db_residues) for long queries on
the panel path, the lane-width-downshift path, and the XLA twin, plus an
oracle/XLA exactness spot check. In-process A/B (cross-process timing is
tunnel-noise-dominated; see CLAUDE.md)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_one(eng, query, db, matrix, mode, st, n_rep=3):
    from opal_tpu.engine.search import search_database_arrays

    Q = len(query)
    cells = Q * sum(len(t) for t in db)
    out = search_database_arrays(query, db, 3, 1, matrix, mode=mode,
                                 search_type=st, engine=eng)
    best = None
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out = search_database_arrays(query, db, 3, 1, matrix, mode=mode,
                                     search_type=st, engine=eng)
        np.asarray(out["score"])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return out, cells / best / 1e9, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qlens", default="6000,16000,34000,65000,100000")
    ap.add_argument("--db-seqs", type=int, default=8000)
    ap.add_argument("--mode", default="SW")
    ap.add_argument("--st", type=int, default=0)
    ap.add_argument("--check", action="store_true",
                    help="diff panel outputs against the XLA twin")
    ap.add_argument("--no-xla", action="store_true",
                    help="skip the XLA twin timing lane")
    ap.add_argument("--only", default="",
                    help="comma list of lanes to run (panel/legacy/xla)")
    args = ap.parse_args()

    from opal_tpu.constants import MODE_CODES
    from opal_tpu.engine.search import Engine

    mode = MODE_CODES[args.mode]
    rng = np.random.default_rng(99)
    A = 24
    matrix = np.full((A, A), -1, np.int32)
    np.fill_diagonal(matrix, 3)
    db = [rng.integers(0, A, rng.integers(100, 700), dtype=np.uint8)
          for _ in range(args.db_seqs)]
    n_res = sum(len(t) for t in db)
    print(f"db: {len(db)} seqs, {n_res/1e6:.2f}M residues", flush=True)

    for qlen in map(int, args.qlens.split(",")):
        query = rng.integers(0, A, qlen, dtype=np.uint8)
        rows = {}
        for label, env, backend in (
            ("panel", {"OPAL_TPU_FORCE_PANELS": "1"}, "pallas"),
            ("legacy", {"OPAL_TPU_NO_PANELS": "1"}, "pallas"),
            ("xla", {}, "xla"),
        ):
            if args.only and label not in args.only.split(","):
                continue
            if label == "xla" and ((qlen > 40000 and not args.check)
                                   or args.no_xla):
                continue  # too slow to time repeatedly
            for k, v in env.items():
                os.environ[k] = v
            try:
                eng = Engine(backend=backend, block_size=1024)
                out, gcups, dt = run_one(eng, query, db, matrix, mode,
                                         args.st, n_rep=2)
                rows[label] = (out, gcups, dt)
                print(f"  Q={qlen} {label:7s}: {gcups:7.1f} GCUPS "
                      f"({dt*1e3:.0f} ms)", flush=True)
            except Exception as e:  # a lane may not compile at this Q
                print(f"  Q={qlen} {label:7s}: FAILS "
                      f"({type(e).__name__}: {str(e)[:90]})", flush=True)
            finally:
                for k in env:
                    os.environ.pop(k, None)
        if args.check and "panel" in rows and "xla" in rows:
            a, b = rows["panel"][0], rows["xla"][0]
            for k in a:
                if not np.array_equal(a[k], b[k]):
                    bad = np.nonzero(a[k] != b[k])[0][:5]
                    print(f"  MISMATCH Q={qlen} col={k} at {bad}: "
                          f"{a[k][bad]} vs {b[k][bad]}", flush=True)
                    return 1
            print(f"  Q={qlen}: panel == xla on all columns", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
