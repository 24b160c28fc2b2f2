#!/usr/bin/env python3
"""Traceback (align-all) thread-scaling measurement.

Times the HOST alignment stage alone — the banded C fill + walk behind
`alignment_pass` — at several `OPAL_TPU_TRACEBACK_WORKERS` settings. The
exact (score, end) inputs come from the committed reference-binary x1
goldens (tests/golden_large/), so no search runs and nothing here touches
a device: this isolates the stage the reference runs per-pair after its
search loop (reference: src/opal.cpp:1475-1507).

Usage: tb_scaling.py [--n-pairs 4000] [--workers 1,2,4] [--query P18080]
"""
import argparse
import gzip
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pairs", type=int, default=4000)
    ap.add_argument("--workers", default="1,2,4")
    ap.add_argument("--query", default="P18080")
    ap.add_argument("--mode", default="SW")
    args = ap.parse_args()

    from opal_tpu.constants import MODE_CODES, SEARCH_SCORE
    from opal_tpu.engine.search import alignment_pass
    from opal_tpu.fasta import read_fasta_file
    from opal_tpu.matrices import ScoreMatrix
    from opal_tpu.result import SearchResult

    sm = ScoreMatrix.blosum50()
    lut = sm.letter_index()
    db, _ = read_fasta_file(
        os.path.join(REPO, "tests", "data", "synth12071.fasta.gz"), lut)
    qs, _ = read_fasta_file(
        f"/root/reference/test_data/query/{args.query}.fasta", lut)
    query = qs[0]

    golden = os.path.join(
        REPO, "tests", "golden_large",
        f"{args.query}__synth12071__{args.mode}_x1_o3_e1.txt.gz")
    pat = re.compile(r"^#(\d+): (-?\d+) \(\?, \?\) \((-?\d+), (-?\d+)\)")
    results = {}
    with gzip.open(golden, "rt") as f:
        for ln in f:
            m = pat.match(ln)
            if not m:
                continue
            i, score, eq, et = map(int, m.groups())
            r = SearchResult()
            r.set_score(score)
            r.end_location_query = eq
            r.end_location_target = et
            results[i] = r
    mode = MODE_CODES[args.mode]
    # biggest bands first: sort candidates by score to mimic a ranked
    # align-top-k workload, then cap
    cand = sorted(results, key=lambda i: -results[i].score)[: args.n_pairs]
    cells = sum(len(db[i]) * len(query) for i in cand)
    print(f"{len(cand)} pairs, {cells / 1e9:.2f} G full-matrix cells "
          f"(banded fill visits fewer), query {args.query} "
          f"len={len(query)}", flush=True)

    base = None
    for w in args.workers.split(","):
        os.environ["OPAL_TPU_TRACEBACK_WORKERS"] = w
        fresh = {i: _clone(results[i]) for i in cand}
        t0 = time.perf_counter()
        alignment_pass(query, db, 3, 1, sm.matrix, mode, fresh, list(cand))
        dt = time.perf_counter() - t0
        ok = sum(1 for i in cand if fresh[i].alignment is not None)
        if base is None:
            base = dt
        print(f"workers={w}: {dt:.2f} s  ({len(cand) / dt:,.0f} pairs/s, "
              f"{ok} aligned, speedup x{base / dt:.2f})", flush=True)
    return 0


def _clone(r):
    from opal_tpu.result import SearchResult

    c = SearchResult()
    c.set_score(r.score)
    c.end_location_query = r.end_location_query
    c.end_location_target = r.end_location_target
    return c


if __name__ == "__main__":
    sys.exit(main())
