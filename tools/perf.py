#!/usr/bin/env python3
"""Performance suite: times all 4 modes for the reference's benchmark
queries, reporting seconds + GCUPS per configuration.

Analog of the reference's shell harness (reference: test/perf:1-25), which
times `opal_aligner -s` for 4 UniProt queries x 4 modes. DB defaults to the
synthetic Swiss-Prot stand-in (see make_synth_db.py); pass --db to use a
real FASTA file.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opal_tpu.constants import (  # noqa: E402
    MODE_CODES, SEARCH_ALIGNMENT, SEARCH_SCORE, SEARCH_SCORE_END,
)
from opal_tpu.engine.search import Engine, search_database_arrays  # noqa: E402
from opal_tpu.fasta import read_fasta_file  # noqa: E402
from opal_tpu.matrices import ScoreMatrix  # noqa: E402

QUERY_DIR = "/root/reference/test_data/query"
QUERIES = ["O74807", "P19930", "Q3ZAI3", "P18080"]  # reference: test/perf:8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default=None, help="FASTA DB (default: synthetic)")
    ap.add_argument("--n-seqs", type=int, default=541762)
    ap.add_argument("--modes", default="SW,NW,HW,OV")
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--block-size", type=int, default=1024)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--search-type", type=int, default=0, choices=(0, 1),
                    help="0=score only (reference protocol), 1=score+end")
    ap.add_argument("--multi", action="store_true",
                    help="also time the 4 queries STACKED in one kernel "
                    "pass per mode (search_database_multi_arrays) — "
                    "compare against the sum of the per-query rows")
    args = ap.parse_args()
    st = SEARCH_SCORE if args.search_type == 0 else SEARCH_SCORE_END

    sm = ScoreMatrix.blosum50()
    lut = sm.letter_index()

    if args.db:
        db, _ = read_fasta_file(args.db, lut)
    else:
        from make_synth_db import make_db_arrays

        db = [lut[a] for a in make_db_arrays(args.n_seqs, seed=12071)]
    total = sum(len(s) for s in db)
    print(f"DB: {len(db)} sequences, {total} residues")

    engine = Engine(backend=args.backend, block_size=args.block_size)
    ddb = engine.upload(db)

    rows = []
    loaded = []
    for qname in QUERIES:
        qpath = os.path.join(QUERY_DIR, f"{qname}.fasta")
        if not os.path.exists(qpath):
            continue
        qs, _ = read_fasta_file(qpath, lut)
        loaded.append((qname, qs[0]))
    seq_secs = {}  # mode -> summed per-query best seconds
    for qname, query in loaded:
        for mode_name in args.modes.split(","):
            mode = MODE_CODES[mode_name]
            search_database_arrays(
                query, ddb, 3, 1, sm.matrix, mode=mode,
                search_type=st, engine=engine,
            )  # warm-up/compile
            times = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                search_database_arrays(
                    query, ddb, 3, 1, sm.matrix, mode=mode,
                    search_type=st, engine=engine,
                )
                times.append(time.perf_counter() - t0)
            best = min(times)
            seq_secs[mode_name] = seq_secs.get(mode_name, 0.0) + best
            gcups = total * len(query) / best / 1e9
            rows.append({
                "query": qname, "query_len": len(query), "mode": mode_name,
                "seconds": round(best, 4), "gcups": round(gcups, 2),
                "seqs_per_sec": round(len(db) / best),
            })
            print(json.dumps(rows[-1]))

    if args.multi:
        from opal_tpu.engine.search import search_database_multi_arrays

        queries = [q for _, q in loaded]
        cells = total * sum(len(q) for q in queries)
        for mode_name in args.modes.split(","):
            mode = MODE_CODES[mode_name]
            search_database_multi_arrays(
                queries, ddb, 3, 1, sm.matrix, mode=mode,
                search_type=st, engine=engine)  # warm-up/compile
            times = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                search_database_multi_arrays(
                    queries, ddb, 3, 1, sm.matrix, mode=mode,
                    search_type=st, engine=engine)
                times.append(time.perf_counter() - t0)
            best = min(times)
            print(json.dumps({
                "stacked": [n for n, _ in loaded], "mode": mode_name,
                "seconds": round(best, 4),
                "gcups": round(cells / best / 1e9, 2),
                "sequential_seconds": round(seq_secs.get(mode_name, 0.0), 4),
                "speedup_vs_sequential": round(
                    seq_secs.get(mode_name, 0.0) / best, 3) if best else 0,
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
