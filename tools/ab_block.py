#!/usr/bin/env python3
"""In-process lane-width A/B at the headline bench protocol.

Cross-process timing comparisons through the tunneled chip are noise-
dominated (25-35 ms round trips, minute-scale throughput windows — see
CLAUDE.md), so bench-config A/Bs must run inside ONE process, interleaved.
Times each lane width round-robin (default 1024 vs 2048) on the bench
protocol (O74807, SW score-only, BLOSUM50, synthetic Swiss-Prot-scale DB)
and prints per-width best/median GCUPS.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opal_tpu.constants import MODE_SW, SEARCH_SCORE  # noqa: E402
from opal_tpu.engine.search import Engine, search_database_arrays  # noqa: E402
from opal_tpu.fasta import read_fasta_file  # noqa: E402
from opal_tpu.matrices import ScoreMatrix  # noqa: E402

QUERY_FASTA = "/root/reference/test_data/query/O74807.fasta"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", default="1024,2048")
    ap.add_argument("--n-seqs", type=int, default=541762)
    ap.add_argument("--rounds", type=int, default=5,
                    help="interleaved timing rounds per width")
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--query", default=QUERY_FASTA)
    args = ap.parse_args()

    sm = ScoreMatrix.blosum50()
    lut = sm.letter_index()
    qs, _ = read_fasta_file(args.query, lut)
    query = qs[0]

    from make_synth_db import make_db_arrays

    db = [lut[a] for a in make_db_arrays(args.n_seqs, seed=12071)]
    total = sum(len(s) for s in db)

    widths = [int(b) for b in args.blocks.split(",")]
    engines = {}
    for B in widths:
        eng = Engine(backend=args.backend, block_size=B)
        ddb = eng.upload(db)
        search_database_arrays(query, ddb, 3, 1, sm.matrix, mode=MODE_SW,
                               search_type=SEARCH_SCORE, engine=eng)  # warm
        engines[B] = (eng, ddb)

    times: dict = {B: [] for B in widths}
    for _ in range(args.rounds):
        for B in widths:  # interleaved: every width samples every window
            eng, ddb = engines[B]
            t0 = time.perf_counter()
            search_database_arrays(query, ddb, 3, 1, sm.matrix, mode=MODE_SW,
                                   search_type=SEARCH_SCORE, engine=eng)
            times[B].append(time.perf_counter() - t0)

    for B in widths:
        ts = sorted(times[B])
        print(json.dumps({
            "block": B,
            "best_s": round(ts[0], 4),
            "median_s": round(ts[len(ts) // 2], 4),
            "best_gcups": round(total * len(query) / ts[0] / 1e9, 2),
            "median_gcups": round(
                total * len(query) / ts[len(ts) // 2] / 1e9, 2),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
