#!/usr/bin/env python3
"""In-process A/B of the fine padding quantum + data-driven last-chunk
column count (meta ncols) at the bench protocol.

Interleaves OPAL_TPU_T_QUANTUM=64 (the pre-ncols packing: every chunk
runs all 64 columns) against the shipped default quantum 1 (blocks pad
to their exact max length; the last chunk runs only its real columns)
inside ONE process; cross-process comparisons are window-noise-dominated
(CLAUDE.md). Also asserts score parity between the packings.
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
    ap.add_argument("--quanta", default="64,1",
                    help="OPAL_TPU_T_QUANTUM values to interleave "
                    "(64 = pre-ncols packing, 1 = shipped default)")
    ap.add_argument("--n-seqs", type=int, default=541762)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--block-size", type=int, default=1024)
    ap.add_argument("--query", default=QUERY_FASTA)
    args = ap.parse_args()

    sm = ScoreMatrix.blosum50()
    lut = sm.letter_index()
    qs, _ = read_fasta_file(args.query, lut)
    query = qs[0]

    from make_synth_db import make_db_arrays

    db = [lut[a] for a in make_db_arrays(args.n_seqs, seed=12071)]
    total = sum(len(s) for s in db)

    quanta = [int(q) for q in args.quanta.split(",")]
    setups = {}
    base = None
    for q in quanta:
        os.environ["OPAL_TPU_T_QUANTUM"] = str(q)
        eng = Engine(backend="auto", block_size=args.block_size)
        ddb = eng.upload(db)
        out = search_database_arrays(query, ddb, 3, 1, sm.matrix,
                                     mode=MODE_SW, search_type=SEARCH_SCORE,
                                     engine=eng)  # warm + parity
        if base is None:
            base = out["score"]
        elif not np.array_equal(base, out["score"]):
            bad = int(np.nonzero(base != out["score"])[0][0])
            print(f"PARITY FAIL q={q} at seq {bad}")
            return 1
        setups[q] = (eng, ddb)

    times: dict = {q: [] for q in quanta}
    for _ in range(args.rounds):
        for q in quanta:
            eng, ddb = setups[q]
            t0 = time.perf_counter()
            search_database_arrays(query, ddb, 3, 1, sm.matrix,
                                   mode=MODE_SW, search_type=SEARCH_SCORE,
                                   engine=eng)
            times[q].append(time.perf_counter() - t0)

    for q in quanta:
        ts = sorted(times[q])
        print(json.dumps({
            "t_quantum": q,
            "best_s": round(ts[0], 4),
            "median_s": round(ts[len(ts) // 2], 4),
            "best_gcups": round(total * len(query) / ts[0] / 1e9, 2),
            "median_gcups": round(
                total * len(query) / ts[len(ts) // 2] / 1e9, 2),
        }))
    print("parity: MATCH across quanta")
    return 0


if __name__ == "__main__":
    sys.exit(main())
