#!/usr/bin/env python3
"""In-process T_CHUNK A/B at the bench protocol (dev tool).

The original T_CHUNK=128 measurement (3-6% slower than 64) predates exact
block padding: back then a 128-column quantum also doubled padding waste.
With meta-ncols padding decoupled from the chunk size, the only remaining
effects are per-grid-step overhead (fewer, larger steps) vs pipeline
granularity — worth re-measuring. Mutates pallas_kernels.T_CHUNK between
variants inside ONE process (clearing the builder caches; the persistent
XLA cache makes re-jits cheap), asserts score parity, and interleaves
timing rounds.
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
from opal_tpu.engine import pallas_kernels as pk  # noqa: E402
from opal_tpu.engine.search import Engine, search_database_arrays  # noqa: E402
from opal_tpu.fasta import read_fasta_file  # noqa: E402
from opal_tpu.matrices import ScoreMatrix  # noqa: E402

QUERY_FASTA = "/root/reference/test_data/query/O74807.fasta"


def set_tc(tc: int):
    pk.T_CHUNK = tc
    pk.build_pallas_ragged_fn_raw.cache_clear()
    pk.build_pallas_ragged_fn.cache_clear()
    pk.build_pallas_score_fn_raw.cache_clear()
    pk.build_pallas_score_fn.cache_clear()
    pk.build_pallas_multi_fn_raw.cache_clear()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tcs", default="64,128,32")
    ap.add_argument("--n-seqs", type=int, default=541762)
    ap.add_argument("--rounds", type=int, default=4)
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

    tcs = [int(t) for t in args.tcs.split(",")]
    setups = {}
    base = None
    for tc in tcs:
        set_tc(tc)
        eng = Engine(backend="auto", block_size=args.block_size)
        ddb = eng.upload(db)
        out = search_database_arrays(query, ddb, 3, 1, sm.matrix,
                                     mode=MODE_SW, search_type=SEARCH_SCORE,
                                     engine=eng)  # compile + parity
        if base is None:
            base = out["score"]
        elif not np.array_equal(base, out["score"]):
            print(f"PARITY FAIL tc={tc}")
            return 1
        setups[tc] = (eng, ddb)

    times: dict = {tc: [] for tc in tcs}
    for _ in range(args.rounds):
        for tc in tcs:
            set_tc(tc)
            eng, ddb = setups[tc]
            search_database_arrays(query, ddb, 3, 1, sm.matrix,
                                   mode=MODE_SW, search_type=SEARCH_SCORE,
                                   engine=eng)  # re-jit against this TC
            for _ in range(2):
                t0 = time.perf_counter()
                search_database_arrays(
                    query, ddb, 3, 1, sm.matrix, mode=MODE_SW,
                    search_type=SEARCH_SCORE, engine=eng)
                times[tc].append(time.perf_counter() - t0)

    for tc in tcs:
        ts = sorted(times[tc])
        print(json.dumps({
            "t_chunk": tc,
            "best_s": round(ts[0], 4),
            "median_s": round(ts[len(ts) // 2], 4),
            "best_gcups": round(total * len(query) / ts[0] / 1e9, 2),
            "median_gcups": round(
                total * len(query) / ts[len(ts) // 2] / 1e9, 2),
        }))
    print("parity: MATCH across chunk sizes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
