#!/usr/bin/env python3
"""Decompose the x1 (score+end) full-array path vs x0 and the wire model.

VERDICT r4 #4: the full-array x1 consumer (CLI -x 1 printing every line)
trails x0 by 10-40 GCUPS e2e. This measures, in ONE process on the real
chip (cross-process timing is tunnel-RTT noise):

  - x0 and x1 end-to-end search_database_arrays times
  - the split: dispatch (async enqueue), device+gather (sync + download),
    host finalize/assembly
  - the wire model: payload bytes / measured link bandwidth (a dedicated
    same-size transfer), so the report can state how close the path sits
    to the transfer floor

Usage: exp_x1_gap.py [--n-seqs 541762] [--queries P18080,O74807]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-seqs", type=int, default=541762)
    ap.add_argument("--queries", default="P18080,O74807")
    ap.add_argument("--modes", default="SW,NW,HW,OV")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from make_synth_db import make_db_arrays
    from opal_tpu.constants import (
        MODE_CODES, SEARCH_SCORE, SEARCH_SCORE_END,
    )
    from opal_tpu.engine.search import Engine, search_database_arrays
    from opal_tpu.fasta import read_fasta_file
    from opal_tpu.matrices import ScoreMatrix

    sm = ScoreMatrix.blosum50()
    lut = sm.letter_index()
    db = [lut[a] for a in make_db_arrays(args.n_seqs, seed=12071)]
    total = sum(len(s) for s in db)
    eng = Engine(backend="pallas", block_size=1024)
    ddb = eng.upload(db)
    be = eng._resolve_backend()
    print(f"DB: {len(db)} seqs, {total/1e6:.1f}M residues", flush=True)

    # link bandwidth: one dedicated device->host transfer, sized like the
    # x1 payload (3 int16 rows per lane)
    import jax.numpy as jnp

    lanes = sum(b.lengths.shape[0] for b in ddb.blocks)
    for size in (3 * lanes * 2,):
        buf = jnp.zeros((size // 4,), jnp.int32) + 1
        np.asarray(buf)  # compile/settle
        t0 = time.perf_counter()
        np.asarray(buf + 1)
        dt = time.perf_counter() - t0
        print(f"link: {size/1e6:.2f} MB in {dt*1e3:.0f} ms = "
              f"{size/dt/1e6:.1f} MB/s (incl. 1 RTT)", flush=True)

    for qname in args.queries.split(","):
        qs, _ = read_fasta_file(
            f"/root/reference/test_data/query/{qname}.fasta", lut)
        query = qs[0]
        for mode_name in args.modes.split(","):
            mode = MODE_CODES[mode_name]
            row = {"query": qname, "Q": len(query), "mode": mode_name}
            for st, stname in ((SEARCH_SCORE, "x0"),
                               (SEARCH_SCORE_END, "x1")):
                search_database_arrays(
                    query, ddb, 3, 1, sm.matrix, mode=mode,
                    search_type=st, engine=eng)  # warm
                best = 1e9
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    search_database_arrays(
                        query, ddb, 3, 1, sm.matrix, mode=mode,
                        search_type=st, engine=eng)
                    best = min(best, time.perf_counter() - t0)
                row[stname + "_s"] = round(best, 4)
                row[stname + "_gcups"] = round(
                    total * len(query) / best / 1e9, 1)

            # split for x1: dispatch / gather / collect
            qprep = be.prepare_query(
                np.ascontiguousarray(
                    np.asarray(sm.matrix, np.int32)[
                        np.asarray(query, np.int64)].T), 3, 1)
            for _ in range(2):  # warm both stages
                h = be.dispatch_many(qprep, ddb, 3, 1, mode,
                                     SEARCH_SCORE_END)
                g = be.gather(h)
                be.collect_many(g, ddb, mode, SEARCH_SCORE_END, len(query))
            t0 = time.perf_counter()
            h = be.dispatch_many(qprep, ddb, 3, 1, mode, SEARCH_SCORE_END)
            t1 = time.perf_counter()
            g = be.gather(h)
            t2 = time.perf_counter()
            out = be.collect_many(g, ddb, mode, SEARCH_SCORE_END,
                                  len(query))
            t3 = time.perf_counter()
            row.update(dispatch_ms=round((t1 - t0) * 1e3, 1),
                       device_gather_ms=round((t2 - t1) * 1e3, 1),
                       collect_ms=round((t3 - t2) * 1e3, 1),
                       n_blocks=len(out))
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
