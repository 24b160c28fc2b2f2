#!/usr/bin/env python3
"""Batched device-side banded fill A/B at production scale (VERDICT r3 #5).

On the real chip with the Swiss-Prot-scale synthetic DB:
  1. x1 search -> top-K winners (device-side ranked emission).
  2. Host alignment pass (per-pair C fill, 1 core here).
  3. Device alignment pass (engine/device_fill.py batched fill; walk and
     replay validation on host), outputs diffed field-by-field vs host.
Reports wall time for both passes plus a COLD and a WARM timing of
`align_winners_device` (the env-knob e2e path pays one-time jit compiles
per group shape; the warm number is the steady-state serving cost). The
decision-bit matrix never leaves the device: the walk runs there too and
only packed op codes (2 per byte) download. `OPAL_TPU_DEVICE_FILL_STATS=1`
prints the per-stage split.
"""
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
    ap.add_argument("--qlen", type=int, default=513)
    ap.add_argument("--lanes", type=int, default=512)
    args = ap.parse_args()

    from make_synth_db import make_db_arrays
    from opal_tpu.constants import MODE_SW, SEARCH_SCORE_END
    from opal_tpu.engine.device_fill import align_winners_device
    from opal_tpu.engine.search import (
        Engine,
        alignment_pass,
        search_database_arrays,
    )
    from opal_tpu.matrices import ScoreMatrix
    from opal_tpu.result import SearchResult

    sm = ScoreMatrix.blosum50()
    lut = sm.letter_index()
    db = [lut[s] for s in make_db_arrays(args.n_seqs)]
    total = sum(len(s) for s in db)
    rng = np.random.default_rng(1)
    query = rng.integers(0, 20, size=args.qlen, dtype=np.uint8)
    eng = Engine(backend="pallas", block_size=1024)
    eng.upload(db)
    print(f"db: {len(db)} seqs, {total/1e6:.1f}M residues", flush=True)

    out = search_database_arrays(query, db, 3, 1, sm.matrix, mode=MODE_SW,
                                 search_type=SEARCH_SCORE_END, engine=eng,
                                 top_k=args.top_k)
    winners = [(int(i), int(s), int(eq), int(et))
               for i, s, eq, et in zip(out["index"], out["score"],
                                       out["end_q"], out["end_t"])]
    cells = sum((eq + 1) * (et + 1) for _, _, eq, et in winners)
    print(f"top-{len(winners)} winners, {cells/1e9:.2f} G rect cells",
          flush=True)

    def results_for():
        res = [SearchResult() for _ in range(len(db))]
        for i, s, eq, et in winners:
            r = res[i]
            r.score, r.score_set = s, True
            r.end_location_query, r.end_location_target = eq, et
        return res

    todo = sorted(i for i, _, _, _ in winners)

    # host pass
    os.environ.pop("OPAL_TPU_DEVICE_FILL", None)
    res_h = results_for()
    t0 = time.perf_counter()
    alignment_pass(query, db, 3, 1, sm.matrix, MODE_SW, res_h, todo)
    t_host = time.perf_counter() - t0
    print(f"host  alignment pass: {t_host:.2f} s "
          f"({len(todo)/t_host:,.0f} pairs/s)", flush=True)

    # device pass (via the env knob, same call path as search_database)
    os.environ["OPAL_TPU_DEVICE_FILL"] = "1"
    res_d = results_for()
    t0 = time.perf_counter()
    alignment_pass(query, db, 3, 1, sm.matrix, MODE_SW, res_d, todo)
    t_dev = time.perf_counter() - t0
    os.environ.pop("OPAL_TPU_DEVICE_FILL", None)
    print(f"device alignment pass: {t_dev:.2f} s "
          f"({len(todo)/t_dev:,.0f} pairs/s) [fill+download+walk+replay]",
          flush=True)

    # field-by-field diff
    n_dev = 0
    for a, b in zip(res_h, res_d):
        assert (a.score, a.start_location_query, a.start_location_target,
                a.end_location_query, a.end_location_target) == (
            b.score, b.start_location_query, b.start_location_target,
            b.end_location_query, b.end_location_target)
        if a.alignment is None:
            assert b.alignment is None
        else:
            np.testing.assert_array_equal(a.alignment, b.alignment)
            n_dev += 1
    print(f"outputs identical field-by-field ({n_dev} paths)", flush=True)

    # cold vs warm align_winners_device (cold pays the per-group-shape
    # jit compiles; warm is the steady-state serving cost)
    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        got = align_winners_device(query, db, 3, 1, sm.matrix, MODE_SW,
                                   winners, lanes=args.lanes)
        t_all = time.perf_counter() - t0
        print(f"align_winners_device ({label}): {t_all:.2f} s, coverage "
              f"{len(got)}/{len(winners)}", flush=True)


if __name__ == "__main__":
    main()
