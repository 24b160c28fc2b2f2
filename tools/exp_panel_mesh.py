"""A/B: query-panel streaming with mesh=None vs a 1-device mesh (real TPU).

Round-3 verdict item 1 "done" evidence: lifting the `ddb.mesh is None`
panel gate must not cost throughput — the shard_map wrapping of the panel
kernels (one device) should match the direct dispatch within noise, and
the results must be bit-identical. In-process timing (cross-process
comparisons are tunnel-noise-dominated, see CLAUDE.md).

Usage: python tools/exp_panel_mesh.py [--q 16000] [--nseq 3000] [--reps 3]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=16000)
    ap.add_argument("--nseq", type=int, default=3000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--mode", default="SW")
    ap.add_argument("--x", type=int, default=0)
    args = ap.parse_args()

    import jax

    from opal_tpu.constants import MODE_CODES, SEARCH_SCORE_END
    from opal_tpu.engine.search import Engine, search_database_arrays
    from opal_tpu.parallel.shard import db_mesh

    os.environ["OPAL_TPU_FORCE_PANELS"] = "1"
    mode = MODE_CODES[args.mode]
    st = SEARCH_SCORE_END if args.x else 0

    rng = np.random.default_rng(11)
    A = 24
    matrix = np.full((A, A), -2, np.int32)
    np.fill_diagonal(matrix, 5)
    query = rng.integers(0, 20, size=args.q, dtype=np.uint8)
    db = [rng.integers(0, 20, size=int(rng.integers(200, 1800)),
                       dtype=np.uint8) for _ in range(args.nseq)]
    cells = args.q * sum(len(s) for s in db)

    results = {}
    for label, mesh in (("mesh=None", None),
                        ("mesh=1dev", db_mesh(jax.devices()[:1]))):
        eng = Engine(backend="pallas", block_size=1024, mesh=mesh)
        out = search_database_arrays(query, db, 3, 1, matrix, mode=mode,
                                     search_type=st, engine=eng)
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = search_database_arrays(query, db, 3, 1, matrix,
                                         mode=mode, search_type=st,
                                         engine=eng)
            np.asarray(out["score"])  # force transfer (tunnel sync)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[label] = (best, {k: np.asarray(v) for k, v in out.items()})
        print(f"{label}: {cells / best / 1e9:.1f} GCUPS ({best:.3f} s)")

    a, b = results["mesh=None"][1], results["mesh=1dev"][1]
    for k in a:
        assert np.array_equal(a[k], b[k]), f"mismatch in {k}"
    print("outputs bit-identical: OK")
    r = results["mesh=1dev"][0] / results["mesh=None"][0]
    print(f"mesh/none time ratio: {r:.3f}")


if __name__ == "__main__":
    main()
