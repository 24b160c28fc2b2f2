#!/usr/bin/env python3
"""DB-throughput scaling over a device mesh: DB-seqs/s at 1, 2, ..., N
devices (the north-star scaling measurement; SURVEY.md §5/§6).

The DB lane axis is sharded over a 1D mesh; the query is replicated; results
gather at the host. On a multi-chip TPU slice this measures real ICI-attached
scaling; on a single-chip or CPU machine pass --force-cpu-devices N to
simulate the partitioning (validates the sharded program, not the speedup).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-seqs", type=int, default=40000)
    ap.add_argument("--query-len", type=int, default=110)
    ap.add_argument("--force-cpu-devices", type=int, default=0)
    ap.add_argument("--block-size", type=int, default=1024)
    args = ap.parse_args()

    if args.force_cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_cpu_devices}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from make_synth_db import make_db
    from opal_tpu.constants import MODE_SW, SEARCH_SCORE
    from opal_tpu.engine.search import Engine, search_database_arrays
    from opal_tpu.matrices import ScoreMatrix
    from opal_tpu.parallel.shard import db_mesh

    sm = ScoreMatrix.blosum50()
    lut = sm.letter_index()
    seqs = make_db(args.n_seqs, seed=12071)
    db = [lut[np.frombuffer(s.encode(), dtype=np.uint8)] for s in seqs]
    total = sum(len(s) for s in db)
    rng = np.random.default_rng(0)
    query = rng.integers(0, 20, size=args.query_len, dtype=np.uint8)

    all_devices = jax.devices()
    on_tpu = jax.default_backend() == "tpu"
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(all_devices)]
    for n in counts:
        mesh = db_mesh(all_devices[:n]) if n > 1 else None
        # The pallas ragged kernel runs per-device under shard_map (whole
        # blocks per device), so block_size stays constant across mesh
        # sizes; the XLA path (CPU simulation) shards lanes within a block
        # and needs B divisible by n.
        engine = Engine(
            backend="pallas" if on_tpu else "xla",
            block_size=(args.block_size if on_tpu
                        else args.block_size * max(1, n)),
            mesh=mesh,
        )
        ddb = engine.upload(db)
        search_database_arrays(
            query, ddb, 3, 1, sm.matrix, mode=MODE_SW,
            search_type=SEARCH_SCORE, engine=engine,
        )
        t0 = time.perf_counter()
        for _ in range(2):
            search_database_arrays(
                query, ddb, 3, 1, sm.matrix, mode=MODE_SW,
                search_type=SEARCH_SCORE, engine=engine,
            )
        dt = (time.perf_counter() - t0) / 2
        print(json.dumps({
            "devices": n,
            "seconds": round(dt, 4),
            "db_seqs_per_sec": round(len(db) / dt),
            "gcups": round(total * len(query) / dt / 1e9, 2),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
