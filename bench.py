#!/usr/bin/env python3
"""Headline benchmark: SW score-only GCUPS per chip.

Protocol mirrors the reference's published measurement
(reference: aligner_comparison.md:10-25 — query O74807 (110 aa), SW,
BLOSUM50, gapOpen=3, gapExt=1, score-only, time excludes I/O): the DB
resides on-device (the analog of the reference holding it in RAM), the
search is timed end-to-end including result download, and
GCUPS = dbResidues x queryLen / time / 1e9 (src/opal_aligner.cpp:204-207).

DB: synthetic Swiss-Prot-like stand-in (see tools/make_synth_db.py) at the
reference protocol's full scale — 541,762 sequences, ~1.93e8 residues, the
size of the UniProtKB/Swiss-Prot release the reference benchmarked against
(aligner_comparison.md:14).

Baseline: Opal AVX2 single-core, O74807 vs full Swiss-Prot, 5.2 s
=> ~4.08 GCUPS (BASELINE.md). vs_baseline = ours / 4.08.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opal_tpu.constants import MODE_SW, SEARCH_SCORE  # noqa: E402
from opal_tpu.engine.search import Engine, search_database_arrays  # noqa: E402
from opal_tpu.matrices import ScoreMatrix  # noqa: E402

BASELINE_GCUPS = 4.08  # Opal AVX2 1-core, O74807 vs Swiss-Prot (5.2 s)

QUERY_FASTA = "/root/reference/test_data/query/O74807.fasta"


def load_query(sm):
    if os.path.exists(QUERY_FASTA):
        from opal_tpu.fasta import read_fasta_file

        qs, _ = read_fasta_file(QUERY_FASTA, sm.letter_index())
        return qs[0]
    rng = np.random.default_rng(74807)
    return rng.integers(0, 20, size=110, dtype=np.uint8)


def probe_backend(timeout_s=150, attempts=4, wait_s=60):
    """Resolve the default JAX backend with a hard deadline.

    Device discovery on the tunneled TPU hangs indefinitely (no error)
    during tunnel outages, which would wedge the whole bench run. Probe in
    a subprocess so the hang is bounded; retry a few times since outages
    sometimes end between probes.
    """
    import subprocess

    for attempt in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.default_backend())"],
                capture_output=True, text=True, timeout=timeout_s)
            if r.returncode == 0 and r.stdout.strip():
                return r.stdout.strip().splitlines()[-1]
        except subprocess.TimeoutExpired:
            pass
        if attempt < attempts - 1:
            time.sleep(wait_s)
    return None


def main():
    platform = probe_backend()
    if platform is None:
        # the device tunnel is down: report that rather than hanging or
        # silently benchmarking the CPU twin as the headline
        print(json.dumps({
            "metric": "SW_score_GCUPS_per_chip", "value": 0.0,
            "unit": "GCUPS", "vs_baseline": 0.0,
            "error": "tpu_tunnel_unavailable (device discovery hung)",
        }))
        return 1

    sm = ScoreMatrix.blosum50()
    query = load_query(sm)

    n_seqs = int(os.environ.get("BENCH_SEQS", "541762"))
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from make_synth_db import make_db_arrays

    lut = sm.letter_index()
    db = [lut[a] for a in make_db_arrays(n_seqs, seed=12071)]
    total_residues = sum(len(s) for s in db)

    backend = "pallas" if platform == "tpu" else "xla"
    # B=1024 is the measured v5e sweet spot at this query length (2048 was
    # 13-25% slower in-process — VMEM/vreg working-set pressure; the 2048
    # here predated that finding). BENCH_BLOCK overrides for A/B runs.
    engine = Engine(backend=backend,
                    block_size=int(os.environ.get("BENCH_BLOCK", "1024")))

    ddb = engine.upload(db)  # resident DB (excluded, like the reference's I/O)

    def run():
        t0 = time.perf_counter()
        res = search_database_arrays(
            query, ddb, 3, 1, sm.matrix, mode=MODE_SW,
            search_type=SEARCH_SCORE, engine=engine,
        )
        dt = time.perf_counter() - t0
        return dt, res

    run()  # warm-up (compile)
    times = [run()[0] for _ in range(5)]
    # The shared/tunneled chip has minute-scale slow windows (measured
    # ±25%, and a whole back-to-back batch can sit inside one without any
    # telltale spread). Sample across ~1 minute unconditionally — runs are
    # ~0.2 s, so this is cheap — and retry harder if the spread still says
    # we are in a slow window.
    for _ in range(3):
        time.sleep(12)
        times.extend(run()[0] for _ in range(2))
    if max(times) / min(times) > 1.3:
        for _ in range(3):
            time.sleep(10)
            times.extend(run()[0] for _ in range(2))
    best = min(times)
    gcups = total_residues * len(query) / best / 1e9

    print(json.dumps({
        "metric": "SW_score_GCUPS_per_chip",
        "value": round(gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
