#!/usr/bin/env python3
"""Cross-tool benchmark: opal_tpu vs SSW / SSEARCH / SWIPE / reference opal.

Portable re-implementation of the reference's author-local harness
(reference: test/compare_aligners:1-40), which timed `opal_aligner -s`
against three other SIMD aligners on 4 UniProt queries with matched
parameters (gapOpen=3, gapExt=1, BLOSUM50, 1 thread, score-only;
reference: test/compare_aligners:17-19).

The reference script hard-codes the author's Dropbox paths
(test/compare_aligners:3,11) and so never ran anywhere else. This version
discovers each competitor at runtime — `$SSW`/`$SSEARCH`/`$SWIPE` env vars
first, then `ssw_test`/`ssearch36`/`swipe` on PATH — and reports any tool
that is not installed as `unavailable` instead of failing (none of them
ship in this container; the reference `opal_aligner` is always available
because it is built on the fly from the mounted sources).

Usage: compare_aligners.py DB.fasta [--queries A,B,...] [--swipe-db BLASTDB]
"""
import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compare_vs_reference import build_reference  # noqa: E402

QUERY_DIR = "/root/reference/test_data/query"
QUERIES = ["O74807", "P19930", "Q3ZAI3", "P18080"]  # test/compare_aligners:20
FLOAT = r"[0-9]+\.[0-9]+"


def find_tool(env_var: str, exe_name: str):
    p = os.environ.get(env_var)
    if p and os.path.exists(p):
        return p
    return shutil.which(exe_name)


def timed_grep(cmd, pattern, use_stderr=False, first=True):
    """Run cmd; return the tool-reported seconds matched by `pattern`
    (falling back to wall time when the tool prints none), or None on
    failure. Mirrors the reference's grep-a-float protocol
    (test/compare_aligners:28-39)."""
    t0 = time.perf_counter()
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
    except (OSError, subprocess.TimeoutExpired):
        return None
    wall = time.perf_counter() - t0
    if r.returncode != 0:
        return None
    text = r.stderr if use_stderr else r.stdout
    hits = re.findall(pattern, text)
    if not hits:
        return wall
    return float(hits[0] if first else hits[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("db", help="FASTA protein database")
    ap.add_argument("--queries", default=",".join(QUERIES))
    ap.add_argument("--query-dir", default=QUERY_DIR)
    ap.add_argument("--swipe-db", default=None,
                    help="makeblastdb-formatted DB path (SWIPE needs one; "
                    "reference: test/compare_aligners:14)")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ssw = find_tool("SSW", "ssw_test")
    ssearch = find_tool("SSEARCH", "ssearch36")
    swipe = find_tool("SWIPE", "swipe")

    with tempfile.TemporaryDirectory() as td:
        try:
            ref_exe = build_reference(td)
        except Exception:
            ref_exe = None
        for qname in args.queries.split(","):
            q = os.path.join(args.query_dir, f"{qname}.fasta")
            if not os.path.exists(q):
                print(f"# query {qname}: fixture missing, skipped")
                continue
            row = {"query": qname}
            # opal_tpu CLI, score-only silent run; the CLI prints the same
            # "Cpu time of searching" line as the reference
            # (opal_aligner.cpp:203-204).
            row["opal_tpu"] = timed_grep(
                [sys.executable, "-m", "opal_tpu.cli", "-s", q, args.db],
                rf"Cpu time of searching: ({FLOAT})")
            row["opal_ref"] = timed_grep(
                [ref_exe, "-s", q, args.db],
                rf"Cpu time of searching: ({FLOAT})") if ref_exe else None
            # Competitor invocations copied from the reference protocol
            # (test/compare_aligners:28-39): 1 thread, gap 3/1, BLOSUM50.
            row["swipe"] = timed_grep(
                [swipe, "-a", "1", "-p", "1", "-G", "3", "-E", "1",
                 "-M", "BLOSUM50", "-b", "0", "-i", q,
                 "-d", args.swipe_db],
                rf"Elapsed:\s*({FLOAT})",
            ) if (swipe and args.swipe_db) else None
            row["ssearch"] = timed_grep(
                [ssearch, "-d", "0", "-T", "1", "-p", "-f", "-3",
                 "-g", "-1", "-s", "BL50", q, args.db],
                rf"Total Scan time:\s*({FLOAT})",
            ) if ssearch else None
            row["ssw"] = timed_grep(
                [ssw, "-p", args.db, q], rf"({FLOAT})", use_stderr=True,
            ) if ssw else None
            out = {k: (round(v, 3) if isinstance(v, float) else
                       ("unavailable" if v is None and k != "query" else v))
                   for k, v in row.items()}
            print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
