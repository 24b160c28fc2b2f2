#!/usr/bin/env python3
"""Cross-tool comparison harness: opal_tpu vs the reference opal_aligner.

Analog of the reference's `test/compare_aligners` (which benchmarked Opal
against SSW/SSEARCH/SWIPE); here the comparison target is the reference
binary itself, built on the fly from the mounted reference sources. Checks
output parity line-by-line and reports both tools' search times.

Usage: compare_vs_reference.py QUERY.fasta DB.fasta [-a MODE] [-x LEVEL]
"""
import argparse
import os
import re
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_SRC = "/root/reference/src"


def build_reference(tmpdir: str) -> str:
    exe = os.path.join(tmpdir, "opal_aligner")
    subprocess.run(
        ["g++", "-std=c++11", "-O3", "-march=native", f"-I{REF_SRC}",
         "-o", exe, f"{REF_SRC}/opal.cpp", f"{REF_SRC}/opal_aligner.cpp",
         f"{REF_SRC}/ScoreMatrix.cpp"],
        check=True, capture_output=True,
    )
    return exe


def extract_body(stdout: str):
    body = stdout[stdout.index("#0:"):]
    cpu = float(re.search(r"Cpu time of searching: ([\d.]+)", stdout).group(1))
    body = body[: body.index("\nCpu time")]
    return [ln for ln in body.splitlines() if ln.strip()], cpu


def normalize_full(stdout: str):
    """FULL stdout, timing-dependent values normalized: every header,
    progress, result, and alignment line must match the reference
    byte-for-byte (reference: src/opal_aligner.cpp:108-207)."""
    out = []
    for ln in stdout.splitlines():
        ln = re.sub(r"^(Cpu time of searching:) [\d.]+$", r"\1 T", ln)
        ln = re.sub(
            r"^(GCUPS \(giga cell updates per second\):) [\d.]+$",
            r"\1 G", ln)
        out.append(ln)
    # trailing blank-line differences are not meaningful
    while out and not out[-1].strip():
        out.pop()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("db")
    ap.add_argument("-a", dest="mode", default="SW")
    ap.add_argument("-x", dest="level", default="1")
    ap.add_argument("-o", dest="gap_open", default="3")
    ap.add_argument("-e", dest="gap_ext", default="1")
    args = ap.parse_args()

    if not os.path.exists(f"{REF_SRC}/opal.cpp"):
        print("reference sources not mounted; nothing to compare against")
        return 2

    with tempfile.TemporaryDirectory() as td:
        exe = build_reference(td)
        flags = ["-a", args.mode, "-x", args.level,
                 "-o", args.gap_open, "-e", args.gap_ext]
        t0 = time.perf_counter()
        ref = subprocess.run([exe, *flags, args.query, args.db],
                             capture_output=True, text=True)
        ref_wall = time.perf_counter() - t0
        ref_lines, ref_cpu = extract_body(ref.stdout)

        t0 = time.perf_counter()
        mine = subprocess.run(
            [sys.executable, "-m", "opal_tpu.cli", *flags, args.query, args.db],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        my_wall = time.perf_counter() - t0
        my_lines, my_cpu = extract_body(mine.stdout)

    ok = my_lines == ref_lines
    if not ok and args.mode == "SW" and args.level == "1":
        # normalize the reference's indeterminate score-0 end locations
        norm = lambda ls: [re.sub(r"^(#\d+: 0) .*", r"\1", ln) for ln in ls]
        ok = norm(my_lines) == norm(ref_lines)
    print(f"parity: {'MATCH' if ok else 'MISMATCH'} "
          f"({len(my_lines)} vs {len(ref_lines)} lines)")
    if not ok:
        for a, b in zip(my_lines, ref_lines):
            if a != b:
                print(f"  mine: {a}\n  ref : {b}")
                break

    # whole-stdout parity (headers + progress + results + alignments),
    # normalizing only the timing values
    my_full = normalize_full(mine.stdout)
    ref_full = normalize_full(ref.stdout)
    full_ok = my_full == ref_full
    if not full_ok and ok:
        # score-0 normalization may already have been applied above
        n0 = lambda ls: [re.sub(r"^(#\d+: 0) .*", r"\1", ln) for ln in ls]
        full_ok = n0(my_full) == n0(ref_full)
    print(f"full-stdout parity: {'MATCH' if full_ok else 'MISMATCH'} "
          f"({len(my_full)} vs {len(ref_full)} lines)")
    if not full_ok:
        import difflib

        for d in list(difflib.unified_diff(ref_full, my_full,
                                           "reference", "opal_tpu",
                                           lineterm=""))[:24]:
            print(" ", d)
    ok = ok and full_ok
    print(f"search time: opal_tpu {my_cpu:.3f}s (wall {my_wall:.1f}s incl. "
          f"startup/compile), reference {ref_cpu:.3f}s (wall {ref_wall:.1f}s)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
