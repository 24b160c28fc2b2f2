#!/usr/bin/env python3
"""Build the Swiss-Prot-scale parity fixture (BASELINE.json's configs).

The reference's headline parity DB (test_data/db/uniprot_sprot12071.fasta,
12071 entries / ~4.2M residues) is absent from the mounted snapshot
(/root/reference/.MISSING_LARGE_BLOBS), so the large-scale fixture is the
deterministic synthetic stand-in from make_synth_db (seed 12071 => identical
bytes everywhere). This tool

1. writes the DB gzipped to tests/data/synth12071.fasta.gz (the engine's
   FASTA reader is gzip-transparent),
2. builds the reference opal_aligner from the mounted sources
   (/root/reference/src, cf. opal_aligner.cpp:20-235),
3. runs it over 2 queries x 4 modes x search types 0/1 and stores the
   result bodies gzipped under tests/golden_large/, plus search type 2
   (full alignment blocks, ~12 MB raw but ~1-2 MB gzipped each) for the
   O74807 query x 4 modes AND P18080 x SW/HW — committed so
   tools/tpu_parity.py --large needs no compiler or mounted reference
   sources at run time.

Re-running this tool must be a no-op diff-wise.
"""
import glob
import gzip
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_synth_db import make_db, write_fasta  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"
QUERIES = ("O74807", "P18080")
MODES = ("SW", "NW", "HW", "OV")


def build_reference(tmpdir: str) -> str:
    exe = os.path.join(tmpdir, "opal_aligner")
    subprocess.run(
        ["g++", "-std=c++11", "-O3", "-march=native", f"-I{REF_SRC}",
         "-o", exe, f"{REF_SRC}/opal.cpp", f"{REF_SRC}/opal_aligner.cpp",
         f"{REF_SRC}/ScoreMatrix.cpp"],
        check=True, capture_output=True,
    )
    return exe


def extract_body(stdout: str) -> str:
    """Result lines (and alignment blocks) between '#0:' and 'Cpu time'."""
    body = stdout[stdout.index("#0:"):]
    return body[: body.index("\nCpu time")] + "\n"


def run_reference(exe, query, db, mode, x):
    p = subprocess.run(
        [exe, "-a", mode, "-x", str(x), query, db],
        capture_output=True, text=True, check=True,
    )
    return extract_body(p.stdout)


def main():
    tmpdir = tempfile.mkdtemp(prefix="large_parity_")
    db_plain = os.path.join(tmpdir, "synth12071.fasta")
    seqs = make_db(12071, 12071)
    write_fasta(db_plain, seqs)
    n_res = sum(map(len, seqs))
    print(f"DB: {len(seqs)} sequences, {n_res} residues")

    db_gz = os.path.join(REPO, "tests", "data", "synth12071.fasta.gz")
    os.makedirs(os.path.dirname(db_gz), exist_ok=True)
    with open(db_plain, "rb") as f, gzip.GzipFile(
            filename="", mode="wb", fileobj=open(db_gz, "wb"), mtime=0) as g:
        g.write(f.read())
    print(f"wrote {db_gz} ({os.path.getsize(db_gz)} bytes)")

    exe = build_reference(tmpdir)
    outdir = os.path.join(REPO, "tests", "golden_large")
    os.makedirs(outdir, exist_ok=True)
    for q in QUERIES:
        qpath = f"/root/reference/test_data/query/{q}.fasta"
        for mode in MODES:
            # x2 for every mode of the headline query (4 x ~1.5 MB
            # gzipped) + SW/HW of P18080 (alignment-path parity at scale
            # must not be single-query; P18080's NW/OV x2 skipped purely
            # for fixture size — soak + live diffs cover those paths)
            if q == "O74807":
                xs = (0, 1, 2)
            else:
                xs = (0, 1, 2) if mode in ("SW", "HW") else (0, 1)
            for x in xs:
                body = run_reference(exe, qpath, db_plain, mode, x)
                name = f"{q}__synth12071__{mode}_x{x}_o3_e1.txt.gz"
                path = os.path.join(outdir, name)
                with gzip.GzipFile(filename="", mode="wb",
                                   fileobj=open(path, "wb"), mtime=0) as g:
                    g.write(body.encode())
                print(f"wrote {name} ({os.path.getsize(path)} bytes)")
    n = len(glob.glob(os.path.join(outdir, "*.txt.gz")))
    print(f"{n} large goldens in {outdir}")


if __name__ == "__main__":
    main()
