#!/usr/bin/env python3
"""Full parity sweep on the current JAX backend (run on TPU): engine output
vs golden fixtures from the reference binary, all modes x search types.

The pytest suite pins CPU (virtual-device mesh); this script exercises the
same golden comparisons through the Pallas TPU path.

--large adds the Swiss-Prot-scale fixture (tests/data/synth12071.fasta.gz,
12071 sequences / 4.34M residues, the stand-in for the reference's missing
uniprot_sprot12071.fasta): 16 committed x0/x1 goldens from
tests/golden_large/ plus 4 alignment (x2) configs whose reference outputs
are regenerated on the fly from the mounted sources (they are ~12 MB each,
too large to commit; see tools/make_large_parity.py).
"""
import argparse
import glob
import gzip
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opal_tpu.constants import MODE_CODES  # noqa: E402
from opal_tpu.engine.search import Engine, search_database  # noqa: E402
from opal_tpu.fasta import read_fasta_file  # noqa: E402
from opal_tpu.matrices import ScoreMatrix  # noqa: E402
from opal_tpu.render import render_alignment, result_line  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden")
GOLDEN_LARGE = os.path.join(REPO, "tests", "golden_large")
LARGE_DB = os.path.join(REPO, "tests", "data", "synth12071.fasta.gz")
REF_DATA = "/root/reference/test_data"


def norm_sw_zero(lines, search_type, mode_name):
    if mode_name != "SW" or search_type != 1:
        return lines
    out = []
    for ln in lines:
        m = re.match(r"(#\d+: 0) \(\?, \?\) \(-?\d+, -?\d+\)$", ln)
        out.append(m.group(1) + " (?, ?) (?, ?)" if m else ln)
    return out


def read_golden(path: str):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return [ln for ln in f.read().splitlines() if ln.strip()]


def run_case(engine, sm, lut, stem, qpath, dbpath, want, db_cache):
    qname, dbname, rest = stem.split("__")
    mode_name, x, o, e = rest.split("_")
    search_type = int(x[1:])
    go, ge = int(o[1:]), int(e[1:])
    qs, _ = read_fasta_file(qpath, lut)
    if dbpath not in db_cache:
        db_cache.clear()  # one large DB in memory at a time
        db_cache[dbpath] = read_fasta_file(dbpath, lut)[0]
    db = db_cache[dbpath]
    res = search_database(
        qs[0], db, go, ge, sm.matrix, mode=MODE_CODES[mode_name],
        search_type=search_type, engine=engine,
    )
    lines = []
    for i, (r, t) in enumerate(zip(res, db)):
        lines.append(result_line(i, r))
        if r.alignment is not None:
            lines.append(render_alignment(qs[0], t, r, sm.alphabet))
    mine = [ln for ln in "\n".join(lines).splitlines() if ln.strip()]
    mine = norm_sw_zero(mine, search_type, mode_name)
    want = norm_sw_zero(want, search_type, mode_name)
    ok = mine == want
    print(f"{stem}: {'MATCH' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        for a, b in zip(mine, want):
            if a != b:
                print(f"  mine: {a}\n  want: {b}")
                break
        if len(mine) != len(want):
            print(f"  line counts: mine {len(mine)}, want {len(want)}")
    return ok


def run_multi_case(engine, sm, lut, dbpath, mode_name, search_type,
                   golden_paths, db_cache):
    """Stacked multi-query parity: all queries share one kernel pass
    (search_database_multi_arrays), each query's result lines diffed
    against its own golden. Exercises the SEG_M-stacked x0/x1 kernels
    (engine/pallas_kernels.py::_kernel_multi) on the hardware path."""
    from opal_tpu.engine.search import search_database_multi_arrays

    queries, stems = [], []
    for path in golden_paths:
        stem = os.path.basename(path).replace(".txt.gz", "").replace(
            ".txt", "")
        qname = stem.split("__")[0]
        qs, _ = read_fasta_file(f"{REF_DATA}/query/{qname}.fasta", lut)
        queries.append(qs[0])
        stems.append(stem)
    if dbpath not in db_cache:
        db_cache.clear()
        db_cache[dbpath] = read_fasta_file(dbpath, lut)[0]
    db = db_cache[dbpath]
    outs = search_database_multi_arrays(
        queries, db, 3, 1, sm.matrix, mode=MODE_CODES[mode_name],
        search_type=search_type, engine=engine,
    )
    from opal_tpu.render import result_line
    from opal_tpu.result import SearchResult

    def line(i, s, eq=-1, et=-1):
        # go through the real renderer (the single source of truth the
        # golden diffs validate everywhere else) instead of a hand-rolled
        # format string
        r = SearchResult()
        r.set_score(int(s))
        r.end_location_query = int(eq)
        r.end_location_target = int(et)
        return result_line(i, r)

    all_ok = True
    for stem, path, out in zip(stems, golden_paths, outs):
        want = norm_sw_zero(read_golden(path), search_type, mode_name)
        if search_type == 0:
            mine = [line(i, s) for i, s in enumerate(out["score"])]
        else:
            mine = [line(i, s, eq, et)
                    for i, (s, eq, et) in enumerate(
                        zip(out["score"], out["end_q"], out["end_t"]))]
        mine = norm_sw_zero(mine, search_type, mode_name)
        ok = mine == want
        print(f"multi[{stem}]: {'MATCH' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            all_ok = False
            for a, b in zip(mine, want):
                if a != b:
                    print(f"  mine: {a}\n  want: {b}")
                    break
    return all_ok


def large_x2_cases(tmpdir: str):
    """Regenerate the 4 alignment-mode reference outputs at 12k scale."""
    from tools.make_large_parity import build_reference, run_reference

    db_plain = os.path.join(tmpdir, "synth12071.fasta")
    with gzip.open(LARGE_DB, "rb") as f, open(db_plain, "wb") as g:
        g.write(f.read())
    exe = build_reference(tmpdir)
    qpath = f"{REF_DATA}/query/O74807.fasta"
    for mode in ("SW", "NW", "HW", "OV"):
        body = run_reference(exe, qpath, db_plain, mode, 2)
        want = [ln for ln in body.splitlines() if ln.strip()]
        yield f"O74807__synth12071__{mode}_x2_o3_e1", qpath, want


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--large", action="store_true",
                    help="include the 12k-sequence Swiss-Prot-scale fixture")
    ap.add_argument("--only", help="substring filter on config stems")
    args = ap.parse_args()

    sm = ScoreMatrix.blosum50()
    lut = sm.letter_index()
    engine = Engine(backend="pallas", block_size=256)
    db_cache = {}
    failures = total = 0

    cases = []
    for path in sorted(glob.glob(f"{GOLDEN}/*.txt")):
        stem = os.path.basename(path)[:-4]
        qname, dbname, _ = stem.split("__")
        cases.append((stem, f"{REF_DATA}/query/{qname}.fasta",
                      f"{REF_DATA}/db/{dbname}.fasta", path))
    if args.large:
        for path in sorted(glob.glob(f"{GOLDEN_LARGE}/*.txt.gz")):
            stem = os.path.basename(path)[:-7]
            qname = stem.split("__")[0]
            cases.append((stem, f"{REF_DATA}/query/{qname}.fasta",
                          LARGE_DB, path))

    for stem, qpath, dbpath, goldpath in cases:
        if args.only and args.only not in stem:
            continue
        total += 1
        if not run_case(engine, sm, lut, stem, qpath, dbpath,
                        read_golden(goldpath), db_cache):
            failures += 1
    if args.large and not args.only:
        # stacked multi-query parity: O74807 + P18080 share one DP pass
        # per (mode, x) against the 12k-seq fixture
        for mode_name in ("SW", "NW", "HW", "OV"):
            for st in (0, 1):
                paths = sorted(glob.glob(
                    f"{GOLDEN_LARGE}/*__synth12071__{mode_name}_x{st}_o3_e1"
                    ".txt.gz"))
                if len(paths) < 2:
                    continue
                total += 1
                if not run_multi_case(engine, sm, lut, LARGE_DB, mode_name,
                                      st, paths, db_cache):
                    failures += 1

    if args.large and (not args.only or "x2" in args.only
                       or "synth" in args.only):
        with tempfile.TemporaryDirectory(prefix="tpu_parity_") as tmpdir:
            for stem, qpath, want in large_x2_cases(tmpdir):
                if args.only and args.only not in stem:
                    continue
                total += 1
                if not run_case(engine, sm, lut, stem, qpath, LARGE_DB,
                                want, db_cache):
                    failures += 1

    print(f"\n{failures} failures / {total} configs")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
