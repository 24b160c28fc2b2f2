#!/usr/bin/env python3
"""Full parity sweep on the current JAX backend (run on TPU): engine output
vs golden fixtures from the reference binary, all modes x search types.

The pytest suite pins CPU (virtual-device mesh); this script exercises the
same golden comparisons through the Pallas TPU path.
"""
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opal_tpu.constants import MODE_CODES  # noqa: E402
from opal_tpu.engine.search import Engine, search_database  # noqa: E402
from opal_tpu.fasta import read_fasta_file  # noqa: E402
from opal_tpu.matrices import ScoreMatrix  # noqa: E402
from opal_tpu.render import render_alignment, result_line  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "golden")
REF_DATA = "/root/reference/test_data"


def norm_sw_zero(lines, search_type, mode_name):
    if mode_name != "SW" or search_type != 1:
        return lines
    out = []
    for ln in lines:
        m = re.match(r"(#\d+: 0) \(\?, \?\) \(-?\d+, -?\d+\)$", ln)
        out.append(m.group(1) + " (?, ?) (?, ?)" if m else ln)
    return out


def main():
    sm = ScoreMatrix.blosum50()
    lut = sm.letter_index()
    engine = Engine(backend="pallas", block_size=256)
    failures = 0
    for path in sorted(glob.glob(f"{GOLDEN}/*.txt")):
        stem = os.path.basename(path)[:-4]
        qname, dbname, rest = stem.split("__")
        mode_name, x, o, e = rest.split("_")
        search_type = int(x[1:])
        go, ge = int(o[1:]), int(e[1:])
        qs, _ = read_fasta_file(f"{REF_DATA}/query/{qname}.fasta", lut)
        db, _ = read_fasta_file(f"{REF_DATA}/db/{dbname}.fasta", lut)
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
        want = [ln for ln in open(path).read().splitlines() if ln.strip()]
        mine = norm_sw_zero(mine, search_type, mode_name)
        want = norm_sw_zero(want, search_type, mode_name)
        ok = mine == want
        print(f"{stem}: {'MATCH' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            failures += 1
            for a, b in zip(mine, want):
                if a != b:
                    print(f"  mine: {a}\n  want: {b}")
                    break
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
