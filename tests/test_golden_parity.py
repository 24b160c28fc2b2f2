"""Golden-output parity: engine output must byte-match the reference
``opal_aligner``'s per-sequence result lines and rendered alignments on the
in-tree FASTA fixtures (fixtures pre-generated from the reference binary;
format: src/opal_aligner.cpp:170-188).

Note: for SW score-0 sequences under -x 1 the reference prints indeterminate
end locations (its improvement tracker reads lane-stale values), so such
lines are normalized on both sides.
"""
import glob
import os
import re

import numpy as np
import pytest

from opal_tpu.constants import MODE_CODES, SEARCH_SCORE
from opal_tpu.engine.search import Engine, search_database
from opal_tpu.fasta import read_fasta_file
from opal_tpu.matrices import ScoreMatrix
from opal_tpu.render import render_alignment, result_line

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REF_DATA = "/root/reference/test_data"

CASES = sorted(os.path.basename(p) for p in glob.glob(f"{GOLDEN_DIR}/*.txt"))


def _normalize_sw_zero(lines, search_type, mode_name):
    if mode_name != "SW" or search_type != 1:
        return lines
    out = []
    for ln in lines:
        m = re.match(r"(#\d+: 0) \(\?, \?\) \(-?\d+, -?\d+\)$", ln)
        out.append(m.group(1) + " (?, ?) (?, ?)" if m else ln)
    return out


@pytest.fixture(scope="module")
def engine():
    return Engine(backend="xla", block_size=64)


@pytest.mark.parametrize("case", CASES)
def test_golden(case, engine):
    stem = case[:-4]
    qname, dbname, rest = stem.split("__")
    mode_name, x, o, e = rest.split("_")
    search_type = int(x[1:])
    gap_open, gap_ext = int(o[1:]), int(e[1:])
    mode = MODE_CODES[mode_name]

    sm = ScoreMatrix.blosum50()
    lut = sm.letter_index()
    qs, _ = read_fasta_file(f"{REF_DATA}/query/{qname}.fasta", lut)
    db, _ = read_fasta_file(f"{REF_DATA}/db/{dbname}.fasta", lut)
    query = qs[0]

    res = search_database(
        query, db, gap_open, gap_ext, sm.matrix,
        mode=mode, search_type=search_type, engine=engine,
    )
    lines = []
    for i, (r, t) in enumerate(zip(res, db)):
        lines.append(result_line(i, r))
        if r.alignment is not None:
            lines.append(render_alignment(query, t, r, sm.alphabet))
    mine = [ln for ln in "\n".join(lines).splitlines() if ln.strip()]
    want = [
        ln
        for ln in open(os.path.join(GOLDEN_DIR, case)).read().splitlines()
        if ln.strip()
    ]
    mine = _normalize_sw_zero(mine, search_type, mode_name)
    want = _normalize_sw_zero(want, search_type, mode_name)
    assert mine == want
