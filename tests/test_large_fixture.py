"""Swiss-Prot-scale parity fixture (tests/data/synth12071.fasta.gz).

The reference's headline parity DB (uniprot_sprot12071.fasta, named by
BASELINE.json's configs) is missing from the mounted snapshot; the committed
fixture is the deterministic synthetic stand-in (tools/make_large_parity.py)
with reference-binary goldens in tests/golden_large/. The full 40-config
sweep runs on hardware via `tools/tpu_parity.py --large`; here the CPU suite
guards fixture integrity and checks a cheap prefix slice, and the tpu lane
runs one full 12k-sequence config.
"""
import gzip
import hashlib
import os

import pytest

from conftest import REF_DATA

HERE = os.path.dirname(__file__)
DB = os.path.join(HERE, "data", "synth12071.fasta.gz")
GOLDEN_LARGE = os.path.join(HERE, "golden_large")


def _read_db(lut):
    from opal_tpu.fasta import read_fasta_file

    db, _ = read_fasta_file(DB, lut)
    return db


@pytest.fixture(scope="module")
def engine():
    from opal_tpu.engine.search import Engine

    return Engine(backend="xla", block_size=256)


def test_fixture_integrity():
    """The committed DB must be the exact seed-12071 generator output."""
    from opal_tpu.matrices import ScoreMatrix

    db = _read_db(ScoreMatrix.blosum50().letter_index())
    assert len(db) == 12071
    assert sum(len(s) for s in db) == 4337319
    h = hashlib.sha256()
    for s in db:
        h.update(s.tobytes())
    assert h.hexdigest() == (
        "6f769a36c57afd31e7f87fdc1c4bbcf1d33ee7462cd325f0ee031cd6fd669754")


def test_goldens_present():
    # 16 score/score+end goldens + 6 committed x2 alignment goldens
    # (all 4 modes for O74807 + SW/HW for P18080; lets
    # `tpu_parity --large` run with no compiler)
    assert len([f for f in os.listdir(GOLDEN_LARGE)
                if f.endswith(".txt.gz")]) == 22


@pytest.mark.parametrize("mode,x", [("SW", 0), ("NW", 1)])
def test_prefix_parity_cpu(mode, x, engine):
    """Per-sequence results are independent, so searching a DB prefix must
    reproduce the golden's first lines exactly — a cheap CPU-scale check
    of the 12k fixture (full sweep: tools/tpu_parity.py --large)."""
    from opal_tpu.constants import MODE_CODES
    from opal_tpu.engine.search import search_database
    from opal_tpu.fasta import read_fasta_file
    from opal_tpu.matrices import ScoreMatrix
    from opal_tpu.render import result_line

    n = 400
    sm = ScoreMatrix.blosum50()
    lut = sm.letter_index()
    qs, _ = read_fasta_file(f"{REF_DATA}/query/O74807.fasta", lut)
    db = _read_db(lut)[:n]
    res = search_database(qs[0], db, 3, 1, sm.matrix,
                          mode=MODE_CODES[mode], search_type=x,
                          engine=engine)
    mine = [result_line(i, r) for i, r in enumerate(res)]
    gold = os.path.join(GOLDEN_LARGE,
                        f"O74807__synth12071__{mode}_x{x}_o3_e1.txt.gz")
    with gzip.open(gold, "rt") as f:
        want = [ln for ln in f.read().splitlines() if ln.strip()][:n]
    assert mine == want


@pytest.mark.tpu
def test_large_config_on_tpu():
    """One full 12k-sequence config on the real chip (pallas path)."""
    from opal_tpu.constants import MODE_CODES
    from opal_tpu.engine.search import Engine, search_database
    from opal_tpu.fasta import read_fasta_file
    from opal_tpu.matrices import ScoreMatrix
    from opal_tpu.render import result_line

    sm = ScoreMatrix.blosum50()
    lut = sm.letter_index()
    qs, _ = read_fasta_file(f"{REF_DATA}/query/P18080.fasta", lut)
    db = _read_db(lut)
    eng = Engine(backend="pallas", block_size=256)
    res = search_database(qs[0], db, 3, 1, sm.matrix,
                          mode=MODE_CODES["SW"], search_type=1, engine=eng)
    mine = [result_line(i, r) for i, r in enumerate(res)]
    gold = os.path.join(GOLDEN_LARGE,
                        "P18080__synth12071__SW_x1_o3_e1.txt.gz")
    with gzip.open(gold, "rt") as f:
        want = [ln for ln in f.read().splitlines() if ln.strip()]
    assert mine == want
