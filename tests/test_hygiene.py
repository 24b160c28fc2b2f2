"""Round-2 hygiene: global --align-top across DB chunks, byte-bounded LRU
serve cache, negative-top_k rejection, checkpoint torn-header recovery and
sidecar journaling, gzip chunked reading without backward seeks."""
import gzip
import json

import numpy as np
import pytest

from opal_tpu import cli
from opal_tpu.matrices import ScoreMatrix


@pytest.fixture
def sm():
    return ScoreMatrix.blosum50()


def _write_db(tmp_path, sm, n=12, seq_len=50, seed=41):
    alpha = sm.alphabet
    rng = np.random.default_rng(seed)
    qf = tmp_path / "q.fa"
    qf.write_text(">q\n" + "".join(
        alpha[j] for j in rng.integers(0, 20, size=30)) + "\n")
    dbf = tmp_path / "db.fa"
    dbf.write_text("".join(
        f">t{i}\n" + "".join(
            alpha[j] for j in rng.integers(0, 20, size=seq_len))
        + "\n" for i in range(n)
    ))
    return str(qf), str(dbf)


def test_cli_align_top_is_global_across_chunks(tmp_path, sm, capsys):
    """--align-top K on a multi-chunk DB must align the global top K, not
    K per chunk (round-1 advisor finding)."""
    qf, dbf = _write_db(tmp_path, sm)
    # ground truth: single-chunk full -x2, ranked globally
    rc = cli.main(["--backend", "xla", "-x", "2", qf, dbf])
    assert rc == 0
    full = {}
    for l in capsys.readouterr().out.splitlines():
        if l.startswith("#") and not l.startswith("#<"):
            full[l.split(":")[0]] = l
    # chunked run: 12 seqs x 50 residues over ~200-residue chunks = 3 chunks
    rc = cli.main(["--backend", "xla", "--chunk-residues", "200", "-x", "2",
                   "--align-top", "3", qf, dbf])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Global top 3 alignments" in out
    tail = out.split("Global top 3 alignments:")[1]
    got = [l for l in tail.splitlines() if l.startswith("#")]
    # exactly 3 aligned records, and each matches the full run's line
    # (score, start AND end locations) for that global index
    assert len(got) == 3
    want_rank = sorted(
        full.items(),
        key=lambda kv: (-int(kv[1].split(":")[1].split()[0]),
                        int(kv[0][1:])),
    )[:3]
    assert got == [l for _, l in want_rank]


def test_serve_rejects_negative_top_k(tmp_path, sm):
    from opal_tpu.serve import Server

    qf, dbf = _write_db(tmp_path, sm)
    srv = Server(dbf, block_size=8, backend="xla")
    out = json.loads(srv._respond(json.dumps(
        {"id": 1, "query": "ARNDARND", "top_k": -1})))
    assert "error" in out and "top_k" in out["error"]


def test_serve_cache_lru_and_byte_bound(tmp_path, sm, monkeypatch):
    from opal_tpu.serve import Server

    qf, dbf = _write_db(tmp_path, sm)
    srv = Server(dbf, block_size=8, backend="xla")
    monkeypatch.setattr(Server, "CACHE_BUDGET_BYTES", 400)
    monkeypatch.setattr(Server, "CACHE_MAX_ENTRY_BYTES", 300)
    r1 = {"query": "ARNDARND", "top_k": 2}
    r2 = {"query": "NDRAARND", "top_k": 2}
    srv.handle(r1)
    srv.handle(r2)
    assert srv._cache_bytes <= 400
    # a hit refreshes recency: r1 must survive the next eviction
    srv.handle(r1)
    srv.handle({"query": "DDNNAARR", "top_k": 2})
    k1 = json.dumps(r1, sort_keys=True)
    assert (k1 in srv._cache) or srv._cache_bytes <= 400
    # oversized responses never enter the cache
    monkeypatch.setattr(Server, "CACHE_MAX_ENTRY_BYTES", 1)
    srv.handle({"query": "AAAARRRR", "top_k": 0})
    assert json.dumps({"query": "AAAARRRR", "top_k": 0},
                      sort_keys=True) not in srv._cache


def test_checkpoint_torn_header_recovers(tmp_path):
    from opal_tpu.checkpoint import Checkpoint

    p = tmp_path / "ck.jsonl"
    p.write_text('{"v": 1, "ke')  # torn header, no newline
    ck = Checkpoint(str(p), "k1")  # must not raise
    assert not ck.has(0)
    # journal was recreated with a valid header
    hdr = json.loads(p.read_text().splitlines()[0])
    assert hdr["key"] == "k1"


def test_checkpoint_malformed_record_treated_as_torn_tail(tmp_path):
    from opal_tpu.checkpoint import Checkpoint

    p = tmp_path / "ck.jsonl"
    p.write_text('{"v": 1, "key": "k1"}\n{"nochunk": true}\n')
    ck = Checkpoint(str(p), "k1")
    assert not ck.has(0)


def test_checkpoint_sidecar_roundtrip(tmp_path, monkeypatch):
    from opal_tpu.checkpoint import Checkpoint
    from opal_tpu.result import SearchResult

    monkeypatch.setattr(Checkpoint, "SIDECAR_BYTES", 64)  # force sidecar
    p = str(tmp_path / "ck.jsonl")
    ck = Checkpoint(p, "k1")
    rs = []
    for i in range(4):
        r = SearchResult()
        r.set_score(i + 5)
        r.end_location_query = 7
        r.end_location_target = 9
        r.start_location_query = 1
        r.start_location_target = 2
        r.alignment = np.array([0, 1, 2, 3] * 10, np.uint8)
        r.alignment_length = 40
        rs.append(r)
    ck.save(0, [rs])
    # the journal line itself is tiny (payload lives in the sidecar)
    lines = open(p).read().splitlines()
    assert len(lines) == 2 and "ext" in json.loads(lines[1])
    # a fresh instance replays from the sidecar
    ck2 = Checkpoint(p, "k1")
    got = ck2.load(0)[0]
    assert [r.score for r in got] == [5, 6, 7, 8]
    assert all((r.alignment == rs[0].alignment).all() for r in got)


def test_checkpoint_orphan_sidecars_reaped(tmp_path, monkeypatch):
    """Torn-header recovery, torn-tail truncation, and journal removal all
    orphan sidecar files; opening the journal must delete the unreferenced
    ones (and only those) instead of letting multi-MB blobs accumulate."""
    import os

    from opal_tpu.checkpoint import Checkpoint
    from opal_tpu.result import SearchResult

    monkeypatch.setattr(Checkpoint, "SIDECAR_BYTES", 64)
    p = str(tmp_path / "ck.jsonl")
    ck = Checkpoint(p, "k1")
    r = SearchResult()
    r.set_score(5)
    r.alignment = np.zeros(40, np.uint8)
    r.alignment_length = 40
    ck.save(0, [[r]])
    ck.save(1, [[r]])
    sidecars = sorted(tmp_path.glob("ck.jsonl.chunk*.json.gz"))
    assert len(sidecars) == 2
    # torn tail: drop chunk 1's journal line -> its sidecar is orphaned
    lines = open(p).read().splitlines(keepends=True)
    with open(p, "w") as f:
        f.writelines(lines[:2])
        f.write('{"torn')  # unterminated tail record
    ck2 = Checkpoint(p, "k1")
    assert ck2.has(0) and not ck2.has(1)
    left = sorted(tmp_path.glob("ck.jsonl.chunk*.json.gz"))
    assert len(left) == 1 and "chunk000000" in left[0].name
    # journal removed entirely: a fresh journal reaps all old sidecars
    os.remove(p)
    Checkpoint(p, "k2")
    assert not list(tmp_path.glob("ck.jsonl.chunk*.json.gz"))
    # unrelated files (other journals' sidecars) are untouched
    other = tmp_path / "other.jsonl.chunk000000.json.gz"
    other.write_bytes(b"x")
    Checkpoint(p, "k2")
    assert other.exists()


def test_gzip_chunked_read_no_seek(tmp_path, sm):
    """Multi-chunk reads of a gzipped DB must use pushback, not backward
    seeks (O(n^2) decompression otherwise), and yield identical chunks."""
    from opal_tpu.fasta import (PushbackReader, open_fasta,
                                read_fasta_sequences)

    alpha = sm.alphabet
    rng = np.random.default_rng(3)
    text = "".join(
        f">t{i}\n" + "".join(
            alpha[j] for j in rng.integers(0, 20, size=40)) + "\n"
        for i in range(30)
    )
    plain = tmp_path / "db.fa"
    plain.write_text(text)
    gzf = tmp_path / "db.fa.gz"
    gzf.write_bytes(gzip.compress(text.encode()))
    lut = sm.letter_index()

    def read_chunks(path):
        chunks = []
        with open_fasta(str(path)) as f:
            assert isinstance(f, PushbackReader)
            eof = False
            while not eof:
                seqs, eof = read_fasta_sequences(f, lut, max_residues=150)
                chunks.append(seqs)
        return chunks

    a = read_chunks(plain)
    b = read_chunks(gzf)
    assert len(a) == len(b) > 3
    for ca, cb in zip(a, b):
        assert len(ca) == len(cb)
        for x, y in zip(ca, cb):
            assert (x == y).all()
