"""Unit tests: FASTA reader, score matrices, band math, batching."""
import io

import numpy as np
import pytest

from opal_tpu.bandmath import band_borders, cdiv, gap_penalty
from opal_tpu.constants import MODE_HW, MODE_NW, MODE_OV, MODE_SW
from opal_tpu.engine.batching import PAD_LETTER, pad_bucket, plan_blocks
from opal_tpu.fasta import read_fasta_sequences
from opal_tpu.matrices import ScoreMatrix


def test_blosum50_builtin(blosum50):
    assert blosum50.alphabet == "ARNDCQEGHILKMFPSTWYVBZX*"
    assert blosum50.alphabet_length == 24
    m = blosum50.matrix
    assert m[0, 0] == 5 and m[4, 4] == 13 and m[17, 17] == 15
    assert m[23, 23] == 1 and m[0, 23] == -5
    np.testing.assert_array_equal(m[:23, :23], m[:23, :23].T)  # symmetric core


def test_all_builtins_load():
    for name in ["blosum45", "blosum50", "blosum62", "blosum80", "pam120", "pam250"]:
        sm = ScoreMatrix.from_name(name)
        assert sm.matrix.shape == (sm.alphabet_length, sm.alphabet_length)


def test_matrix_file_roundtrip(tmp_path):
    p = tmp_path / "m.mat"
    p.write_text("A C G T\n2 -1 -1 -1\n-1 2 -1 -1\n-1 -1 2 -1\n-1 -1 -1 2\n")
    sm = ScoreMatrix.from_file(str(p))
    assert sm.alphabet == "ACGT"
    assert sm.matrix[1, 1] == 2 and sm.matrix[0, 3] == -1


def test_letter_index_star_catchall(blosum50):
    lut = blosum50.letter_index()
    assert lut[ord("A")] == 0
    assert lut[ord("*")] == 23
    assert lut[ord("J")] == 23  # not in alphabet -> '*'
    assert lut[ord("1")] == 23


def test_fasta_basic(blosum50):
    data = b">s1 header\nARN\nDC\n>empty\n>s2\nQE\n"
    seqs, names, eof = read_fasta_sequences(
        io.BytesIO(data), blosum50.letter_index(), return_names=True
    )
    assert eof
    assert len(seqs) == 2  # empty record produces no sequence
    np.testing.assert_array_equal(seqs[0], [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(seqs[1], [5, 6])
    assert names == ["s1 header", "s2"]


def test_fasta_chunking(blosum50):
    # max_residues budget: reading stops before a new sequence once exceeded
    data = b">a\n" + b"A" * 10 + b"\n>b\n" + b"R" * 10 + b"\n>c\n" + b"N" * 5 + b"\n"
    f = io.BytesIO(data)
    lut = blosum50.letter_index()
    s1, eof1 = read_fasta_sequences(f, lut, max_residues=15)
    assert not eof1 and len(s1) == 2  # a, b read; c deferred
    s2, eof2 = read_fasta_sequences(f, lut, max_residues=15)
    assert eof2 and len(s2) == 1 and s2[0].size == 5


def test_fasta_chunking_pushback_reader(blosum50):
    """Budget + rewind through PushbackReader (the CLI's stream type):
    the native-tokenizer fast path must give the same chunk split and
    bytes as the Python line loop, including when the probe overlaps the
    budget cut, and byte pushback must resume mid-stream exactly."""
    from opal_tpu.fasta import PushbackReader

    data = b">a\n" + b"A" * 10 + b"\n>b\n" + b"R" * 10 + b"\n>c\n" + b"N" * 5 + b"\n"
    lut = blosum50.letter_index()
    f = PushbackReader(io.BytesIO(data))
    s1, eof1 = read_fasta_sequences(f, lut, max_residues=15)
    assert not eof1 and len(s1) == 2 and s1[0].size == 10 and s1[1].size == 10
    s2, eof2 = read_fasta_sequences(f, lut, max_residues=15)
    assert eof2 and len(s2) == 1 and s2[0].size == 5
    # whole-stream fast path agrees with the line loop
    g = PushbackReader(io.BytesIO(data))
    sall, eof = read_fasta_sequences(g, lut, max_residues=2**62)
    assert eof and [a.size for a in sall] == [10, 10, 5]


def test_fasta_chunking_gzip_stream(blosum50, tmp_path):
    """Chunked reads with budget+rewind over a GZIP stream (PushbackReader
    pushback instead of backward seeks), exercising the tokenizer fast
    path on the final chunk."""
    import gzip

    from opal_tpu.fasta import open_fasta

    data = b">a\n" + b"A" * 10 + b"\n>b\n" + b"R" * 10 + b"\n>c\n" + b"N" * 5 + b"\n"
    p = tmp_path / "db.fa.gz"
    with gzip.open(p, "wb") as g:
        g.write(data)
    lut = blosum50.letter_index()
    with open_fasta(str(p)) as f:
        s1, eof1 = read_fasta_sequences(f, lut, max_residues=15)
        assert not eof1 and [a.size for a in s1] == [10, 10]
        s2, eof2 = read_fasta_sequences(f, lut, max_residues=15)
        assert eof2 and [a.size for a in s2] == [5]


def test_pushback_reader_byte_ops():
    from opal_tpu.fasta import PushbackReader

    f = PushbackReader(io.BytesIO(b"one\ntwo\nthree\n"))
    assert f.readline() == b"one\n"
    f.unread(b"zero\none\n")          # arbitrary multi-line pushback
    assert f.readline() == b"zero\n"
    assert f.read(2) == b"on"         # read served from pending
    assert f.readline() == b"e\n"     # remainder of pending, then stream
    f.unread(b"x")                    # pushback without newline
    assert f.readline() == b"xtwo\n"  # joins with the underlying stream
    assert f.read() == b"three\n"
    assert f.readline() == b""


def test_fasta_headerless_prefix(blosum50):
    # text before any '>' is a sequence (reference reader behavior)
    seqs, eof = read_fasta_sequences(io.BytesIO(b"AR\n>x\nND\n"), blosum50.letter_index())
    assert len(seqs) == 2
    np.testing.assert_array_equal(seqs[0], [0, 1])


def test_cdiv_truncates_toward_zero():
    assert cdiv(7, 2) == 3 and cdiv(-7, 2) == -3
    assert cdiv(7, -2) == -3 and cdiv(-7, -2) == 3


def test_gap_penalty():
    assert gap_penalty(0, 3, 1) == 0
    assert gap_penalty(1, 3, 1) == 3
    assert gap_penalty(4, 3, 1) == 6


@pytest.mark.parametrize("mode", [MODE_SW, MODE_NW, MODE_HW, MODE_OV])
def test_band_contains_reference_band(mode):
    # sanity: borders in range and grow as k decreases
    Q, T, Go, Ge, M = 50, 80, 3, 1, 5
    prev = (0, 0)
    for k in range(M * min(Q, T), 0, -25):
        b, t = band_borders(k, mode, Q, T, Go, Ge, M)
        if b < 0:
            continue
        assert 0 <= b < Q and 0 <= t < T
        assert b >= prev[0] and t >= prev[1]
        prev = (b, t)


def test_pad_bucket_monotone():
    ns = list(range(1, 3000, 17))
    vals = [pad_bucket(n) for n in ns]
    assert all(v >= n and v % 64 == 0 for v, n in zip(vals, ns))
    # geometric mode bounds the number of compile shapes
    coarse = [pad_bucket(n, ratio=1.25) for n in ns]
    assert len(set(coarse)) < 20
    assert all(v >= n for v, n in zip(coarse, ns))


def test_plan_blocks_covers_everything():
    rng = np.random.default_rng(3)
    db = [rng.integers(0, 4, size=int(rng.integers(5, 300)), dtype=np.uint8)
          for _ in range(57)]
    blocks = plan_blocks(db, batch=16)
    seen = np.concatenate([b.indices for b in blocks])
    assert sorted(seen.tolist()) == list(range(57))
    for b in blocks:
        for lane, i in enumerate(b.indices):
            assert b.lengths[lane] == len(db[i])
            np.testing.assert_array_equal(
                b.letters[: len(db[i]), lane], db[i]
            )
            assert (b.letters[len(db[i]):, lane] == PAD_LETTER).all()


def test_gzip_fasta_transparent(tmp_path):
    import gzip

    from opal_tpu.fasta import open_fasta, read_fasta_file
    from opal_tpu.matrices import ScoreMatrix

    sm = ScoreMatrix.blosum50()
    lut = sm.letter_index()
    text = ">a\nACDEF\nGHIK\n>b\nLMNPQ\n"
    plain = tmp_path / "x.fa"
    plain.write_text(text)
    gz = tmp_path / "x.fa.gz"
    with gzip.open(gz, "wb") as f:
        f.write(text.encode())
    s1, _ = read_fasta_file(str(plain), lut)
    s2, _ = read_fasta_file(str(gz), lut)
    assert len(s1) == len(s2) == 2
    for a, b in zip(s1, s2):
        np.testing.assert_array_equal(a, b)
    with open_fasta(str(gz)) as f:
        assert f.read(1) == b">"


def test_traceback_workers_identical(monkeypatch):
    from opal_tpu.constants import MODE_SW, SEARCH_ALIGNMENT
    from opal_tpu.engine.search import Engine, search_database

    rng = np.random.default_rng(31)
    A = 20
    matrix = rng.integers(-4, 6, size=(A, A), dtype=np.int32)
    np.fill_diagonal(matrix, 5)
    q = rng.integers(0, A, size=40, dtype=np.uint8)
    db = [rng.integers(0, A, size=int(rng.integers(20, 120)), dtype=np.uint8)
          for _ in range(80)]
    eng = Engine(backend="xla", block_size=16)
    monkeypatch.setenv("OPAL_TPU_TRACEBACK_WORKERS", "1")
    serial = search_database(q, db, 3, 1, matrix, mode=MODE_SW,
                             search_type=SEARCH_ALIGNMENT, engine=eng)
    monkeypatch.setenv("OPAL_TPU_TRACEBACK_WORKERS", "4")
    threaded = search_database(q, db, 3, 1, matrix, mode=MODE_SW,
                               search_type=SEARCH_ALIGNMENT, engine=eng)
    for a, b in zip(serial, threaded):
        assert a.score == b.score
        assert a.start_location_query == b.start_location_query
        if a.alignment is None:
            assert b.alignment is None
        else:
            np.testing.assert_array_equal(a.alignment, b.alignment)
