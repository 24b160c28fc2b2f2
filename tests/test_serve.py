"""Serving daemon: JSON-lines protocol over a resident database."""
import io
import json

import numpy as np
import pytest

from opal_tpu.constants import MODE_NW, MODE_SW, SEARCH_SCORE
from opal_tpu.engine.search import Engine, search_database_arrays
from opal_tpu.fasta import read_fasta_file
from opal_tpu.matrices import ScoreMatrix
from opal_tpu.ranking import rank_scores
from opal_tpu.serve import Server


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    sm = ScoreMatrix.blosum50()
    alpha = sm.alphabet
    rng = np.random.default_rng(71)
    dbf = tmp_path_factory.mktemp("srv") / "db.fa"
    dbf.write_text("".join(
        f">t{i}\n" + "".join(alpha[j] for j in rng.integers(0, 20, size=int(rng.integers(20, 120))))
        + "\n" for i in range(30)
    ))
    return Server(str(dbf), block_size=16, backend="xla"), sm, rng


def _roundtrip(srv, requests):
    fin = io.StringIO("".join(json.dumps(r) + "\n" for r in requests))
    fout = io.StringIO()
    srv.run(fin, fout)
    lines = fout.getvalue().splitlines()
    header = json.loads(lines[0])
    assert header["ready"] and header["n_db"] == 30
    return [json.loads(l) for l in lines[1:]]


def test_serve_single_batch_align_and_errors(server):
    srv, sm, rng = server
    alpha = sm.alphabet
    q1 = "".join(alpha[j] for j in rng.integers(0, 20, size=25))
    q2 = "".join(alpha[j] for j in rng.integers(0, 20, size=40))
    resps = _roundtrip(srv, [
        {"id": 1, "query": q1, "top_k": 5},
        {"id": 2, "queries": [q1, q2], "top_k": 3},
        {"id": 3, "query": q1, "mode": "NW", "top_k": 4},
        {"id": 4, "query": q1, "top_k": 2, "align": True},
        {"id": 5, "query": ""},
        {"id": 6, "nonsense": True},
    ])
    by_id = {r["id"]: r for r in resps}

    # ground truth via the engine directly
    eng = Engine(backend="xla", block_size=16)
    lut = sm.letter_index()
    enc = lambda s: lut[np.frombuffer(s.encode(), np.uint8)].astype(np.uint8)
    out = search_database_arrays(enc(q1), srv.db, 3, 1, sm.matrix,
                                 mode=MODE_SW, search_type=SEARCH_SCORE,
                                 engine=eng)
    order = rank_scores(out["score"], 5)
    want = [[int(i), int(out["score"][i])] for i in order]
    assert by_id[1]["hits"] == want

    # batch: first element matches the single-query answer (top 3)
    assert by_id[2]["hits"][0] == want[:3]
    assert len(by_id[2]["hits"]) == 2

    # NW mode runs and returns 4 hits
    assert len(by_id[3]["hits"]) == 4

    # align: top-2 hits carry locations + CIGARs consistent with scores
    hits = by_id[4]["hits"]
    assert len(hits) == 2
    assert hits[0][:2] == want[0]
    for h in hits:
        assert h[6] is None or isinstance(h[6], str)

    # errors are structured, not fatal (empty query, malformed request);
    # note stray symbols like "@" are NOT errors: the reference's letter
    # LUT absorbs unknowns into the "*" catch-all column
    assert "error" in by_id[5]
    assert "error" in by_id[6]


def test_ops_to_cigar_sam_convention():
    from opal_tpu.constants import (
        ALIGN_DEL,
        ALIGN_INS,
        ALIGN_MATCH,
        ALIGN_MISMATCH,
    )
    from opal_tpu.render import ops_to_cigar

    ops = np.array([ALIGN_MATCH, ALIGN_MATCH, ALIGN_MISMATCH,
                    ALIGN_DEL, ALIGN_INS, ALIGN_INS], np.uint8)
    # SAM: I consumes the query (ALIGN_DEL), D consumes the target
    assert ops_to_cigar(ops) == "2=1X1I2D"
    assert ops_to_cigar(np.zeros(0, np.uint8)) == ""


def test_serve_names_and_cache(server):
    srv, sm, rng = server
    alpha = sm.alphabet
    q = "".join(alpha[j] for j in rng.integers(0, 20, size=22))
    r1, r2, r3 = _roundtrip(srv, [
        {"id": 1, "query": q, "top_k": 2, "names": True},
        {"id": 2, "query": q, "top_k": 2, "names": True},  # cache hit
        {"id": 3, "query": q, "top_k": 2},
    ])
    assert r1["hits"] == r2["hits"]
    for h in r1["hits"]:
        assert h[2].startswith("t")       # FASTA header appended
    for h in r3["hits"]:
        assert len(h) == 2                # no names unless requested
    assert len(srv._cache) >= 2


def test_serve_tcp(server):
    """TCP front end: ready banner + responses per connection, identical
    to the stdin protocol; concurrent connections don't interleave."""
    import socket
    import threading

    srv, sm, rng = server
    started = threading.Event()
    port_box = {}

    def run_srv():
        import socketserver
        from unittest.mock import patch

        real_init = socketserver.TCPServer.__init__

        def catch_port(self, *a, **kw):
            real_init(self, *a, **kw)
            port_box["port"] = self.server_address[1]
            started.set()

        with patch.object(socketserver.TCPServer, "__init__", catch_port):
            try:
                srv.serve_tcp(0)
            except Exception:
                pass

    t = threading.Thread(target=run_srv, daemon=True)
    t.start()
    assert started.wait(10)

    def ask(reqs):
        with socket.create_connection(("127.0.0.1", port_box["port"]),
                                      timeout=30) as c:
            f = c.makefile("rw")
            banner = json.loads(f.readline())
            assert banner["ready"]
            out = []
            for r in reqs:
                f.write(json.dumps(r) + "\n")
                f.flush()
                out.append(json.loads(f.readline()))
            return out

    alpha = sm.alphabet
    q = "".join(alpha[j] for j in rng.integers(0, 20, size=40))
    (r1,) = ask([{"id": 1, "query": q, "top_k": 3}])
    assert r1["id"] == 1 and len(r1["hits"]) == 3
    (r2,) = ask([{"id": 2, "query": q, "top_k": 3}])
    assert r2["hits"] == r1["hits"]
    (err,) = ask([{"id": 3, "query": ""}])
    assert "error" in err


def test_serve_tcp_fuzz_malformed_and_oversized(server):
    """Network-surface fuzz: hostile bytes must produce structured errors
    (or, above the 16 MiB line cap, a RequestTooLarge + connection drop)
    and must never kill the server — the next clean connection still
    serves."""
    import socket
    import threading

    srv, sm, rng = server
    started = threading.Event()
    port_box = {}

    def run_srv():
        import socketserver
        from unittest.mock import patch

        real_init = socketserver.TCPServer.__init__

        def catch_port(self, *a, **kw):
            real_init(self, *a, **kw)
            port_box["port"] = self.server_address[1]
            started.set()

        with patch.object(socketserver.TCPServer, "__init__", catch_port):
            try:
                srv.serve_tcp(0)
            except Exception:
                pass

    threading.Thread(target=run_srv, daemon=True).start()
    assert started.wait(10)

    def connect():
        c = socket.create_connection(("127.0.0.1", port_box["port"]),
                                     timeout=30)
        f = c.makefile("rwb")
        assert json.loads(f.readline())["ready"]
        return c, f

    # 1) malformed payloads on one connection: each gets an error object,
    # the connection survives all of them
    c, f = connect()
    hostile = [
        b"this is not json\n",
        b"\xff\xfe\x00garbage\x80binary\n",
        b"[1, 2, 3]\n",                       # valid JSON, wrong shape
        b'{"query": 42}\n',                    # wrong type
        b'{"id": 9, "query": "ACDE", "top_k": -5}\n',
        b'{"id": 10, "query": "ACDE", "mode": "XX"}\n',
        b'{"id": 11, "queries": []}\n',
        b'{"unterminated": \n',
    ]
    for payload in hostile:
        f.write(payload)
        f.flush()
        resp = json.loads(f.readline())
        assert "error" in resp or resp.get("hits") is not None, resp
    # connection still usable for a real query
    alpha = sm.alphabet
    q = "".join(alpha[j] for j in rng.integers(0, 20, size=30))
    f.write((json.dumps({"id": 1, "query": q, "top_k": 2}) + "\n").encode())
    f.flush()
    ok = json.loads(f.readline())
    assert ok["id"] == 1 and len(ok["hits"]) == 2
    c.close()

    # 2) oversized line (> 16 MiB): structured RequestTooLarge, then drop
    c, f = connect()
    f.write(b'{"id": 2, "query": "' + b"A" * (17 * 1024 * 1024) + b'"}\n')
    f.flush()
    resp = json.loads(f.readline())
    assert "RequestTooLarge" in resp.get("error", "")
    assert f.readline() == b""  # server closed the poisoned stream
    c.close()

    # 3) fresh connection after the drop serves normally
    c, f = connect()
    f.write((json.dumps({"id": 3, "query": q, "top_k": 2}) + "\n").encode())
    f.flush()
    again = json.loads(f.readline())
    assert again["hits"] == ok["hits"]
    c.close()


def test_serve_keepalive_thread(server):
    """The keepalive device heartbeat must run alongside request handling
    without disturbing responses (it exists to absorb tunneled-device
    wake-up stalls so real requests don't)."""
    import time

    srv, sm, rng = server
    alpha = sm.alphabet
    q = "".join(alpha[j] for j in rng.integers(0, 20, size=22))
    before = _roundtrip(srv, [{"id": 1, "query": q, "top_k": 3}])
    stop = srv.start_keepalive(interval=0.05)
    try:
        time.sleep(0.3)  # several heartbeats
        after = _roundtrip(srv, [{"id": 1, "query": q, "top_k": 3}])
        assert before == after
    finally:
        stop()  # a heartbeat racing interpreter teardown would abort


def test_serve_warm_covers_single_and_stacked(server):
    """warm() must compile both the per-length single-query kernels and
    the stacked multi-query kernels for the given length combination
    without error (the batched align path uses the stacked kernels)."""
    srv, sm, rng = server
    srv.warm([18, 33])          # multi-length batch
    srv.warm([25])              # single length: stacks a duplicated pair
    q = "".join(sm.alphabet[j] for j in rng.integers(0, 20, size=18))
    q2 = "".join(sm.alphabet[j] for j in rng.integers(0, 20, size=33))
    fin = io.StringIO(json.dumps(
        {"id": 9, "queries": [q, q2], "top_k": 2, "align": True}) + "\n")
    fout = io.StringIO()
    srv.run(fin, fout)
    resp = json.loads(fout.getvalue().splitlines()[1])
    assert len(resp["hits"]) == 2          # one hit list per query
    assert all(len(h) == 2 for h in resp["hits"])


def test_respond_many_matches_respond(server, tmp_path):
    """Cross-request batching must be byte-identical to per-line handling
    across a mixed batch: groupable single queries, a 'queries' batch, a
    different mode, align, a cache duplicate, and a malformed request."""
    srv, sm, rng = server
    alpha = sm.alphabet
    mk = lambda n: "".join(alpha[j] for j in rng.integers(0, 20, size=n))
    reqs = [
        {"id": 10, "query": mk(24), "top_k": 3},
        {"id": 11, "query": mk(31), "top_k": 3},
        {"id": 12, "query": mk(18), "top_k": 3},
        {"id": 13, "queries": [mk(20), mk(26)], "top_k": 2},
        {"id": 14, "query": mk(24), "mode": "NW", "top_k": 4},
        {"id": 15, "query": mk(22), "top_k": 2, "align": True},
        {"id": 16, "bogus": 1},
        {"id": 10, "query": "", "top_k": 3},
    ]
    lines = [json.dumps(r) for r in reqs]
    got = srv._respond_many(lines)
    # twin server with a cold cache answers per line
    twin = Server(srv_db_path(srv), block_size=16, backend="xla")
    want = [twin._respond(l) for l in lines]
    assert got == want


def srv_db_path(srv):
    # the fixture doesn't retain the path; rebuild a FASTA from srv.db
    import tempfile

    sm = ScoreMatrix.blosum50()
    alpha = sm.alphabet
    f = tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False)
    for i, s in enumerate(srv.db):
        f.write(f">{srv.names[i]}\n" + "".join(alpha[j] for j in s) + "\n")
    f.close()
    return f.name


def test_serve_tcp_concurrent_batching(server):
    """Concurrent TCP clients inside one batch window get answers
    identical to serial handling (and the server keeps serving)."""
    import socket
    import socketserver
    import threading
    from unittest.mock import patch

    srv, sm, rng = server
    started = threading.Event()
    port_box = {}

    def run_srv():
        real_init = socketserver.TCPServer.__init__

        def catch_port(self, *a, **kw):
            real_init(self, *a, **kw)
            port_box["port"] = self.server_address[1]
            started.set()

        with patch.object(socketserver.TCPServer, "__init__", catch_port):
            try:
                srv.serve_tcp(0, batch_window=0.05)
            except Exception:
                pass

    threading.Thread(target=run_srv, daemon=True).start()
    assert started.wait(10)

    alpha = sm.alphabet
    queries = ["".join(alpha[j] for j in rng.integers(0, 20, size=n))
               for n in (21, 27, 33, 25, 19, 29)]
    results = {}

    def client(i):
        with socket.create_connection(("127.0.0.1", port_box["port"]),
                                      timeout=60) as c:
            f = c.makefile("rw")
            json.loads(f.readline())  # banner
            f.write(json.dumps(
                {"id": i, "query": queries[i], "top_k": 4}) + "\n")
            f.flush()
            results[i] = json.loads(f.readline())

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(queries))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert len(results) == len(queries)
    for i, q in enumerate(queries):
        want = srv.handle({"query": q, "top_k": 4})
        assert results[i]["id"] == i
        assert results[i]["hits"] == want["hits"], i
