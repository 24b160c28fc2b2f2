#!/usr/bin/env python3
"""Serve-daemon QPS A/B: cross-request batching vs serial dispatch.

Starts the TCP server in-process (resident DB on the real chip), then
fires N concurrent single-query clients, each sending a stream of UNIQUE
short queries (cache can't help). Reports QPS with the batching window
enabled vs batch_window=0 (round-2 behavior). VERDICT r2 #4's done bar:
>= 2x QPS on 8 concurrent short-query clients, identical responses."""
import argparse
import json
import os
import socket
import socketserver
import sys
import threading
import time
from unittest.mock import patch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def start_server(srv, window):
    started = threading.Event()
    box = {}

    def run():
        real_init = socketserver.TCPServer.__init__

        def catch_port(self, *a, **kw):
            real_init(self, *a, **kw)
            box["port"] = self.server_address[1]
            box["srv"] = self
            started.set()

        with patch.object(socketserver.TCPServer, "__init__", catch_port):
            try:
                srv.serve_tcp(0, batch_window=window)
            except Exception as exc:
                box["exc"] = exc
                started.set()

    threading.Thread(target=run, daemon=True).start()
    assert started.wait(30), "server did not start"
    if "exc" in box:
        raise box["exc"]
    return box


def run_clients(port, n_clients, n_reqs, queries, collect, latencies=None):
    barrier = threading.Barrier(n_clients + 1)

    def client(ci):
        last = None
        for _ in range(5):  # ride out accept-queue bursts
            try:
                c = socket.create_connection(("127.0.0.1", port),
                                             timeout=300)
                break
            except OSError as exc:
                last = exc
                time.sleep(0.2)
        else:
            raise last
        with c:
            f = c.makefile("rw")
            json.loads(f.readline())
            barrier.wait(timeout=600)
            for r in range(n_reqs):
                q = queries[ci * n_reqs + r]
                t0 = time.perf_counter()
                f.write(json.dumps(
                    {"id": [ci, r], "query": q, "top_k": 5}) + "\n")
                f.flush()
                collect[(ci, r)] = json.loads(f.readline())["hits"]
                if latencies is not None:
                    latencies.append(time.perf_counter() - t0)

    threads = [threading.Thread(target=client, args=(ci,))
               for ci in range(n_clients)]
    for t in threads:
        t.start()
    barrier.wait(timeout=600)
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--reqs", type=int, default=12)
    ap.add_argument("--db-seqs", type=int, default=20000)
    ap.add_argument("--qlen", type=int, default=110)
    ap.add_argument("--window", type=float, default=0.004)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--curve", default=None, metavar="N1,N2,...",
                    help="sweep concurrent-client counts (e.g. 1,4,8,16,32)"
                    " reporting QPS + p50/p95/max latency per point, with"
                    " the batching window on AND off (sustained-load"
                    " curve; replaces the single A/B run)")
    args = ap.parse_args()

    from opal_tpu.matrices import ScoreMatrix
    from opal_tpu.serve import Server

    sm = ScoreMatrix.blosum50()
    alpha = sm.alphabet
    rng = np.random.default_rng(5)
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".fa",
                                     delete=False) as f:
        for i in range(args.db_seqs):
            L = int(rng.integers(80, 400))
            f.write(f">t{i}\n" + "".join(
                alpha[j] for j in rng.integers(0, 20, size=L)) + "\n")
        db_path = f.name
    srv = Server(db_path, block_size=1024, backend=args.backend)
    print(f"db resident: {args.db_seqs} seqs", flush=True)

    if args.curve:
        counts = [int(c) for c in args.curve.split(",")]
        srv.warm([args.qlen] * min(8, max(counts)))
        for window in (args.window, 0.0):
            print(f"-- batching window = {window}", flush=True)
            for nc in counts:
                n_total = nc * args.reqs
                mk = lambda: ["".join(alpha[j] for j in rng.integers(
                    0, 20, size=args.qlen)) for _ in range(n_total)]
                box = start_server(srv, window)
                run_clients(box["port"], nc, args.reqs, mk(), {})  # warm
                lat = []
                dt = run_clients(box["port"], nc, args.reqs, mk(), {},
                                 latencies=lat)
                box["srv"].shutdown()
                lat_ms = np.sort(np.array(lat) * 1e3)
                print(json.dumps({
                    "clients": nc, "window": window,
                    "qps": round(n_total / dt, 1),
                    "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
                    "p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
                    "max_ms": round(float(lat_ms[-1]), 1),
                }), flush=True)
        os.unlink(db_path)
        return

    n_total = args.clients * args.reqs
    # one fixed length: every stacked group size k shares one compile
    # per k; an untimed pre-round below covers the k's that occur
    queries = ["".join(alpha[j] for j in rng.integers(
        0, 20, size=args.qlen)) for _ in range(n_total)]
    warmq = ["".join(alpha[j] for j in rng.integers(
        0, 20, size=args.qlen)) for _ in range(n_total)]
    srv.warm([args.qlen] * min(8, args.clients))

    box = start_server(srv, args.window)
    run_clients(box["port"], args.clients, args.reqs, warmq, {})  # compiles
    results = {}
    dt_b = run_clients(box["port"], args.clients, args.reqs, queries,
                       results)
    box["srv"].shutdown()
    print(f"batched  (window={args.window}): {n_total/dt_b:6.1f} QPS "
          f"({dt_b:.2f} s)", flush=True)

    results0 = {}
    srv._cache.clear()
    srv._cache_bytes = 0
    box = start_server(srv, 0.0)
    dt_s = run_clients(box["port"], args.clients, args.reqs, queries,
                       results0)
    box["srv"].shutdown()
    print(f"serial   (window=0):     {n_total/dt_s:6.1f} QPS "
          f"({dt_s:.2f} s)", flush=True)
    assert results == results0, "batched responses differ from serial!"
    print(f"speedup: {dt_s/dt_b:.2f}x, responses identical", flush=True)
    os.unlink(db_path)


if __name__ == "__main__":
    main()
