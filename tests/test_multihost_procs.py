"""True multi-process multihost test: two OS processes, a jax.distributed
coordinator, per-process DB shards, allgather merge — the deployment shape
of parallel/multihost.py (one process per pod host), simulated on CPU.
Verifies the merged global ranking equals a single-process search."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
try:
    # a sitecustomize may force a plugin platform programmatically
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
sys.path.insert(0, sys.argv[5])
from opal_tpu.matrices import ScoreMatrix
from opal_tpu.parallel.multihost import MultiHostSearch
import numpy as np

sm = ScoreMatrix.blosum50()
shard_paths = json.loads(sys.argv[3])
mh = MultiHostSearch(db_paths=shard_paths, matrix=sm, gap_open=3, gap_ext=1)
lut = sm.letter_index()
from opal_tpu.fasta import read_fasta_file
qs, _ = read_fasta_file(sys.argv[4], lut)
ranked = mh.ranked(qs[0], top_k=10)
from opal_tpu.constants import SEARCH_SCORE_END
ranked_ends = mh.ranked(qs[0], top_k=10, search_type=SEARCH_SCORE_END)
aligned = mh.search_aligned(qs[0], top_k=5)
for w in aligned:
    w["ops"] = None if w["ops"] is None else w["ops"].tolist()
out = sys.argv[6] + f".{sys.argv[2]}"
with open(out, "w") as f:
    json.dump({"ranked": ranked, "ranked_ends": ranked_ends,
               "aligned": aligned, "sizes": mh.shard_sizes}, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(240)
def test_two_process_multihost_ranking(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from opal_tpu.constants import MODE_SW, SEARCH_SCORE
    from opal_tpu.engine.search import Engine, search_database_arrays
    from opal_tpu.fasta import read_fasta_file
    from opal_tpu.matrices import ScoreMatrix

    sm = ScoreMatrix.blosum50()
    alpha = sm.alphabet
    rng = np.random.default_rng(99)

    # 4 shard files, 12 sequences total
    shard_paths = []
    all_seq_text = []
    for s in range(4):
        p = tmp_path / f"shard{s}.fa"
        lines = []
        for i in range(3):
            seq = "".join(alpha[j] for j in rng.integers(0, 20, size=int(rng.integers(20, 80))))
            lines.append(f">s{s}_{i}\n{seq}\n")
            all_seq_text.append(seq)
        p.write_text("".join(lines))
        shard_paths.append(str(p))
    qpath = tmp_path / "q.fa"
    qseq = "".join(alpha[j] for j in rng.integers(0, 20, size=40))
    qpath.write_text(f">q\n{qseq}\n")

    wpath = tmp_path / "worker.py"
    wpath.write_text(WORKER)
    out_base = str(tmp_path / "out.json")
    coord = f"localhost:{_free_port()}"
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "JAX_COMPILATION_CACHE_DIR": ""}
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(wpath), coord, str(pid),
             json.dumps(shard_paths), str(qpath), repo, out_base],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=220) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    results = [json.load(open(out_base + f".{i}")) for i in range(2)]
    # both hosts computed identical global results (ranking + alignments)
    assert results[0]["ranked"] == results[1]["ranked"]
    assert results[0]["ranked_ends"] == results[1]["ranked_ends"]
    assert results[0]["aligned"] == results[1]["aligned"]

    # ground truth: single-process search over the same sharded order
    from opal_tpu.constants import SEARCH_ALIGNMENT, SEARCH_SCORE_END
    from opal_tpu.engine.search import search_database

    lut = sm.letter_index()
    shard0 = []
    shard1 = []
    for i, p in enumerate(shard_paths):
        seqs, _ = read_fasta_file(p, lut)
        (shard0 if i % 2 == 0 else shard1).extend(seqs)
    qs, _ = read_fasta_file(str(qpath), lut)
    eng = Engine(backend="xla", block_size=8)
    want = []
    want_full = {}
    for s, shard in enumerate((shard0, shard1)):
        res = search_database(qs[0], shard, 3, 1, sm.matrix, mode=MODE_SW,
                              search_type=SEARCH_ALIGNMENT, engine=eng)
        for i, r in enumerate(res):
            want.append((r.score, s, i))
            want_full[(s, i)] = r
    want.sort(key=lambda r: (-r[0], r[1], r[2]))
    got = [tuple(r) for r in results[0]["ranked"]]
    assert got == want[:10]

    # x1 records carry the exact end locations of a single-process search
    for sc, s, i, eq, et in results[0]["ranked_ends"]:
        r = want_full[(s, i)]
        assert (sc, eq, et) == (
            r.score, r.end_location_query, r.end_location_target), (s, i)

    # aligned top-5: full records (start/end/ops) match single-process
    assert [(w["score"], w["shard"], w["index"])
            for w in results[0]["aligned"]] == want[:5]
    for w in results[0]["aligned"]:
        r = want_full[(w["shard"], w["index"])]
        assert w["end_q"] == r.end_location_query
        assert w["end_t"] == r.end_location_target
        assert w["start_q"] == r.start_location_query
        assert w["start_t"] == r.start_location_target
        want_ops = None if r.alignment is None else list(r.alignment)
        assert w["ops"] == want_ops, (w["shard"], w["index"])
