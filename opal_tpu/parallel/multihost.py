"""Multi-host database search orchestration.

The north-star deployment (SURVEY.md §2 item 5, §5): the protein database is
sharded across hosts of a TPU pod slice over DCN, the query is broadcast to
every host, each host searches its shard on its local chips (lane-sharded
over the local mesh), and per-sequence scores are merged with an all-gather
into one globally-ranked result set.

Usage (one process per host, standard JAX multi-process launch):

    import jax
    jax.distributed.initialize()          # coordinator/env-driven
    from opal_tpu.parallel.multihost import MultiHostSearch

    mh = MultiHostSearch(db_paths=my_shard_paths, matrix=sm)
    ranked = mh.search(query)             # identical on every host

Each host reads only its own FASTA shard (`shard_for_process` splits a path
list round-robin by process index). The merge uses a fixed-width score
all-gather over the global device mesh, so the collective cost is
O(total_sequences) int32 — negligible next to the DP.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..constants import MODE_SW, SEARCH_SCORE
from ..engine.search import Engine, search_database_arrays
from ..fasta import read_fasta_file


def shard_for_process(paths: Sequence[str], process_index: int,
                      process_count: int) -> list[str]:
    """Round-robin assignment of DB shard files to processes."""
    return [p for i, p in enumerate(paths) if i % process_count == process_index]


def allgather_scores(local_scores: np.ndarray, max_len: int) -> np.ndarray:
    """All-gather per-host score vectors (padded to max_len) across
    processes; returns [process_count, max_len]."""
    import jax
    from jax.experimental import multihost_utils

    padded = np.full(max_len, np.iinfo(np.int32).min, np.int32)
    padded[: len(local_scores)] = local_scores
    gathered = multihost_utils.process_allgather(padded)
    return np.asarray(gathered).reshape(jax.process_count(), max_len)


class MultiHostSearch:
    def __init__(self, db_paths: Sequence[str], matrix, gap_open: int = 3,
                 gap_ext: int = 1, engine: Optional[Engine] = None,
                 local_mesh=None):
        import jax

        self.matrix = matrix
        self.gap_open = gap_open
        self.gap_ext = gap_ext
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self.local_paths = shard_for_process(
            list(db_paths), self.process_index, self.process_count
        )
        lut = matrix.letter_index() if hasattr(matrix, "letter_index") else None
        self._matrix_array = (
            matrix.matrix if hasattr(matrix, "matrix") else np.asarray(matrix)
        )
        self.db = []
        for p in self.local_paths:
            seqs, _ = read_fasta_file(p, lut)
            self.db.extend(seqs)
        self.engine = engine or Engine(mesh=local_mesh)
        self.ddb = self.engine.upload(self.db) if self.db else None
        # fixed gather width: max local shard size across hosts
        local_n = np.array([len(self.db)], np.int32)
        if self.process_count > 1:
            from jax.experimental import multihost_utils

            all_n = np.asarray(multihost_utils.process_allgather(local_n))
            self.max_local = int(all_n.max())
            self.shard_sizes = [int(x) for x in all_n.reshape(-1)]
        else:
            self.max_local = len(self.db)
            self.shard_sizes = [len(self.db)]

    def search(self, query, mode: int = MODE_SW,
               search_type: int = SEARCH_SCORE):
        """Search every host's shard; returns (shard_sizes, scores-by-shard):
        a [process_count, max_local] int32 array, identical on all hosts."""
        if self.ddb is not None:
            out = search_database_arrays(
                query, self.ddb, self.gap_open, self.gap_ext,
                self._matrix_array, mode=mode, search_type=search_type,
                engine=self.engine,
            )
            local = out["score"].astype(np.int32)
        else:
            local = np.zeros(0, np.int32)
        if self.process_count == 1:
            full = np.full((1, self.max_local), np.iinfo(np.int32).min,
                           np.int32)
            full[0, : len(local)] = local
            return self.shard_sizes, full
        return self.shard_sizes, allgather_scores(local, self.max_local)

    def ranked(self, query, mode: int = MODE_SW, top_k: int = 0):
        """Globally-ranked (score, shard, index-in-shard) triples."""
        sizes, table = self.search(query, mode=mode)
        rows = []
        for s, n in enumerate(sizes):
            for i in range(n):
                rows.append((int(table[s, i]), s, i))
        rows.sort(key=lambda r: (-r[0], r[1], r[2]))
        return rows[:top_k] if top_k else rows
