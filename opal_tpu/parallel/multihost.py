"""Multi-host database search orchestration.

The north-star deployment (SURVEY.md §2 item 5, §5): the protein database is
sharded across hosts of a TPU pod slice over DCN, the query is broadcast to
every host, each host searches its shard on its local chips (lane-sharded
over the local mesh, pallas kernels under shard_map), and per-sequence
results are merged with an all-gather into one globally-ranked result set.

Usage (one process per host, standard JAX multi-process launch):

    import jax
    jax.distributed.initialize()          # coordinator/env-driven
    from opal_tpu.parallel.multihost import MultiHostSearch

    mh = MultiHostSearch(db_paths=my_shard_paths, matrix=sm)
    ranked = mh.ranked(query)             # identical on every host

Each host reads only its own FASTA shard (`shard_for_process` splits a path
list round-robin by process index). The merge all-gathers fixed-width
per-sequence RECORDS — score alone for score-only searches, (score, end_q,
end_t) for end-location searches (the full result record of the reference's
``OpalSearchResult``, src/opal.h:47-74) — so the collective cost is
O(total_sequences) int32, negligible next to the DP. Full-alignment global
top-k (`search_aligned`) adds one more fixed-width gather of the winners'
op strings: each host reconstructs alignments only for its own winners.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..constants import MODE_SW, SEARCH_SCORE, SEARCH_SCORE_END
from ..engine.search import Engine, search_database_arrays
from ..fasta import read_fasta_file

SCORE_PAD = np.iinfo(np.int32).min  # padding rows sort last


def shard_for_process(paths: Sequence[str], process_index: int,
                      process_count: int) -> list[str]:
    """Round-robin assignment of DB shard files to processes."""
    return [p for i, p in enumerate(paths) if i % process_count == process_index]


def allgather_records(local: np.ndarray, max_len: int) -> np.ndarray:
    """All-gather per-host [n, k] int32 record tables (padded to max_len
    rows) across processes; returns [process_count, max_len, k]."""
    import jax
    from jax.experimental import multihost_utils

    k = local.shape[1]
    padded = np.full((max_len, k), SCORE_PAD, np.int32)
    padded[: len(local)] = local
    gathered = multihost_utils.process_allgather(padded)
    return np.asarray(gathered).reshape(jax.process_count(), max_len, k)


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

    def _local_search(self, query, mode, search_type):
        """[n_local, k] int32 records: score (+ end_q, end_t for x1/x2)."""
        cols = (["score", "end_q", "end_t"]
                if search_type != SEARCH_SCORE else ["score"])
        if self.ddb is None:
            return np.zeros((0, len(cols)), np.int32)
        out = search_database_arrays(
            query, self.ddb, self.gap_open, self.gap_ext,
            self._matrix_array, mode=mode, search_type=search_type,
            engine=self.engine,
        )
        return np.stack(
            [out[c].astype(np.int32) for c in cols], axis=1
        )

    def search(self, query, mode: int = MODE_SW,
               search_type: int = SEARCH_SCORE):
        """Search every host's shard; returns (shard_sizes, records):
        records is [process_count, max_local, k] int32 (k = 1 for
        score-only, 3 for score+ends), identical on all hosts; padding
        rows carry SCORE_PAD."""
        local = self._local_search(query, mode, search_type)
        if self.process_count == 1:
            full = np.full((1, self.max_local, local.shape[1]), SCORE_PAD,
                           np.int32)
            full[0, : len(local)] = local
            return self.shard_sizes, full
        return self.shard_sizes, allgather_records(local, self.max_local)

    def _rank(self, table):
        """(score desc, shard asc, index asc) over the gathered table via
        one vectorized lexsort — milliseconds at 541k sequences (the
        Python tuple sort this replaces took seconds)."""
        P, M = table.shape[:2]
        scores = table[:, :, 0].reshape(-1).astype(np.int64)
        shard = np.repeat(np.arange(P, dtype=np.int64), M)
        idx = np.tile(np.arange(M, dtype=np.int64), P)
        valid = idx < np.asarray(self.shard_sizes, np.int64)[shard]
        order = np.lexsort((idx, shard, -scores))
        return order[valid[order]], scores, shard, idx

    def _global_topk(self, query, mode, search_type, k):
        """Global top-k records via per-host DEVICE top-k selection
        (engine/ranked.py): each host downloads and all-gathers only k
        records — O(P*k) DCN traffic instead of O(total_sequences).
        Exact: each host's k records contain its local top-k, and the
        global top-k is a subset of the union. Returns (score, shard,
        index[, end_q, end_t]) tuples, identical on every host."""
        if k <= 0:
            return []
        track_end = search_type != SEARCH_SCORE
        cols = ["score", "end_q", "end_t"] if track_end else ["score"]
        if self.ddb is None:
            local = np.zeros((0, 1 + len(cols)), np.int32)
        else:
            out = search_database_arrays(
                query, self.ddb, self.gap_open, self.gap_ext,
                self._matrix_array, mode=mode, search_type=search_type,
                engine=self.engine, top_k=k,
            )
            local = np.stack(
                [out[c].astype(np.int32) for c in cols]
                + [out["index"].astype(np.int32)], axis=1)
        if self.process_count > 1:
            table = allgather_records(local, k)
        else:
            table = np.full((1, k, local.shape[1]), SCORE_PAD, np.int32)
            table[0, : len(local)] = local
        P, M, W = table.shape
        scores = table[:, :, 0].reshape(-1).astype(np.int64)
        idx = table[:, :, W - 1].reshape(-1).astype(np.int64)
        shard = np.repeat(np.arange(P, dtype=np.int64), M)
        valid = idx >= 0  # padding rows carry SCORE_PAD in every column
        order = np.lexsort((idx, shard, -scores))
        order = order[valid[order]][:k]
        flat = table.reshape(-1, W)
        rows = []
        for o in order.tolist():
            base = (int(scores[o]), int(shard[o]), int(idx[o]))
            if track_end:
                base += (int(flat[o, 1]), int(flat[o, 2]))
            rows.append(base)
        return rows

    def ranked(self, query, mode: int = MODE_SW, top_k: int = 0,
               search_type: int = SEARCH_SCORE):
        """Globally-ranked records, identical on every host. Each row is
        (score, shard, index-in-shard) — plus (end_q, end_t) when
        search_type tracks ends. Returns a list of tuples.

        top_k > 0 takes the device-ranked path: each host selects its k
        best on device and only k records per host cross DCN; top_k == 0
        (all records) gathers the full per-sequence tables as before."""
        if top_k:
            return self._global_topk(query, mode, search_type, top_k)
        sizes, table = self.search(query, mode=mode,
                                   search_type=search_type)
        order, scores, shard, idx = self._rank(table)
        ends = table.reshape(-1, table.shape[2])[order]
        rows = []
        for j, o in enumerate(order.tolist()):
            base = (int(scores[o]), int(shard[o]), int(idx[o]))
            if table.shape[2] == 3:
                base += (int(ends[j, 1]), int(ends[j, 2]))
            rows.append(base)
        return rows

    @staticmethod
    def _pack_ops_rows(local_ops, n_rows, width):
        """Pack per-winner alignment records into fixed-width int32 rows
        [start_q, start_t, op_len, ops...]; -2 marks "not mine" (another
        host owns the winner), op_len -1 marks score-only/no-path. One
        packer serves both the allgather and single-process branches so
        the record layout cannot drift between them."""
        buf = np.full((n_rows, 3 + width), -2, np.int32)
        for j, (sq, st, ops) in local_ops.items():
            n = 0 if ops is None else len(ops)
            buf[j, :3] = (sq, st, n if ops is not None else -1)
            if n:
                buf[j, 3 : 3 + n] = ops
        return buf

    def search_aligned(self, query, mode: int = MODE_SW, top_k: int = 10):
        """Global top-k full-alignment search (the multihost analog of
        SEARCH_ALIGNMENT + align_top_k): one score+end pass over every
        shard, a global ranking, then each host reconstructs alignment
        paths ONLY for winners in its own shard (reference per-sequence
        record: score, start/end locations, ops; src/opal.h:47-74). The
        winners' op strings merge with one fixed-width all-gather.

        Returns a list of dicts (identical on every host), ranked:
        {score, shard, index, end_q, end_t, start_q, start_t, ops} with
        ops a uint8 numpy array (None if not reconstructible / SW 0)."""
        from ..traceback import AlignmentError, align_pair_reverse_trick

        query = np.asarray(query, dtype=np.uint8)
        # device-ranked winner selection: k records per host cross DCN
        # instead of the full per-sequence table (see _global_topk)
        rows = self._global_topk(query, mode, SEARCH_SCORE_END, top_k)
        winners = [
            dict(score=r[0], shard=r[1], index=r[2],
                 end_q=r[3], end_t=r[4])
            for r in rows
        ]

        # local alignment pass: only this host's winners
        local_ops = {}
        for j, w in enumerate(winners):
            if w["shard"] != self.process_index:
                continue
            if mode == MODE_SW and w["score"] == 0:
                # reference: src/opal.cpp:1479-1483 (no path for score 0)
                local_ops[j] = (-1, -1, None)
                continue
            try:
                sq, st, ops = align_pair_reverse_trick(
                    query, self.db[w["index"]], self.gap_open, self.gap_ext,
                    self._matrix_array, w["score"], w["end_q"], w["end_t"],
                    mode,
                )
                local_ops[j] = (sq, st, np.asarray(ops, np.uint8))
            except AlignmentError:
                local_ops[j] = (-1, -1, None)

        if self.process_count > 1:
            from jax.experimental import multihost_utils

            # fixed gather width: global max op length (one scalar gather)
            local_max = max(
                (0 if o is None else len(o) for _, _, o in local_ops.values()),
                default=0,
            )
            all_max = np.asarray(multihost_utils.process_allgather(
                np.array([local_max], np.int32)))
            width = int(all_max.max())
            buf = self._pack_ops_rows(local_ops, len(winners), width)
            gathered = np.asarray(
                multihost_utils.process_allgather(buf)
            ).reshape(self.process_count, len(winners), 3 + width)
            merged = gathered[np.asarray([w["shard"] for w in winners]),
                              np.arange(len(winners))]
        else:
            width = max(
                (0 if o is None else len(o) for _, _, o in local_ops.values()),
                default=0,
            )
            merged = self._pack_ops_rows(local_ops, len(winners), width)

        for j, w in enumerate(winners):
            sq, st, n = (int(merged[j, 0]), int(merged[j, 1]),
                         int(merged[j, 2]))
            w["start_q"], w["start_t"] = sq, st
            w["ops"] = (merged[j, 3 : 3 + n].astype(np.uint8)
                        if n >= 0 else None)
            if mode == MODE_SW and w["score"] == 0:
                w["end_q"] = w["end_t"] = -1
        return winners
