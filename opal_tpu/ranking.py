"""Result ranking: merge per-sequence scores into a ranked result set.

The reference leaves ranking to callers; the TPU deployment (DB sharded over
chips/hosts) makes a deterministic global ranking part of the engine's job
(north star: "per-sequence results merged via all-gather into one ranked
result set"). Ordering: score descending, then original DB index ascending
(stable and shard-independent).
"""
from __future__ import annotations

import numpy as np


def rank_scores(scores: np.ndarray, top_k: int = 0) -> np.ndarray:
    """Indices of DB sequences ordered by (score desc, index asc)."""
    scores = np.asarray(scores)
    order = np.lexsort((np.arange(len(scores)), -scores))
    return order[:top_k] if top_k else order


def top_k_results(results, k: int):
    """(index, SearchResult) pairs for the k best-scoring results."""
    scores = np.array([r.score if r.score_set else np.iinfo(np.int64).min
                       for r in results])
    order = rank_scores(scores, k)
    return [(int(i), results[int(i)]) for i in order]


def rank_rows(idx, cols, k):
    """Host-side twin of the device top-k (engine/ranked.py): rank rows
    whose DB indices are `idx` by (score desc, index asc), slice k.
    Returns (ranked_idx, ranked_cols)."""
    idx = np.asarray(idx)
    order = np.lexsort((idx, -np.asarray(cols["score"], np.int64)))[:k]
    return idx[order], {c: np.asarray(v)[order] for c, v in cols.items()}


def merge_shard_scores(shard_scores, shard_sizes) -> np.ndarray:
    """Trim per-shard padded all-gather rows (1-D score vectors, or
    [max_local, k] record tables) to their true sizes and concatenate in
    shard-major order. Generic utility for custom merge flows —
    MultiHostSearch itself does NOT use it: it lexsorts the padded record
    table directly (parallel/multihost.py::_rank) and never materializes
    the concatenation."""
    parts = []
    for row, n in zip(shard_scores, shard_sizes):
        parts.append(np.asarray(row)[:n])
    return np.concatenate(parts) if parts else np.zeros(0, np.int32)
