"""Device-side top-k ranked emission.

Every ranked consumer (serve top-k, CLI --align-top, multihost.ranked)
wants the k best sequences by the reference tie-break (score desc, DB
index asc — the order opal's callers sort OpalSearchResult by,
reference: src/opal.h:44-74), yet the engine used to download the FULL
per-sequence tracker payload and rank on host. At whole-database scale
the download dominates end-to-end latency (measured: 46.8 ms device vs
91-150 ms wall; ~35 MB/s through a tunneled device). This module selects
the top-k ON DEVICE and downloads kilobytes instead of megabytes.

Selection is exact and avoids any host round trip mid-flight:

1. finalize tracker rows to (score, end_q, end_t) per lane with the same
   mode dispatch as pallas_kernels.finalize_trackers, on device;
2. mask padding lanes via a per-lane DB-index array (-1 = padding),
   uploaded once per resident database;
3. ``s_k = lax.top_k(score, k)[k-1]``, then two more top_k calls emit a
   SUPERSET of the exact top-k: all entries with score > s_k (at most
   k-1 of them) and the k smallest-index entries with score == s_k.
   The host sorts the <= 2k candidates by (-score, index) and slices k.

The superset property composes across stream parts and mesh shards by
plain union: each part/shard contributes candidates covering its own
exact top-k, so the global sort of all candidates yields the exact
global top-k. Exact for ANY int32 score range (no packed float keys, so
score and index never share a word); DB indices are int32 throughout
(here and in the multihost gather record, where they are shard-local),
bounding a single host's shard at 2^31 sequences — far beyond what fits
a host, and cross-host scale is unbounded via sharding.
"""
from __future__ import annotations

import functools

import numpy as np

from ..constants import MODE_HW, MODE_NW, MODE_OV, MODE_SW, SEARCH_SCORE
from . import pallas_kernels as pk

# Doubles as the invalid-lane sentinel AND the top_k padding key: a valid
# lane scoring exactly I32_MIN would be indistinguishable from padding and
# silently dropped. Unreachable by construction — every engine mode scores
# in f32-exact integer range (|score| < 2^24, see pallas_kernels.py), and
# int32 emission clamps far above this — but the assumption is asserted in
# the host merge (finalize) under OPAL_TPU_DEBUG=1.
I32_MIN = -(2**31)


def _finalize_device(tr, lengths, mode, search_type, q, rows):
    """Tracker rows -> (score, end_q, end_t) [NB, B] device arrays.

    Same per-mode row selection as finalize_trackers (host), expressed in
    jnp; NW/HW end rows are synthesized from static Q / device lengths.
    """
    import jax.numpy as jnp

    tr = tr.astype(jnp.int32)
    row = {r: tr[:, j, :] for j, r in enumerate(rows)}
    track_end = search_type != SEARCH_SCORE
    end_q = end_t = None
    if mode == MODE_SW:
        score = row[pk.TR_BEST]
        if track_end:
            end_q, end_t = row[pk.TR_BEST_R], row[pk.TR_BEST_C]
    elif mode == MODE_NW:
        score = row[pk.TR_NW]
        if track_end:
            end_q = jnp.full_like(score, q - 1)
            end_t = lengths[:, 0, :].astype(jnp.int32) - 1
    elif mode == MODE_HW:
        score = row[pk.TR_BEST]
        if track_end:
            end_q = jnp.full_like(score, q - 1)
            end_t = row[pk.TR_BEST_C]
    else:  # OV (end disambiguation already done on device at emit)
        score = row[pk.TR_BEST]
        if track_end:
            end_q, end_t = row[pk.TR_BEST_R], row[pk.TR_BEST_C]
    return score, end_q, end_t


def _select_topk(score, end_q, end_t, db_idx, k):
    """Emit <= 2k top-k candidates from [NB, B] score/index arrays.

    Returns ONE packed int32 array [n_cols, 2k] — rows (db, score, valid
    [, end_q, end_t]) — so the host fetches the whole candidate set in a
    single transfer (each extra tiny download costs a full link round
    trip, ~25-35 ms tunneled — 5 separate arrays measurably LOST to the
    full-download path). Candidates with valid == 0 are selection-slot
    padding (fewer than k entries in a class); the host merge drops them.
    """
    import jax.lax as lax
    import jax.numpy as jnp

    flat_i = db_idx.reshape(-1)
    valid = flat_i >= 0
    s = jnp.where(valid, score.reshape(-1), I32_MIN)
    kk = min(int(k), s.size)
    sk = lax.top_k(s, kk)[0][kk - 1]
    # score > sk implies a valid lane (invalid lanes sit at I32_MIN);
    # score == sk needs the explicit mask when sk == I32_MIN itself.
    key_gt = jnp.where(s > sk, -flat_i, I32_MIN)
    key_eq = jnp.where((s == sk) & valid, -flat_i, I32_MIN)
    kg, ig = lax.top_k(key_gt, kk)
    ke, ie = lax.top_k(key_eq, kk)
    idx2 = jnp.concatenate([ig, ie])
    ok = (jnp.concatenate([kg, ke]) != I32_MIN).astype(jnp.int32)
    rows = [flat_i[idx2], s[idx2], ok]
    if end_q is not None:
        rows += [end_q.reshape(-1)[idx2], end_t.reshape(-1)[idx2]]
    return jnp.stack(rows)


@functools.lru_cache(maxsize=None)
def _topk_fn(mode, search_type, q, k, rows):
    """Jitted (tr, db_idx, lengths) -> packed candidate array. Cached per
    config; jax.jit re-specializes per tracker shape automatically."""
    import jax

    def fn(tr, db_idx, lengths):
        score, end_q, end_t = _finalize_device(
            tr, lengths, mode, search_type, q, rows)
        return _select_topk(score, end_q, end_t, db_idx, k)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _topk_fn_sharded(mode, search_type, q, k, rows, mesh):
    """shard_map-wrapped _topk_fn: each device selects candidates from its
    own tracker shard (leading device axis on 'db'); the packed outputs
    stack [D, n_cols, 2k] and merge on host by plain union (superset
    property)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ..parallel.shard import DB_AXIS

    def local(tr, db_idx, lengths):
        score, end_q, end_t = _finalize_device(
            tr[0], lengths[0], mode, search_type, q, rows)
        return _select_topk(score, end_q, end_t, db_idx[0], k)[None]

    return jax.jit(jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DB_AXIS), P(DB_AXIS), P(DB_AXIS)),
        out_specs=P(DB_AXIS),
        check_vma=False,
    ))


def _lane_db_indices(blocks, nb_pad, B):
    """[nb_pad, B] int32: original DB index per lane, -1 for padding lanes
    and trash rows."""
    idx = np.full((nb_pad, B), -1, np.int32)
    for bi, blk in enumerate(blocks):
        idx[bi, : blk.n] = blk.indices
    return idx


def _lane_idx_cache(ddb) -> dict:
    cache = getattr(ddb, "_ranked_idx_cache", None)
    if cache is None:
        cache = ddb._ranked_idx_cache = {}
    return cache


def _lane_idx_part(ddb, part_i, n_parts, blocks, nb_pad):
    """Device [nb_pad, B] lane->DB-index array for one stream part
    (cached on the DeviceDatabase; DB-static)."""
    import jax

    cache = _lane_idx_cache(ddb)
    key = ("part", n_parts, part_i, nb_pad)
    arr = cache.get(key)
    if arr is None:
        arr = jax.device_put(
            _lane_db_indices(blocks, nb_pad, ddb.block_size))
        cache[key] = arr
    return arr


def _lane_idx_sharded(ddb, dev_blocks, nb_pad):
    """Device [D, nb_pad, B] lane->DB-index array sharded over the mesh
    (global DB indices; Block.indices are global already)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from ..parallel.shard import DB_AXIS

    cache = _lane_idx_cache(ddb)
    key = ("sharded", nb_pad)
    arr = cache.get(key)
    if arr is None:
        stack = np.stack([
            _lane_db_indices(blocks, nb_pad, ddb.block_size)
            for blocks in dev_blocks
        ])
        arr = jax.device_put(
            stack, NamedSharding(ddb.mesh, PartitionSpec(DB_AXIS)))
        cache[key] = arr
    return arr


def merge_candidates(parts, k, track_end):
    """Union packed candidate arrays from stream parts / mesh shards, sort
    by the reference tie-break (score desc, DB index asc), slice k.
    parts: list of [n_cols, 2k] int arrays, rows (db, score, valid
    [, end_q, end_t])."""
    dbs, scores, eqs, ets = [], [], [], []
    import os

    debug = os.environ.get("OPAL_TPU_DEBUG") == "1"
    for p in parts:
        p = np.asarray(p)
        ok = p[2] != 0
        if debug:
            # audit the I32_MIN sentinel assumption (see its definition)
            assert not np.any(p[1][ok] == I32_MIN), \
                "valid candidate scored I32_MIN — sentinel collision"
        dbs.append(p[0][ok])
        scores.append(p[1][ok])
        if track_end:
            eqs.append(p[3][ok])
            ets.append(p[4][ok])
    db = np.concatenate(dbs) if dbs else np.zeros(0, np.int32)
    score = np.concatenate(scores) if scores else np.zeros(0, np.int32)
    order = np.lexsort((db, -score.astype(np.int64)))[:k]
    out = {"index": db[order].astype(np.int64),
           "score": score[order].astype(np.int32)}
    if track_end:
        eq = np.concatenate(eqs) if eqs else np.zeros(0, np.int32)
        et = np.concatenate(ets) if ets else np.zeros(0, np.int32)
        out["end_q"] = eq[order].astype(np.int32)
        out["end_t"] = et[order].astype(np.int32)
    return out


def topk_from_handle(handle, ddb, mode, search_type, q, k):
    """Device-side top-k from a live dispatch_many handle (tracker arrays
    still on device). Returns the ranked dict, or None when the payload
    shape has no device fast path (XLA fallback, query panels) — the
    caller then ranks the full host download instead."""
    kind, payload = handle
    track_end = search_type != SEARCH_SCORE
    # q reaches the jit only through NW/HW end synthesis; key the fn
    # cache on 0 otherwise so SW/OV serving does not re-trace (and
    # re-compile) per distinct query length.
    if not (track_end and mode in (MODE_NW, MODE_HW)):
        q = 0
    if kind == "ragged":
        if payload is None:
            return merge_candidates([], k, track_end)
        rows = tuple(pk.tracker_rows(mode, search_type, False))
        fn = _topk_fn(mode, search_type, q, k, rows)
        parts = []
        lengths_by_part = _part_lengths(ddb, len(payload))
        # enqueue every part's selection before the first download so
        # device work pipelines; each part downloads ONE packed array
        for pi, (blocks, tr) in enumerate(payload):
            di = _lane_idx_part(ddb, pi, len(payload), blocks, tr.shape[0])
            parts.append(fn(tr, di, lengths_by_part[pi]))
        return merge_candidates(parts, k, track_end)
    if kind == "sharded":
        rows = tuple(pk.tracker_rows(mode, search_type, False))
        dev_blocks, tr = payload
        di = _lane_idx_sharded(ddb, dev_blocks, tr.shape[1])
        _, _, _, lengths = ddb.flat_sharded()
        fn = _topk_fn_sharded(mode, search_type, q, k, rows, ddb.mesh)
        out = np.asarray(fn(tr, di, lengths))  # [D, n_cols, 2k]
        return merge_candidates(list(out), k, track_end)
    return None  # xla / panel payloads: host ranking path


def _part_lengths(ddb, n_parts):
    """Per-part device lengths arrays matching dispatch_many's split."""
    return [lengths for _, _, _, lengths in ddb.flat_parts(n_parts)]


def topk_from_multi_handle(handle, ddb, k):
    """Device-side per-query top-k from a dispatch_multi handle (stacked
    multi-query launch). Returns a list of ranked dicts (one per query),
    or None when the payload is not a device array (mesh multi downloads
    eagerly; empty DB)."""
    payload, seg_qs, mode, track_end = handle
    n_q = len(seg_qs)
    if payload is None:
        return [merge_candidates([], k, track_end) for _ in range(n_q)]
    if isinstance(payload[0][1], np.ndarray):
        return None  # already host-side (mesh multi path)
    fn = _topk_multi_fn(n_q, track_end, k)
    per_query = [[] for _ in range(n_q)]
    for pi, (blocks, tr) in enumerate(payload):
        di = _lane_idx_part(ddb, pi, len(payload), blocks, tr.shape[0])
        out = np.asarray(fn(tr, di))  # [n_q, n_cols, 2k], one download
        for s in range(n_q):
            per_query[s].append(out[s])
    return [merge_candidates(per_query[s], k, track_end)
            for s in range(n_q)]


@functools.lru_cache(maxsize=None)
def _topk_multi_fn(n_q, track_end, k):
    """Jitted per-segment top-k over a stacked multi-query tracker array
    [NB, n_rows, B] (rows: per-segment score [+ end_q/end_t] — the multi
    kernel emits final values at emit time, no mode dispatch needed)."""
    import jax
    import jax.numpy as jnp

    def fn(tr, db_idx):
        tr = tr.astype(jnp.int32)
        score = jnp.moveaxis(tr[:, :n_q, :], 1, 0)       # [n_q, NB, B]
        if track_end:
            eq = jnp.moveaxis(tr[:, n_q : 2 * n_q, :], 1, 0)
            et = jnp.moveaxis(tr[:, 2 * n_q :, :], 1, 0)
            sel = jax.vmap(
                lambda s, a, b: _select_topk(s, a, b, db_idx, k))
            return sel(score, eq, et)
        sel = jax.vmap(lambda s: _select_topk(s, None, None, db_idx, k))
        return sel(score)

    return jax.jit(fn)
