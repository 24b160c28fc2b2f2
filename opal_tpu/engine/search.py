"""Top-level database search: the public API of the engine.

Mirrors the contract of the reference's ``opalSearchDatabase``
(reference: src/opal.h:150-154, src/opal.cpp:1435-1519):

- dispatch on mode (SW / NW / HW / OV) and search type (score / score+end /
  full alignment);
- skip semantics: sequences whose passed-in results already carry a score
  (and end location when needed) are not recomputed, and their stored values
  are trusted by the alignment pass (src/opal.cpp:1446-1451);
- the alignment pass runs the reverse-pair banded traceback per sequence with
  score_limit = the known score (src/opal.cpp:1475-1507);
- the adaptive precision cascade and its two overflow strategies are
  implemented in engine/cascade.py and behave identically at the output level.

The scoring pass itself is batched: the DB is length-bucketed into padded
blocks (engine/batching.py) and each block is scored on the accelerator
(engine/xla.py or the Pallas TPU kernels in engine/pallas_kernels.py).
"""
from __future__ import annotations

import collections
import dataclasses
from typing import Optional, Sequence

import numpy as np

from ..constants import (
    MODE_HW,
    MODE_NW,
    MODE_OV,
    MODE_SW,
    OVERFLOW_BUCKETS,
    SEARCH_ALIGNMENT,
    SEARCH_SCORE,
)
from ..result import SearchResult
from ..traceback import AlignmentError, align_pair_reverse_trick


def _db_fingerprint(db) -> bytes:
    """Cheap content fingerprint of a sequence list: the count plus the
    full bytes of a deterministic ~17-sequence sample (first, last, evenly
    strided). O(1) in database size; detects id() reuse and in-place
    mutation of sampled sequences (mutating only unsampled sequences still
    requires a fresh list — or Engine.upload() — to be observed)."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    n = len(db)
    h.update(n.to_bytes(8, "little"))
    if n:
        step = max(1, n // 16)
        for i in sorted({*list(range(0, n, step))[:16], n - 1}):
            a = np.asarray(db[i])
            h.update(i.to_bytes(8, "little"))
            h.update(int(a.shape[0]).to_bytes(8, "little"))
            h.update(a.tobytes())
    return h.digest()


# Resident DeviceDatabases kept per Engine (LRU). 4 covers the realistic
# "a few DBs alternating through the convenience API" shape without letting
# device buffers accumulate unboundedly.
_RESIDENT_LRU_SIZE = 4


@dataclasses.dataclass
class EngineConfig:
    backend: str = "auto"     # "auto" | "xla" | "pallas" | "pallas-interpret"
    # sequences per scored block (lane count); 1024 measured fastest on
    # v5e (512 ~5% slower, 2048 regresses on VMEM pressure)
    block_size: int = 1024
    # Precision stages for the adaptive cascade; int32 alone disables it.
    # (The TPU VPU has no throughput cliff between int8/int16/int32 the way
    # SSE/AVX lane-splitting does, so int32-direct is the default; the
    # cascade exists for API parity and for the int16 fast path.)
    precision: str = "int32"  # "int32" | "adaptive"
    # Optional jax.sharding.Mesh with axis "db": block lanes are sharded
    # across it (data parallelism over the database dimension).
    mesh: object = None


class Engine:
    def __init__(self, config: Optional[EngineConfig] = None, **kw):
        self.config = config or EngineConfig(**kw)
        self._backend = None
        # Bounded LRU of resident DeviceDatabases (most-recent last):
        # callers alternating between a few DBs through the convenience
        # APIs must not re-upload on every call.
        self._resident_cache: "collections.OrderedDict" = (
            collections.OrderedDict())
        self.last_search_stats: Optional[dict] = None

    def _resolve_backend(self):
        if self._backend is not None:
            return self._backend
        name = self.config.backend
        if name == "auto":
            import jax

            name = "pallas" if jax.default_backend() == "tpu" else "xla"
        if name in ("pallas", "pallas-interpret"):
            from . import pallas_backend

            self._backend = pallas_backend.PallasBackend(
                interpret=(name == "pallas-interpret"))
        else:
            from . import xla_backend

            self._backend = xla_backend.XlaBackend()
        return self._backend

    def upload(self, db: Sequence[np.ndarray]) -> "DeviceDatabase":
        """Upload the DB to the device once (resident-database mode).

        The returned handle can be passed to repeated searches; this is the
        TPU analog of the reference holding the DB in RAM across queries."""
        from .device_db import DeviceDatabase

        return DeviceDatabase(db, self.config.block_size,
                              mesh=self.config.mesh)

    def _get_resident(self, db, block_size=None) -> "DeviceDatabase":
        from .device_db import DeviceDatabase

        B = block_size or self.config.block_size
        if isinstance(db, DeviceDatabase):
            if B >= db.block_size:
                return db
            # long-query lane-width downshift: re-block the resident DB
            db = db.raw
        # Keyed by id() AND a sampled content fingerprint: id alone could
        # serve a stale DeviceDatabase after the caller mutates the list's
        # sequences in place (and, were the list not pinned by the cache,
        # after id reuse of a freed list). Engine.upload() remains the
        # contract-safe resident API for mutation-heavy callers.
        key = (id(db), _db_fingerprint(db))
        cached = self._resident_cache.get(key)
        if cached is None:
            cached = {}
            self._resident_cache[key] = cached
            # Bounded LRU: keep the 4 most recent DBs resident (each entry
            # also pins its backing list, so id() reuse cannot alias).
            while len(self._resident_cache) > _RESIDENT_LRU_SIZE:
                self._resident_cache.popitem(last=False)
        else:
            self._resident_cache.move_to_end(key)
        if B not in cached:
            cached[B] = DeviceDatabase(db, B, mesh=self.config.mesh)
        return cached[B]

    def score_blocks(
        self,
        query: np.ndarray,
        db,
        gap_open: int,
        gap_ext: int,
        matrix: np.ndarray,
        mode: int,
        search_type: int,
        subset=None,
        with_flags: bool = False,
        top_k: int = 0,
    ):
        """Score (a subset of) the DB. Returns (indices, columns) where
        columns is a dict of per-index arrays (score [+ end_q/end_t]).

        Dispatch is fully asynchronous: every block is enqueued before the
        first result is pulled back, so device work and transfers pipeline.

        top_k > 0: return only the k best rows, ranked by the reference
        tie-break (score desc, DB index asc). On the pallas backend the
        selection runs ON DEVICE (engine/ranked.py) and the download is
        O(k) instead of O(n) — the whole-database payload used to dominate
        end-to-end latency on tunneled devices; payloads without a device
        fast path (XLA fallback, query panels) collect fully and rank on
        host, same output.
        """
        backend = self._resolve_backend()
        qprofile = np.ascontiguousarray(
            np.asarray(matrix, dtype=np.int32)[
                np.asarray(query, dtype=np.int64)
            ].T
        )  # [A, Q]
        Q = qprofile.shape[1]
        qprep = backend.prepare_query(qprofile, int(gap_open), int(gap_ext))

        # Long queries overflow the VMEM DP-state budget at the default
        # lane width; rather than falling back to XLA, narrow the lane
        # width (pallas stays ~1.6x faster at Q=6000). Mesh-sharded DBs
        # keep their width (sharding layout is width-dependent).
        B_eff = self.config.block_size
        pick = getattr(backend, "preferred_block_size", None)
        if pick is not None and self.config.mesh is None:
            from .pallas_kernels import n_state_arrays, sw_end_packed_ok

            absmax = int(np.abs(qprofile).max()) if Q else 0
            packed = (mode == MODE_SW and search_type != SEARCH_SCORE
                      and sw_end_packed_ok(Q, absmax, int(gap_ext)))
            B_eff = pick(
                Q, int(gap_open), int(gap_ext), qprofile.shape[0], absmax,
                n_state_arrays(mode, search_type, with_flags, packed),
                self.config.block_size,
            )

        from .device_db import DeviceDatabase

        if isinstance(db, DeviceDatabase):
            db_list = db.raw
        else:
            db_list = db
        if subset is None or len(subset) == len(db_list):
            ddb = self._get_resident(db, block_size=B_eff)
            index_map = None
        else:
            # partial rescoring (cascade reruns / skip): ad-hoc upload
            index_map = np.fromiter(subset, dtype=np.int64)
            ddb = DeviceDatabase(
                [db_list[i] for i in index_map],
                min(B_eff, self.config.block_size),
                mesh=self.config.mesh,
            )

        handle = backend.dispatch_many(
            qprep, ddb, int(gap_open), int(gap_ext),
            mode, search_type, with_flags,
            single_part=bool(top_k and index_map is None
                             and not with_flags),
        )
        if top_k and index_map is None and not with_flags:
            if (isinstance(handle, tuple) and len(handle) == 2
                    and isinstance(handle[0], str)):
                from .ranked import topk_from_handle

                out = topk_from_handle(
                    handle, ddb, mode, search_type, Q, top_k)
                if out is not None:
                    return out.pop("index"), out
        handle = backend.gather(handle)  # one device->host round trip
        per_block = backend.collect_many(
            handle, ddb, mode, search_type, Q, with_flags
        )
        all_idx = []
        cols: dict[str, list] = {}
        for blk, out in per_block:
            idxs = blk.indices if index_map is None else index_map[blk.indices]
            all_idx.append(idxs)
            for k, v in out.items():
                cols.setdefault(k, []).append(v)
        if not all_idx:
            return np.zeros(0, np.int64), {}
        idx = np.concatenate(all_idx)
        cols = {k: np.concatenate(v) for k, v in cols.items()}
        if top_k:
            from ..ranking import rank_rows

            return rank_rows(idx, cols, top_k)
        return idx, cols


def _finish_cols(out, mode, search_type, n=0):
    """Normalize a result-column dict in place: an empty database yields
    no blocks, hence no columns, so synthesize the expected (empty)
    arrays; then apply the reference's SW zero-score end masking (end
    locations report -1, src/opal_aligner.cpp semantics)."""
    if "score" not in out:
        out["score"] = np.zeros(n, np.int32)
    if search_type != SEARCH_SCORE:
        for k in ("end_q", "end_t"):
            if k not in out:
                out[k] = np.zeros(n, np.int32)
        if mode == MODE_SW:
            zero = out["score"] == 0
            out["end_q"] = np.where(zero, -1, out["end_q"])
            out["end_t"] = np.where(zero, -1, out["end_t"])
    return out


def search_database_arrays(
    query,
    db,
    gap_open: int = 3,
    gap_ext: int = 1,
    matrix=None,
    mode: int = MODE_SW,
    search_type: int = SEARCH_SCORE,
    engine: Optional[Engine] = None,
    top_k: int = 0,
):
    """Array-level search: returns a dict of [n] numpy arrays in DB order
    ("score" [+ "end_q"/"end_t"]). The zero-copy path for ranking, serving,
    and benchmarking (the object API wraps this).

    top_k > 0: returns the RANKED shape instead — {"index", "score"
    [, "end_q", "end_t"]} arrays of the k best sequences (score desc,
    index asc). Selection runs on device where possible (engine/ranked.py)
    so the result download is O(k), not O(n)."""
    if matrix is None:
        raise ValueError("matrix is required")
    engine = engine or get_default_engine()
    query = np.asarray(query, dtype=np.uint8)
    from .device_db import DeviceDatabase

    n = db.n if isinstance(db, DeviceDatabase) else len(db)
    if top_k:
        idx, cols = engine.score_blocks(
            query, db, gap_open, gap_ext, matrix, mode, search_type,
            top_k=top_k,
        )
        out = {"index": idx, **cols}
        return _finish_cols(out, mode, search_type)
    idx, cols = engine.score_blocks(
        query, db, gap_open, gap_ext, matrix, mode, search_type
    )
    out = {}
    for k, v in cols.items():
        arr = np.empty(n, dtype=v.dtype)
        arr[idx] = v
        out[k] = arr
    return _finish_cols(out, mode, search_type, n=n)


def search_database_multi_arrays(
    queries,
    db,
    gap_open: int = 3,
    gap_ext: int = 1,
    matrix=None,
    mode: int = MODE_SW,
    search_type: int = SEARCH_SCORE,
    engine: Optional[Engine] = None,
    top_k: int = 0,
):
    """Many-queries-vs-database search. Returns one array-dict per query
    (see search_database_arrays), in query order. top_k > 0 switches each
    dict to the RANKED shape ({"index", "score"[, ends]} of the k best,
    score desc / index asc), selected on device where possible.

    This is the production serving shape (a batch of queries against a
    resident database) the reference has no equivalent for (its CLI reads
    only the first query sequence, src/opal_aligner.cpp:106-110). On the
    pallas TPU backend, score-only AND score+end batches (any mode) run as
    *stacked* kernel launches — up to 8 queries share one DP pass as
    independent row segments (engine/pallas_kernels.py::_kernel_multi),
    amortizing launch and per-column costs (~40% more GCUPS than
    sequential launches at typical query lengths). Full-alignment searches
    run per query on the resident database."""
    if matrix is None:
        raise ValueError("matrix is required")
    engine = engine or get_default_engine()
    queries = [np.asarray(q, dtype=np.uint8) for q in queries]
    ddb = engine._get_resident(db)
    backend = engine._resolve_backend()
    matrix_np = np.asarray(matrix, dtype=np.int32)
    A = matrix_np.shape[0]

    out: list = [None] * len(queries)
    stackable = (
        search_type != SEARCH_ALIGNMENT
        and engine.config.precision != "adaptive"
        and getattr(backend, "supports_multi", None) is not None
    )
    # Length-aware packing: group along a 16-quantized-length sort instead
    # of arrival order, so one long query adjacent to short ones no longer
    # breaks a stackable group (the stacked kernel's VMEM budget is the
    # SUM of padded segment heights — like-sized queries pack tightest).
    # Stable sort keeps equal-length queries in arrival order; results are
    # written back through the permutation.
    perm = sorted(range(len(queries)),
                  key=lambda i: (len(queries[i]) + 15) // 16)
    i = 0
    while i < len(perm):
        group = []
        if stackable:
            j = i
            while (
                j < len(perm)
                and len(group) < 8
                and backend.supports_multi(
                    [queries[p] for p in perm[i : j + 1]],
                    gap_open, gap_ext,
                    ddb.block_size, A, matrix_np,
                    max_target_len=ddb.max_len,
                    search_type=search_type, mode=mode,
                )
            ):
                group = [queries[p] for p in perm[i : j + 1]]
                j += 1
        if len(group) >= 2:
            qprofiles = [
                np.ascontiguousarray(matrix_np[q.astype(np.int64)].T)
                for q in group
            ]
            handle = backend.dispatch_multi(qprofiles, ddb, gap_open,
                                            gap_ext, mode=mode,
                                            search_type=search_type,
                                            single_part=bool(top_k))
            ranked = None
            if top_k:
                from .ranked import topk_from_multi_handle

                ranked = topk_from_multi_handle(handle, ddb, top_k)
            if ranked is not None:
                for s in range(len(group)):
                    out[perm[i + s]] = _finish_cols(
                        ranked[s], mode, search_type)
                i += len(group)
                continue
            per_query = backend.collect_multi(handle, ddb)
            for s in range(len(group)):
                cols: dict = {}
                for blk, blk_cols in per_query[s]:
                    for k, v in blk_cols.items():
                        arr = cols.setdefault(
                            k, np.empty(ddb.n, dtype=np.int32))
                        arr[blk.indices] = v
                _finish_cols(cols, mode, search_type, n=ddb.n)
                if top_k:
                    from ..ranking import rank_rows

                    ridx, rcols = rank_rows(
                        np.arange(ddb.n), cols, top_k)
                    cols = {"index": ridx, **rcols}
                out[perm[i + s]] = cols
            i += len(group)
        else:
            out[perm[i]] = search_database_arrays(
                queries[perm[i]], ddb, gap_open, gap_ext, matrix,
                mode=mode, search_type=search_type, engine=engine,
                top_k=top_k,
            )
            i += 1
    return out


def alignment_pass(query, db_list, gap_open, gap_ext, matrix, mode,
                   results, cand):
    """Reconstruct alignment paths for the candidate indices.

    results[i] must already carry the exact score and end locations for
    every i in cand (any indexable container of SearchResult works — a
    dict for sparse serving top-k passes). Zero-score SW sequences get the
    reference's no-alignment treatment (src/opal.cpp:1479-1483);
    non-reconstructible degenerate optima keep exact score/end and omit
    the path (the reference aborts there, src/opal.cpp:1497)."""

    def _align_one(i):
        r = results[i]
        try:
            return i, align_pair_reverse_trick(
                query, db_list[i], gap_open, gap_ext, matrix,
                r.score, r.end_location_query, r.end_location_target,
                mode,
            ), None
        except AlignmentError as exc:
            return i, None, exc

    todo_align = []
    for i in cand:
        r = results[i]
        if mode == MODE_SW and r.score == 0:
            # reference: src/opal.cpp:1479-1483
            r.alignment = None
            r.alignment_length = 0
            r.start_location_query = r.start_location_target = -1
            r.end_location_query = r.end_location_target = -1
        else:
            todo_align.append(i)

    # The per-pair traceback is host work; the native C path releases
    # the GIL, so a thread pool scales it across host cores
    # (OPAL_TPU_TRACEBACK_WORKERS overrides; 0/1 = serial).
    import os as _os

    # OPAL_TPU_DEVICE_FILL=1: run the batched banded fill on the TPU
    # (engine/device_fill.py) and only walk/validate on host; lanes the
    # device path skips or fails to validate fall through to the
    # per-pair host path below, so outputs are identical either way.
    device_done = {}
    if (_os.environ.get("OPAL_TPU_DEVICE_FILL") == "1"
            and len(todo_align) >= 2):
        from .device_fill import align_winners_device

        winners = [
            (i, results[i].score, results[i].end_location_query,
             results[i].end_location_target)
            for i in todo_align
        ]
        device_done = align_winners_device(
            query, db_list, gap_open, gap_ext, matrix, mode, winners)
        if _os.environ.get("OPAL_TPU_DEVICE_FILL_CHECK") == "1":
            # Audit mode: recompute every device-filled lane on the host
            # path and demand bit-identity (start, path ops). Replay
            # validation alone pins (score, ends, path validity) — under
            # an exotic tie pattern a valid-but-non-canonical path could
            # pass it, so this keeps the "identical either way" claim
            # checkable at will. Mismatching lanes fall back to host.
            import warnings as _warnings

            for i in list(device_done):
                _, host_out, exc = _align_one(i)
                if exc is not None or (
                        host_out[0] != device_done[i][0]
                        or host_out[1] != device_done[i][1]
                        or not np.array_equal(host_out[2],
                                              device_done[i][2])):
                    _warnings.warn(
                        f"device fill lane {i} differs from host path; "
                        f"using host result", RuntimeWarning, stacklevel=2)
                    del device_done[i]
        for i, (sq, st, ops) in device_done.items():
            r = results[i]
            r.start_location_query = sq
            r.start_location_target = st
            r.alignment = ops
            r.alignment_length = len(ops)
        todo_align = [i for i in todo_align if i not in device_done]

    workers = _os.environ.get("OPAL_TPU_TRACEBACK_WORKERS")
    workers = (int(workers) if workers
               else min(_os.cpu_count() or 1, 16))
    if workers > 1 and len(todo_align) >= 32:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            outcomes = list(pool.map(_align_one, todo_align))
    else:
        outcomes = [_align_one(i) for i in todo_align]

    for i, out, exc in outcomes:
        r = results[i]
        if exc is not None:
            # Degenerate optimum not representable as an anchored path
            # (e.g. a pure-deletion HW/OV alignment consuming zero
            # target letters). The reference aborts on its reverse-pass
            # assert here (src/opal.cpp:1497); we keep the exact
            # score/end and omit the path.
            import warnings

            warnings.warn(
                f"sequence {i}: alignment path not reconstructible "
                f"({exc}); score/end locations remain exact",
                RuntimeWarning,
                stacklevel=2,
            )
            r.alignment = None
            r.alignment_length = 0
            r.start_location_query = -1
            r.start_location_target = -1
            continue
        sq, st, ops = out
        r.start_location_query = sq
        r.start_location_target = st
        r.alignment = ops
        r.alignment_length = len(ops)


_default_engine: Optional[Engine] = None


def get_default_engine() -> Engine:
    global _default_engine
    if _default_engine is None:
        _default_engine = Engine()
    return _default_engine


def search_database(
    query,
    db,
    gap_open: int = 3,
    gap_ext: int = 1,
    matrix=None,
    mode: int = MODE_SW,
    search_type: int = SEARCH_SCORE,
    overflow_method: int = OVERFLOW_BUCKETS,
    results: Optional[list[SearchResult]] = None,
    engine: Optional[Engine] = None,
    align_top_k: int = 0,
) -> list[SearchResult]:
    """Search the database with the query; see module docstring.

    query: uint8 alphabet-index array. db: list of uint8 index arrays.
    matrix: [A, A] int array. results: optional pre-filled results to reuse
    (skip semantics). Returns the (possibly passed-in) list of SearchResult.

    align_top_k: with SEARCH_ALIGNMENT, reconstruct alignment paths only for
    the k best-scoring sequences (score desc, index asc); the rest keep
    exact score + end locations (as if searched with SEARCH_SCORE_END).
    0 = align everything (the reference's behavior). The scoring pass is
    batched on the accelerator either way; this bounds the irregular
    host-side per-pair traceback work — the serving pattern for large DBs.
    """
    if mode not in (MODE_NW, MODE_HW, MODE_OV, MODE_SW):
        raise ValueError(f"invalid mode {mode}")
    if matrix is None:
        raise ValueError("matrix is required")
    if search_type == SEARCH_ALIGNMENT and gap_ext > gap_open:
        # With gap_ext > gap_open the DP's effective gap model lets interior
        # gaps re-open (cost go per residue) while boundary gaps cannot, so
        # optimal scores are not reversal-invariant and reconstructed paths
        # would not replay to their reported affine score. The reference has
        # the same gap model and would abort on its reverse-pass assert
        # (src/opal.cpp:1497); scores (SEARCH_SCORE/SCORE_END) remain exact.
        raise ValueError(
            "alignment reconstruction requires gap_ext <= gap_open "
            "(scores are still available via search_type 0/1)"
        )
    engine = engine or get_default_engine()
    query = np.asarray(query, dtype=np.uint8)
    from .device_db import DeviceDatabase

    ddb = db if isinstance(db, DeviceDatabase) else None
    db_list = ddb.raw if ddb is not None else db
    n = len(db_list)
    track_end = search_type != SEARCH_SCORE
    if results is None:
        # fresh results: everything is to-do, no need to scan for skips
        results = [SearchResult() for _ in range(n)]
        todo = np.arange(n)
    else:
        # Skip already-calculated sequences (reference:
        # src/opal.cpp:1446-1451).
        skip = np.array(
            [
                (not r.is_empty())
                and (
                    search_type == SEARCH_SCORE
                    or (r.end_location_query >= 0
                        and r.end_location_target >= 0)
                )
                for r in results
            ],
            dtype=bool,
        )
        todo = np.nonzero(~skip)[0]

    adaptive = engine.config.precision == "adaptive"
    if todo.size:
        if todo.size == n:
            idx, cols = engine.score_blocks(
                query, db, gap_open, gap_ext, matrix, mode, search_type,
                with_flags=adaptive,
            )
        else:
            idx, cols = engine.score_blocks(
                query, db_list, gap_open, gap_ext, matrix, mode, search_type,
                subset=todo, with_flags=adaptive,
            )
        if adaptive:
            # Adaptive-precision bookkeeping: which reference precision each
            # sequence needed, and what each overflow strategy would rerun.
            # Outputs are already exact (see engine/cascade.py), so this is
            # observability, not a recompute trigger.
            from .cascade import (
                bucket_escalation_counts,
                classify_precision,
                simulate_overflow_method,
            )

            prec = classify_precision(cols, mode)
            # masks/buckets follow DATABASE order (the reference's bucket
            # granularity is 1024 consecutive DB sequences, src/opal.cpp:502);
            # skipped sequences count as 8-bit (never rerun)
            prec_db = np.full(n, 8, dtype=np.int32)
            prec_db[idx] = prec
            engine.last_search_stats = {
                "precision_bits": dict(
                    zip(idx.tolist(), prec.tolist())
                ),
                # what each cascade stage would rerun under the chosen
                # strategy (reference: src/opal.cpp:512-529): stage 8 =
                # the char->short escalation set, stage 16 = short->int
                "rerun_mask_stage8": simulate_overflow_method(
                    prec_db, overflow_method, 8
                ),
                "rerun_mask_stage16": simulate_overflow_method(
                    prec_db, overflow_method, 16
                ),
                "precision_counts": {
                    b: int((prec == b).sum()) for b in (8, 16, 32)
                },
                "bucket_escalations": bucket_escalation_counts(prec_db),
                "overflow_method": overflow_method,
            }
        scores = cols["score"].tolist()
        end_qs = cols["end_q"].tolist() if track_end else None
        end_ts = cols["end_t"].tolist() if track_end else None
        for j, i in enumerate(idx.tolist()):
            r = results[i]
            r.score_set = 1
            r.score = scores[j]
            if track_end and not (mode == MODE_SW and scores[j] == 0):
                r.end_location_query = end_qs[j]
                r.end_location_target = end_ts[j]
            else:
                r.end_location_query = -1
                r.end_location_target = -1

    if search_type == SEARCH_ALIGNMENT:
        align_set = None
        if align_top_k:
            from ..ranking import rank_scores

            if todo.size and todo.size == n:
                all_scores = np.empty(n, np.int64)
                all_scores[idx] = cols["score"]
            else:
                all_scores = np.array(
                    [r.score if r.score_set else -(2**62) for r in results]
                )
            align_set = set(rank_scores(all_scores, align_top_k).tolist())

        # non-top-k sequences keep exact score/end and no path; only the
        # candidates need a pass (avoids an O(n) scan at large n)
        cand = range(n) if align_set is None else sorted(align_set)
        alignment_pass(query, db_list, gap_open, gap_ext, matrix, mode,
                       results, cand)
    else:
        # reference: src/opal.cpp:1508-1515
        for r in results:
            r.alignment = None
            r.alignment_length = -1
            r.start_location_query = -1
            r.start_location_target = -1

    return results
