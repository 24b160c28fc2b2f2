"""Backend adapter for the Pallas TPU kernels.

Default dispatch is the *ragged single-launch* path: the entire database —
regardless of how many padded length buckets it spans — is scored by ONE
pallas_call walking a flat chunk stream with scalar-prefetched block
metadata (see build_pallas_ragged_fn_raw). One device launch + one result
round trip per search, zero inter-bucket dispatch gaps — critical when
host<->device latency is high (remote/tunneled devices) and still optimal
locally.

Mesh-sharded databases run the SAME ragged kernel per device under
shard_map (one chunk stream per device, leading device axis sharded on
'db'; see DeviceDatabase.flat_sharded) — the hot loop never crosses
devices. Configs the kernels don't cover (queries beyond the narrowest
lane width's VMEM ceiling, gap_ext > gap_open, oversized alphabets) fall
back to the XLA path.
"""
from __future__ import annotations

import os

import numpy as np

from . import pallas_kernels as pk
from .xla_backend import XlaBackend


class PallasBackend:
    name = "pallas"

    # payload bytes per pipelined gather part (tests shrink this to force
    # multi-part dispatch on small databases)
    SPLIT_PAYLOAD_BYTES = 512 * 1024

    def __init__(self, interpret: bool = False):
        self.interpret = interpret
        self._fallback = XlaBackend()
        self._sharded_cache: dict = {}

    def supports(self, Q: int, gap_open: int, gap_ext: int,
                 B: int = 1024, A: int = 0, profile_absmax: int = 0,
                 arrays: int = 2) -> bool:
        """arrays: VMEM state arrays of the config (n_state_arrays);
        callers that don't know the mode yet pass the least-demanding 2 —
        dispatch re-checks with the real value."""
        return (
            gap_ext <= gap_open
            and A <= pk.PAD_LETTER
            # the query profile feeds the MXU in bf16: integers are exact
            # only up to 2^8, so large score-matrix entries take the XLA path
            and profile_absmax + gap_ext <= 256
            and pk._round_up(max(Q, 16), 16) <= pk.max_q_pad(B, arrays)
        )

    def panel_ok(self, Q, gap_open, gap_ext, A, profile_absmax,
                 max_len=0) -> bool:
        """May this query run via query-panel streaming (no VMEM query
        ceiling — see build_pallas_panel_fn_raw)? Gates: the usual
        B-independent kernel constraints plus f32 integer-exactness of the
        whole DP value range (|H| is bounded by Q*|P|max on the positive
        side and the gap walls on the negative side; 2^23 leaves a 2x
        margin under the f32 mantissa)."""
        return (
            gap_ext <= gap_open
            and A <= pk.PAD_LETTER
            and profile_absmax + gap_ext <= 256
            and Q * profile_absmax + 2 * gap_open
            + (Q + max_len) * gap_ext < 2**23
        )

    def preferred_block_size(self, Q, gap_open, gap_ext, A, profile_absmax,
                             arrays, default_B):
        """Lane width for this query. Queries whose VMEM DP state does not
        fit at default_B stay at FULL width and run via query-panel
        streaming (measured faster than the old lane-width downshift at
        every length probed — see BENCH_REPORT; OPAL_TPU_NO_PANELS=1
        restores the downshift policy for A/B runs). With panels
        ineligible (f32 value-range gate), fall back to the widest width
        (>= 128) whose DP state fits; B-independent gates (ge > go,
        alphabet, bf16 profile range) still route to XLA via supports()."""
        if self.supports(Q, gap_open, gap_ext, B=default_B, A=A,
                         profile_absmax=profile_absmax, arrays=arrays):
            return default_B
        if (os.environ.get("OPAL_TPU_NO_PANELS") != "1"
                and self.panel_ok(Q, gap_open, gap_ext, A, profile_absmax)):
            return default_B  # query-panel streaming at full width
        if not self.supports(Q, gap_open, gap_ext, B=128, A=A,
                             profile_absmax=profile_absmax, arrays=arrays):
            return default_B
        B = default_B
        while B > 128 and not self.supports(
                Q, gap_open, gap_ext, B=B, A=A,
                profile_absmax=profile_absmax, arrays=arrays):
            # snap to the 128-lane stripe (non-power-of-two widths halve
            # into invalid lane counts otherwise, e.g. 768 -> 384 -> 192)
            B = max(128, (B // 2) // 128 * 128)
        return max(B, 128)

    def prepare_query(self, qprofile, gap_open, gap_ext):
        import jax
        import jax.numpy as jnp

        A, Q = qprofile.shape
        absmax = int(np.abs(np.asarray(qprofile)).max()) if Q else 0
        # Gate on the most permissive lane width here (long queries may run
        # at a downshifted width, see preferred_block_size); dispatch_many
        # re-checks at the actual width and still falls back when needed.
        if not self.supports(Q, gap_open, gap_ext, B=128, A=A,
                             profile_absmax=absmax):
            if self.panel_ok(Q, gap_open, gap_ext, A, absmax):
                # query-panel streaming: panels slice their own profile
                # rows in dispatch, no full-profile device upload needed
                return ("pallas", Q, None, np.asarray(qprofile))
            return ("xla",
                    self._fallback.prepare_query(qprofile, gap_open, gap_ext))
        # qprofile arrives as [A, Q]; kernel wants [Q_pad, A_PAD] bf16
        # holding P + Ge with PAD_NEG padding (ramped-space diag candidate).
        # Keep the raw profile too: dispatch re-checks VMEM feasibility at
        # the actual lane width and may still fall back to the XLA path.
        qp = pk.prepare_qp(np.asarray(qprofile), int(gap_ext))
        return ("pallas", Q, jax.device_put(jnp.asarray(qp, jnp.bfloat16)),
                np.asarray(qprofile))

    def _sharded(self, mode, search_type, Q, go, ge, B, with_flags,
                 out_i16, mesh, sw_end_packed=False):
        """Mesh path: the ragged single-launch kernel wrapped in shard_map.

        Each device runs the UNMODIFIED single-chip pallas program on its
        own chunk stream (DeviceDatabase.flat_sharded lays one stream per
        device along a leading axis sharded on 'db'); the query profile is
        replicated. No collectives in the hot loop — per-lane tracker
        outputs come back sharded and merge on host. This scales the
        105-GCUPS kernel rather than the XLA twin (the reference's entire
        value is its kernel, src/opal.cpp:164-470)."""
        import jax
        from jax.sharding import PartitionSpec as P

        from ..parallel.shard import DB_AXIS

        key = (mode, search_type, Q, go, ge, B, with_flags, out_i16, mesh,
               sw_end_packed)
        fn = self._sharded_cache.get(key)
        if fn is None:
            raw = pk.build_pallas_ragged_fn_raw(
                mode, search_type, Q, go, ge, B=B,
                with_flags=with_flags, interpret=self.interpret,
                out_i16=out_i16, sw_end_packed=sw_end_packed,
            )

            def local(meta, qp, letters, lengths):
                # local shards carry a leading device axis of size 1
                return raw(meta[0], qp, letters[0], lengths[0])[None]

            fn = jax.jit(jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(DB_AXIS), P(), P(DB_AXIS), P(DB_AXIS)),
                out_specs=P(DB_AXIS),
                # pallas_call's out_shape carries no varying-mesh-axes
                # annotation; the output is trivially device-varying
                check_vma=False,
            ))
            self._sharded_cache[key] = fn
        return fn

    def _out_i16_ok(self, Q, absmax, gap_open, gap_ext, search_type,
                    with_flags, max_len):
        """May trackers be emitted as int16? The device->host result
        download is a measurable cost at whole-database scale (~30-40 MB/s
        through the tunnel); halving the payload is worth a clip at emit.
        Conservative magnitude bound on any emitted value: scores are
        within Q*|P|max + 2*go + (Q + Tmax)*ge; end coordinates within
        max(Q_pad, Tmax). Flags rows (overflow trackers) stay int32."""
        if with_flags:
            return False
        bound = Q * absmax + 2 * gap_open + (Q + max_len) * gap_ext + 64
        if bound >= 32768:
            return False
        from ..constants import SEARCH_SCORE as _SCORE

        if search_type != _SCORE and max(Q + 16, max_len) >= 32768:
            return False
        return True

    def dispatch_many(self, qprep, ddb, gap_open, gap_ext, mode,
                      search_type, with_flags=False, single_part=False):
        # single_part: the caller will NOT download the full tracker
        # payload (device-side top-k) — the multi-part split only exists
        # to pipeline big downloads, so skip it
        if qprep[0] == "xla":
            return ("xla", self._fallback.dispatch_many(
                qprep[1], ddb, gap_open, gap_ext, mode, search_type,
                with_flags))
        _, Q, qp_dev, qprofile_np = qprep
        if not ddb.blocks:
            return ("ragged", None)
        B = ddb.block_size
        absmax = int(np.abs(qprofile_np).max()) if Q else 0
        from ..constants import MODE_SW as _SW
        from ..constants import SEARCH_SCORE as _SCORE

        packed = (mode == _SW and search_type != _SCORE
                  and pk.sw_end_packed_ok(Q, absmax, int(gap_ext)))
        # OPAL_TPU_FORCE_PANELS=1 routes every eligible search through the
        # query-panel path (tests / A-B runs)
        if os.environ.get("OPAL_TPU_FORCE_PANELS") == "1" or not self.supports(
            Q, gap_open, gap_ext, B, A=qprofile_np.shape[0],
            arrays=pk.n_state_arrays(mode, search_type, with_flags, packed),
        ):
            if (os.environ.get("OPAL_TPU_NO_PANELS") != "1"
                    and self.panel_ok(
                        Q, gap_open, gap_ext, qprofile_np.shape[0], absmax,
                        ddb.max_len)):
                return self._dispatch_panels(
                    Q, qprofile_np, ddb, int(gap_open), int(gap_ext),
                    mode, search_type, with_flags)
            xq = self._fallback.prepare_query(qprofile_np, gap_open, gap_ext)
            return ("xla", self._fallback.dispatch_many(
                xq, ddb, gap_open, gap_ext, mode, search_type, with_flags))
        out_i16 = self._out_i16_ok(Q, absmax, int(gap_open), int(gap_ext),
                                   search_type, with_flags, ddb.max_len)
        if ddb.mesh is not None:
            # per-device ragged streams under shard_map (see _sharded)
            fn = self._sharded(mode, search_type, Q, int(gap_open),
                               int(gap_ext), B, with_flags, out_i16,
                               ddb.mesh, sw_end_packed=packed)
            dev_blocks, meta, letters, lengths = ddb.flat_sharded()
            out = fn(meta, qp_dev, letters, lengths)
            return ("sharded", (dev_blocks, out))
        fn = pk.build_pallas_ragged_fn(
            mode, search_type, Q, int(gap_open), int(gap_ext), B=B,
            with_flags=with_flags, interpret=self.interpret,
            out_i16=out_i16, sw_end_packed=packed,
        )
        # Pipeline the device->host result download behind compute: split
        # the stream into equal-shaped parts (one compiled kernel serves
        # all) and fetch part i while part i+1 computes. Only worth it
        # when the payload is big enough to dominate a fetch round trip;
        # capped at 2 parts — each extra fetch pays the link round-trip
        # latency (~26 ms tunneled), which k>2 cannot amortize (measured:
        # k=4 regresses 10%, k=2 wins ~5% on both x0 and x1).
        # OPAL_TPU_FETCH_PARTS overrides the cap for A/B runs.
        rows = len(pk.tracker_rows(mode, search_type, with_flags))
        payload = len(ddb.blocks) * rows * B * (2 if out_i16 else 4)
        cap = int(os.environ.get("OPAL_TPU_FETCH_PARTS", "2"))
        if single_part:
            cap = 1
        k = max(1, min(cap, payload // self.SPLIT_PAYLOAD_BYTES))
        parts = ddb.flat_parts(int(k))
        outs = [
            (blocks, fn(meta, qp_dev, letters, lengths))
            for blocks, meta, letters, lengths in parts
        ]
        return ("ragged", outs)

    def _dispatch_panels(self, Q, qprofile_np, ddb, gap_open, gap_ext,
                         mode, search_type, with_flags):
        """Query-panel streaming: the query's rows are split into
        VMEM-sized panels; each panel sweeps the whole ragged chunk stream
        at FULL lane width, handing per-column boundary rows to the next
        panel through HBM (see build_pallas_panel_fn_raw). All panel
        launches enqueue back to back (boundaries chain through device
        values), so device work pipelines; the per-panel trackers merge on
        host in collect_many."""
        import jax.numpy as jnp

        from ..constants import MODE_SW as _SW
        from ..constants import SEARCH_SCORE as _SCORE

        B = ddb.block_size
        absmax = int(np.abs(qprofile_np).max()) if Q else 0
        packed = (mode == _SW and search_type != _SCORE
                  and pk.sw_end_packed_ok(Q, absmax, gap_ext))
        arrays = pk.n_state_arrays(mode, search_type, with_flags, packed)
        # Panel height: the VMEM ceiling is NOT the optimum. Hardware sweep
        # (tools/exp_panel_rows.py, Q=16000, SW x0, B=1024, in-process
        # best-of-4): rows 1280/1504/2048 all 105.7-106.7 GCUPS, 2560 =
        # 98.6, the 3072 VMEM-maximal height only 76.5 (the scan's
        # 3*ceil(log2(P)) ops/cell grows with P and the maximal height
        # sits at the VMEM edge), 1024 = 102, 768 and below collapse on
        # per-column fixed costs (68.7 -> 23.9 at 256). The cap also makes
        # interior-panel compiles shape-stable across query lengths (the
        # first/interior panels always have exactly PANEL_ROWS_CAP rows,
        # so one compile serves any long query) and cuts Mosaic compile
        # ~4x vs the 3072-row kernel (50 s -> 198 s measured).
        P = min(pk.max_q_pad(B, arrays), pk.PANEL_ROWS_CAP)
        if search_type != _SCORE:
            # Score+end kernel bodies keep more live per-column [P, B]
            # temporaries (end-tracker state threaded across the
            # COL_UNROLL group): Mosaic spills ~94 MB of register slots
            # and exceeds VMEM when the panel AREA reaches ~3M cells
            # (measured: P=3072 x B=1024, SW x1 packed, fails to compile;
            # half that area fits) — cap the area, not just the rows.
            P = min(P, max(16, (pk.PANEL_X1_AREA // B) // 16 * 16))
        env = os.environ.get("OPAL_TPU_PANEL_ROWS")
        if env:
            P = int(env)
        n_panels = -(-Q // P)
        offsets = tuple(p * P for p in range(n_panels))
        qs = (P,) * (n_panels - 1) + (Q - P * (n_panels - 1),)
        out_i16 = self._out_i16_ok(Q, absmax, gap_open, gap_ext,
                                   search_type, with_flags, ddb.max_len)
        fns, qps = [], []
        for p in range(n_panels):
            first, final = p == 0, p == n_panels - 1
            if ddb.mesh is not None:
                fns.append(self._sharded_panel(
                    mode, search_type, qs[p], gap_open, gap_ext, B,
                    with_flags, out_i16, packed, first, final, ddb.mesh))
            else:
                fns.append(pk.build_pallas_panel_fn(
                    mode, search_type, qs[p], gap_open, gap_ext, B=B,
                    with_flags=with_flags, interpret=self.interpret,
                    out_i16=out_i16, sw_end_packed=packed,
                    first=first, final=final))
            qp_np = pk.prepare_qp(
                qprofile_np[:, offsets[p] : offsets[p] + qs[p]], gap_ext)
            qps.append(jnp.asarray(qp_np, jnp.bfloat16))
        if ddb.mesh is not None:
            dev_blocks, meta, letters, lengths = ddb.flat_sharded()
            trs, bnd = [], ()
            for p in range(n_panels):
                poff = jnp.asarray([offsets[p]], jnp.int32)
                outs = fns[p](meta, poff, qps[p], letters, lengths, *bnd)
                trs.append(outs[0])
                bnd = tuple(outs[1:])
            return ("panel_sharded", (dev_blocks, trs, offsets, qs))
        payload = []
        for blocks, meta, letters, lengths in ddb.flat_parts(1):
            trs, bnd = [], ()
            for p in range(n_panels):
                poff = jnp.asarray([offsets[p]], jnp.int32)
                outs = fns[p](meta, poff, qps[p], letters, lengths, *bnd)
                trs.append(outs[0])
                bnd = tuple(outs[1:])  # (bh, bx) for the next panel
            payload.append((blocks, trs))
        return ("panel", (payload, offsets, qs))

    def _sharded_panel(self, mode, search_type, q, go, ge, B, with_flags,
                       out_i16, packed, first, final, mesh):
        """Mesh path for ONE query panel: the panel kernel under shard_map.

        Each device sweeps its own ragged chunk stream (leading device
        axis sharded on 'db', same layout as _sharded); the panel's
        profile rows and global row offset are replicated. The chained
        boundary rows bh/bx are PER-LANE state of each device's own
        stream, so they shard on 'db' with the stream — the panel chain
        needs no collectives, exactly like the single-device case. This
        closes the round-3 gap where long queries on a mesh-sharded DB
        silently fell off the pallas fast path (the reference's column
        streaming is unbounded per lane, src/opal.cpp:245-249,668-681)."""
        import jax
        from jax.sharding import PartitionSpec as P

        from ..parallel.shard import DB_AXIS

        key = ("panel", mode, search_type, q, go, ge, B, with_flags,
               out_i16, packed, first, final, mesh)
        fn = self._sharded_cache.get(key)
        if fn is None:
            raw = pk.build_pallas_panel_fn_raw(
                mode, search_type, q, go, ge, B=B, with_flags=with_flags,
                interpret=self.interpret, out_i16=out_i16,
                sw_end_packed=packed, first=first, final=final,
            )

            def local(meta, poff, qp, letters, lengths, *bnd):
                outs = raw(meta[0], poff, qp, letters[0], lengths[0],
                           *[b[0] for b in bnd])
                return tuple(o[None] for o in outs)

            n_in_bnd = 0 if first else 2
            n_out_bnd = 0 if final else 2
            fn = jax.jit(jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(DB_AXIS), P(), P(), P(DB_AXIS), P(DB_AXIS))
                + (P(DB_AXIS),) * n_in_bnd,
                out_specs=(P(DB_AXIS),) * (1 + n_out_bnd),
                check_vma=False,
            ))
            self._sharded_cache[key] = fn
        return fn

    def supports_multi(self, queries, gap_open, gap_ext, B, A, matrix,
                       max_target_len=0, search_type=0, mode=None):
        """Can these queries run as one stacked launch (score-only or
        score+end)?"""
        from ..constants import MODE_SW as _SW
        from ..constants import SEARCH_SCORE as _SCORE

        matrix = np.asarray(matrix)
        # only SW end tracking carries a 4th VMEM state array (per-cell
        # first-attainment columns); NW/HW/OV x1 stacks with 3 — must
        # match build_pallas_multi_fn_raw's sw_end gating or tall NW/HW/OV
        # batches are needlessly rejected to sequential launches
        sw_end = search_type != _SCORE and (mode is None or mode == _SW)
        arrays = 4 if sw_end else 3
        if not self.supports(
            max(len(q) for q in queries), gap_open, gap_ext, B, A,
            profile_absmax=int(np.abs(matrix).max()),
        ):
            return False
        if len(queries) > pk.MULTI_MAX_SEGS:
            return False
        q_total = sum(pk._round_up(max(len(q), 16), 16) for q in queries)
        if q_total > pk.max_q_pad(B, arrays):
            return False
        if len(queries) > 1 and q_total * B > pk.MULTI_AREA_BUDGET:
            return False  # stacked pass would be VMEM-pressure-bound
        # segmented-scan exactness: the DP value *spread* must stay below
        # SEG_M; positive side <= Qmax*matmax, negative side (NW/HW gap
        # walls) >= -(go + (Qmax + Tmax)*ge)
        qmax = max(len(q) for q in queries)
        spread = (
            qmax * max(int(matrix.max()), 1)
            + gap_open + (qmax + int(max_target_len)) * gap_ext
        )
        return spread < pk.MULTI_VALUE_BOUND

    def _sharded_multi(self, mode, seg_key, go, ge, B, out_i16, track_end,
                       mesh):
        """Mesh path for the STACKED multi-query kernel: same shard_map
        wrapping as _sharded (per-device ragged streams, replicated stacked
        query profile), so query batches scale across chips too."""
        import jax
        from jax.sharding import PartitionSpec as P

        from ..parallel.shard import DB_AXIS

        key = ("multi", mode, seg_key, go, ge, B, out_i16, track_end, mesh)
        fn = self._sharded_cache.get(key)
        if fn is None:
            raw = pk.build_pallas_multi_fn_raw(
                mode, seg_key, go, ge, B=B, interpret=self.interpret,
                out_i16=out_i16, track_end=track_end,
            )

            def local(meta, qp, letters, lengths):
                return raw(meta[0], qp, letters[0], lengths[0])[None]

            fn = jax.jit(jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(DB_AXIS), P(), P(DB_AXIS), P(DB_AXIS)),
                out_specs=P(DB_AXIS),
                check_vma=False,
            ))
            self._sharded_cache[key] = fn
        return fn

    def dispatch_multi(self, qprofiles, ddb, gap_open, gap_ext,
                       mode=None, search_type=0, single_part=False):
        """Stacked multi-query dispatch (ragged stream), score-only or
        score+end. Returns a handle for collect_multi; caller has checked
        supports_multi. Mesh-sharded databases run the stacked kernel
        under shard_map (one chunk stream per device)."""
        import jax.numpy as jnp

        from ..constants import MODE_SW as _SW
        from ..constants import SEARCH_SCORE as _SCORE

        mode = _SW if mode is None else mode
        track_end = search_type != _SCORE
        qp_np, seg_qpads, seg_qs = pk.prepare_qp_multi(
            qprofiles, int(gap_ext))
        if not ddb.blocks:
            return (None, seg_qs, mode, track_end)
        seg_key = tuple(zip(seg_qs, seg_qpads))
        absmax = max(
            (int(np.abs(qp).max()) for qp in qprofiles if qp.size),
            default=0,
        )
        out_i16 = self._out_i16_ok(
            max(seg_qs), absmax, int(gap_open), int(gap_ext),
            search_type, False, ddb.max_len,
        )
        qp_dev = jnp.asarray(qp_np, jnp.bfloat16)
        if ddb.mesh is not None:
            fn = self._sharded_multi(
                mode, seg_key, int(gap_open), int(gap_ext),
                ddb.block_size, out_i16, track_end, ddb.mesh)
            dev_blocks, meta, letters, lengths = ddb.flat_sharded()
            out = np.asarray(fn(meta, qp_dev, letters, lengths))
            outs = [(blocks, out[d]) for d, blocks in enumerate(dev_blocks)]
            return (outs, seg_qs, mode, track_end)
        fn = pk.build_pallas_multi_fn_raw(
            mode, seg_key, int(gap_open), int(gap_ext), B=ddb.block_size,
            interpret=self.interpret, out_i16=out_i16,
            track_end=track_end,
        )
        n_rows = len(seg_qs) * (3 if track_end else 1)
        payload = (len(ddb.blocks) * n_rows * ddb.block_size
                   * (2 if out_i16 else 4))
        k = max(1, min(1 if single_part else 2,
                       payload // self.SPLIT_PAYLOAD_BYTES))
        parts = ddb.flat_parts(int(k))
        outs = [
            (blocks, fn(meta, qp_dev, letters, lengths))
            for blocks, meta, letters, lengths in parts
        ]
        return (outs, seg_qs, mode, track_end)

    def collect_multi(self, handle, ddb):
        """Returns per-query lists of (Block, {col: [n] array}) pairs
        (cols: score [+ end_q/end_t])."""
        payload, seg_qs, mode, track_end = handle
        n_q = len(seg_qs)
        if payload is None:
            return [[] for _ in range(n_q)]
        result = [[] for _ in range(n_q)]
        for blocks, out in payload:
            tr = np.asarray(out).astype(np.int32, copy=False)
            for bi, blk in enumerate(blocks):
                for s in range(n_q):
                    cols = {"score": tr[bi, s, : blk.n]}
                    if track_end:
                        cols["end_q"] = tr[bi, n_q + s, : blk.n]
                        cols["end_t"] = tr[bi, 2 * n_q + s, : blk.n]
                    result[s].append((blk, cols))
        return result

    @staticmethod
    def _batched_fetch(trs):
        """Download per-panel tracker arrays in ONE device->host transfer
        (device-side concatenate on the panel-row axis) instead of one
        np.asarray per panel: each separate fetch costs a full tunnel
        round trip (~25-35 ms), which at Q=100k (67 panels) summed to
        ~3 s of the 4.3 s search — the measured cause of the long-query
        GCUPS droop (VERDICT r3 #4). Panels share every dim except the
        tracker-row axis (interior vs final row counts differ)."""
        if len(trs) < 2:
            return [np.asarray(t) for t in trs]
        import jax.numpy as jnp

        ax = trs[0].ndim - 2
        t0 = trs[0]
        if ax < 0 or not all(
                t.ndim == t0.ndim and t.dtype == t0.dtype
                and t.shape[:ax] == t0.shape[:ax]
                and t.shape[ax + 1:] == t0.shape[ax + 1:]
                for t in trs[1:]):
            return [np.asarray(t) for t in trs]
        rows = [t.shape[ax] for t in trs]
        flat = np.asarray(jnp.concatenate(trs, axis=ax))
        return np.split(flat, np.cumsum(rows)[:-1], axis=ax)

    def gather(self, handle):
        """Fetch all results; multi-part ragged payloads are fetched in
        order so part i's transfer overlaps part i+1's compute."""
        import jax

        kind, payload = handle
        if kind == "xla":
            return (kind, self._fallback.gather(payload))
        if kind == "ragged" and payload is not None:
            return (kind, [(blocks, np.asarray(out))
                           for blocks, out in payload])
        if kind == "panel":
            parts, offsets, qs = payload
            return (kind, ([(blocks, self._batched_fetch(trs))
                            for blocks, trs in parts], offsets, qs))
        if kind == "sharded":
            dev_blocks, out = payload
            return (kind, (dev_blocks, np.asarray(out)))
        if kind == "panel_sharded":
            dev_blocks, trs, offsets, qs = payload
            return (kind, (dev_blocks, self._batched_fetch(trs),
                           offsets, qs))
        return (kind, jax.device_get(payload) if payload is not None
                else None)

    def collect_many(self, handle, ddb, mode, search_type, Q,
                     with_flags=False):
        """Returns [(Block, {col: [n] array}), ...] over all DB blocks."""
        kind, payload = handle
        if kind == "xla":
            return self._fallback.collect_many(
                payload, ddb, mode, search_type, Q, with_flags)
        result = []
        if kind == "ragged":
            if payload is None:
                return result
            for blocks, tr in payload:
                for bi, blk in enumerate(blocks):
                    out = pk.finalize_trackers(
                        np.asarray(tr[bi]).astype(np.int32, copy=False),
                        mode, search_type, Q,
                        np.asarray(blk.lengths), with_flags,
                    )
                    result.append(
                        (blk, {k: v[: blk.n] for k, v in out.items()}))
            return result
        if kind == "panel":
            parts, offsets, qs = payload
            for blocks, trs in parts:
                for bi, blk in enumerate(blocks):
                    out = pk.finalize_trackers_panels(
                        [np.asarray(t[bi]).astype(np.int32, copy=False)
                         for t in trs],
                        offsets, qs, mode, search_type,
                        np.asarray(blk.lengths), with_flags,
                    )
                    result.append(
                        (blk, {k: v[: blk.n] for k, v in out.items()}))
            return result
        if kind == "panel_sharded":
            dev_blocks, trs, offsets, qs = payload
            trs = [np.asarray(t).astype(np.int32, copy=False) for t in trs]
            for d, blocks in enumerate(dev_blocks):
                for bi, blk in enumerate(blocks):
                    out = pk.finalize_trackers_panels(
                        [t[d, bi] for t in trs], offsets, qs,
                        mode, search_type,
                        np.asarray(blk.lengths), with_flags,
                    )
                    result.append(
                        (blk, {k: v[: blk.n] for k, v in out.items()}))
            return result
        assert kind == "sharded", kind
        dev_blocks, tr = payload
        tr = tr.astype(np.int32, copy=False)
        for d, blocks in enumerate(dev_blocks):
            for bi, blk in enumerate(blocks):
                out = pk.finalize_trackers(
                    tr[d, bi], mode, search_type, Q,
                    np.asarray(blk.lengths), with_flags,
                )
                result.append(
                    (blk, {k: v[: blk.n] for k, v in out.items()}))
        return result
