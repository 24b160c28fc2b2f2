"""Resident device database.

The reference streams the DB from RAM through SIMD registers; the TPU analog
is the DB resident in HBM, streamed through VMEM by the kernels. Uploading
once and searching many times is both the production serving model and the
only way to amortize host->device transfer (which can dominate on tunneled
or remote devices). Letters are stored int8 (alphabet < 128) — 4x cheaper on
the wire and in HBM — and widened on-device inside the jitted search.

Blocks sharing the same padded length are stacked into *groups*
([G, T_pad, B] arrays): the Pallas path scores a whole group in one
pallas_call (grid leading dim = G), amortizing per-call dispatch latency.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from .batching import PAD_LETTER, Block, plan_blocks


@dataclasses.dataclass
class BlockGroup:
    t_pad: int
    blocks: list          # list[Block]
    letters: object       # device [G, T_pad, B] int8
    lengths: object       # device [G, 1, B] int32


class DeviceDatabase:
    """Length-bucketed, padded DB blocks with letters/lengths on device."""

    def __init__(self, db: Sequence[np.ndarray], block_size: int,
                 mesh=None, t_quantum: int = 64):
        import jax

        self.n = len(db)
        self.raw = db  # kept for the traceback pass and partial rescoring
        self.block_size = block_size
        self.mesh = mesh
        self.blocks: list[Block] = plan_blocks(db, block_size)
        self.total_residues = int(sum(len(s) for s in db))
        self.max_len = max((len(s) for s in db), default=0)
        self._flat = None    # lazy ragged chunk stream (pallas fast path)
        self._flat_sharded = None  # lazy per-device streams (pallas + mesh)
        self._groups = None  # lazy [G, T, B] bucket stacks (XLA / sharded)
        self._t_quantum = t_quantum

    @property
    def groups(self) -> list:
        """Blocks stacked by padded length into [G, T_pad, B] device arrays
        (one pallas/XLA call per group); built and uploaded on first use."""
        if self._groups is not None:
            return self._groups
        import jax

        letters_sh = lengths_sh = None
        if self.mesh is not None:
            from ..parallel.shard import (
                group_letters_sharding,
                group_lengths_sharding,
            )

            letters_sh = group_letters_sharding(self.mesh)
            lengths_sh = group_lengths_sharding(self.mesh)

        # group blocks by padded length (rounded up to the kernel's T chunk)
        by_tpad: dict[int, list[Block]] = {}
        for blk in self.blocks:
            t_pad = -(-blk.t_pad // self._t_quantum) * self._t_quantum
            by_tpad.setdefault(t_pad, []).append(blk)

        self._groups = []
        for t_pad in sorted(by_tpad):
            blks = by_tpad[t_pad]
            G = len(blks)
            letters = np.full((G, t_pad, self.block_size), PAD_LETTER,
                              dtype=np.int8)
            lengths = np.zeros((G, 1, self.block_size), dtype=np.int32)
            for g, blk in enumerate(blks):
                letters[g, : blk.letters.shape[0]] = blk.letters
                lengths[g, 0] = blk.lengths
            self._groups.append(
                BlockGroup(
                    t_pad=t_pad,
                    blocks=blks,
                    letters=jax.device_put(letters, letters_sh),
                    lengths=jax.device_put(lengths, lengths_sh),
                )
            )
        return self._groups

    @staticmethod
    def _quantize(n: int, frac: int = 8, floor: int = 16) -> int:
        """Round n up to a ~1/frac-granular grid (multiples of
        max(floor, 2^floor(log2 n)/frac)). Bounds the number of distinct
        compiled shapes to ~frac per octave while wasting <= 1/frac work."""
        if n <= floor:
            return floor
        step = max(floor, (1 << (int(n).bit_length() - 1)) // frac)
        return -(-n // step) * step

    def _build_stream_np(self, blocks, c_pad, nb_pad):
        """Host-side (meta[6, C], letters[C, TC, B], lengths[NB, 1, B])
        chunk stream for `blocks` (meta block indices are positions within
        `blocks`), padded with inert chunks to exactly (c_pad, nb_pad).
        Meta rows: (block, is-first, is-last, t0, active, ncols); ncols
        lets the kernel run a block's LAST chunk over only its real
        t_pad - t0 columns, so block padding stops at the fine
        plan_blocks quantum instead of the 64-column chunk boundary
        (the skipped tail columns are pure algebraic padding — results
        are bit-identical, the compute is simply not done)."""
        from .pallas_kernels import T_CHUNK

        parts, metas = [], []
        lengths = np.zeros((nb_pad, 1, self.block_size), np.int32)
        for bi, blk in enumerate(blocks):
            t_pad = blk.letters.shape[0]
            nch = -(-t_pad // T_CHUNK)
            full = nch * T_CHUNK
            lett = blk.letters
            if full != t_pad:
                lett = np.concatenate([
                    lett,
                    np.full((full - t_pad, self.block_size), PAD_LETTER,
                            np.int8),
                ], axis=0)
            parts.append(lett.reshape(nch, T_CHUNK, -1))
            m = np.zeros((nch, 6), np.int32)
            m[:, 0] = bi
            m[0, 1] = 1
            m[-1, 2] = 1
            m[:, 3] = np.arange(nch, dtype=np.int32) * T_CHUNK
            m[:, 4] = 1  # active
            m[:, 5] = T_CHUNK
            m[-1, 5] = t_pad - (nch - 1) * T_CHUNK  # real cols in last chunk
            metas.append(m)
            lengths[bi, 0] = blk.lengths
        c_real = sum(p.shape[0] for p in parts)
        assert c_real <= c_pad and len(blocks) < nb_pad
        if c_pad > c_real:
            parts.append(np.zeros(
                (c_pad - c_real, T_CHUNK, self.block_size), np.int8
            ))
            dm = np.zeros((c_pad - c_real, 6), np.int32)
            dm[:, 0] = nb_pad - 1  # trash output row, never emitted
            metas.append(dm)       # active=0: kernel skips them
        letters = np.concatenate(parts, axis=0)
        meta = np.concatenate(metas, axis=0)
        # [6, C] layout: scalar-prefetch SMEM pads the minor dim to a
        # full lane stripe, so the minor dim must be the long one.
        meta = np.ascontiguousarray(meta.T)
        return meta, letters, lengths

    def _build_stream(self, blocks, c_pad, nb_pad):
        """_build_stream_np, uploaded to the default device."""
        import jax

        meta, letters, lengths = self._build_stream_np(blocks, c_pad, nb_pad)
        return (
            jax.device_put(meta),
            jax.device_put(letters),
            jax.device_put(lengths),
        )

    def flat(self):
        """Ragged chunk stream for the single-launch pallas path: the whole
        DB as one [C, T_CHUNK, B] int8 chunk sequence (each block's chunks
        back to back) plus per-chunk metadata (block index, first/last
        markers, column offset) prefetched to SMEM, and per-block lengths.
        Built and uploaded once, cached.

        The chunk count C and block count NB are rounded up to a coarse
        grid with inert dummy chunks (first/last = 0: no state reset, no
        emit) pointing at a trash output row, so compiled kernel shapes
        recur across databases of similar size — one-shot CLI runs on new
        databases hit the persistent compilation cache instead of paying a
        fresh XLA compile (the reference has no compile step to amortize).
        """
        if self._flat is None:
            from .pallas_kernels import T_CHUNK

            nb = len(self.blocks)
            nb_pad = self._quantize(max(nb + 1, 2))  # +1 trash row
            c_real = sum(
                -(-blk.letters.shape[0] // T_CHUNK) for blk in self.blocks
            )
            c_pad = self._quantize(max(c_real, 1))
            self._flat = self._build_stream(self.blocks, c_pad, nb_pad)
        return self._flat

    def flat_sharded(self):
        """Per-device ragged chunk streams for the mesh-sharded pallas path.

        The DB's blocks are partitioned into one contiguous group per mesh
        device (balanced by chunk mass), each group is built as its own
        flat()-style stream padded to a COMMON (c_pad, nb_pad), and the
        streams are stacked along a leading device axis sharded over the
        mesh: meta [D, 6, C], letters [D, C, TC, B], lengths [D, NB, 1, B].
        A shard_map-wrapped ragged kernel then runs the unmodified
        single-chip pallas program per device — data parallelism over the
        database with zero cross-device traffic in the hot loop (the TPU
        analog of the reference's single-threaded conveyor, scaled out;
        SURVEY.md §2 item 5). Returns (per-device block lists, meta,
        letters, lengths)."""
        if self._flat_sharded is not None:
            return self._flat_sharded
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        from ..parallel.shard import DB_AXIS
        from .pallas_kernels import T_CHUNK

        D = int(np.prod(self.mesh.devices.shape))
        nch = np.array(
            [-(-blk.letters.shape[0] // T_CHUNK) for blk in self.blocks],
            np.int64,
        )
        total = int(nch.sum())
        prefix = np.cumsum(nch)
        groups, lo = [], 0
        for j in range(1, D):
            # cut AFTER the block whose prefix mass first reaches j/D of
            # the total (same inclusive-cut rule as flat_parts — an
            # exclusive cut leaves device 0 empty and doubles the last
            # device's load in the uniform case); empty groups are fine
            # (mesh wider than the DB has blocks)
            c = int(np.searchsorted(prefix, total * j / D))
            cut = min(max(c + 1, lo), len(self.blocks))
            groups.append(self.blocks[lo:cut])
            lo = cut
        groups.append(self.blocks[lo:])
        c_pad = self._quantize(max(
            (sum(-(-blk.letters.shape[0] // T_CHUNK) for blk in g)
             for g in groups), default=1) or 1)
        nb_pad = self._quantize(
            max(max((len(g) for g in groups), default=0) + 1, 2))
        metas, letters, lengths = [], [], []
        for g in groups:
            m, l, n = self._build_stream_np(g, c_pad, nb_pad)
            metas.append(m)
            letters.append(l)
            lengths.append(n)
        sh = lambda: NamedSharding(self.mesh, PartitionSpec(DB_AXIS))
        self._flat_sharded = (
            groups,
            jax.device_put(np.stack(metas), sh()),
            jax.device_put(np.stack(letters), sh()),
            jax.device_put(np.stack(lengths), sh()),
        )
        return self._flat_sharded

    def flat_parts(self, k: int):
        """The flat() stream split into k equal-shaped parts (contiguous
        block ranges balanced by chunk count, all padded to one common
        (c_pad, nb_pad) so a single compiled kernel serves every part).
        Returns [(block_list, meta, letters, lengths), ...]. Fetching part
        i's results while part i+1 computes pipelines the device->host
        transfer behind compute."""
        if k <= 1 or len(self.blocks) < 2 * k:
            meta, letters, lengths = self.flat()
            return [(self.blocks, meta, letters, lengths)]
        cache = getattr(self, "_flat_parts", None)
        if cache is None:
            cache = self._flat_parts = {}
        if k in cache:
            return cache[k]
        from .pallas_kernels import T_CHUNK

        nch = [-(-blk.letters.shape[0] // T_CHUNK) for blk in self.blocks]
        total = sum(nch)
        # contiguous split at ~equal chunk mass: cut after the block whose
        # prefix mass first reaches j*total/k, guaranteeing every part gets
        # at least one block (a naive greedy loop degenerates to one group
        # when a heavy tail block carries most of the mass)
        prefix = np.cumsum(nch)
        cuts = []
        for j in range(1, k):
            c = int(np.searchsorted(prefix, total * j / k))
            lo = (cuts[-1] + 1) if cuts else 0
            cuts.append(min(max(c, lo), len(self.blocks) - (k - j) - 1))
        groups, lo = [], 0
        for c in cuts:
            groups.append(self.blocks[lo : c + 1])
            lo = c + 1
        groups.append(self.blocks[lo:])
        assert all(groups), [len(g) for g in groups]
        c_pad = self._quantize(max(
            sum(-(-blk.letters.shape[0] // T_CHUNK) for blk in g)
            for g in groups))
        nb_pad = self._quantize(max(max(len(g) for g in groups) + 1, 2))
        out = [
            (g,) + self._build_stream(g, c_pad, nb_pad) for g in groups
        ]
        cache[k] = out
        return out

    def __len__(self) -> int:
        return self.n
