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

    def flat(self):
        """Ragged chunk stream for the single-launch pallas path: the whole
        DB as one [C, T_CHUNK, B] int8 chunk sequence (each block's chunks
        back to back) plus per-chunk metadata (block index, first/last
        markers, column offset) prefetched to SMEM, and per-block lengths.
        Built and uploaded once, cached."""
        if self._flat is None:
            import jax

            from .pallas_kernels import T_CHUNK

            parts, metas = [], []
            nb = len(self.blocks)
            lengths = np.zeros((max(nb, 1), 1, self.block_size), np.int32)
            for bi, blk in enumerate(self.blocks):
                t_pad = blk.letters.shape[0]
                assert t_pad % T_CHUNK == 0, t_pad
                nch = t_pad // T_CHUNK
                parts.append(blk.letters.reshape(nch, T_CHUNK, -1))
                m = np.zeros((nch, 4), np.int32)
                m[:, 0] = bi
                m[0, 1] = 1
                m[-1, 2] = 1
                m[:, 3] = np.arange(nch, dtype=np.int32) * T_CHUNK
                metas.append(m)
                lengths[bi, 0] = blk.lengths
            letters = np.concatenate(parts, axis=0) if parts else np.zeros(
                (0, T_CHUNK, self.block_size), np.int8
            )
            meta = np.concatenate(metas, axis=0) if metas else np.zeros(
                (0, 4), np.int32
            )
            # [4, C] layout: scalar-prefetch SMEM pads the minor dim to a
            # full lane stripe, so the minor dim must be the long one.
            meta = np.ascontiguousarray(meta.T)
            self._flat = (
                jax.device_put(meta),
                jax.device_put(letters),
                jax.device_put(lengths),
            )
        return self._flat

    def __len__(self) -> int:
        return self.n
