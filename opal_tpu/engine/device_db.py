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
        self.blocks: list[Block] = plan_blocks(db, block_size)
        self.total_residues = int(sum(len(s) for s in db))
        letters_sh = lengths_sh = None
        if mesh is not None:
            from ..parallel.shard import group_letters_sharding, group_lengths_sharding

            letters_sh = group_letters_sharding(mesh)
            lengths_sh = group_lengths_sharding(mesh)

        # group blocks by padded length (rounded up to the kernel's T chunk)
        by_tpad: dict[int, list[Block]] = {}
        for blk in self.blocks:
            t_pad = -(-blk.t_pad // t_quantum) * t_quantum
            by_tpad.setdefault(t_pad, []).append(blk)

        self.groups: list[BlockGroup] = []
        for t_pad in sorted(by_tpad):
            blks = by_tpad[t_pad]
            G = len(blks)
            letters = np.full((G, t_pad, block_size), PAD_LETTER,
                              dtype=np.int8)
            lengths = np.zeros((G, 1, block_size), dtype=np.int32)
            for g, blk in enumerate(blks):
                letters[g, : blk.letters.shape[0]] = blk.letters
                lengths[g, 0] = blk.lengths
            self.groups.append(
                BlockGroup(
                    t_pad=t_pad,
                    blocks=blks,
                    letters=jax.device_put(letters, letters_sh),
                    lengths=jax.device_put(lengths, lengths_sh),
                )
            )

    def __len__(self) -> int:
        return self.n
