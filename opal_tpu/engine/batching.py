"""Length-bucketed batching of the database.

The reference keeps SIMD lanes busy with a dynamic per-column sequence-refill
conveyor (reference: loadNextSequence, src/opal.cpp:472-490). Dynamic refill
is hostile to XLA's static shapes, so the TPU-native equivalent is host-side
*length-sorted bucketing*: sequences are sorted by length, grouped into
fixed-width blocks, and padded to a bucketed column count, with in-kernel
masking handling residual raggedness. Sorting bounds padding waste the same
way the reference's docs recommend sorting the DB for lane efficiency
(src/opal.h:103-104).
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np

PAD_LETTER = 31  # == pallas_kernels.PAD_LETTER (A_PAD - 1); alphabet <= 31


def pad_bucket(n: int, quantum: int = 64, ratio: float = 1.0) -> int:
    """Padded column count for a block whose longest sequence has n residues.

    With ratio == 1.0 (default) this is exact rounding to the kernel's
    column-chunk quantum: padding waste is minimal and the number of distinct
    compiled shapes is bounded by the number of blocks (typically ~10-30,
    amortized by the persistent compilation cache). A ratio > 1 coarsens to a
    geometric grid, trading padding for fewer shapes.
    """
    if ratio <= 1.0:
        return max(quantum, -(-n // quantum) * quantum)
    b = quantum
    while b < n:
        b = max(b + quantum, int(-(-b * ratio // quantum) * quantum))
    return b


@dataclasses.dataclass
class Block:
    indices: np.ndarray   # [nb] original DB indices (nb <= batch)
    letters: np.ndarray   # [T_pad, batch] uint8, padded lanes/columns hold 0
    lengths: np.ndarray   # [batch] int32, padded lanes hold 0
    t_pad: int

    @property
    def n(self) -> int:
        return len(self.indices)


def plan_blocks(db, batch: int, subset=None) -> list[Block]:
    """Split (a subset of) the database into length-sorted padded blocks.

    db: list of uint8 index arrays. subset: optional iterable of DB indices to
    include (used for per-sequence rerun in the SIMPLE overflow strategy).
    """
    if subset is None:
        subset = range(len(db))
    idx = np.fromiter(subset, dtype=np.int64)
    if idx.size == 0:
        return []
    lens = np.array([len(db[i]) for i in idx], dtype=np.int64)
    order = np.argsort(lens, kind="stable")
    idx = idx[order]

    blocks = []
    # When n is not a multiple of the lane count, make the FIRST block the
    # partial one: ascending length order would otherwise leave the empty
    # lanes in the LAST block, which holds the longest sequences — at
    # Swiss-Prot scale those ~1k empty lanes × a ~5k-column t_pad were
    # 2.2% of all padded DP cells; on the shortest block they are ~0.01%.
    first = idx.size % batch or batch
    lens_sorted = lens[order]
    starts = [0] + list(range(first, idx.size, batch))
    for j, s in enumerate(starts):
        cnt = first if j == 0 else batch
        part = idx[s : s + cnt]
        maxlen = int(lens_sorted[s + cnt - 1])  # ascending order
        # Exact block length (quantum 1): the ragged pallas stream runs the
        # last chunk of each block with a data-driven column count (meta
        # ncols), so block padding need not reach the T_CHUNK=64 boundary —
        # at Swiss-Prot scale the 64-quantum wasted 7.8% of all DP columns
        # (the dominant padding term; spread under length sorting is 0.9%).
        # Measured on v5e, in-process: quantum 1 = 106.4 vs 64 = 99.4 GCUPS
        # (+5-7%), bit-identical scores. Stream/group SHAPES are unaffected
        # (streams are [C, 64, B] regardless; the XLA path re-rounds groups
        # to its own quantum). OPAL_TPU_T_QUANTUM overrides (64 restores
        # the pre-ncols packing for in-process A/B, tools/ab_ncols.py).
        t_pad = pad_bucket(
            int(maxlen),
            quantum=int(os.environ.get("OPAL_TPU_T_QUANTUM", "1")),
        )
        # Padding (lanes and columns) carries the reserved PAD_LETTER: its
        # profile entries are large-negative, so padded DP cells can never
        # beat real cells — the pallas path's score-only trackers rely on
        # this to skip per-column masking entirely.
        letters = np.full((t_pad, batch), PAD_LETTER, dtype=np.int8)
        lengths = np.zeros(batch, dtype=np.int32)
        lengths[:cnt] = lens_sorted[s : s + cnt]
        # vectorized lane fill: one concatenation + one masked scatter
        # (the per-lane assignment loop was ~40% of upload-path CPU at
        # 541k sequences). letters.T[mask] iterates lane-major then
        # row-major — exactly the concatenation order.
        cat = np.concatenate([db[i] for i in part])
        mask = np.arange(t_pad, dtype=np.int32)[None, :] < lengths[:, None]
        letters.T[mask] = cat
        blocks.append(Block(indices=part, letters=letters, lengths=lengths, t_pad=t_pad))
    return blocks
