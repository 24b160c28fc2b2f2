"""Backend adapter for the Pallas TPU kernels.

Prepares block inputs (bf16 query profile, T_CHUNK-padded letters, lengths)
and finalizes tracker outputs. Falls back to the XLA path for shapes or gap
configs the kernels don't cover (very long queries, gap_ext > gap_open).
"""
from __future__ import annotations

import numpy as np

from . import pallas_kernels as pk
from .xla_backend import XlaBackend


class PallasBackend:
    name = "pallas"

    def __init__(self, lane_block: int = pk.LANE_BLOCK, interpret: bool = False):
        self.lane_block = lane_block
        self.interpret = interpret
        self._fallback = XlaBackend()

    def supports(self, Q: int, gap_open: int, gap_ext: int) -> bool:
        return (
            gap_ext <= gap_open
            and pk._round_up(max(Q, 16), 16) <= pk.Q_PAD_MAX
        )

    def score_block(self, qprofile, blk, gap_open, gap_ext, mode, search_type,
                    with_flags: bool = False):
        import jax.numpy as jnp

        A, Q = qprofile.shape[0], qprofile.shape[1]
        if not self.supports(Q, gap_open, gap_ext):
            return self._fallback.score_block(
                qprofile, blk, gap_open, gap_ext, mode, search_type
            )

        B = blk.letters.shape[1]
        if B != self.lane_block:
            # blocks are planned with the engine's block_size; re-pad lanes
            pad = self.lane_block - B
            if pad < 0:
                raise ValueError("block wider than lane_block")
            letters = np.pad(blk.letters, ((0, 0), (0, pad)))
            lengths = np.pad(blk.lengths, (0, pad))
        else:
            letters, lengths = blk.letters, blk.lengths

        T = letters.shape[0]
        T_pad = pk._round_up(T, pk.T_CHUNK)
        if T_pad != T:
            letters = np.pad(letters, ((0, T_pad - T), (0, 0)))

        # qprofile arrives as [A, Q]; kernel wants [Q_pad, A_PAD]
        Q_pad = pk._round_up(max(Q, 16), 16)
        qp = np.zeros((Q_pad, pk.A_PAD), dtype=np.float32)
        qp[:Q, :A] = np.asarray(qprofile, dtype=np.float32).T

        fn = pk.build_pallas_score_fn(
            mode, search_type, Q, int(gap_open), int(gap_ext),
            B=self.lane_block, with_flags=with_flags, interpret=self.interpret,
        )
        tr = fn(
            jnp.asarray(qp, jnp.bfloat16),
            jnp.asarray(letters, jnp.int32),
            jnp.asarray(lengths, jnp.int32).reshape(1, -1),
        )
        tr = np.asarray(tr)
        out = pk.finalize_trackers(tr, mode, search_type, Q, np.asarray(lengths))
        return {k: v[: blk.letters.shape[1]] for k, v in out.items()}
