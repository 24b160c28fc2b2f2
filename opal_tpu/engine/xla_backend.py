"""Backend adapter: scores one padded block via the lax.scan engine."""
from __future__ import annotations

import numpy as np

from .xla import build_score_fn


class XlaBackend:
    name = "xla"

    def score_block(self, qprofile, blk, gap_open, gap_ext, mode, search_type):
        import jax.numpy as jnp

        Q = qprofile.shape[1]
        fn = build_score_fn(mode, search_type, Q, gap_open, gap_ext)
        out = fn(
            jnp.asarray(qprofile, jnp.int32),
            jnp.asarray(blk.letters, jnp.int32),
            jnp.asarray(blk.lengths, jnp.int32),
        )
        return {k: np.asarray(v) for k, v in out.items() if v is not None}
