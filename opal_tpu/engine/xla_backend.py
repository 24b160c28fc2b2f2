"""Backend adapter: scores padded block groups via the lax.scan engine.

Mirrors the Pallas backend's dispatch_many/gather/collect_many protocol so
the engine treats both identically; used on CPU (tests, dry runs) and as the
fallback for configs the kernels don't cover.
"""
from __future__ import annotations

import numpy as np

from .xla import build_score_fn


class XlaBackend:
    name = "xla"

    def prepare_query(self, qprofile, gap_open, gap_ext):
        import jax
        import jax.numpy as jnp

        return jax.device_put(jnp.asarray(qprofile, jnp.int32))  # [A, Q]

    def dispatch_many(self, qprep, groups, gap_open, gap_ext, mode,
                      search_type, with_flags=False):
        """groups: list of BlockGroup ([G, T, B] letters)."""
        Q = qprep.shape[1]
        fn = build_score_fn(mode, search_type, Q, gap_open, gap_ext,
                            with_flags=with_flags)
        handles = []
        for grp in groups:
            handles.append([
                fn(qprep, grp.letters[g], grp.lengths[g])
                for g in range(grp.letters.shape[0])
            ])
        return handles

    def gather(self, handles):
        """Fetch all results in one host round trip."""
        import jax

        return jax.device_get(handles)

    def collect_many(self, handles, groups, mode, search_type, Q,
                     with_flags=False):
        result = []
        for grp, hs in zip(groups, handles):
            outs = []
            for blk, h in zip(grp.blocks, hs):
                outs.append(
                    {k: np.asarray(v)[: blk.n] for k, v in h.items()
                     if v is not None}
                )
            result.append(outs)
        return result
