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

    def dispatch_many(self, qprep, ddb, gap_open, gap_ext, mode,
                      search_type, with_flags=False, single_part=False):
        """ddb: DeviceDatabase (scores its [G, T, B] letter groups).
        single_part is a download-pipelining hint with no meaning here."""
        Q = qprep.shape[1]
        fn = build_score_fn(mode, search_type, Q, gap_open, gap_ext,
                            with_flags=with_flags)
        handles = []
        for grp in ddb.groups:
            handles.append([
                fn(qprep, grp.letters[g], grp.lengths[g])
                for g in range(grp.letters.shape[0])
            ])
        return handles

    def gather(self, handles):
        """Fetch all results in one host round trip."""
        import jax

        return jax.device_get(handles)

    def collect_many(self, handles, ddb, mode, search_type, Q,
                     with_flags=False):
        """Returns [(Block, {col: [n] array}), ...] over all DB blocks."""
        result = []
        for grp, hs in zip(ddb.groups, handles):
            for blk, h in zip(grp.blocks, hs):
                result.append((blk, {
                    k: np.asarray(v)[: blk.n] for k, v in h.items()
                    if v is not None
                }))
        return result
