"""Multi-device / multi-host distribution of the database search.

The reference is strictly single-threaded (SURVEY.md §2 item 5); scaling out
is a new, TPU-native capability: the database's *lane* axis (independent DB
sequences) is sharded over a 1D device mesh, the query (tiny) is replicated,
and per-sequence results are gathered back — data parallelism over the DB
with zero cross-device traffic in the hot loop, exactly what the
embarrassingly-parallel structure of 1-vs-N alignment calls for. Collectives
only appear at result-gather time and ride ICI within a slice.

Two integration levels:

- ``db_mesh()`` + ``Engine(mesh=...)``: block lanes are laid out sharded over
  the mesh (jax.sharding.NamedSharding); the jitted block scorer is
  partitioned automatically by GSPMD (every op is lane-wise, so partitioning
  is trivial and exact).
- ``sharded_score_step``: an explicit shard_map-wrapped step (query
  broadcast, lanes split, results gathered) used by the multi-chip dry run
  and by multi-host launches where each process feeds its local shard.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.xla import build_score_fn

DB_AXIS = "db"


def db_mesh(devices=None) -> Mesh:
    """1D mesh over all (or the given) devices; axis name 'db'."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DB_AXIS,))


def lane_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [T, B] letter blocks: lanes split across devices."""
    return NamedSharding(mesh, P(None, DB_AXIS))


def length_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, DB_AXIS))


def group_letters_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for grouped [G, T, B] letter stacks: lanes split."""
    return NamedSharding(mesh, P(None, None, DB_AXIS))


def group_lengths_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, None, DB_AXIS))


def sharded_score_step(mode, search_type, Q, go, ge, mesh: Mesh):
    """shard_map-wrapped block scorer: letters [T, B_total] split on lanes,
    query profile replicated, outputs gathered per-lane arrays."""
    fn = build_score_fn(mode, search_type, Q, go, ge)

    def local_step(qprofile, letters, lengths):
        return fn(qprofile, letters, lengths)

    shard = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(None, DB_AXIS), P(None, DB_AXIS)),
        out_specs=P(DB_AXIS),
        check_vma=False,  # scan carries mix replicated/varying values
    )
    return jax.jit(shard)
