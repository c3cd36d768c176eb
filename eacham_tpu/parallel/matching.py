"""Mesh-sharded exhaustive pair matching.

The O(N^2) pair-matrix stage (apps/sfm/main.cpp:84-147) is the framework's
"long-context" analogue (SURVEY.md §5): the pair axis is sharded over the
mesh, descriptors are replicated, and every device matmuls its pair shard
on its MXU. No collectives are needed — outputs stay pair-sharded.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from eacham_tpu.features.matching import match_all_pairs


def match_all_pairs_sharded(
    desc: jnp.ndarray,       # [N, K, D] L2-normalized (replicated)
    kp_mask: jnp.ndarray,    # [N, K]
    pair_idx: jnp.ndarray,   # [P, 2]
    mesh: Mesh,
    ratio: float = 0.8,
    min_matches: int = 30,
    chunk: int = 16,
):
    """Same contract as ``match_all_pairs``, work split over the mesh's
    single axis. Padding rows (frame 0 vs itself) are computed and sliced
    off — static shapes everywhere."""
    from eacham_tpu.parallel.mesh import mesh_axes

    axis, n_dev = mesh_axes(mesh)     # 1-D or (hosts, chips): same specs
    P_orig = pair_idx.shape[0]
    pad = (-P_orig) % n_dev
    pair_padded = jnp.concatenate(
        [pair_idx, jnp.zeros((pad, 2), pair_idx.dtype)], axis=0
    )

    local = partial(
        match_all_pairs, ratio=ratio, min_matches=min_matches, chunk=chunk
    )
    f = shard_map(
        lambda d, m, pi: local(d, m, pi),
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    mj, mv, ok = jax.jit(f)(desc, kp_mask, pair_padded)
    return mj[:P_orig], mv[:P_orig], ok[:P_orig]
