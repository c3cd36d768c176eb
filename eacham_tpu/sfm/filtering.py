"""Observation / landmark outlier pruning.

The reference never prunes: a landmark accepted at triangulation time
keeps all its observers forever (Map.h — no removal path except wholesale
relinking). Robust losses in BA bound the damage but leave gross outliers
in the problem. This pass — standard in production SfM — drops
observations whose reprojection error exceeds a threshold (or that fall
behind their camera) and invalidates landmarks left with fewer than two
registered observers. Run before global BA; cheap (one projection pass).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eacham_tpu.geometry.camera import project
from eacham_tpu.sfm.scene import Scene, lm_observer_counts


@jax.jit
def prune_observations(scene: Scene, max_repr_error: float = 8.0):
    """Returns (scene, n_dropped_obs, n_invalidated_landmarks)."""
    N, K = scene.kp_mask.shape
    lm = scene.kp2lm
    lm_safe = jnp.maximum(lm, 0)
    linked = (lm >= 0) & scene.kp_mask & scene.pose_valid[:, None]

    uv_proj, z = jax.vmap(
        lambda T, pts: project(T, pts, scene.intr)
    )(scene.pose, scene.points[lm_safe])                 # [N, K, 2], [N, K]
    err = jnp.linalg.norm(uv_proj - scene.keypoints, axis=-1)
    bad = linked & ((err > max_repr_error) | (z <= 0.0))

    kp2lm = jnp.where(bad, -1, scene.kp2lm)
    scene = scene._replace(kp2lm=kp2lm)

    counts = lm_observer_counts(scene)
    was_valid = scene.lm_valid
    lm_valid = was_valid & (counts >= 2)
    n_invalidated = jnp.sum(was_valid & (~lm_valid))
    # unlink keypoints whose landmark just died
    dead = (kp2lm >= 0) & (~lm_valid[jnp.maximum(kp2lm, 0)])
    scene = scene._replace(
        kp2lm=jnp.where(dead, -1, kp2lm),
        lm_valid=lm_valid,
    )
    return scene, jnp.sum(bad), n_invalidated
