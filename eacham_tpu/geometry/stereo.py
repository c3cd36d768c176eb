"""Stereo and RGB-D backprojection tools (pure jnp, batched).

Equivalents of the reference's Tools3d helpers
(modules/base/tools/Tools3d.h):

  * ``point_from_stereo``  <- Get3dPointByStereoPair (Tools3d.h:14-38):
    disparity between rectified left/right observations -> camera-frame 3D
  * ``point_from_depth``   <- Get3dPointByDepthMap (Tools3d.h:40-60):
    depth-map lookup -> camera-frame 3D (see also camera.backproject)
  * ``hamming_distance``   <- BinaryDescriptorDist (Tools3d.h:62-80):
    popcount distance for binary (ORB-class) descriptors, as a batched
    XLA population-count — the whole distance matrix in one fused op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def point_from_stereo(uv_left: jnp.ndarray, u_right: jnp.ndarray,
                      intr: jnp.ndarray, baseline: float):
    """Rectified stereo triangulation.

    uv_left: [..., 2] pixels in the left camera; u_right: [...] the
    matched x-coordinate in the right camera; baseline in meters.
    Returns camera-frame points [..., 3]; non-positive disparity yields
    points at huge depth (callers gate on a max-depth threshold).
    """
    disparity = uv_left[..., 0] - u_right
    disparity = jnp.maximum(disparity, 1e-6)
    z = intr[..., 0] * baseline / disparity
    x = (uv_left[..., 0] - intr[..., 2]) / intr[..., 0] * z
    y = (uv_left[..., 1] - intr[..., 3]) / intr[..., 1] * z
    return jnp.stack([x, y, z], axis=-1)


def point_from_depth(uv: jnp.ndarray, depth_map: jnp.ndarray,
                     intr: jnp.ndarray, depth_scale: float = 1.0):
    """Depth-map backprojection at integer pixel locations.

    uv: [K, 2]; depth_map: [H, W]. Returns ([K, 3], valid [K]) — valid
    where the stored depth is positive.
    """
    H, W = depth_map.shape
    xi = jnp.clip(uv[..., 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(uv[..., 1].astype(jnp.int32), 0, H - 1)
    z = depth_map[yi, xi] * depth_scale
    valid = z > 0.0
    x = (uv[..., 0] - intr[..., 2]) / intr[..., 0] * z
    y = (uv[..., 1] - intr[..., 3]) / intr[..., 1] * z
    return jnp.stack([x, y, z], axis=-1), valid


def hamming_distance(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs Hamming distance of packed binary descriptors.

    d1: [K1, B] uint8, d2: [K2, B] uint8 -> [K1, K2] int32. The reference
    does a per-pair 64-bit popcount loop (Tools3d.h:62-80); here the whole
    matrix is one broadcast XOR + population_count + reduction.
    """
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])
    return jnp.sum(
        jax.lax.population_count(x).astype(jnp.int32), axis=-1
    )


def match_hamming(d1, d2, mask1, mask2, max_distance: int = 64,
                  ratio: float = 0.8):
    """Mutual ratio-test matching for binary descriptors — the ORB-path
    analogue of features.matching.match_pair."""
    dist = hamming_distance(d1, d2).astype(jnp.float32)
    BIG = 1e9
    dist = jnp.where(mask1[:, None] & mask2[None, :], dist, BIG)

    best12 = jnp.argmin(dist, axis=1)
    d_best = jnp.min(dist, axis=1)
    masked = dist + jax.nn.one_hot(best12, dist.shape[1]) * BIG
    d_second = jnp.min(masked, axis=1)
    best21 = jnp.argmin(dist, axis=0)

    ok = (
        (d_best <= max_distance)
        & (d_best < ratio * d_second)
        & (best21[best12] == jnp.arange(d1.shape[0]))
        & mask1
    )
    return best12.astype(jnp.int32), ok
