"""Batched SE(3) operations (pure jnp; vmap/jit friendly).

Pose convention follows the reference pipeline: a frame's pose is the
world->camera rigid transform T (4x4), i.e. ``x_cam = T @ x_world``
(reference: modules/sfm/data/Node.h pose storage; solvePnP output written
directly as the node transform in
modules/sfm/reconstruction/ReconstructionManager.cpp:233-237).

All functions operate on the *last* one or two axes so they can be freely
vmapped / broadcast over leading batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]_x of a (..., 3) axis vector -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    rows = [
        jnp.stack([zeros, -wz, wy], axis=-1),
        jnp.stack([wz, zeros, -wx], axis=-1),
        jnp.stack([-wy, wx, zeros], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def _so3_exp(w: jnp.ndarray):
    """Rodrigues formula. Returns (R, V) where V is the left Jacobian of SO(3).

    Taylor-safe near theta=0 (needed for fp32 and for autodiff through zero).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    # double-where: keep the non-Taylor branch's inputs finite at theta=0 so
    # reverse-mode grads through the unselected branch don't produce NaNs
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    W = hat(w)
    W2 = W @ W

    # sin(t)/t and (1-cos t)/t^2 and (t - sin t)/t^3 with small-angle guards
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2_safe * theta)
    )

    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    return R, V


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map se(3) -> SE(3).

    ``xi = (..., 6)`` ordered as (omega, v) — rotation first, translation
    second (the same ordering the reference's GTSAM Pose3 uses for its
    noise sigmas, modules/sfm/reconstruction/BundleAdjuster.cpp:28-33).
    Returns (..., 4, 4).
    """
    w, v = xi[..., :3], xi[..., 3:]
    R, V = _so3_exp(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return _rt_to_mat(R, t)


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map SE(3) -> se(3), (..., 4, 4) -> (..., 6) as (omega, v)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    theta2 = theta * theta
    small = theta < 1e-4
    # w = theta/(2 sin theta) * (R - R^T)^vee
    sin_theta = jnp.sin(theta)
    k = jnp.where(small, 0.5 + theta2 / 12.0, theta / (2.0 * sin_theta + 1e-30))
    Rd = R - jnp.swapaxes(R, -1, -2)
    w = k[..., None] * jnp.stack(
        [Rd[..., 2, 1], Rd[..., 0, 2], Rd[..., 1, 0]], axis=-1
    )
    # V^{-1} = I - W/2 + (1/theta^2)(1 - a/(2b)) W^2
    W = hat(w)
    W2 = W @ W
    a = jnp.where(small, 1.0 - theta2 / 6.0, sin_theta / (theta + 1e-30))
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + 1e-30))
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - a / (2.0 * b + 1e-30)) / (theta2 + 1e-30),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), R.shape)
    Vinv = eye - 0.5 * W + coef[..., None, None] * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def _rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) + (..., 3) -> (..., 4, 4) homogeneous transform."""
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Public alias: rotation+translation to 4x4 (mirrors the reference's
    ConvertToTransform, modules/sfm/reconstruction/ProjectionHelper.cpp:8-20)."""
    return _rt_to_mat(R, t)


def retract(T: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative retraction: exp(xi) @ T.

    Used by the bundle adjuster as the local parameterization of camera
    poses (the TPU-native replacement for GTSAM's Pose3 manifold updates).
    """
    return exp_se3(xi) @ T


def inverse_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse (no generic 4x4 solve)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return _rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to (..., 3) points (equivalent of
    tools::transformPoint3d, modules/base/tools/Tools3d.h)."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], pts) + T[..., :3, 3]


def camera_center(T: jnp.ndarray) -> jnp.ndarray:
    """Camera center in world coords for a world->cam transform:
    C = -R^T t (reference computes transform.inverse().block<3,1>(0,3),
    modules/sfm/reconstruction/Triangulator.cpp:25)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", R, t)
