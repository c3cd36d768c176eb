"""Perspective-n-Point: batched DLT hypotheses + RANSAC + Gauss-Newton polish.

TPU-native equivalent of cv::solvePnPRansac(SOLVEPNP_EPNP, 10000 iters, 4px,
0.999) at modules/sfm/reconstruction/ReconstructionManager.cpp:223-224. The
EPnP control-point machinery doesn't batch cleanly; a 6-point DLT hypothesis
is linear (one 12x12 eigendecomposition), is exact on noise-free samples, and
after the masked Gauss-Newton polish on the inlier set achieves the same
registration accuracy — validated against synthetic ground truth in
tests/test_pnp.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from eacham_tpu.geometry.linalg import smallest_eigvec, orthonormalize_rotation
from eacham_tpu.geometry.ransac import ransac
from eacham_tpu.geometry.se3 import exp_se3, rt_to_mat, transform_points, hat
from eacham_tpu.geometry.camera import project_hom, pixel_to_normalized

_EPS = 1e-12


def dlt_pnp(pts3d: jnp.ndarray, xy: jnp.ndarray, exact: bool = False) -> jnp.ndarray:
    """Linear PnP from >=6 3D<->normalized-2D correspondences -> T [4,4].

    Solves for the projection P = [R|t] (up to scale) with a 12-dim null
    vector, then projects onto SE(3). The 3D points are centered and scaled
    first (Hartley normalization) — required for fp32 conditioning of the
    12x12 eigendecomposition on TPU.
    """
    c = jnp.mean(pts3d, axis=0)
    norm_scale = jnp.mean(jnp.linalg.norm(pts3d - c, axis=-1)) + _EPS
    pts3d = (pts3d - c) / norm_scale

    X, Y, Z = pts3d[:, 0], pts3d[:, 1], pts3d[:, 2]
    x, y = xy[:, 0], xy[:, 1]
    ones = jnp.ones_like(X)
    zeros = jnp.zeros_like(X)
    rows_a = jnp.stack(
        [X, Y, Z, ones, zeros, zeros, zeros, zeros, -x * X, -x * Y, -x * Z, -x],
        axis=-1,
    )
    rows_b = jnp.stack(
        [zeros, zeros, zeros, zeros, X, Y, Z, ones, -y * X, -y * Y, -y * Z, -y],
        axis=-1,
    )
    A = jnp.concatenate([rows_a, rows_b], axis=0)
    AtA = A.T @ A
    if exact:
        _, vecs = jnp.linalg.eigh(AtA)
        P = vecs[:, 0].reshape(3, 4)
    else:
        P = smallest_eigvec(AtA).reshape(3, 4)

    # Fix the sign so sampled points sit in front of the camera.
    z_mean = jnp.mean(pts3d @ P[2, :3] + P[2, 3])
    P = P * jnp.where(z_mean < 0, -1.0, 1.0)

    # Project the rotation part onto SO(3); rescale t consistently.
    if exact:
        U, s, Vt = jnp.linalg.svd(P[:, :3])
        scale = jnp.mean(s)
        d = jnp.linalg.det(U @ Vt)
        R = U @ jnp.diag(jnp.array([1.0, 1.0, d], dtype=P.dtype)) @ Vt
    else:
        # matmul-only nearest rotation (per-hypothesis path); scale from
        # the Frobenius norm
        scale = jnp.sqrt(jnp.sum(P[:, :3] * P[:, :3]) / 3.0)
        R = orthonormalize_rotation(P[:, :3])
    t_norm = P[:, 3] / jnp.where(scale < _EPS, _EPS, scale)
    # Undo normalization: x_cam ~ R (X-c)/s + t_norm  ∝  R X + (s t_norm - R c)
    t = norm_scale * t_norm - R @ c
    return rt_to_mat(R, t)


def _reproj_residual_px(T, pts3d, uv, intr):
    pc = transform_points(T, pts3d)
    proj = project_hom(pc, intr)
    err = jnp.linalg.norm(proj - uv, axis=-1)
    # behind-camera points must never be inliers
    return jnp.where(pc[..., 2] > 0, err, 1e6)


def gauss_newton_pose(
    T0: jnp.ndarray,
    pts3d: jnp.ndarray,
    uv: jnp.ndarray,
    intr: jnp.ndarray,
    weights: jnp.ndarray,
    iters: int = 10,
    damping: float = 1e-6,
):
    """Masked Gauss-Newton refinement of a single pose (fixed iteration
    count; the 6x6 normal-equation solve is trivial). Left-multiplicative
    se(3) updates. Analytic Jacobians (no autodiff graphs in the hot loop)."""

    def body(_, T):
        pc = transform_points(T, pts3d)           # [N, 3]
        z = jnp.maximum(pc[..., 2], _EPS)
        inv_z = 1.0 / z
        fx, fy = intr[0], intr[1]
        # d(uv)/d(pc)
        du = jnp.stack(
            [fx * inv_z, jnp.zeros_like(z), -fx * pc[..., 0] * inv_z * inv_z],
            axis=-1,
        )
        dv = jnp.stack(
            [jnp.zeros_like(z), fy * inv_z, -fy * pc[..., 1] * inv_z * inv_z],
            axis=-1,
        )
        J_pc = jnp.stack([du, dv], axis=-2)       # [N, 2, 3]
        # d(pc)/d(xi) for left perturbation: [ -[pc]_x | I ]  (omega, v)
        dpc = jnp.concatenate(
            [-hat(pc), jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), pc.shape[:-1] + (3, 3))],
            axis=-1,
        )                                          # [N, 3, 6]
        J = J_pc @ dpc                             # [N, 2, 6]
        r = project_hom(pc, intr) - uv             # [N, 2]
        w = weights[..., None]
        JtJ = jnp.einsum("nik,nij->kj", J * w[..., None], J)
        Jtr = jnp.einsum("nik,ni->k", J * w[..., None], r)
        H = JtJ + damping * jnp.eye(6, dtype=T.dtype)
        dx = -jnp.linalg.solve(H, Jtr)
        return exp_se3(dx) @ T

    return jax.lax.fori_loop(0, iters, body, T0)


@partial(jax.jit, static_argnames=("n_hyp", "refine_iters"))
def solve_pnp_ransac(
    key,
    pts3d: jnp.ndarray,      # [N, 3] world points
    uv: jnp.ndarray,         # [N, 2] pixel observations
    mask: jnp.ndarray,       # [N] bool
    intr: jnp.ndarray,       # [4]
    threshold: float = 4.0,  # px (reference: 4.0, cpp:224)
    n_hyp: int = 512,
    refine_iters: int = 10,
):
    """Returns (T [4,4] world->cam, inliers [N] bool, n_inliers)."""
    xy = pixel_to_normalized(uv, intr)

    def solver(idx):
        return dlt_pnp(pts3d[idx], xy[idx])

    def residual(T):
        return _reproj_residual_px(T, pts3d, uv, intr)

    res = ransac(key, mask, solver, residual, threshold, n_hyp, 6)
    # Polish on the inlier set, then recompute the inlier mask once.
    T = gauss_newton_pose(
        res.model, pts3d, uv, intr, res.inliers.astype(uv.dtype), iters=refine_iters
    )
    err = _reproj_residual_px(T, pts3d, uv, intr)
    inl = (err < threshold) & mask
    return T, inl, jnp.sum(inl)
