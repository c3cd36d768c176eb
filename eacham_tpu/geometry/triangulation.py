"""Batched DLT triangulation and multi-view consensus (pure jnp).

TPU-native rework of modules/sfm/reconstruction/Triangulator.cpp: the
per-track exhaustive-pair loop (TriangulatePointRansac, cpp:91-186) becomes a
vmapped batch of fixed-size pair enumerations with masks; the 4x4 JacobiSVD
null-space (cpp:49-63) becomes a batched 4x4 symmetric eigendecomposition of
A^T A (equivalent null vector, much faster batched on TPU).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from eacham_tpu.geometry.se3 import camera_center, transform_points
from eacham_tpu.geometry.camera import pixel_to_normalized, reprojection_error

_EPS = 1e-12


def triangulate_dlt(T1: jnp.ndarray, T2: jnp.ndarray,
                    xy1: jnp.ndarray, xy2: jnp.ndarray) -> jnp.ndarray:
    """Two-view DLT triangulation in *normalized* camera coordinates.

    ``T1, T2``: (..., 4, 4) world->cam transforms; ``xy1, xy2``: (..., 2)
    normalized (K-free) image points. Returns (..., 3) world points.

    Equivalent of TriangulatePoint (Triangulator.cpp:49-63) — builds the
    standard DLT system, solved in inhomogeneous form (A[:, :3] X = -A[:, 3])
    through 3x3 normal equations with a closed-form adjugate inverse: no
    iterative eigen/SVD kernel at all, pure fused arithmetic on the VPU.
    Points at infinity (singular normal matrix) come back huge and are
    rejected by the callers' depth/reprojection gates.
    """
    rows = []
    for T, xy in ((T1, xy1), (T2, xy2)):
        p0 = T[..., 0, :]
        p1 = T[..., 1, :]
        p2 = T[..., 2, :]
        rows.append(xy[..., 0:1] * p2 - p0)
        rows.append(xy[..., 1:2] * p2 - p1)
    A = jnp.stack(rows, axis=-2)                      # (..., 4, 4)
    B = A[..., :3]                                    # (..., 4, 3)
    b = -A[..., 3]                                    # (..., 4)
    M = jnp.swapaxes(B, -1, -2) @ B                   # (..., 3, 3)
    rhs = jnp.einsum("...ij,...i->...j", B, b)        # (..., 3)
    return _solve3x3(M, rhs)


def _solve3x3(M: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form solve of symmetric 3x3 systems (adjugate / Cramer)."""
    m00, m01, m02 = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    m10, m11, m12 = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    m20, m21, m22 = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    c00 = m11 * m22 - m12 * m21
    c01 = m12 * m20 - m10 * m22
    c02 = m10 * m21 - m11 * m20
    det = m00 * c00 + m01 * c01 + m02 * c02
    det = jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    c10 = m02 * m21 - m01 * m22
    c11 = m00 * m22 - m02 * m20
    c12 = m01 * m20 - m00 * m21
    c20 = m01 * m12 - m02 * m11
    c21 = m02 * m10 - m00 * m12
    c22 = m00 * m11 - m01 * m10
    x = jnp.stack([
        c00 * b[..., 0] + c10 * b[..., 1] + c20 * b[..., 2],
        c01 * b[..., 0] + c11 * b[..., 1] + c21 * b[..., 2],
        c02 * b[..., 0] + c12 * b[..., 1] + c22 * b[..., 2],
    ], axis=-1)
    return x / det[..., None]


def triangulation_angle(T1: jnp.ndarray, T2: jnp.ndarray,
                        point: jnp.ndarray) -> jnp.ndarray:
    """Angle between the two viewing rays at ``point`` (folded to <= pi/2),
    matching TriangulationAngle (Triangulator.cpp:21-47)."""
    c1 = camera_center(T1)
    c2 = camera_center(T2)
    r1 = point - c1
    r2 = point - c2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    cos = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(n1 * n2, _EPS)
    ang = jnp.arccos(jnp.clip(cos, -1.0, 1.0))
    return jnp.minimum(ang, np.pi - ang)


def is_positive_depth(T: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Cheirality test: point is in front of the camera (Triangulator.cpp:85-89)."""
    z = jnp.einsum("...j,...j->...", T[..., 2, :3], point) + T[..., 2, 3]
    return z > 0.0


def triangulate_consensus(
    transforms: jnp.ndarray,   # [V, 4, 4] world->cam per observer slot
    uv: jnp.ndarray,           # [V, 2] pixel observations
    mask: jnp.ndarray,         # [V] bool — which slots are real observers
    intr: jnp.ndarray,         # [4] shared intrinsics
    max_repr_error: float,
    min_tri_angle: float,
):
    """Multi-view triangulation with exhaustive-pair consensus.

    TPU rework of TriangulatePointRansac (Triangulator.cpp:91-186): every
    observer pair proposes a DLT point; a proposal is admissible if its pair
    angle >= ``min_tri_angle``; proposals are scored by the number of
    observers with reprojection error < ``max_repr_error`` and positive
    depth; the best proposal wins (first-wins on ties, like the strict ">"
    in cpp:162).

    Returns ``(point3d [3], inliers [V] bool, ok [] bool)`` where ``ok``
    replicates the reference's acceptance:
      * 2 observers: pair angle passes and world-z > 0 (cpp:104-120)
      * >2 observers: best inlier count > 2 and world-z > 0 (cpp:185)
    Callers (TriangulateFrame parity) additionally require all observers to
    be inliers.

    vmap this over a batch of tracks.
    """
    V = transforms.shape[0]
    ii, jj = np.triu_indices(V, k=1)
    ii = jnp.asarray(ii)
    jj = jnp.asarray(jj)

    xy = pixel_to_normalized(uv, intr)

    Ti = transforms[ii]
    Tj = transforms[jj]
    pts = triangulate_dlt(Ti, Tj, xy[ii], xy[jj])          # [P, 3]
    ang = triangulation_angle(Ti, Tj, pts)                 # [P]
    pair_valid = mask[ii] & mask[jj] & (ang >= min_tri_angle)

    # Score every proposal against every observer.
    pc = transform_points(transforms[None, :, :, :], pts[:, None, :])  # [P, V, 3]
    err = reprojection_error(uv[None, :, :], pc, intr)                  # [P, V]
    inl = (err < max_repr_error) & (pc[..., 2] > 0.0) & mask[None, :]   # [P, V]
    counts = jnp.where(pair_valid, jnp.sum(inl, axis=-1), -1)

    best = jnp.argmax(counts)
    best_point = pts[best]
    best_inl = inl[best]
    best_count = counts[best]
    n_valid = jnp.sum(mask)

    ok_two = pair_valid[best]            # V == 2 case: only the angle gate
    ok_many = best_count > 2
    ok = jnp.where(n_valid <= 2, ok_two, ok_many) & (best_point[2] > 0.0) & (n_valid >= 2)
    return best_point, best_inl, ok
