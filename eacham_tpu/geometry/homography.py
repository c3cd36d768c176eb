"""Homography estimation and decomposition (batched, pure jnp).

TPU-native equivalent of cv::findHomography(LMEDS) +
cv::decomposeHomographyMat used by the two-view initializer for planar
scenes (modules/sfm/reconstruction/ReconstructionManager.cpp:74,92):
4-point DLT hypotheses scored by forward transfer error; decomposition by
the SVD (Faugeras/Zhang) method yielding up to 8 (R, t, n) candidates —
the caller selects by cheirality + reprojection + triangulation angle just
like the reference (cpp:98-144), so the candidate-set superset is harmless.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from eacham_tpu.geometry.ransac import ransac, RansacResult

_EPS = 1e-12


def _nullvec(A: jnp.ndarray, exact: bool, weights=None) -> jnp.ndarray:
    if weights is not None:
        A = A * weights[:, None]
    AtA = A.T @ A
    if exact:
        _, vecs = jnp.linalg.eigh(AtA)
        return vecs[:, 0]
    from eacham_tpu.geometry.linalg import smallest_eigvec

    return smallest_eigvec(AtA)


def dlt_homography(p1: jnp.ndarray, p2: jnp.ndarray, exact: bool = False,
                   weights=None) -> jnp.ndarray:
    """DLT from >=4 correspondences (pixels), with Hartley normalization.

    exact=False uses the matmul-only power-iteration null vector (the
    per-hypothesis RANSAC path — see geometry/linalg.py)."""
    def norm_pts(xy):
        c = jnp.mean(xy, axis=0)
        d = jnp.mean(jnp.linalg.norm(xy - c, axis=-1)) + _EPS
        s = jnp.sqrt(2.0) / d
        T = jnp.array(
            [[s, 0.0, -s * c[0]], [0.0, s, -s * c[1]], [0.0, 0.0, 1.0]],
            dtype=xy.dtype,
        )
        return (xy - c) * s, T

    q1, T1 = norm_pts(p1)
    q2, T2 = norm_pts(p2)
    x1, y1 = q1[:, 0], q1[:, 1]
    x2, y2 = q2[:, 0], q2[:, 1]
    zeros = jnp.zeros_like(x1)
    ones = jnp.ones_like(x1)
    rows_a = jnp.stack(
        [x1, y1, ones, zeros, zeros, zeros, -x2 * x1, -x2 * y1, -x2], axis=-1
    )
    rows_b = jnp.stack(
        [zeros, zeros, zeros, x1, y1, ones, -y2 * x1, -y2 * y1, -y2], axis=-1
    )
    A = jnp.concatenate([rows_a, rows_b], axis=0)
    w2 = None if weights is None else jnp.concatenate([weights, weights])
    H = _nullvec(A, exact, w2).reshape(3, 3)
    H = jnp.linalg.inv(T2) @ H @ T1
    return H / jnp.where(jnp.abs(H[2, 2]) < _EPS, _EPS, H[2, 2])


def transfer_error(H: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray):
    """Forward transfer error ||p2 - H p1|| in pixels (what OpenCV's
    findHomography scores with)."""
    ones = jnp.ones(p1.shape[:-1] + (1,), dtype=p1.dtype)
    q = jnp.concatenate([p1, ones], axis=-1) @ H.T
    w = jnp.where(jnp.abs(q[..., 2]) < _EPS, _EPS, q[..., 2])
    proj = q[..., :2] / w[..., None]
    return jnp.linalg.norm(proj - p2, axis=-1)


@partial(jax.jit, static_argnames=("n_hyp",))
def estimate_homography(
    key,
    p1: jnp.ndarray,     # [N, 2] pixels, frame 1
    p2: jnp.ndarray,     # [N, 2] pixels, frame 2
    mask: jnp.ndarray,   # [N] bool
    threshold: float,    # pixels (reference passes 4.0, cpp:74)
    n_hyp: int = 256,
) -> RansacResult:
    def solver(idx):
        return dlt_homography(p1[idx], p2[idx])

    def residual(H):
        return transfer_error(H, p1, p2)

    res = ransac(key, mask, solver, residual, threshold, n_hyp, 4)
    # exact winner refit on the inlier set
    H = dlt_homography(p1, p2, exact=True, weights=res.inliers.astype(p1.dtype))
    err = transfer_error(H, p1, p2)
    inl = (err * err < threshold * threshold) & mask
    better = jnp.sum(inl) >= res.n_inliers
    return RansacResult(
        model=jnp.where(better, H, res.model),
        inliers=jnp.where(better, inl, res.inliers),
        n_inliers=jnp.where(better, jnp.sum(inl), res.n_inliers),
        score=res.score,
    )


def decompose_homography(H: jnp.ndarray, intr: jnp.ndarray):
    """Calibrated homography decomposition (SVD / Faugeras method).

    Returns stacked candidates ``R [8,3,3], t [8,3], n [8,3], valid [8]``.
    Candidates cover both sign families; degenerate/duplicate ones are fine
    because selection downstream mirrors the reference's best-of-solutions
    triangulation test (ReconstructionManager.cpp:98-138).
    """
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=H.dtype)
    Kinv = jnp.array(
        [[1.0 / fx, 0.0, -cx / fx], [0.0, 1.0 / fy, -cy / fy], [0.0, 0.0, 1.0]],
        dtype=H.dtype,
    )
    Hc = Kinv @ H @ K

    U, s, Vt = jnp.linalg.svd(Hc)
    d1, d2, d3 = s[0], s[1], s[2]
    Hn = Hc / jnp.where(d2 < _EPS, _EPS, d2)  # noqa: F841  (kept for clarity)
    detUV = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d3 = d1 / d2, d3 / d2  # now d2 == 1

    denom = jnp.maximum(d1 * d1 - d3 * d3, _EPS)
    x1 = jnp.sqrt(jnp.clip((d1 * d1 - 1.0) / denom, 0.0, None))
    x3 = jnp.sqrt(jnp.clip((1.0 - d3 * d3) / denom, 0.0, None))

    V = Vt.T

    def family(e1, e3, positive: bool):
        # positive: d' = +1 family (camera does not cross the plane)
        if positive:
            sin_t = (d1 - d3) * x1 * x3 * e1 * e3
            cos_t = d1 * x3 * x3 + d3 * x1 * x1
            Rp = jnp.array(
                [
                    [cos_t, 0.0, -sin_t],
                    [0.0, 1.0, 0.0],
                    [sin_t, 0.0, cos_t],
                ],
                dtype=H.dtype,
            )
            tp = (d1 - d3) * jnp.array([x1 * e1, 0.0, -x3 * e3], dtype=H.dtype)
        else:
            sin_p = (d1 + d3) * x1 * x3 * e1 * e3
            cos_p = d3 * x1 * x1 - d1 * x3 * x3
            Rp = jnp.array(
                [
                    [cos_p, 0.0, sin_p],
                    [0.0, -1.0, 0.0],
                    [sin_p, 0.0, -cos_p],
                ],
                dtype=H.dtype,
            )
            tp = (d1 + d3) * jnp.array([x1 * e1, 0.0, x3 * e3], dtype=H.dtype)
        np_ = jnp.array([x1 * e1, 0.0, x3 * e3], dtype=H.dtype)
        R = detUV * (U @ Rp @ Vt)
        t = U @ tp
        n = V @ np_
        # Flip normal (and t) so the plane faces the first camera (n_z > 0),
        # matching OpenCV's convention of returning visible-plane solutions.
        sign = jnp.where(n[2] < 0.0, -1.0, 1.0)
        return R, t * sign, n * sign

    Rs, ts, ns = [], [], []
    for positive in (True, False):
        for e1 in (1.0, -1.0):
            for e3 in (1.0, -1.0):
                R, t, n = family(e1, e3, positive)
                Rs.append(R)
                ts.append(t)
                ns.append(n)
    Rs = jnp.stack(Rs)
    ts = jnp.stack(ts)
    ns = jnp.stack(ns)
    # Candidates 0-3 are the d' > 0 family, 4-7 the d' < 0 family (the
    # camera crossed the plane between the views). Both are physical —
    # cv::decomposeHomographyMat's solution set spans them too — and the
    # caller's cheirality + reprojection + angle vote
    # (ReconstructionManager.cpp:98-138 semantics) discards the impostors,
    # so all eight stay valid.
    valid = jnp.ones(8, dtype=bool)
    return Rs, ts, ns, valid
