"""Essential-matrix estimation and pose recovery (batched, pure jnp).

TPU-native equivalent of the cv::findEssentialMat / cv::recoverPose path in
modules/sfm/reconstruction/ReconstructionManager.cpp:58-61,148-151:
  * hypotheses: normalized 8-point solves, batched over one MXU-friendly
    eigendecomposition per hypothesis (fixed count — no adaptive loops)
  * scoring: Sampson distance MSAC
  * pose: E -> 4 (R, t) candidates, cheirality vote by batched triangulation
    with the same 50-unit max-depth gate OpenCV's recoverPose applies.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from eacham_tpu.geometry.linalg import smallest_eigvec
from eacham_tpu.geometry.ransac import ransac, RansacResult
from eacham_tpu.geometry.se3 import rt_to_mat
from eacham_tpu.geometry.triangulation import triangulate_dlt

_EPS = 1e-12


def _nullvec_3x3(A: jnp.ndarray, exact: bool, weights=None) -> jnp.ndarray:
    """Smallest right-singular vector of A (rows, 9) -> 3x3.

    exact=True: eigh (one winner refit). exact=False: matmul-only power
    iteration (per-hypothesis path — TPU eigh is an iterative program that
    dominates RANSAC when vmapped over thousands of hypotheses)."""
    if weights is not None:
        A = A * weights[:, None]
    AtA = A.T @ A
    if exact:
        _, vecs = jnp.linalg.eigh(AtA)
        return vecs[:, 0].reshape(3, 3)
    return smallest_eigvec(AtA).reshape(3, 3)


def eight_point(xy1: jnp.ndarray, xy2: jnp.ndarray, exact: bool = False,
                weights=None) -> jnp.ndarray:
    """Normalized 8-point algorithm on >=8 correspondences in *normalized
    camera* coordinates.

    exact=True additionally projects onto the essential manifold (singular
    values (1,1,0)); the fast path returns the raw fundamental-style model,
    which Sampson scoring handles fine."""
    # Hartley normalization (isotropic scaling) for conditioning in fp32.
    def norm_pts(xy):
        c = jnp.mean(xy, axis=0)
        d = jnp.mean(jnp.linalg.norm(xy - c, axis=-1)) + _EPS
        s = jnp.sqrt(2.0) / d
        T = jnp.array([[1, 0, -c[0]], [0, 1, -c[1]], [0, 0, 1 / s]]) * s
        T = T.at[2, 2].set(1.0)
        return (xy - c) * s, T

    p1, T1 = norm_pts(xy1)
    p2, T2 = norm_pts(xy2)

    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )
    F = _nullvec_3x3(A, exact, weights)
    F = T2.T @ F @ T1
    if not exact:
        return F / (jnp.linalg.norm(F) + _EPS)
    # Project onto the essential manifold: singular values -> (1, 1, 0).
    U, s, Vt = jnp.linalg.svd(F)
    E = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], dtype=F.dtype)) @ Vt
    return E


def sampson_distance(E: jnp.ndarray, xy1: jnp.ndarray, xy2: jnp.ndarray):
    """First-order geometric distance to the epipolar constraint, in the
    units of the input coordinates."""
    ones = jnp.ones(xy1.shape[:-1] + (1,), dtype=xy1.dtype)
    p1 = jnp.concatenate([xy1, ones], axis=-1)
    p2 = jnp.concatenate([xy2, ones], axis=-1)
    Ep1 = p1 @ E.T          # [N, 3]
    Etp2 = p2 @ E           # [N, 3]
    num = jnp.sum(p2 * Ep1, axis=-1)
    den = Ep1[..., 0] ** 2 + Ep1[..., 1] ** 2 + Etp2[..., 0] ** 2 + Etp2[..., 1] ** 2
    return jnp.abs(num) / jnp.sqrt(den + _EPS)


@partial(jax.jit, static_argnames=("n_hyp",))
def estimate_essential(
    key,
    xy1: jnp.ndarray,        # [N, 2] normalized camera coords, frame 1
    xy2: jnp.ndarray,        # [N, 2] normalized camera coords, frame 2
    mask: jnp.ndarray,       # [N] bool
    threshold: float,        # Sampson threshold in normalized units
    n_hyp: int = 512,
) -> RansacResult:
    def solver(idx):
        return eight_point(xy1[idx], xy2[idx])

    def residual(E):
        return sampson_distance(E, xy1, xy2)

    res = ransac(key, mask, solver, residual, threshold, n_hyp, 8)
    # exact re-fit of the winner on its inlier set (weighted LS nullvec +
    # essential-manifold projection) — one factorization per estimate
    E = eight_point(xy1, xy2, exact=True,
                    weights=res.inliers.astype(xy1.dtype))
    err = sampson_distance(E, xy1, xy2)
    inl = (err * err < threshold * threshold) & mask
    # keep the refit only if it did not lose inliers (degenerate sets)
    better = jnp.sum(inl) >= res.n_inliers
    return RansacResult(
        model=jnp.where(better, E, res.model),
        inliers=jnp.where(better, inl, res.inliers),
        n_inliers=jnp.where(better, jnp.sum(inl), res.n_inliers),
        score=res.score,
    )


def decompose_essential(E: jnp.ndarray):
    """E -> two rotations and a unit translation (the classic U W V^T
    factorization behind cv::recoverPose)."""
    U, _, Vt = jnp.linalg.svd(E)
    # keep proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return R1, R2, t


def recover_pose(
    E: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    mask: jnp.ndarray,
    max_depth: float = 50.0,
):
    """Pick the (R, t) candidate with the most points passing cheirality in
    both views and depth < ``max_depth`` (cv::recoverPose with
    distanceThresh=50 as called at ReconstructionManager.cpp:150).

    Returns (T [4,4] world->cam of view 2 w.r.t. view 1, n_good, good_mask).
    """
    R1, R2, t = decompose_essential(E)
    eye = jnp.eye(4, dtype=E.dtype)

    def count_good(R, tt):
        T = rt_to_mat(R, tt)
        pts = triangulate_dlt(eye, T, xy1, xy2)
        z1 = pts[:, 2]
        pc2 = pts @ R.T + tt
        z2 = pc2[:, 2]
        good = (z1 > 0) & (z2 > 0) & (z1 < max_depth) & (z2 < max_depth) & mask
        return jnp.sum(good), good, T

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    counts, goods, Ts = zip(*[count_good(R, tt) for R, tt in cands])
    counts = jnp.stack(counts)
    goods = jnp.stack(goods)
    Ts = jnp.stack(Ts)
    best = jnp.argmax(counts)
    return Ts[best], counts[best], goods[best]
