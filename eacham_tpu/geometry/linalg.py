"""Factorization-free small-matrix helpers for batched RANSAC solving.

TPU rationale: `jnp.linalg.eigh/svd` lower to long sequential iterative
programs on TPU; vmapped over thousands of RANSAC hypotheses they dominate
the whole pipeline (the init-pair stage measured ~21 s of a 28 s
reconstruction). Hypothesis solving does not need machine-precision
factorizations — MSAC scoring tolerates approximate models and the winner
is re-fit exactly once. These replacements use only matmuls:

  * ``smallest_eigvec``: power iteration on the spectrally-shifted matrix
    (c I - A), c = trace(A) >= lambda_max — converges to the smallest
    eigenvector of symmetric PSD A.
  * ``orthonormalize_rotation``: Newton-Schulz polar iteration projecting a
    near-rotation onto SO(3) (det sign handled).

Exact paths (used once per winning model) stay on jnp.linalg.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def smallest_eigvec(A: jnp.ndarray, outer: int = 3, cg_iters: int = 12) -> jnp.ndarray:
    """Approximate unit eigenvector of the smallest eigenvalue of symmetric
    PSD ``A`` [..., n, n] -> [..., n].

    Inverse iteration: repeatedly solve (A + eps*tr(A) I) x = v with a few
    CG steps (exact at n iterations for an n x n system) — convergence per
    outer step is ~eps/lambda_{n-1}, so 2-3 outer steps reach fp32 noise.
    Everything is matvecs: no factorization primitive anywhere.
    """
    n = A.shape[-1]
    tr = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None]
    M = A / jnp.maximum(tr, _EPS)                      # normalize spectrum
    M = M + 1e-6 * jnp.eye(n, dtype=A.dtype)

    def cg_solve(b):
        x = jnp.zeros_like(b)
        r = b
        p = r
        rz = jnp.sum(r * r, axis=-1, keepdims=True)
        for _ in range(cg_iters):
            Ap = jnp.einsum("...ij,...j->...i", M, p)
            denom = jnp.sum(p * Ap, axis=-1, keepdims=True)
            alpha = rz / jnp.maximum(denom, 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            rz2 = jnp.sum(r * r, axis=-1, keepdims=True)
            p = r + (rz2 / jnp.maximum(rz, 1e-30)) * p
            rz = rz2
        return x

    v = jnp.full(A.shape[:-2] + (n,), 1.0, A.dtype)
    v = v.at[..., 0].add(0.5).at[..., n - 1].add(-0.25)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    for _ in range(outer):
        v = cg_solve(v)
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + _EPS)
    return v


def inv3x3(M: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate / determinant).

    ``jnp.linalg.inv`` lowers to an LU program on TPU; for [L, 3, 3] blocks
    (Schur landmark elimination) the adjugate is a handful of fused
    elementwise ops instead.
    """
    m00, m01, m02 = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    m10, m11, m12 = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    m20, m21, m22 = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    c00 = m11 * m22 - m12 * m21
    c01 = m12 * m20 - m10 * m22
    c02 = m10 * m21 - m11 * m20
    det = m00 * c00 + m01 * c01 + m02 * c02
    det = jnp.where(jnp.abs(det) < eps, eps, det)
    c10 = m02 * m21 - m01 * m22
    c11 = m00 * m22 - m02 * m20
    c12 = m01 * m20 - m00 * m21
    c20 = m01 * m12 - m02 * m11
    c21 = m02 * m10 - m00 * m12
    c22 = m00 * m11 - m01 * m10
    adj = jnp.stack([
        jnp.stack([c00, c10, c20], -1),
        jnp.stack([c01, c11, c21], -1),
        jnp.stack([c02, c12, c22], -1),
    ], -2)
    return adj / det[..., None, None]


def orthonormalize_rotation(M: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Nearest rotation to ``M`` [..., 3, 3] by Newton-Schulz polar
    iteration (converges when M is within ~a factor of 2 of orthogonal;
    inputs are pre-scaled to unit Frobenius/sqrt(3))."""
    det = jnp.linalg.det(M)
    M = M * jnp.sign(det)[..., None, None]
    s = jnp.sqrt(jnp.sum(M * M, axis=(-2, -1), keepdims=True) / 3.0)
    R = M / jnp.maximum(s, _EPS)
    eye = jnp.eye(3, dtype=M.dtype)
    for _ in range(iters):
        RtR = jnp.einsum("...ji,...jk->...ik", R, R)
        R = jnp.einsum("...ij,...jk->...ik", R, 1.5 * eye - 0.5 * RtR)
    return R
