"""Batched fixed-iteration RANSAC machinery (pure jnp).

TPU-native replacement for OpenCV's adaptive LMEDS/RANSAC loops
(cv::findEssentialMat / cv::findHomography / cv::solvePnPRansac used at
modules/sfm/reconstruction/ReconstructionManager.cpp:58,74,223): all
hypotheses are sampled, solved, and scored in one batched program — no
data-dependent iteration counts, everything lands on the MXU/VPU.

Scoring is MSAC (truncated quadratic), which empirically matches the
reference's LMEDS inlier sets on the same thresholds (parity is an ATE
bound, not bitwise — SURVEY.md §7 "Hard parts" #3).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    model: jnp.ndarray       # best model parameters
    inliers: jnp.ndarray     # [N] bool inlier mask against the data
    n_inliers: jnp.ndarray   # [] int32
    score: jnp.ndarray       # [] float32 MSAC score (lower is better)


def masked_sample_indices(key, mask: jnp.ndarray, n_hyp: int, sample_size: int):
    """Sample ``n_hyp`` index tuples of ``sample_size`` distinct entries,
    restricted to ``mask``-valid rows.

    Uses the Gumbel-top-k trick: per hypothesis, draw iid uniforms, push
    invalid rows to -inf, take the top-k — one batched sort, no rejection
    loops (static shapes for XLA).
    """
    n = mask.shape[0]
    u = jax.random.uniform(key, (n_hyp, n))
    u = jnp.where(mask[None, :], u, -jnp.inf)
    _, idx = jax.lax.top_k(u, sample_size)
    return idx  # [n_hyp, sample_size]


def ransac(
    key,
    data_mask: jnp.ndarray,            # [N] bool — valid correspondences
    solver: Callable,                  # idx [S] -> model (pytree/array), vmapped over hypotheses
    residual: Callable,                # model -> [N] residuals (squared or px)
    threshold: float,
    n_hyp: int,
    sample_size: int,
    model_valid: Callable | None = None,   # model -> [] bool
) -> RansacResult:
    """Generic batched MSAC.

    ``solver`` maps a [sample_size] int index vector to a model;
    ``residual`` maps a model to per-datum residuals (same units as
    ``threshold``). Invalid data (``~data_mask``) never count as inliers.
    """
    idx = masked_sample_indices(key, data_mask, n_hyp, sample_size)
    models = jax.vmap(solver)(idx)

    def score_one(model):
        r = residual(model)
        r2 = r * r
        t2 = threshold * threshold
        inl = (r2 < t2) & data_mask
        # MSAC: inliers contribute r^2, outliers contribute t^2
        score = jnp.sum(jnp.where(inl, r2, t2) * data_mask)
        return score, inl

    scores, inlier_masks = jax.vmap(score_one)(models)
    if model_valid is not None:
        valid = jax.vmap(model_valid)(models)
        scores = jnp.where(valid, scores, jnp.inf)

    best = jnp.argmin(scores)
    best_model = jax.tree_util.tree_map(lambda m: m[best], models)
    best_inl = inlier_masks[best]
    return RansacResult(
        model=best_model,
        inliers=best_inl,
        n_inliers=jnp.sum(best_inl),
        score=scores[best],
    )
