"""Descriptor matching on the MXU: one matmul + top-2 ratio test + mutual check.

TPU-native replacement for the FLANN knn matcher + the driver's
mutual-cross-check buffer (modules/base/features/FeatureMatcherFlann.cpp:14-30
— knnMatch k=2, Lowe ratio 0.8; apps/sfm/main.cpp:130-146 — both-direction
agreement, pair kept if >30 survivors). For L2-normalized descriptors the
full distance matrix is ``d^2 = 2 - 2 * D1 @ D2^T`` — a single [K,256]x[256,K]
matmul per pair; the all-pairs stage batches P such matmuls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG = -1e9

# packed top-2: quantize similarity to 2^-14 steps (finer than the bf16
# MXU pass noise the decisions already tolerate, fp.py) and pack the
# lane index into the low bits of an int32 — ONE max then yields best
# AND argmax, and because packed values are unique per lane the exact
# second-best is one equality-masked max (no argmax scan, no one_hot
# materialization). Measured on v5e, 2048 pairs K=1024: the old
# max/argmax/one_hot/max sequence cost ~170 ms over the 34 ms matmul.
_QSCALE = 16384.0
# plain int (NOT jnp.int32): a module-level device array would initialize
# the XLA backend at import time, which breaks jax.distributed.initialize
# in multi-process runs (it must run before any backend query)
_IMIN = -(2 ** 30)


def _top2_packed(s, axis):
    K = s.shape[axis]
    bits = max(K - 1, 1).bit_length()
    idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, axis)
    q = (jnp.round(s * _QSCALE).astype(jnp.int32) << bits) | idx
    q = jnp.where(s <= NEG / 2, _IMIN, q)
    top = jnp.max(q, axis=axis)
    arg = top & (2 ** bits - 1)
    topx = jnp.expand_dims(top, axis)
    q2 = jnp.max(jnp.where(q == topx, _IMIN, q), axis=axis)
    unpack = lambda v: jnp.where(
        v == _IMIN, NEG, (v >> bits).astype(jnp.float32) / _QSCALE)
    return unpack(top), arg, unpack(q2)


def match_pair(
    d1: jnp.ndarray,      # [K1, D] L2-normalized descriptors
    d2: jnp.ndarray,      # [K2, D]
    mask1: jnp.ndarray,   # [K1] bool
    mask2: jnp.ndarray,   # [K2] bool
    ratio: float = 0.8,
):
    """Mutual Lowe-ratio matching.

    Returns ``(best_j [K1] int32, valid [K1] bool)``: for each keypoint of
    frame 1, the matched keypoint of frame 2 (or garbage where valid=False).
    Ratio test applied in both directions plus mutual-argmax agreement —
    exactly the semantics of FLANN(ratio) + the main-loop cross check.
    """
    # bf16 MXU passes are fine here: the matmul only ranks similarities and
    # the ratio/mutual tests are robust to 1e-3-level rounding (eacham_tpu.fp)
    from eacham_tpu.fp import FAST

    sim = jnp.dot(
        d1, d2.T, preferred_element_type=jnp.float32, precision=FAST
    )  # [K1, K2]
    sim = jnp.where(mask1[:, None] & mask2[None, :], sim, NEG)

    b12, a12, s12 = _top2_packed(sim, 1)   # per row (frame-1 kp)
    b21, a21, s21 = _top2_packed(sim, 0)   # per col (frame-2 kp)

    # Lowe ratio on L2 distances: d = sqrt(2 - 2 s) (clamped), d1 < r * d2
    def ratio_ok(best, second):
        dbest = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best, 0.0))
        dsecond = jnp.sqrt(jnp.maximum(2.0 - 2.0 * second, 0.0))
        return dbest < ratio * dsecond

    ok12 = ratio_ok(b12, s12) & (b12 > NEG / 2) & mask1
    ok21 = ratio_ok(b21, s21) & (b21 > NEG / 2) & mask2

    mutual = a21[a12] == jnp.arange(d1.shape[0])
    valid = ok12 & mutual & ok21[a12]
    return a12.astype(jnp.int32), valid


@partial(jax.jit, static_argnames=("ratio", "min_matches", "chunk", "backend"))
def match_all_pairs(
    desc: jnp.ndarray,       # [N, K, D] L2-normalized
    kp_mask: jnp.ndarray,    # [N, K] bool
    pair_idx: jnp.ndarray,   # [P, 2] int32 (i, j) frame indices, i < j
    ratio: float = 0.8,
    min_matches: int = 30,
    chunk: int = 16,
    backend: str = "auto",   # "auto" | "jnp" | "fused" (Pallas, TPU only)
):
    """Exhaustive pair matching (HOT LOOP 2 of the reference,
    apps/sfm/main.cpp:84-147) as a scan of batched matmuls.

    Returns ``(match_j [P, K] int32, match_valid [P, K] bool,
    pair_ok [P] bool)`` where row p maps keypoints of frame pair_idx[p,0]
    to keypoints of frame pair_idx[p,1]; pair_ok mirrors the reference's
    "> min_matches survivors" gate (main.cpp:142).

    ``chunk`` bounds the live similarity-matrix memory on the jnp path
    (chunk*K*K floats). ``backend="fused"`` routes the WHOLE pair set
    through one batched Pallas launch (ops/match_kernel.match_pairs_fused)
    that never materializes a similarity matrix in HBM and fetches
    descriptor blocks by scalar-prefetched pair index (no [P, K, D]
    gather). Measured on one v5e chip (scripts/bench_match_kernel.py,
    2048 pairs, K=1024): fused vs jnp — see SCALING.md r3; the jnp path's
    matmul->top-2 HBM boundary runs at ~35 GB/s
    (scripts/profile_match_parts.py), which the kernel avoids entirely.
    "auto" picks the kernel on TPU (K padded to the 128-lane row tile)
    and plain jnp elsewhere.
    """
    P = pair_idx.shape[0]
    K = desc.shape[1]
    if backend == "auto":
        # measured v5e (bench_match_kernel, within-run A/B): P=2048
        # K=1024 fused 1.15x, K=512 1.02x; P=256 K=1024 0.87x — the
        # single-launch kernel pays off once the pair set amortizes its
        # fixed cost
        backend = (
            "fused" if jax.default_backend() == "tpu" and P >= 1024
            else "jnp"
        )

    if backend == "fused":
        from eacham_tpu.ops.match_kernel import match_pairs_fused

        match_j, match_valid = match_pairs_fused(
            desc, kp_mask, pair_idx, ratio)
        pair_ok = (jnp.sum(match_valid, axis=-1) > min_matches) \
            & (pair_idx[:, 0] < pair_idx[:, 1])
        return match_j, match_valid, pair_ok

    pad = (-P) % chunk
    pair_padded = jnp.concatenate(
        [pair_idx, jnp.zeros((pad, 2), dtype=pair_idx.dtype)], axis=0
    )
    n_chunks = pair_padded.shape[0] // chunk
    pair_chunks = pair_padded.reshape(n_chunks, chunk, 2)

    def one(pair):
        i, j = pair[0], pair[1]
        return match_pair(desc[i], desc[j], kp_mask[i], kp_mask[j], ratio)

    def step(_, pairs):
        bj, valid = jax.vmap(one)(pairs)
        return None, (bj, valid)

    _, (match_j, match_valid) = jax.lax.scan(step, None, pair_chunks)
    match_j = match_j.reshape(-1, K)[:P]
    match_valid = match_valid.reshape(-1, K)[:P]
    # i < j also gates bucket-padding dummy rows (i == j == 0)
    pair_ok = (jnp.sum(match_valid, axis=-1) > min_matches) \
        & (pair_idx[:, 0] < pair_idx[:, 1])
    return match_j, match_valid, pair_ok
