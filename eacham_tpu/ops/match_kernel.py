"""Fused descriptor-matching Pallas kernel.

One kernel computes, per keypoint pair-set, the row-wise best/second-best
similarities + argmax AND the column-wise best/argmax — without the
[K1, K2] similarity matrix ever leaving VMEM. The MXU does the [tile,256]
x [256, K2] products; the VPU reduces. Host-side jnp then applies the
Lowe ratio + mutual-consistency decision (features/matching.py semantics,
FLANN knn k=2 parity — FeatureMatcherFlann.cpp:14-30).

Column state (running max/argmax across row tiles) lives in VMEM scratch,
carried across the sequential row-tile grid dimension.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = int(__import__("os").environ.get("EACHAM_MATCH_ROW_TILE", "128"))
NEG = -1e30


QSCALE = 16384.0
IMIN = -(2 ** 30)


def _match_kernel(d1_ref, d2_ref, m1_ref, m2_ref,
                  b1_ref, a1_ref, s1_ref, b2_ref, a2_ref, s2_ref,
                  colmax_ref, colarg_ref, colsec_ref):
    i = pl.program_id(0)
    n_rows = pl.num_programs(0)

    d1 = d1_ref[:]                          # [ROW_TILE, D]
    d2 = d2_ref[:]                          # [K2, D]
    sim = jax.lax.dot_general(
        d1, d2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                        # [ROW_TILE, K2]
    # mask as 32-bit arithmetic: bool broadcasts with minor-dim insertion
    # are unsupported by Mosaic
    live1 = m1_ref[0, :].astype(jnp.float32)    # [ROW_TILE]
    live2 = m2_ref[0, :].astype(jnp.float32)    # [K2]
    dead = (live1[:, None] * live2[None, :]) < 0.5

    # packed top-2 (see features/matching._top2_packed): quantize sim to
    # 2^-14 steps and pack the lane index into the low int32 bits — one
    # max then carries best AND argmax, and the unique packing makes the
    # exact second-best one equality-masked max. This removes the two
    # argmax composites and their iota/select re-scans, which dominated
    # the kernel's VPU time (the matmul is 34 ms of a ~390 ms call at
    # 2048 pairs, K=1024 — measured r3).
    K2 = sim.shape[1]
    T = sim.shape[0]
    cbits = max(K2 - 1, 1).bit_length()
    rbits = max(T - 1, 1).bit_length()
    q = jnp.round(sim * QSCALE).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
    qc = jnp.where(dead, IMIN, (q << cbits) | cols)
    qr = jnp.where(dead, IMIN, (q << rbits) | rows)

    def unpack(v, bits):
        return jnp.where(v == IMIN, NEG,
                         (v >> bits).astype(jnp.float32) / QSCALE)

    # --- row-wise top-2 ----------------------------------------------------
    top = jnp.max(qc, axis=1)
    sec = jnp.max(jnp.where(qc == top[:, None], IMIN, qc), axis=1)
    b1_ref[0, :] = unpack(top, cbits)
    a1_ref[0, :] = top & (2 ** cbits - 1)
    s1_ref[0, :] = unpack(sec, cbits)

    # --- column-wise running top-2 across row tiles (packed) ---------------
    ctop = jnp.max(qr, axis=0)               # [K2]
    csec = jnp.max(jnp.where(qr == ctop[None, :], IMIN, qr), axis=0)
    carg = (ctop & (2 ** rbits - 1)) + i * ROW_TILE

    @pl.when(i == 0)
    def _():
        colmax_ref[0, :] = ctop
        colarg_ref[0, :] = carg
        colsec_ref[0, :] = csec

    @pl.when(i > 0)
    def _():
        prev = colmax_ref[0, :]
        prev_sec = colsec_ref[0, :]
        take_new = ctop > prev
        # merged second-best of two (best, second) summaries (packed
        # ints order by value first, so the min/max identity holds):
        # max(second_a, second_b, min(best_a, best_b))
        merged_sec = jnp.maximum(
            jnp.maximum(prev_sec, csec), jnp.minimum(prev, ctop)
        )
        colmax_ref[0, :] = jnp.where(take_new, ctop, prev)
        colarg_ref[0, :] = jnp.where(take_new, carg, colarg_ref[0, :])
        colsec_ref[0, :] = merged_sec

    @pl.when(i == n_rows - 1)
    def _():
        b2_ref[0, :] = unpack(colmax_ref[0, :], rbits)
        a2_ref[0, :] = colarg_ref[0, :]
        s2_ref[0, :] = unpack(colsec_ref[0, :], rbits)


def _match_batch_kernel(pi0_ref, pi1_ref, d1_ref, d2_ref, m1_ref, m2_ref,
                        b1_ref, a1_ref, s1_ref, b2_ref, a2_ref, s2_ref,
                        colmax_ref, colarg_ref, colsec_ref):
    """Grid (P, row_tiles): one frame PAIR per major grid step.

    Identical math to _match_kernel; the pair axis lives in the grid and
    the descriptor blocks are DMA'd straight from the [N, K, D] table via
    scalar-prefetched pair indices — no [P, K, D] gather ever exists, and
    the whole pair set is ONE kernel launch (the vmap-of-pallas_call
    structure this replaces measured 356-587 ms for 2048 pairs at K=1024;
    this kernel measures 306-324 ms, bounded by Mosaic's ~14 us/grid-step
    latency and lane-axis reductions, not the matmul — SCALING.md r3)."""
    del pi0_ref, pi1_ref  # consumed by the BlockSpec index maps
    i = pl.program_id(1)
    n_rows = pl.num_programs(1)

    d1 = d1_ref[0]                           # [ROW_TILE, D] bf16
    d2t = d2_ref[0]                          # [D, K2] bf16 (pre-transposed:
    # Mosaic's bf16 MXU path rejects the NT contraction, so the host
    # passes desc as [N, D, K] for the rhs)
    sim = jax.lax.dot_general(
        d1, d2t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # the repo-wide "highest" matmul default (fp.py) would ask Mosaic
        # for fp32 passes over bf16 operands — unsupported ("Bad lhs
        # type"); bf16 inputs + fp32 accumulate is the native MXU mode
        precision=jax.lax.Precision.DEFAULT,
    )                                        # [ROW_TILE, K2] fp32
    T = sim.shape[0]
    # mask blocks carry the FULL row (minor-dim tiling constraint);
    # slice this row tile's span dynamically
    live1 = m1_ref[0, 0, pl.ds(i * T, T)].astype(jnp.float32)
    live2 = m2_ref[0, 0, :].astype(jnp.float32)
    dead = (live1[:, None] * live2[None, :]) < 0.5

    K2 = sim.shape[1]
    cbits = max(K2 - 1, 1).bit_length()
    rbits = max(T - 1, 1).bit_length()
    q = jnp.round(sim * QSCALE).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
    qc = jnp.where(dead, IMIN, (q << cbits) | cols)
    qr = jnp.where(dead, IMIN, (q << rbits) | rows)

    def unpack(v, bits):
        return jnp.where(v == IMIN, NEG,
                         (v >> bits).astype(jnp.float32) / QSCALE)

    # NOTE r3: a hierarchical [T, K2/128, 128] reshape reduction measured
    # faster in an isolated probe but SLOWER composed with the column
    # pass + mask handling (324 -> 498 ms within-run A/B); flat lane max
    # kept deliberately
    top = jnp.max(qc, axis=1)
    sec = jnp.max(jnp.where(qc == top[:, None], IMIN, qc), axis=1)
    b1_ref[0, 0, pl.ds(i * T, T)] = unpack(top, cbits)
    a1_ref[0, 0, pl.ds(i * T, T)] = top & (2 ** cbits - 1)
    s1_ref[0, 0, pl.ds(i * T, T)] = unpack(sec, cbits)

    ctop = jnp.max(qr, axis=0)
    csec = jnp.max(jnp.where(qr == ctop[None, :], IMIN, qr), axis=0)
    carg = (ctop & (2 ** rbits - 1)) + i * T

    @pl.when(i == 0)
    def _():
        colmax_ref[0, :] = ctop
        colarg_ref[0, :] = carg
        colsec_ref[0, :] = csec

    @pl.when(i > 0)
    def _():
        prev = colmax_ref[0, :]
        prev_sec = colsec_ref[0, :]
        take_new = ctop > prev
        merged_sec = jnp.maximum(
            jnp.maximum(prev_sec, csec), jnp.minimum(prev, ctop)
        )
        colmax_ref[0, :] = jnp.where(take_new, ctop, prev)
        colarg_ref[0, :] = jnp.where(take_new, carg, colarg_ref[0, :])
        colsec_ref[0, :] = merged_sec

    @pl.when(i == n_rows - 1)
    def _():
        b2_ref[0, 0, :] = unpack(colmax_ref[0, :], rbits)
        a2_ref[0, 0, :] = colarg_ref[0, :]
        s2_ref[0, 0, :] = unpack(colsec_ref[0, :], rbits)


@partial(jax.jit, static_argnames=("ratio", "interpret"))
def match_pairs_fused(
    desc: jnp.ndarray,       # [N, K, D] L2-normalized fp32
    kp_mask: jnp.ndarray,    # [N, K] bool
    pair_idx: jnp.ndarray,   # [P, 2] int32 frame indices
    ratio: float = 0.8,
    interpret: bool = False,
):
    """Batched fused matching: ALL pairs in one kernel launch.

    Same per-pair contract as features.matching.match_pair — returns
    ``(match_j [P, K] int32, match_valid [P, K] bool)``. The similarity
    matrices never exist in HBM (the jnp path's matmul->top-2 boundary
    reads them back at ~35 GB/s, scripts/profile_match_parts.py), the
    descriptor blocks are fetched per-pair by scalar-prefetch indexing
    (no [P, K, D] gather), and the MXU runs native bf16 with fp32
    accumulation — the same precision the jnp path's ranking matmul uses
    (fp.FAST)."""
    N, K, D = desc.shape
    P = pair_idx.shape[0]
    padk = (-K) % ROW_TILE
    if padk:
        desc = jnp.pad(desc, ((0, 0), (0, padk), (0, 0)))
        kp_mask = jnp.pad(kp_mask, ((0, 0), (0, padk)))
    Kp = K + padk
    desc_bf = desc.astype(jnp.bfloat16)
    desc_bf_t = jnp.swapaxes(desc_bf, 1, 2)  # [N, D, Kp] for the rhs
    # [N, 1, Kp]: minor-two block dims must tile to (8, 128) or equal the
    # array dims, so masks/outputs carry a singleton middle axis
    mask_i = kp_mask.astype(jnp.int32)[:, None, :]

    grid = (P, Kp // ROW_TILE)
    out_shape = (
        jax.ShapeDtypeStruct((P, 1, Kp), jnp.float32),   # row best
        jax.ShapeDtypeStruct((P, 1, Kp), jnp.int32),     # row argmax
        jax.ShapeDtypeStruct((P, 1, Kp), jnp.float32),   # row second
        jax.ShapeDtypeStruct((P, 1, Kp), jnp.float32),   # col best
        jax.ShapeDtypeStruct((P, 1, Kp), jnp.int32),     # col argmax
        jax.ShapeDtypeStruct((P, 1, Kp), jnp.float32),   # col second
    )
    # pair indices ride as TWO 1-D scalar-prefetch arrays: a [P, 2] SMEM
    # operand is lane-padded to [P, 128] and blows the 1 MB SMEM budget
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ROW_TILE, D), lambda p, i, pi0, pi1: (pi0[p], i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, Kp), lambda p, i, pi0, pi1: (pi1[p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Kp), lambda p, i, pi0, pi1: (pi0[p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Kp), lambda p, i, pi0, pi1: (pi1[p], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, Kp), lambda p, i, pi0, pi1: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Kp), lambda p, i, pi0, pi1: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Kp), lambda p, i, pi0, pi1: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Kp), lambda p, i, pi0, pi1: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Kp), lambda p, i, pi0, pi1: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Kp), lambda p, i, pi0, pi1: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, Kp), jnp.int32),
            pltpu.VMEM((1, Kp), jnp.int32),
            pltpu.VMEM((1, Kp), jnp.int32),
        ],
    )
    b1, a1, s1, b2, a2, s2 = pl.pallas_call(
        _match_batch_kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(pair_idx[:, 0], pair_idx[:, 1], desc_bf, desc_bf_t, mask_i, mask_i)
    b1, a1, s1 = b1[:, 0], a1[:, 0], s1[:, 0]
    b2, a2, s2 = b2[:, 0], a2[:, 0], s2[:, 0]

    mask1 = kp_mask[pair_idx[:, 0]]          # [P, Kp]
    mask2 = kp_mask[pair_idx[:, 1]]

    def ratio_ok(best, second):
        dbest = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best, 0.0))
        dsecond = jnp.sqrt(jnp.maximum(2.0 - 2.0 * second, 0.0))
        return dbest < ratio * dsecond

    ok1 = ratio_ok(b1, s1) & (b1 > NEG / 2) & mask1
    ok2 = ratio_ok(b2, s2) & (b2 > NEG / 2) & mask2
    mutual = jnp.take_along_axis(a2, a1, axis=1) \
        == jnp.arange(Kp)[None, :]
    valid = ok1 & mutual & jnp.take_along_axis(ok2, a1, axis=1)
    return a1[:, :K], valid[:, :K]


@partial(jax.jit, static_argnames=("interpret",))
def match_pair_fused(
    d1: jnp.ndarray,      # [K1, D] L2-normalized
    d2: jnp.ndarray,      # [K2, D]
    mask1: jnp.ndarray,   # [K1] bool
    mask2: jnp.ndarray,   # [K2] bool
    ratio: float = 0.8,
    interpret: bool = False,
):
    """Same contract as features.matching.match_pair, fused on TPU."""
    K1, D = d1.shape
    K2 = d2.shape[0]
    pad1 = (-K1) % ROW_TILE
    if pad1:
        d1 = jnp.pad(d1, ((0, pad1), (0, 0)))
        mask1 = jnp.pad(mask1, (0, pad1))
    K1p = K1 + pad1

    grid = (K1p // ROW_TILE,)
    out_shape = (
        jax.ShapeDtypeStruct((1, K1p), jnp.float32),   # row best
        jax.ShapeDtypeStruct((1, K1p), jnp.int32),     # row argmax
        jax.ShapeDtypeStruct((1, K1p), jnp.float32),   # row second
        jax.ShapeDtypeStruct((1, K2), jnp.float32),    # col best
        jax.ShapeDtypeStruct((1, K2), jnp.int32),      # col argmax
        jax.ShapeDtypeStruct((1, K2), jnp.float32),    # col second
    )
    b1, a1, s1, b2, a2, s2 = pl.pallas_call(
        _match_kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, ROW_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, K2), jnp.int32),    # packed col best
            pltpu.VMEM((1, K2), jnp.int32),    # global col argmax
            pltpu.VMEM((1, K2), jnp.int32),    # packed col second
        ],
        interpret=interpret,
    )(
        d1, d2, mask1.astype(jnp.int32)[None, :],
        mask2.astype(jnp.int32)[None, :],
    )

    b1 = b1[0, :K1]
    a1 = a1[0, :K1]
    s1 = s1[0, :K1]
    b2 = b2[0]
    a2 = a2[0]
    s2 = s2[0]
    mask1 = mask1[:K1]

    # Lowe ratio on L2 distances (d^2 = 2 - 2 s), both directions + mutual —
    # identical decision rule to features.matching.match_pair
    def ratio_ok(best, second):
        dbest = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best, 0.0))
        dsecond = jnp.sqrt(jnp.maximum(2.0 - 2.0 * second, 0.0))
        return dbest < ratio * dsecond

    ok1 = ratio_ok(b1, s1) & (b1 > NEG / 2) & mask1
    ok2 = ratio_ok(b2, s2) & (b2 > NEG / 2) & mask2
    mutual = a2[a1] == jnp.arange(K1)
    valid = ok1 & mutual & ok2[a1]
    return a1, valid
