"""Pose-graph optimization: loop closing for long trajectories.

The incremental sweep refines a 16-camera window per frame, so pose error
accumulates along the trajectory. By the time a loop closes, the revisited
frames are metres away from where their features say they should be — the
reprojection-gated landmark merge (triangulate.py, max_repr_error) rejects
every loop link, the global BA never sees a long-range constraint, and the
drift survives (observed: N=500 orbit, match purity 99%, 71 loop edges in
the graph, final ATE ~7; the same run with GT track identity: ATE 0.003).

The fix — standard in SfM/SLAM, absent from the reference — is to close
loops in POSE space, where two-view measurements are drift-independent:

  1. ``edge_measurements``: per surviving match edge, essential-matrix
     MSAC + cheirality voting gives the relative rotation and unit
     translation direction (batched over the pair axis, MXU-shaped like
     the matcher).
  2. ``optimize_pose_graph``: damped Gauss-Newton over all camera poses
     minimizing rotation-log and translation-direction residuals. Both
     stages solve block-sparse float64 normal equations on the HOST
     (analytic 3x3 Jacobian blocks, vectorized COO assembly, sparse LU):
     the measurement extraction is MXU work, but the graph solve is a
     tiny, precision-critical sparse problem — fp32 rounding alone
     perturbs the soft bending modes (measured), and dense assembly dies
     at KITTI scale (N=4541: dense H ~2.6 GB, autodiff J ~7 GB).
  3. ``rebuild_map``: with drift-free poses, wipe the landmark table and
     re-run the per-frame merge/triangulation pass so loop links finally
     connect; the global BA then polishes everything.

No reference counterpart (fatlipp/eacham has no loop handling); closest
in spirit to its global BA stage (apps/sfm/main.cpp:228-231).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from eacham_tpu.geometry.camera import pixel_to_normalized
from eacham_tpu.geometry.epipolar import estimate_essential, recover_pose
from eacham_tpu.geometry.se3 import exp_se3, inverse_se3
from eacham_tpu.sfm.scene import Scene
from eacham_tpu.sfm.triangulate import triangulate_frame


@partial(jax.jit, static_argnames=("n_hyp", "chunk"))
def edge_measurements(
    keypoints: jnp.ndarray,    # [N, K, 2]
    pair_idx: jnp.ndarray,     # [P, 2]
    pair_ok: jnp.ndarray,      # [P]
    match_ij: jnp.ndarray,     # [P, K]
    valid_ij: jnp.ndarray,     # [P, K]
    intr: jnp.ndarray,         # [4]
    key,
    px_threshold: float = 4.0,
    n_hyp: int = 128,
    chunk: int = 32,
):
    """Relative-pose measurement per match edge.

    Returns ``(T_meas [P, 4, 4], weight [P])`` — T_meas maps cam_i coords
    to cam_j (the two-view convention of recover_pose), translation
    normalized to unit length; weight is the cheirality-consistent inlier
    count (0 where the edge is off or the estimate unusable).
    """
    P, K = match_ij.shape
    f_mean = 0.5 * (intr[0] + intr[1])
    thr = px_threshold / f_mean

    pad = (-P) % chunk
    rows = jnp.arange(P + pad, dtype=jnp.int32)
    keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(rows)
    cat = lambda a, fill: jnp.concatenate(
        [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)]) if pad else a
    pi = cat(pair_idx, 0)
    mi = cat(match_ij, 0)
    vi = cat(valid_ij & pair_ok[:, None], False)

    def one(k, pair, mj, v):
        uv1 = keypoints[pair[0]]
        uv2 = keypoints[pair[1]][mj]
        xy1 = pixel_to_normalized(uv1, intr)
        xy2 = pixel_to_normalized(uv2, intr)
        res = estimate_essential(k, xy1, xy2, v, thr, n_hyp=n_hyp)
        T, n_good, _ = recover_pose(res.model, xy1, xy2, res.inliers)
        t = T[:3, 3]
        T = T.at[:3, 3].set(t / jnp.maximum(jnp.linalg.norm(t), 1e-9))
        return T, n_good.astype(jnp.float32)

    def step(_, args):
        return None, jax.vmap(one)(*args)

    n_chunks = (P + pad) // chunk
    resh = lambda a: a.reshape(n_chunks, chunk, *a.shape[1:])
    _, (T, w) = jax.lax.scan(step, None, (resh(keys), resh(pi), resh(mi),
                                          resh(vi)))
    T = T.reshape(-1, 4, 4)[:P]
    w = w.reshape(-1)[:P]
    return T, jnp.where(pair_ok, w, 0.0)


@partial(jax.jit, static_argnames=("n_hyp",))
def loop_pnp_measurements(
    pose: jnp.ndarray,        # [N, 4, 4] current (drifted) world->cam
    points: jnp.ndarray,      # [L, 3]
    lm_valid: jnp.ndarray,    # [L]
    kp2lm: jnp.ndarray,       # [N, K]
    keypoints: jnp.ndarray,   # [N, K, 2]
    pair_idx: jnp.ndarray,    # [P, 2]
    match_ij: jnp.ndarray,    # [P, K]
    valid_ij: jnp.ndarray,    # [P, K]
    intr: jnp.ndarray,        # [4]
    loop_rows: jnp.ndarray,   # [Pl] int32 row ids into the pair axis (-1 pad)
    key,
    px_threshold: float = 4.0,
    n_hyp: int = 256,
):
    """Metric loop-edge measurement: PnP of frame j against frame i's map.

    Essential-matrix translation DIRECTIONS at video baselines are ~10 deg
    noise (measured, N=500 orbit) and carry no scale — too weak to close a
    loop. The SLAM-standard measurement instead registers the revisited
    frame against the 3-D structure the loop START already triangulated:
    frame i's keypoint->landmark links, composed with the verified i->j
    matches, give 3D-2D correspondences in the map frame AROUND i (locally
    consistent even under global drift); MSAC PnP yields T_pnp (map->cam_j)
    and ``T_rel = T_pnp @ pose_i^-1`` — the full relative SE(3), WITH the
    local map's scale, accurate to the local reprojection noise.

    Returns ``(T_rel [Pl, 4, 4], weight [Pl])`` — weight is the PnP inlier
    count (0 for pad rows / failed edges).
    """
    from eacham_tpu.geometry.pnp import solve_pnp_ransac

    K = keypoints.shape[1]

    def one(k, row):
        p = jnp.maximum(row, 0)
        i = pair_idx[p, 0]
        j = pair_idx[p, 1]
        lm = kp2lm[i]                                   # [K]
        on = valid_ij[p] & (lm >= 0) & lm_valid[jnp.maximum(lm, 0)]
        pts3d = points[jnp.maximum(lm, 0)]              # [K, 3]
        uv = keypoints[j][match_ij[p]]                  # [K, 2]
        T_pnp, _, n_inl = solve_pnp_ransac(
            k, pts3d, uv, on, intr, px_threshold, n_hyp=n_hyp)
        T_rel = T_pnp @ inverse_se3(pose[i])
        w = jnp.where(row >= 0, n_inl.astype(jnp.float32), 0.0)
        return T_rel, w

    keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(
        jnp.arange(loop_rows.shape[0], dtype=jnp.int32))

    def step(_, args):
        return None, one(*args)

    _, (T, w) = jax.lax.scan(step, None, (keys, loop_rows))
    return T, w


def _log_so3_np(R: np.ndarray) -> np.ndarray:
    """SO(3) log, batched, host float64 (gradient-free counterpart of
    ``_log_so3`` for the sparse pose-graph solver)."""
    trace = np.trace(R, axis1=-2, axis2=-1)
    cos_t = np.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = np.arccos(cos_t)
    small = theta < 1e-6
    s = np.where(small, 1.0, np.sin(theta))
    k = np.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * s))
    Rd = R - np.swapaxes(R, -1, -2)
    return k[..., None] * np.stack(
        [Rd[..., 2, 1], Rd[..., 0, 2], Rd[..., 1, 0]], axis=-1)


def _exp_so3_np(w: np.ndarray) -> np.ndarray:
    """SO(3) exp, batched, host float64."""
    theta = np.linalg.norm(w, axis=-1)
    small = theta < 1e-8
    th = np.where(small, 1.0, theta)
    a = np.where(small, 1.0 - theta ** 2 / 6.0, np.sin(th) / th)
    b = np.where(small, 0.5 - theta ** 2 / 24.0, (1.0 - np.cos(th)) / th ** 2)
    W = _hat_np(w)
    I = np.broadcast_to(np.eye(3), W.shape)
    return I + a[..., None, None] * W + b[..., None, None] * (W @ W)


def _hat_np(w: np.ndarray) -> np.ndarray:
    O = np.zeros(w.shape[:-1])
    return np.stack([
        np.stack([O, -w[..., 2], w[..., 1]], axis=-1),
        np.stack([w[..., 2], O, -w[..., 0]], axis=-1),
        np.stack([-w[..., 1], w[..., 0], O], axis=-1),
    ], axis=-2)


def _jr_inv_np(phi: np.ndarray) -> np.ndarray:
    """Inverse right Jacobian of SO(3) (batched, float64):
    log(A exp(u^)) ~= log(A) + Jr_inv(log A) u."""
    theta = np.linalg.norm(phi, axis=-1)
    small = theta < 1e-6
    th = np.where(small, 1.0, theta)
    cot = np.where(small, 1.0 / 12.0 + theta ** 2 / 720.0,
                   1.0 / th ** 2 - (1.0 + np.cos(th)) / (2.0 * th * np.sin(th)))
    W = _hat_np(phi)
    I = np.broadcast_to(np.eye(3), W.shape)
    return I + 0.5 * W + cot[..., None, None] * (W @ W)


def _block_triplets(bi, bj, B, rows, cols, vals,
                    stride_r=3, stride_c=3, off_r=0, off_c=0):
    """Append COO triplets for [E, a, b] blocks B at block coords (bi, bj).

    ``stride_r``/``stride_c`` are the per-node variable widths at the
    block's row/col axes; ``off_r``/``off_c`` shift into a larger variable
    vector (e.g. the per-camera scale tail of the center system).
    """
    E, a, b = B.shape
    r = (off_r + stride_r * bi)[:, None, None] + np.arange(a)[None, :, None]
    c = (off_c + stride_c * bj)[:, None, None] + np.arange(b)[None, None, :]
    rows.append(np.broadcast_to(r, (E, a, b)).ravel())
    cols.append(np.broadcast_to(c, (E, a, b)).ravel())
    vals.append(np.ascontiguousarray(B, np.float64).ravel())


def _sparse_solve(rows, cols, vals, n_var, b):
    """Solve the assembled symmetric system H x = b (float64, sparse LU)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.linalg import splu
    H = coo_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(n_var, n_var)).tocsc()
    return splu(H).solve(b)


def _rotation_averaging_host(
    R0: np.ndarray,      # [N, 3, 3] float64 current rotations (world->cam)
    R_meas: np.ndarray,  # [E, 3, 3] measured relative rotations R_j R_i^T
    ii: np.ndarray,      # [E]
    jj: np.ndarray,      # [E]
    sw: np.ndarray,      # [E] sqrt-weight per edge (0 = off)
    free: np.ndarray,    # [N] bool — nodes allowed to move
    rot_sigma: float,
    iters: int,
) -> np.ndarray:
    """Sparse Gauss-Newton/LM rotation averaging on the host in float64.

    Replaces the dense autodiff Jacobian (J was [3E, 3N] — 7+ GB at KITTI
    scale N=4541) with analytic 3x3 blocks: for residual
    r = log(R_meas^T R_j R_i^T),  dr/d(dj) = Jr_inv(r) R_rel^T and
    dr/d(di) = -Jr_inv(r) under left perturbations R <- exp(d^) R. The
    normal equations are a 3Nx3N graph-Laplacian-sparse system solved by
    sparse LU per damped iteration. float64 beats the old fp32 device path
    numerically as well.
    """
    N = R0.shape[0]
    R = R0.copy()
    w_base = (sw / rot_sigma).astype(np.float64)
    on = sw > 0
    rob = np.ones(ii.shape[0])

    def cost_and_parts(R, w_e):
        R_rel = np.einsum("eab,ecb->eac", R[jj], R[ii])      # R_j R_i^T
        A = np.einsum("eba,ebc->eac", R_meas, R_rel)          # R_meas^T R_rel
        r0 = _log_so3_np(A)                                   # [E, 3]
        r = r0 * w_e[:, None]
        return r0, r, R_rel, float(np.sum(r * r))

    def reweight(r0):
        # Geman-McClure IRLS with a MAD scale: measurement sets in the
        # wild mix sub-degree PnP rotations with multi-degree essential-
        # matrix estimates at poor baselines; fixed weights let the tail
        # steer the solve (measured on the fs6 1000-frame dump)
        if on.sum() < 4:
            return np.ones_like(rob)
        rn = np.linalg.norm(r0, axis=-1)
        s = 1.4826 * np.median(rn[on]) + 1e-12
        # wide-threshold trimming, not classic IRLS: full weight inside
        # 3 MAD-sigmas (clean data is untouched), quadratic suppression
        # beyond (the 4-8x garbage vectors of the fs6 dump land at
        # 10-30 sigma and effectively drop out)
        return np.minimum(1.0, (3.0 * s / np.maximum(rn, 1e-12)) ** 2)

    lam = 1e-4
    freen = free.astype(bool)
    eye3 = np.eye(3)
    w_e = w_base
    r0, r, R_rel, cost = cost_and_parts(R, w_e)
    rob = reweight(r0)
    w_e = w_base * np.sqrt(rob)
    r0, r, R_rel, cost = cost_and_parts(R, w_e)
    for _ in range(iters):
        Jri = _jr_inv_np(r0)                                  # [E, 3, 3]
        Jj = w_e[:, None, None] * (Jri @ np.swapaxes(R_rel, -1, -2))
        Ji = -w_e[:, None, None] * Jri
        rows, cols, vals = [], [], []
        _block_triplets(ii, ii, np.einsum("eab,eac->ebc", Ji, Ji),
                        rows, cols, vals)
        _block_triplets(jj, jj, np.einsum("eab,eac->ebc", Jj, Jj),
                        rows, cols, vals)
        Hij = np.einsum("eab,eac->ebc", Ji, Jj)
        _block_triplets(ii, jj, Hij, rows, cols, vals)
        _block_triplets(jj, ii, np.swapaxes(Hij, -1, -2), rows, cols, vals)
        g = np.zeros((N, 3))
        np.add.at(g, ii, np.einsum("eab,ea->eb", Ji, r))
        np.add.at(g, jj, np.einsum("eab,ea->eb", Jj, r))
        # diagonal scale for LM damping + hard prior pinning non-free nodes
        diag = np.zeros(N)
        np.add.at(diag, ii, np.einsum("eab,eab->e", Ji, Ji) / 3.0)
        np.add.at(diag, jj, np.einsum("eab,eab->e", Jj, Jj) / 3.0)
        scale = max(float(diag.max()), 1.0)
        pin = np.where(freen, 0.0, 1e8 * scale)
        for trial in range(4):
            d = (lam * scale) + pin
            nid = np.arange(N)
            _block_triplets(nid, nid, d[:, None, None] * eye3[None],
                            rows, cols, vals)
            dx = _sparse_solve(rows, cols, vals, 3 * N, -g.ravel())
            rows, cols, vals = rows[:-1], cols[:-1], vals[:-1]
            dxn = dx.reshape(N, 3)
            dxn[~freen] = 0.0
            R_new = _exp_so3_np(dxn) @ R
            r0_n, r_n, R_rel_n, cost_n = cost_and_parts(R_new, w_e)
            if cost_n < cost:
                R, r0, r, R_rel, cost = R_new, r0_n, r_n, R_rel_n, cost_n
                lam = max(lam * 0.3, 1e-9)
                # refresh the robust weights at the accepted state
                rob = reweight(r0)
                w_e = w_base * np.sqrt(rob)
                r0, r, R_rel, cost = cost_and_parts(R, w_e)
                break
            lam = min(lam * 10.0, 1e6)
        if cost <= 1e-18:
            break
    return R


def _log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) log (batched) — rotation-residual coordinates.

    Gradient-safe at R -> I (the converged state the optimizer DIFFERENTIATES
    through): arccos has an infinite derivative at cos=1, and the NaN leaks
    through jnp.where from the unselected branch, so the small-angle branch
    feeds arccos a safe constant and expresses the Taylor form directly in
    cos(theta) (theta^2 ~ 2(1-cos) near zero).
    """
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-6, 1.0)
    small = cos_t > 1.0 - 1e-5
    cos_safe = jnp.where(small, 0.0, cos_t)
    theta = jnp.arccos(cos_safe)
    k = jnp.where(small, 0.5 + (1.0 - cos_t) / 6.0,
                  theta / (2.0 * jnp.sin(theta)))
    Rd = R - jnp.swapaxes(R, -1, -2)
    return k[..., None] * jnp.stack(
        [Rd[..., 2, 1], Rd[..., 0, 2], Rd[..., 1, 0]], axis=-1)


def optimize_pose_graph(
    poses: jnp.ndarray,       # [N, 4, 4] world->cam
    pose_valid: jnp.ndarray,  # [N]
    pose_fixed: jnp.ndarray,  # [N] gauge anchors (at least one valid)
    pair_idx: jnp.ndarray,    # [P, 2]
    T_meas: jnp.ndarray,      # [P, 4, 4] unit-translation relative poses
    weight: jnp.ndarray,      # [P] measurement confidence (0 = unused)
    iters: int = 12,
    rot_sigma: float = 0.02,   # rad — relative-rotation noise scale
    dir_sigma: float = 0.05,   # unit-vector noise scale
    min_weight: float = 20.0,
    loop_rows: jnp.ndarray | None = None,   # [Pl] rows with PnP measurements
    T_loop: jnp.ndarray | None = None,      # [Pl, 4, 4] metric relative SE(3)
    w_loop: jnp.ndarray | None = None,      # [Pl] PnP inlier counts
    min_loop_weight: float = 30.0,
    local_span: int = 15,
):
    """Damped Gauss-Newton over all poses; returns refined [N, 4, 4].

    Residuals per edge (i, j): log(R_meas^T R_j R_i^T) / rot_sigma and
    (unit(t_rel) - t_meas) / dir_sigma, both scaled by sqrt(weight).
    Translation directions leave the global scale free — the update is
    followed by a similarity re-scaling about the anchor camera so the
    map's scale is preserved for the downstream re-triangulation.

    When ``loop_rows``/``T_loop``/``w_loop`` (from ``loop_pnp_measurements``)
    are given, those edges carry full metric relative SE(3) — their
    rotations replace the essential-matrix ones in stage 1, and stage 2
    constrains the center difference as a VECTOR (direction AND length in
    the loop-start section's scale) instead of a direction projector.
    """
    N = poses.shape[0]
    dt = poses.dtype
    R_meas = T_meas[:, :3, :3]
    has_loop_pnp = (
        loop_rows is not None and T_loop is not None and w_loop is not None
        and loop_rows.shape[0] > 0
    )
    if has_loop_pnp:
        lr_safe = jnp.maximum(loop_rows, 0)
        ok_l = (loop_rows >= 0) & (w_loop >= min_loop_weight)
        R_meas = R_meas.at[lr_safe].set(jnp.where(
            ok_l[:, None, None], T_loop[:, :3, :3], R_meas[lr_safe]))
        weight = weight.at[lr_safe].set(jnp.where(
            ok_l, jnp.maximum(weight[lr_safe], w_loop), weight[lr_safe]))
    on = pose_valid[pair_idx[:, 0]] & pose_valid[pair_idx[:, 1]] & (
        weight >= min_weight)
    # compact the edge axis to the active rows on the host: the candidate
    # table is mostly dead edges (padding + failed matches), and the
    # rotation stage's Jacobian memory scales with the edge count — at
    # P=8192 the uncompacted jacobian OOMs a 16 GB chip (measured 25.2 G)
    keep = np.where(np.asarray(on))[0]
    if keep.size == 0:
        return poses
    if has_loop_pnp:
        # remap loop-row ids into the compacted axis
        remap = np.full(int(pair_idx.shape[0]), -1, np.int64)
        remap[keep] = np.arange(keep.shape[0])
        lrn0 = np.asarray(loop_rows)
        loop_rows = jnp.asarray(np.where(
            lrn0 >= 0, remap[np.maximum(lrn0, 0)], -1).astype(np.int32))
    keep_j = jnp.asarray(keep)
    pair_idx = pair_idx[keep_j]
    T_meas = T_meas[keep_j]
    R_meas = R_meas[keep_j]
    weight = weight[keep_j]
    on = on[keep_j]
    sw = jnp.sqrt(jnp.where(on, weight, 0.0))
    sw = sw / jnp.maximum(jnp.max(sw), 1e-9)
    t_meas = T_meas[:, :3, 3]
    free = pose_valid & (~pose_fixed)
    ii = pair_idx[:, 0]
    jj = pair_idx[:, 1]
    R0 = poses[:, :3, :3]

    # ---- stage 1: rotation averaging (sparse GN/LM over SO(3)^N, host) ------
    # The dense autodiff Jacobian this used to build ([3E, 3N] via jacfwd)
    # dies at KITTI scale (N=4541, E~50k: 7.4 GB in fp32); the analytic
    # block-sparse float64 host solve handles it in seconds and is the
    # numerically stronger choice besides (fp32 rotation noise at 1e-7
    # is visible in stage 2's soft bending modes — see below).
    iin = np.asarray(ii)
    jjn = np.asarray(jj)
    freen_ = np.asarray(free)
    R_new64 = _rotation_averaging_host(
        np.asarray(R0, np.float64), np.asarray(R_meas, np.float64),
        iin, jjn, np.asarray(sw, np.float64), freen_, rot_sigma, iters)
    R_new = jnp.asarray(R_new64, dt)

    # ---- stage 2: camera centers from translation directions (LINEAR) -------
    # t_rel = R_j (c_i - c_j), so each edge constrains the center difference
    # to the known direction d = R_j^T t_meas: minimize
    # sum w || (I - d d^T)(c_i - c_j) ||^2 — convex, one sparse 3N solve.
    # formed AND solved on the HOST in float64: the direction system is
    # parallel-rigid but its soft bending modes sit ~1e-6 below the matrix
    # norm — fp32 rounding in the projectors alone (1e-7) perturbs those
    # modes into the gauge nullspace and the drift survives in exactly
    # those modes. A float64 sparse solve per reconstruction is host-trivial.
    R64 = R_new64
    t64 = np.asarray(t_meas, np.float64)
    t64 /= np.maximum(np.linalg.norm(t64, axis=-1, keepdims=True), 1e-12)
    dn = np.einsum("pji,pj->pi", R64[jjn], t64)           # R_j^T t_meas
    w2 = np.asarray(sw, np.float64) ** 2
    centers = lambda T: -jnp.einsum("nij,ni->nj", T[:, :3, :3], T[:, :3, 3])
    c0 = centers(poses)
    c0n = np.asarray(c0, np.float64)

    # Direction-only constraints leave near-zero bending modes that even
    # 1e-7 rotation noise excites; trusting drifted magnitudes instead
    # just reproduces the drift. The linear Sim3-style middle ground:
    # per-camera scale variables sigma_i, with short-range edges
    # constraining (c_i - c_j) = sigma_i * m_e * d_e (m_e = current
    # baseline, d_e = measured direction) — locally rigid SHAPE, smoothly
    # re-scalable along the trajectory — and long-range (loop) edges
    # contributing direction-only projector terms that pin global shape
    # and, through them, the sigma field. Jointly LINEAR in (c, sigma):
    # one (3N+N) float64 solve.
    span = np.abs(jjn - iin)
    local = span <= local_span
    m_e = np.linalg.norm(c0n[iin] - c0n[jjn], axis=-1)
    # PnP loop edges: full metric center-difference vectors. The PnP
    # translation lives in the LOOP-START section's local map scale, so it
    # couples to sigma_i exactly like the local reconstruction vectors do.
    P_edges = iin.shape[0]
    has_pnp = np.zeros(P_edges, bool)
    v_pnp = np.zeros((P_edges, 3))
    if has_loop_pnp:
        lrn = np.asarray(loop_rows)
        wln = np.asarray(w_loop)
        Tln = np.asarray(T_loop, np.float64)
        sel = (lrn >= 0) & (wln >= min_loop_weight)
        rows = lrn[sel]
        # center of cam_j in cam_i coordinates: c_j^(i) = -R_rel^T t_rel,
        # then to world through the CORRECTED rotation of i
        cji = -np.einsum("pji,pj->pi", Tln[sel, :3, :3], Tln[sel, :3, 3])
        has_pnp[rows] = True
        v_pnp[rows] = np.einsum("pji,pj->pi", R64[iin[rows]], cji)
    # Which direction to trust for local edges is decided EMPIRICALLY:
    # the angle between the E-measured direction and the reconstruction's
    # local displacement sums the two independent error sources, so tight
    # agreement can only mean the measurements are good — use them (they
    # are unbiased; this is what recovers a drifted trajectory from exact
    # relative measurements). Large disagreement at video baselines means
    # E-direction noise (~10 deg measured on the N=500 stress) — fall
    # back to the reconstruction's locally-rigid shape, the camera-frame
    # displacement R_old_j (c_i - c_j) the windowed BA got RIGHT locally,
    # re-expressed through the CORRECTED rotation so the averaged-rotation
    # heading fix integrates into the positions. Loop edges keep the
    # measured directions either way (their information is irreplaceable),
    # with a noise scale tied to the same empirical estimate.
    d_cur = c0n[iin] - c0n[jjn]
    d_cur /= np.maximum(np.linalg.norm(d_cur, axis=-1, keepdims=True), 1e-12)
    cos_md = np.clip(np.sum(d_cur * dn, axis=-1), -1.0, 1.0)
    th_loc = np.arccos(cos_md)[local & (w2 > 0)]
    theta_med = float(np.median(th_loc)) if th_loc.size else 0.2
    use_meas = theta_med < np.deg2rad(3.0)
    if not use_meas:
        R_old64 = np.asarray(poses[:, :3, :3], np.float64)
        u_cam = np.einsum("pij,pj->pi", R_old64[jjn], c0n[iin] - c0n[jjn])
        d_local = np.einsum("pji,pj->pi", R64[jjn], u_cam)
        d_local /= np.maximum(
            np.linalg.norm(d_local, axis=-1, keepdims=True), 1e-12)
        dn = np.where(local[:, None], d_local, dn)
    eye3 = np.eye(3)
    n_var = 3 * N + N
    freen = freen_

    # When the measured directions are trusted, the solve is refined by
    # re-estimating the edge baselines m_e from the solved centers and
    # solving again — the drifted magnitudes are the last bias, and with
    # unbiased directions the fixed point is the measurement-consistent
    # shape (verified: drift recovery 0.065 -> 0.03 on the 48-orbit test).
    cn_cur = c0n
    sg_cur = np.ones(N)
    # IRLS: the a-priori sigmas model the TYPICAL edge; the long-range
    # PnP vectors at near-coincident revisits are measured to carry
    # relative errors of 4-8x (fs6 dump analysis — PnP noise >> true
    # baseline), and any fixed sigma either drowns them or lets them
    # drag the trajectory (measured: consistency 13.6 -> 53.9 deg).
    # Geman-McClure weights with per-class MAD-estimated scales let the
    # data itself say which vectors are trustworthy.
    def _trim(r_all, vec, rest):
        rob = np.ones(P_edges)
        for cls in (vec & has_pnp, vec & ~has_pnp, rest):
            cls = cls & (w2 > 0)
            if cls.sum() >= 4:
                s_ = 1.4826 * np.median(np.abs(r_all[cls])) + 1e-12
                rob[cls] = np.minimum(
                    1.0, (3.0 * s_ / np.maximum(r_all[cls], 1e-12)) ** 2)
        return rob

    def _residuals(cn, sg, m_e, vec, rest):
        r_all = np.zeros(P_edges)
        dvec = cn[iin] - cn[jjn]
        lv_all = np.where(has_pnp[:, None], -v_pnp, m_e[:, None] * dn)
        r_all[vec] = np.linalg.norm(
            dvec[vec] - sg[iin[vec], None] * lv_all[vec], axis=-1)
        Pp = np.eye(3)[None] - dn[:, :, None] * dn[:, None, :]
        r_all[rest] = np.linalg.norm(
            np.einsum("eab,eb->ea", Pp[rest], dvec[rest]), axis=-1)
        return r_all

    # pre-trim at the INITIAL configuration: the current poses are
    # locally right, so a garbage metric vector already sticks out
    # against them — without this, pass 1 is dragged far enough that the
    # post-solve MAD can no longer separate signal from garbage
    # (measured: 15% injected 5-unit outliers pushed recovery 0.14 -> 7.2)
    vec0 = local | has_pnp
    m_e0 = np.linalg.norm(c0n[iin] - c0n[jjn], axis=-1)
    rob = _trim(_residuals(c0n, np.ones(N), m_e0, vec0, ~vec0), vec0, ~vec0)
    for _pass in range(3):
        m_e = np.linalg.norm(cn_cur[iin] - cn_cur[jjn], axis=-1) \
            if use_meas else np.linalg.norm(c0n[iin] - c0n[jjn], axis=-1)
        # Per-constraint noise models, NOT raw inlier counts: local
        # full-vector constraints are tight (~2% of their baseline — the
        # window BA keeps local geometry consistent), while essential-matrix
        # translation DIRECTIONS at video baselines are noisy (~0.2 rad
        # median observed on the N=500 stress). Equal weighting lets the
        # noisy directions drag the solution (measured: PGO made ATE
        # worse); 1/sigma^2 weighting lets them bend only the low-frequency
        # modes where the local constraints are soft.
        m_med = max(np.median(m_e[local]) if local.any() else 1.0, 1e-6)
        # floor the per-edge sigmas at a healthy fraction of the median
        # baseline: near-zero-baseline edges otherwise get ~1e9 weights that
        # dominate every scale in the system (including the "weak" priors)
        sig_local = 0.02 * np.maximum(m_e, 0.1 * m_med)
        dir_coef = float(np.clip(3.0 * theta_med, 0.03, 0.25))
        sig_dir = dir_coef * np.maximum(m_e, m_med)
        w_local = (w2 > 0) / (sig_local ** 2)
        w_dir = (w2 > 0) / (sig_dir ** 2)

        # full-vector sigma-coupled edges: local reconstruction vectors plus
        # PnP loop vectors — residual r = (c_i - c_j) - sigma_i v_e.
        # The PnP center error scales with the local MAP DEPTH (reprojection
        # noise back-projected), NOT with the edge baseline: flooring sigma
        # at a fraction of the baseline gave near-coincident revisit edges
        # (true baseline ~0.1 of the frame step) weights 16x above every
        # local edge, and 90 such noise-direction vectors bent an ATE-1.1
        # reconstruction to ATE 9 (N=500 orbit, measured). Floor at half
        # the median local baseline — a proxy for percent-of-depth noise.
        sig_pnp = 0.05 * np.maximum(np.linalg.norm(v_pnp, axis=-1),
                                    0.5 * m_med)
        w_pnp = (w2 > 0) / (sig_pnp ** 2)
        vec = local | has_pnp
        li = iin[vec]
        lj = jjn[vec]
        lw = np.where(has_pnp[vec], w_pnp[vec], w_local[vec]) * rob[vec]
        lv = np.where(has_pnp[vec, None], -v_pnp[vec],
                      m_e[vec, None] * dn[vec])            # [El, 3]
        # vectorized COO assembly (the per-edge Python loop this replaces
        # ran ~10^5 iterations at KITTI N=4541, and the dense (3N+N)^2
        # float64 H alone was ~2.6 GB; the triplet build is O(E) numpy and
        # the sparse LU scales with the graph's bandwidth)
        rows, cols, vals = [], [], []
        wI = lw[:, None, None] * eye3[None]                # [El, 3, 3]
        _block_triplets(li, li, wI, rows, cols, vals)
        _block_triplets(lj, lj, wI, rows, cols, vals)
        _block_triplets(li, lj, -wI, rows, cols, vals)
        _block_triplets(lj, li, -wI, rows, cols, vals)
        wv = (lw[:, None] * lv)[:, :, None]                # [El, 3, 1]
        sig_kw = dict(stride_c=1, off_c=3 * N)
        sig_kw_t = dict(stride_r=1, off_r=3 * N)
        _block_triplets(li, li, -wv, rows, cols, vals, **sig_kw)
        _block_triplets(li, li, -np.swapaxes(wv, 1, 2), rows, cols, vals,
                        **sig_kw_t)
        _block_triplets(lj, li, wv, rows, cols, vals, **sig_kw)
        _block_triplets(li, lj, np.swapaxes(wv, 1, 2), rows, cols, vals,
                        **sig_kw_t)
        ws = (lw * np.einsum("ea,ea->e", lv, lv))[:, None, None]
        _block_triplets(li, li, ws, rows, cols, vals,
                        stride_r=1, stride_c=1, off_r=3 * N, off_c=3 * N)
        # remaining loop edges (no PnP): direction projector on (c_i - c_j)
        Pproj = eye3[None] - dn[:, :, None] * dn[:, None, :]
        rest = ~vec
        gi = iin[rest]
        gj = jjn[rest]
        gP = Pproj[rest] * (w_dir[rest] * rob[rest])[:, None, None]
        _block_triplets(gi, gi, gP, rows, cols, vals)
        _block_triplets(gj, gj, gP, rows, cols, vals)
        _block_triplets(gi, gj, -gP, rows, cols, vals)
        _block_triplets(gj, gi, -gP, rows, cols, vals)
        # priors: anchor fixed/invalid centers hard, free weakly; sigma -> 1
        # (hard on the anchor, weak everywhere to bound unobserved scales)
        b = np.zeros(n_var)
        wmax = max(np.median(w_local[local & (w2 > 0)])
                   if (local & (w2 > 0)).any() else 1.0, 1.0)
        prior_c = np.where(freen, 1e-8 * wmax, 1e3 * wmax)
        nid = np.arange(N)
        _block_triplets(nid, nid, prior_c[:, None, None] * eye3[None],
                        rows, cols, vals)
        b[:3 * N] += (prior_c[:, None] * c0n).ravel()
        prior_s = np.where(freen, 1e-6 * wmax, 1e3 * wmax)
        _block_triplets(nid, nid, prior_s[:, None, None], rows, cols, vals,
                        stride_r=1, stride_c=1, off_r=3 * N, off_c=3 * N)
        b[3 * N:] += prior_s * 1.0
        sol = _sparse_solve(rows, cols, vals, n_var, b)
        cn_cur = sol[:3 * N].reshape(N, 3)
        sg_cur = sol[3 * N:]
        # robust multipliers for the next pass (floored by the pre-trim:
        # an edge the initial state already called garbage stays down
        # even if the dragged solution happens to fit it)
        rob = np.minimum(
            rob, _trim(_residuals(cn_cur, sg_cur, m_e, vec, rest),
                       vec, rest))
    c_new = jnp.asarray(cn_cur, dt)

    # restore the original map scale about the anchor camera
    anchor = jnp.argmax(pose_fixed & pose_valid)
    d0 = jnp.where(pose_valid, jnp.linalg.norm(c0 - c0[anchor], axis=-1), 0.0)
    d1 = jnp.where(pose_valid,
                   jnp.linalg.norm(c_new - c_new[anchor], axis=-1), 0.0)
    s = jnp.sum(d0 * d1) / jnp.maximum(jnp.sum(d1 * d1), 1e-9)
    c_new = c_new[anchor] + s * (c_new - c_new[anchor])
    c_new = jnp.where(free[:, None], c_new, c0)

    # (no joint fp32 polish: after the exact two-stage solve it can only
    # wander within the soft bending modes fp32 cannot resolve)
    c_new = jnp.where(free[:, None], c_new, c0)
    T_out = jnp.zeros_like(poses)
    T_out = T_out.at[:, :3, :3].set(R_new)
    T_out = T_out.at[:, :3, 3].set(-jnp.einsum("nij,nj->ni", R_new, c_new))
    T_out = T_out.at[:, 3, 3].set(1.0)
    return jnp.where(pose_valid[:, None, None], T_out, poses)


def loop_consistency(
    poses,          # [N, 4, 4]
    pair_idx,       # [P, 2]
    loop_rows,      # [Pl]
    T_loop,         # [Pl, 4, 4] metric PnP measurements
    w_loop,         # [Pl]
    min_weight: float = 30.0,
) -> float:
    """Mean deviation (degrees) of the loop PnP measurements from the
    relative poses implied by ``poses`` — rotation angle plus
    translation-direction angle (scale-free: the measurement's scale is
    the local section's, which a global pose set need not share).

    The pipeline applies a pose-graph correction only if this number
    IMPROVES: a PGO that cannot explain its own loop measurements better
    than the input did would only destabilize the map (observed r2:
    direction-only PGO pushed ATE 6.8 -> 10.1 on the N=500 orbit).
    Returns +inf when no loop edge passes the weight gate.
    """
    lrn = np.asarray(loop_rows)
    wln = np.asarray(w_loop)
    sel = (lrn >= 0) & (wln >= min_weight)
    if not sel.any():
        return float("inf")
    rows = lrn[sel]
    Tl = np.asarray(T_loop, np.float64)[sel]
    T = np.asarray(poses, np.float64)
    pi = np.asarray(pair_idx)
    i, j = pi[rows, 0], pi[rows, 1]
    Ri = T[i, :3, :3]
    rel = np.einsum("pab,pcb->pac", T[j, :3, :3], Ri)        # R_j R_i^T
    # rotation residual
    Rr = np.einsum("pab,pcb->pac", rel, Tl[:, :3, :3])
    cosr = np.clip((np.trace(Rr, axis1=1, axis2=2) - 1.0) * 0.5, -1.0, 1.0)
    rot_deg = np.degrees(np.arccos(cosr))
    # translation-direction residual (c_j in cam_i frame), weighted by the
    # measured baseline: at a near-coincident revisit the TRUE baseline is
    # a fraction of the PnP noise, so the angle between two ~zero vectors
    # is meaningless (measured: 46 deg median on span-480 edges whose
    # relative poses were sub-degree correct) — those edges carry rotation
    # information only
    a = np.einsum("pab,pb->pa", Ri, centers_of(T)[j] - centers_of(T)[i])
    b = -np.einsum("pba,pb->pa", Tl[:, :3, :3], Tl[:, :3, 3])
    an = np.linalg.norm(a, axis=1)
    bn = np.linalg.norm(b, axis=1)
    ok = (an > 1e-9) & (bn > 1e-9)
    dir_deg = np.zeros(len(rows))
    dir_deg[ok] = np.degrees(np.arccos(np.clip(
        (a[ok] * b[ok]).sum(1) / (an[ok] * bn[ok]), -1.0, 1.0)))
    b_ref = max(float(np.median(bn)), 1e-9)
    dir_w = np.minimum(bn / b_ref, 1.0)
    ww = wln[sel]
    return float(np.sum(ww * (rot_deg + dir_w * dir_deg)) / np.sum(ww))


def centers_of(T: np.ndarray) -> np.ndarray:
    """Camera centers of world->cam matrices (host-side helper)."""
    return -np.einsum("nij,ni->nj", T[:, :3, :3], T[:, :3, 3])


def rebuild_map(
    scene: Scene,
    fp_tbl: jnp.ndarray,   # [N, D] frame_pair_table
    max_repr_error: float,
    min_tri_angle: float,
    max_observers: int = 12,
    segment: int = 128,
):
    """Wipe the landmark table and re-run the merge/triangulation pass for
    every registered frame under the (pose-graph-corrected) poses.

    Links that drift previously forced apart — in particular every loop
    closure — now pass the reprojection gates and connect into long
    tracks, giving the final global BA its long-range constraints.
    """
    N, K = scene.kp_mask.shape
    scene = scene._replace(
        kp2lm=jnp.full((N, K), -1, jnp.int32),
        lm_valid=jnp.zeros_like(scene.lm_valid),
        lm_two_view=jnp.zeros_like(scene.lm_two_view),
        points=jnp.zeros_like(scene.points),
        n_landmarks=jnp.zeros_like(scene.n_landmarks),
    )

    @partial(jax.jit, static_argnames=("max_observers",))
    def span(scene, lo, hi, max_observers):
        def body(f, s):
            fi = jnp.int32(f)

            def tri(s):
                s, _, _ = triangulate_frame(
                    s, fi, fp_tbl[f], jnp.int32(2), max_repr_error,
                    min_tri_angle, max_observers=max_observers,
                )
                return s

            # unregistered frames carry an invalid pose; running the pass
            # for them forces that pose in as a self-observer (rejecting
            # good neighbor tracks) and can merge-link their keypoints
            # under a garbage reprojection
            return jax.lax.cond(s.pose_valid[fi], tri, lambda s: s, s)

        return jax.lax.fori_loop(lo, hi, body, scene)

    for lo in range(0, N, segment):
        scene = span(scene, jnp.int32(lo), jnp.int32(min(lo + segment, N)),
                     max_observers=max_observers)
    return scene
