"""Bundle adjustment: batched Levenberg-Marquardt with an implicit Schur
complement solved by block-Jacobi-preconditioned CG.

TPU-native replacement for the reference's GTSAM factor graph
(modules/sfm/reconstruction/BundleAdjuster.cpp):

  * GeneralSFMFactor2<Cal3_S2> reprojection factors (Huber 3.0 on a
    1.5 px isotropic noise, cpp:89-98)      -> whitened+IRLS residual arrays
  * per-pose Huber(2.5) priors (sigma rot 45deg, pos 0.35; fixed nodes
    hard, cpp:60-77)                         -> anchored se(3) prior terms
                                                (+ hard masking for fixed)
  * per-landmark Huber(3/obs) priors sigma 1/obs (cpp:100-117)
                                             -> anchored point prior terms
  * shared Cal3_S2 with prior sigmas (25, 25, ~0, ~0, ~0) (cpp:171-178)
                                             -> (fx, fy) global block, fixed
                                                skew/principal point
  * LM with Ceres defaults / optional PCG + BlockJacobi (cpp:182-214)
                                             -> lax.while_loop LM around an
                                                implicit-Schur PCG solve

Design: the landmark blocks are eliminated in closed form (batched 3x3
inverses); the reduced camera system S = U - W V^-1 W^T is *never formed* —
PCG applies it matrix-free via two segment-sums over the observation table
per iteration. All hot math is batched 2x6 / 2x3 / 3x3 / 6x6 einsums —
MXU/VPU-friendly — and every array is statically shaped and masked, which is
also exactly the form that shards over a device mesh (obs axis sharded,
psum over the segment sums; see eacham_tpu.parallel.ba).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from eacham_tpu.geometry.linalg import inv3x3
from eacham_tpu.geometry.se3 import exp_se3, log_se3

_EPS = 1e-12

# Noise model constants mirroring BundleAdjuster.cpp
PX_SIGMA = 1.5            # isotropic pixel sigma (cpp:89)
PX_HUBER = 3.0            # Huber k on whitened pixel error (cpp:91)
POSE_SIGMA_ROT = 45.0 * np.pi / 180.0   # (cpp:60)
POSE_SIGMA_POS = 0.35
POSE_HUBER = 2.5
K_SIGMA = 25.0            # fx, fy prior sigma (cpp:174-175)


class BAProblem(NamedTuple):
    """Struct-of-arrays bundle-adjustment problem (padded + masked)."""

    poses: jnp.ndarray       # [N, 4, 4] world->cam
    points: jnp.ndarray      # [L, 3]
    intr: jnp.ndarray        # [4] fx fy cx cy (shared camera)
    obs_cam: jnp.ndarray     # [O] int32
    obs_pt: jnp.ndarray      # [O] int32
    obs_uv: jnp.ndarray      # [O, 2] pixels
    obs_mask: jnp.ndarray    # [O] bool
    cam_in_ba: jnp.ndarray   # [N] bool — cameras being optimized
    cam_fixed: jnp.ndarray   # [N] bool — gauge-fixed cameras (zero update)
    pt_in_ba: jnp.ndarray    # [L] bool — landmarks being optimized
    pt_obs_count: jnp.ndarray  # [L] float — total observers (for the prior)
    # Optional ABSOLUTE pose references (GPS priors / surveyed cameras):
    # tight se(3) anchors to externally-known poses, the measurement class
    # that removes the low-frequency drift modes living in the near-
    # nullspace of all relative measurements (SCALING.md r4 observability
    # analysis). None = no absolute references (the reference-parity
    # default; the reference has none either).
    abs_pose: jnp.ndarray | None = None   # [N, 4, 4] world->cam anchors
    abs_mask: jnp.ndarray | None = None   # [N] bool — which cams anchored


class BAConfig(NamedTuple):
    max_iters: int = 50
    tolerance: float = 1e-5       # relative cost-decrease stop (maxTolerance)
    cg_iters: int = 30
    cg_tol: float = 1e-6
    lambda_init: float = 1e-4
    lambda_min: float = 1e-10
    lambda_max: float = 1e8
    use_pose_priors: bool = True
    use_point_priors: bool = True
    # "pcg": implicit Schur + block-Jacobi PCG (scales to any L, shards).
    # "dense": materialize the reduced [6N+2] camera system and solve it
    #   directly — one einsum + one dense solve per LM iteration instead of
    #   ~cg_iters sequential operator applications; the TPU-right choice
    #   whenever W = [L, N, 6, 3] fits (L * N * 72 bytes), e.g. every local
    #   BA and small-to-mid global BA.
    # "auto": dense when the W tensor is under dense_budget_bytes, counted
    # in PHYSICAL (tiled) bytes: TPU tiles the minor (6, 3) dims of each
    # [L*N, 6, 3] block to (8, 128), a ~7x inflation over the logical
    # size. Several W-sized tensors live per LM iteration, and oversized
    # buffers crash the TPU worker outright (observed at lm_capacity
    # 65536 x 16 cams = 4.3 GB tiled per tensor). The 1.25 GB default
    # admits the standard local window (16 cams x 16384 landmarks
    # = 1.07 GB tiled) and routes anything larger to the implicit PCG path.
    solver: str = "auto"
    dense_budget_bytes: int = 1_342_177_280  # 1.25 GiB of tiled W
    # dense path: >0 = Jacobi-CG iterations on the materialized system
    # (latency-optimal on TPU); 0 = exact Cholesky solve
    dense_cg_iters: int = 64
    # "lm" (Levenberg-Marquardt damping) or "dogleg" (Powell trust region) —
    # the two optimizer methods the reference's config selects between
    # (OptimizerConfig::method, BundleAdjuster.cpp:182-214)
    method: str = "lm"
    trust_radius_init: float = 1.0   # DogLeg delta (OptimizerConfig::delta)
    # absolute-anchor noise (used only when BAProblem.abs_pose is set):
    # ~0.6 deg / 0.01 scene units — trusted external references
    abs_sigma_rot: float = 0.01
    abs_sigma_pos: float = 0.01


def _huber_sqrt_weight(r_norm: jnp.ndarray, k: float) -> jnp.ndarray:
    """sqrt of the IRLS weight for a Huber M-estimator on whitened norm."""
    return jnp.sqrt(jnp.minimum(1.0, k / jnp.maximum(r_norm, _EPS)))


def _obs_linearize_t(poses, points, intr, p: BAProblem):
    """Per-observation whitened residuals + Jacobians, TRANSPOSED layout.

    Returns r [2,O], Jc [2,6,O], Jp [2,3,O], Jk [2,2,O], w_mask [O].

    The observation axis is the MINOR (lane) dim of every array: TPU
    tiles the last two dims of a materialized tensor to (8, 128), so a
    standard [O, 2, 6] Jacobian physically occupies ~85x its logical
    bytes once a consumer forces it resident, and even the [O, 4, 4]
    pose gather of ba_cost inflates 16x — measured 8.6 GB for the cost
    alone at the KITTI-scale O=2.1M (r3). With [.., O] layouts the same
    code compiles to 1.26 GB.
    """
    # pack [R(9) | t(3)] per camera (row-major R), transpose once (tiny)
    P_t = jnp.concatenate(
        [poses[:, :3, :3].reshape(-1, 9), poses[:, :3, 3]], axis=1).T
    Tg = P_t[:, p.obs_cam]                        # [12, O]
    R = Tg[:9].reshape(3, 3, p.obs_cam.shape[0])
    t_cam = Tg[9:]
    X = points.T[:, p.obs_pt]                     # [3, O]
    # broadcast-sum, NOT einsum: a dot_general with the O axis as its
    # batch dim makes XLA transpose operands into [O, a, b] layouts
    # (tiled 42-85x) — measured 6.6 GB of temp at O=2.1M from these
    # tiny contractions alone
    pc = jnp.sum(R * X[None], axis=1) + t_cam     # [3, O]
    z = pc[2]
    good = p.obs_mask & p.cam_in_ba[p.obs_cam] & p.pt_in_ba[p.obs_pt] & (z > 1e-4)
    z_safe = jnp.where(z > 1e-4, z, 1.0)
    inv_z = 1.0 / z_safe
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    u = fx * pc[0] * inv_z + cx
    v = fy * pc[1] * inv_z + cy
    r = jnp.stack([u, v], 0) - p.obs_uv.T         # [2, O] pixels

    # whiten + robustify
    r_w = r / PX_SIGMA
    w = _huber_sqrt_weight(jnp.sqrt(jnp.sum(r_w * r_w, 0)), PX_HUBER)
    w = jnp.where(good, w, 0.0)

    zeros = jnp.zeros_like(z)
    J_pc = jnp.stack([
        jnp.stack([fx * inv_z, zeros, -fx * pc[0] * inv_z * inv_z], 0),
        jnp.stack([zeros, fy * inv_z, -fy * pc[1] * inv_z * inv_z], 0),
    ], 0)                                          # [2, 3, O]

    # left-perturbation of the pose: dpc/d(omega, v) = [-[pc]_x | I]
    one = jnp.ones_like(z)
    hat_t = jnp.stack([
        jnp.stack([zeros, pc[2], -pc[1]], 0),
        jnp.stack([-pc[2], zeros, pc[0]], 0),
        jnp.stack([pc[1], -pc[0], zeros], 0),
    ], 0)                                          # [3, 3, O] = -hat(pc)
    eye_t = jnp.stack([
        jnp.stack([one, zeros, zeros], 0),
        jnp.stack([zeros, one, zeros], 0),
        jnp.stack([zeros, zeros, one], 0),
    ], 0)
    dpc_dxi = jnp.concatenate([hat_t, eye_t], axis=1)   # [3, 6, O]
    Jc = jnp.sum(J_pc[:, :, None, :] * dpc_dxi[None], axis=1)  # [2,6,O]
    Jp = jnp.sum(J_pc[:, :, None, :] * R[None], axis=1)        # [2,3,O]
    Jk = jnp.stack([
        jnp.stack([pc[0] * inv_z, zeros], 0),
        jnp.stack([zeros, pc[1] * inv_z], 0),
    ], 0)                                          # [2, 2, O] d(u,v)/d(fx,fy)

    scale = (w / PX_SIGMA)[None]
    r_out = r_w * w[None]
    return (r_out, Jc * scale[None], Jp * scale[None], Jk * scale[None], w)


def _obs_linearize(poses, points, intr, p: BAProblem):
    """Standard-layout wrapper (dense/dogleg paths on window-sized O —
    the transpose materializes the tiled [O, 2, 6] form, fine at local
    sizes, prohibitive at global ones; see _obs_linearize_t).

    Returns r [O,2], Jc [O,2,6], Jp [O,2,3], Jk [O,2,2], w_mask [O].
    """
    r_t, Jc_t, Jp_t, Jk_t, w = _obs_linearize_t(poses, points, intr, p)
    return (r_t.T, Jc_t.transpose(2, 0, 1), Jp_t.transpose(2, 0, 1),
            Jk_t.transpose(2, 0, 1), w)


def _prior_terms(poses, points, intr, p: BAProblem, anchors, cfg: BAConfig):
    """Whitened anchored-prior residuals and (diagonal) Jacobian scales.

    Pose prior: r = Log(T T0^-1) / sigma with Huber(2.5) IRLS; the Jacobian
    w.r.t. the left-multiplied twist is approximated by I (exact at r=0,
    standard for weak priors). Fixed cameras are hard-masked instead of the
    reference's sigma=1e-4 prior — same effect, fp32-safe.
    """
    poses0, points0, intr0 = anchors
    sig_pose = jnp.concatenate(
        [jnp.full((3,), POSE_SIGMA_ROT), jnp.full((3,), POSE_SIGMA_POS)]
    ).astype(poses.dtype)

    r_pose = log_se3(poses @ jnp.linalg.inv(poses0)) / sig_pose  # [N, 6]
    w_pose = _huber_sqrt_weight(jnp.linalg.norm(r_pose, axis=-1), POSE_HUBER)
    pose_on = p.cam_in_ba & (~p.cam_fixed)
    if not cfg.use_pose_priors:
        pose_on = jnp.zeros_like(pose_on)
    w_pose = jnp.where(pose_on, w_pose, 0.0)
    r_pose = r_pose * w_pose[:, None]
    j_pose = w_pose[:, None] / sig_pose       # diag Jacobian [N, 6]

    sig_pt = 1.0 / jnp.maximum(p.pt_obs_count, 1.0)   # (cpp:110)
    r_pt = (points - points0) / sig_pt[:, None]
    w_pt = _huber_sqrt_weight(
        jnp.linalg.norm(r_pt, axis=-1), 3.0 / jnp.maximum(p.pt_obs_count, 1.0)
    )
    pt_on = p.pt_in_ba
    if not cfg.use_point_priors:
        pt_on = jnp.zeros_like(pt_on)
    w_pt = jnp.where(pt_on, w_pt, 0.0)
    r_pt = r_pt * w_pt[:, None]
    j_pt = (w_pt / sig_pt)[:, None]           # diag Jacobian [L, 3]

    r_k = (intr[:2] - intr0[:2]) / K_SIGMA
    j_k = jnp.full((2,), 1.0 / K_SIGMA, dtype=intr.dtype)

    # absolute pose anchors (GPS/surveyed-camera references): tight,
    # un-Huberized se(3) priors to externally-known poses on the masked
    # cameras. No robustifier — an absolute reference is trusted by
    # construction; robustness to bad anchors is the caller's policy.
    if p.abs_pose is not None:
        sig_abs = jnp.concatenate(
            [jnp.full((3,), cfg.abs_sigma_rot),
             jnp.full((3,), cfg.abs_sigma_pos)]
        ).astype(poses.dtype)
        # unanchored rows may hold garbage (zeros): inv() of a singular
        # matrix yields inf/NaN which poisons the masked product
        # (0 * NaN = NaN) — substitute identity before inverting
        eye = jnp.eye(4, dtype=poses.dtype)
        safe_abs = jnp.where(p.abs_mask[:, None, None], p.abs_pose, eye)
        r_abs = log_se3(poses @ jnp.linalg.inv(safe_abs)) / sig_abs
        abs_on = p.abs_mask & p.cam_in_ba & (~p.cam_fixed)
        w_abs = abs_on.astype(poses.dtype)
        r_abs = r_abs * w_abs[:, None]
        j_abs = w_abs[:, None] / sig_abs              # diag Jacobian [N, 6]
    else:
        r_abs = jnp.zeros_like(r_pose)
        j_abs = jnp.zeros_like(j_pose)
    return (r_pose, j_pose), (r_pt, j_pt), (r_k, j_k), (r_abs, j_abs)


def _reduce(x, axis_name):
    """Sum a value over the observation-sharded mesh axis (no-op single-chip).

    This is the entire distributed-BA communication pattern: observation
    shards contribute partial segment-sums; ``psum`` over ICI makes every
    device hold the full reduced camera system (SURVEY.md §5
    "long-context" mapping)."""
    return jax.lax.psum(x, axis_name) if axis_name else x


# --- memory-shaped segment sums ---------------------------------------------
# TPU tiles the LAST TWO dims of every materialized array to (8, 128);
# segment_sum forces its input to materialize, so the classic
# einsum("oki,okj->oij") -> segment_sum pattern physically allocates the
# [O, 6, 6] intermediate at a 28x inflation (measured: 3.2 GB for a 113 MB
# logical tensor at O=786k) — the direct cause of the KITTI-scale BA OOM
# (r3 4500-frame rehearsal). Two shapes fix it at IDENTICAL runtime
# (measured 92-96 ms / 42-43 ms on v5e):
#   * outer products: accumulate [n, a, b] over obs CHUNKS with lax.scan
#     (live intermediate is one chunk: 675 MB total at O=786k)
#   * J^T-vector sums: emit the [a, O] TRANSPOSED product (minor dims
#     (a, O) tile at ~1.3x) and scatter-add along the last axis

_SEG_CHUNK = 65536


def _seg_outer(J1, J2, idx, n, axis_name):
    """segment_sum(einsum("oki,okj->oij", J1, J2), idx, n) without the
    tiled [O, a, b] intermediate."""
    O = J1.shape[0]
    a, b = J1.shape[2], J2.shape[2]
    if O <= _SEG_CHUNK:
        out = jax.ops.segment_sum(
            jnp.einsum("oki,okj->oij", J1, J2), idx, num_segments=n)
        return _reduce(out, axis_name)
    pad = (-O) % _SEG_CHUNK
    if pad:
        J1 = jnp.concatenate([J1, jnp.zeros((pad,) + J1.shape[1:], J1.dtype)])
        J2 = jnp.concatenate([J2, jnp.zeros((pad,) + J2.shape[1:], J2.dtype)])
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    def step(acc, args):
        j1, j2, ii = args
        return acc.at[ii].add(jnp.einsum("oki,okj->oij", j1, j2)), None
    acc = jnp.zeros((n, a, b), J1.dtype)
    resh = lambda x: x.reshape(-1, _SEG_CHUNK, *x.shape[1:])
    acc, _ = jax.lax.scan(step, acc, (resh(J1), resh(J2), resh(idx)))
    return _reduce(acc, axis_name)


def _seg_vec(J, t, idx, n, axis_name):
    """segment_sum(einsum("oki,ok->oi", J, t), idx, n) via the transposed
    [a, O] product + last-axis scatter (no tiled [O, a] intermediate)."""
    u = jnp.einsum("oki,ok->io", J, t)                      # [a, O]
    out = jnp.zeros((u.shape[0], n), J.dtype).at[:, idx].add(u)
    return _reduce(out.T, axis_name)


def ba_cost(poses, points, intr, p: BAProblem, anchors=None, cfg: BAConfig = BAConfig(),
            axis_name: str | None = None):
    """Total robust cost 0.5 * sum(rho(r)) — comparable to GTSAM's
    graph.error printout (BundleAdjuster.cpp:218-219). Transposed per-obs
    layout (see _obs_linearize_t): measured 8.6 -> 1.3 GB at O=2.1M."""
    P_t = jnp.concatenate(
        [poses[:, :3, :3].reshape(-1, 9), poses[:, :3, 3]], axis=1).T
    Tg = P_t[:, p.obs_cam]                        # [12, O]
    R = Tg[:9].reshape(3, 3, -1)
    X = points.T[:, p.obs_pt]
    pc = jnp.sum(R * X[None], axis=1) + Tg[9:]
    z = pc[2]
    good = p.obs_mask & p.cam_in_ba[p.obs_cam] & p.pt_in_ba[p.obs_pt]
    z_safe = jnp.where(z > 1e-4, z, 1.0)
    u = intr[0] * pc[0] / z_safe + intr[2]
    v = intr[1] * pc[1] / z_safe + intr[3]
    r = (jnp.stack([u, v], 0) - p.obs_uv.T) / PX_SIGMA
    rn = jnp.sqrt(jnp.sum(r * r, 0))
    rn = jnp.where(z > 1e-4, rn, 2.0 * PX_HUBER + rn * 0.0 + 100.0)  # behind camera: big
    rho = jnp.where(
        rn <= PX_HUBER, 0.5 * rn * rn, PX_HUBER * rn - 0.5 * PX_HUBER * PX_HUBER
    )
    cost = _reduce(jnp.sum(jnp.where(good, rho, 0.0)), axis_name)

    if anchors is not None:
        (r_pose, _), (r_pt, _), (r_k, _), (r_abs, _) = _prior_terms(
            poses, points, intr, p, anchors, cfg
        )

        def rho_of(r_vec, k):
            n = jnp.linalg.norm(r_vec, axis=-1)
            return jnp.where(n <= k, 0.5 * n * n, k * n - 0.5 * k * k)

        cost = cost + jnp.sum(rho_of(r_pose, POSE_HUBER))
        cost = cost + 0.5 * jnp.sum(r_pt * r_pt)
        cost = cost + 0.5 * jnp.sum(r_k * r_k)
        cost = cost + 0.5 * jnp.sum(r_abs * r_abs)
    return cost


def _blocks(r, Jc, Jp, Jk, priors, p: BAProblem, lam, cfg: BAConfig,
            axis_name: str | None = None):
    """Shared linearized-system blocks for both Schur solvers."""
    N = p.poses.shape[0]
    L = p.points.shape[0]
    (r_pose, j_pose), (r_pt, j_pt), (r_k, j_k), (r_abs, j_abs) = priors

    cam_upd = p.cam_in_ba & (~p.cam_fixed)    # cameras that receive updates
    cam_w = cam_upd[:, None].astype(r.dtype)  # [N, 1]
    pt_w = p.pt_in_ba[:, None].astype(r.dtype)

    def seg_c(x, idx):
        return _reduce(jax.ops.segment_sum(x, idx, num_segments=N), axis_name)

    def seg_p(x, idx):
        return _reduce(jax.ops.segment_sum(x, idx, num_segments=L), axis_name)

    # --- diagonal blocks ---------------------------------------------------
    U_obs = _seg_outer(Jc, Jc, p.obs_cam, N, axis_name)             # [N,6,6]
    V_obs = _seg_outer(Jp, Jp, p.obs_pt, L, axis_name)              # [L,3,3]
    Ukk_obs = _reduce(jnp.einsum("oki,okj->ij", Jk, Jk), axis_name)  # [2,2]

    U = U_obs + jax.vmap(jnp.diag)(j_pose * j_pose + j_abs * j_abs)
    V = V_obs + jax.vmap(jnp.diag)(j_pt * j_pt)
    Ukk = Ukk_obs + jnp.diag(j_k * j_k)

    # LM damping: lambda * diag(JtJ) (Ceres default), with a small absolute
    # floor so empty blocks stay invertible.
    def damp(M, on):
        d = jnp.diagonal(M, axis1=-2, axis2=-1)
        D = jax.vmap(jnp.diag)(lam * d + 1e-8) if M.ndim == 3 else jnp.diag(lam * d + 1e-8)
        out = M + D
        if M.ndim == 3:
            eye = jnp.eye(M.shape[-1], dtype=M.dtype)
            out = jnp.where(on[:, None, None], out, eye[None])
        return out

    U = damp(U, cam_upd)
    V = damp(V, p.pt_in_ba)
    Ukk = Ukk + jnp.diag(lam * jnp.diagonal(Ukk) + 1e-8)

    # The implicit operator applies the observation part via segment sums;
    # everything else on the diagonal (priors + damping + floor) must be
    # applied explicitly and must match U/Ukk exactly:
    extra_diag_c = jnp.diagonal(U, axis1=-2, axis2=-1) - jnp.diagonal(
        U_obs, axis1=-2, axis2=-1
    )                                                               # [N,6]
    extra_diag_k = jnp.diagonal(Ukk) - jnp.diagonal(Ukk_obs)        # [2]

    Vinv = inv3x3(V)                                                # [L,3,3]

    # --- gradients ----------------------------------------------------------
    b_c = -_seg_vec(Jc, r, p.obs_cam, N, axis_name) - r_pose * j_pose - r_abs * j_abs
    b_p = -_seg_vec(Jp, r, p.obs_pt, L, axis_name) - r_pt * j_pt
    b_k = -_reduce(jnp.einsum("oki,ok->i", Jk, r), axis_name) - r_k * j_k
    b_c = b_c * cam_w
    b_p = b_p * pt_w

    # reduced RHS: b~ = b_cams - W V^-1 b_p
    h = jnp.einsum("lij,lj->li", Vinv, b_p)                         # [L,3]
    t = jnp.einsum("oki,oi->ok", Jp, h[p.obs_pt])                   # [O,2]
    b_red_c = b_c - _seg_vec(Jc, t, p.obs_cam, N, axis_name) * cam_w
    b_red_k = b_k - _reduce(jnp.einsum("oki,ok->i", Jk, t), axis_name)

    return dict(
        N=N, L=L, seg_c=seg_c, seg_p=seg_p, axis_name=axis_name,
        cam_upd=cam_upd, cam_w=cam_w, pt_w=pt_w,
        U=U, V=V, Ukk=Ukk, Vinv=Vinv,
        extra_diag_c=extra_diag_c, extra_diag_k=extra_diag_k,
        b_c=b_c, b_p=b_p, b_k=b_k, b_red_c=b_red_c, b_red_k=b_red_k,
    )


def _seg_outer_t(J1_t, J2_t, idx, n, axis_name):
    """_seg_outer for transposed [k, a, O] Jacobians."""
    O = J1_t.shape[-1]
    a, b = J1_t.shape[1], J2_t.shape[1]
    if O <= _SEG_CHUNK:
        u = jnp.sum(J1_t[:, :, None, :] * J2_t[:, None, :, :], axis=0)
        out = jax.ops.segment_sum(
            jnp.moveaxis(u, -1, 0), idx, num_segments=n)
        return _reduce(out, axis_name)
    pad = (-O) % _SEG_CHUNK
    if pad:
        z = lambda x: jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
        J1_t, J2_t = z(J1_t), z(J2_t)
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    nc = (O + pad) // _SEG_CHUNK
    resh = lambda x: jnp.moveaxis(
        x.reshape(*x.shape[:-1], nc, _SEG_CHUNK), -2, 0)

    def step(acc, args):
        j1, j2, ii = args
        u = jnp.sum(j1[:, :, None, :] * j2[:, None, :, :], axis=0)
        return acc.at[ii].add(jnp.moveaxis(u, -1, 0)), None

    acc = jnp.zeros((n, a, b), J1_t.dtype)
    acc, _ = jax.lax.scan(
        step, acc,
        (resh(J1_t), resh(J2_t), idx.reshape(nc, _SEG_CHUNK)))
    return _reduce(acc, axis_name)


def _seg_vec_t(J_t, t_t, idx, n, axis_name):
    """_seg_vec for transposed inputs: J [k, a, O], t [k, O] -> [n, a]."""
    u = jnp.sum(J_t * t_t[:, None, :], axis=0)
    out = jnp.zeros((u.shape[0], n), J_t.dtype).at[:, idx].add(u)
    return _reduce(out.T, axis_name)


def _blocks_t(r, Jc, Jp, Jk, priors, p: BAProblem, lam, cfg: BAConfig,
              axis_name: str | None = None):
    """_blocks on the transposed per-obs layout (r [2,O], J* [k,a,O]) —
    the global/PCG path's memory-critical twin of _blocks."""
    N = p.poses.shape[0]
    L = p.points.shape[0]
    (r_pose, j_pose), (r_pt, j_pt), (r_k, j_k), (r_abs, j_abs) = priors

    cam_upd = p.cam_in_ba & (~p.cam_fixed)
    cam_w = cam_upd[:, None].astype(r.dtype)
    pt_w = p.pt_in_ba[:, None].astype(r.dtype)

    U_obs = _seg_outer_t(Jc, Jc, p.obs_cam, N, axis_name)           # [N,6,6]
    V_obs = _seg_outer_t(Jp, Jp, p.obs_pt, L, axis_name)            # [L,3,3]
    Ukk_obs = _reduce(jnp.sum(
        Jk[:, :, None, :] * Jk[:, None, :, :], axis=(0, 3)), axis_name)

    U = U_obs + jax.vmap(jnp.diag)(j_pose * j_pose + j_abs * j_abs)
    V = V_obs + jax.vmap(jnp.diag)(j_pt * j_pt)
    Ukk = Ukk_obs + jnp.diag(j_k * j_k)

    def damp(M, on):
        d = jnp.diagonal(M, axis1=-2, axis2=-1)
        D = jax.vmap(jnp.diag)(lam * d + 1e-8)
        out = M + D
        eye = jnp.eye(M.shape[-1], dtype=M.dtype)
        return jnp.where(on[:, None, None], out, eye[None])

    U = damp(U, cam_upd)
    V = damp(V, p.pt_in_ba)
    Ukk = Ukk + jnp.diag(lam * jnp.diagonal(Ukk) + 1e-8)
    extra_diag_c = jnp.diagonal(U, axis1=-2, axis2=-1) - jnp.diagonal(
        U_obs, axis1=-2, axis2=-1)
    extra_diag_k = jnp.diagonal(Ukk) - jnp.diagonal(Ukk_obs)
    Vinv = inv3x3(V)

    b_c = (-_seg_vec_t(Jc, r, p.obs_cam, N, axis_name)
           - r_pose * j_pose - r_abs * j_abs)
    b_p = -_seg_vec_t(Jp, r, p.obs_pt, L, axis_name) - r_pt * j_pt
    b_k = -_reduce(jnp.sum(Jk * r[:, None, :], axis=(0, 2)),
                   axis_name) - r_k * j_k
    b_c = b_c * cam_w
    b_p = b_p * pt_w

    h = jnp.einsum("lij,lj->li", Vinv, b_p)                         # [L,3]
    t = jnp.sum(Jp * h.T[:, p.obs_pt][None], axis=1)                # [2,O]
    b_red_c = b_c - _seg_vec_t(Jc, t, p.obs_cam, N, axis_name) * cam_w
    b_red_k = b_k - _reduce(
        jnp.sum(Jk * t[:, None, :], axis=(0, 2)), axis_name)

    return dict(
        N=N, L=L, axis_name=axis_name,
        cam_upd=cam_upd, cam_w=cam_w, pt_w=pt_w,
        U=U, V=V, Ukk=Ukk, Vinv=Vinv,
        extra_diag_c=extra_diag_c, extra_diag_k=extra_diag_k,
        b_c=b_c, b_p=b_p, b_k=b_k, b_red_c=b_red_c, b_red_k=b_red_k,
    )


def _solve_schur_pcg_t(r, Jc, Jp, Jk, priors, p: BAProblem, lam,
                       cfg: BAConfig, axis_name: str | None = None):
    """_solve_schur_pcg on the transposed layout: every per-observation
    tensor keeps O as the lane dim, so nothing tiles beyond ~1.3x.
    Semantics identical to the standard-layout solver (parity-tested)."""
    blk = _blocks_t(r, Jc, Jp, Jk, priors, p, lam, cfg, axis_name)
    N, L = blk["N"], blk["L"]
    cam_upd, cam_w, pt_w = blk["cam_upd"], blk["cam_w"], blk["pt_w"]
    U, Vinv, Ukk = blk["U"], blk["Vinv"], blk["Ukk"]
    extra_diag_c, extra_diag_k = blk["extra_diag_c"], blk["extra_diag_k"]
    b_p = blk["b_p"]
    b_red_c, b_red_k = blk["b_red_c"], blk["b_red_k"]

    Uinv = jnp.linalg.inv(U)
    Ukk_inv = jnp.linalg.inv(Ukk)

    def S_mv(vc, vk):
        vc_act = vc * cam_w
        vg = vc_act.T[:, p.obs_cam]                                 # [6,O]
        t = jnp.sum(Jc * vg[None], axis=1) + jnp.sum(
            Jk * vk[None, :, None], axis=1)
        g = _seg_vec_t(Jp, t, p.obs_pt, L, axis_name)               # [L,3]
        hh = jnp.einsum("lij,lj->li", Vinv, g) * pt_w
        u = jnp.sum(Jp * hh.T[:, p.obs_pt][None], axis=1)
        Sc = _seg_vec_t(Jc, t - u, p.obs_cam, N, axis_name)
        Sc = Sc + extra_diag_c * vc_act
        Sc = jnp.where(cam_upd[:, None], Sc, vc)
        Sk = _reduce(jnp.sum(Jk * (t - u)[:, None, :], axis=(0, 2)),
                     axis_name) + extra_diag_k * vk
        return Sc, Sk

    def M_inv(vc, vk):
        return jnp.einsum("nij,nj->ni", Uinv, vc), Ukk_inv @ vk

    x_c = jnp.zeros_like(blk["b_c"])
    x_k = jnp.zeros_like(blk["b_k"])
    r_c, r_k2 = b_red_c, b_red_k
    z_c, z_k = M_inv(r_c, r_k2)
    p_c, p_k = z_c, z_k
    rz = jnp.sum(r_c * z_c) + jnp.sum(r_k2 * z_k)
    b_norm = jnp.sqrt(jnp.sum(b_red_c * b_red_c) + jnp.sum(b_red_k * b_red_k))

    def cg_cond(state):
        i, _, _, r_c, r_k2, *_ = state
        rn = jnp.sqrt(jnp.sum(r_c * r_c) + jnp.sum(r_k2 * r_k2))
        return (i < cfg.cg_iters) & (rn > cfg.cg_tol * (b_norm + 1e-20))

    def cg_body(state):
        i, x_c, x_k, r_c, r_k2, p_c, p_k, rz = state
        Ap_c, Ap_k = S_mv(p_c, p_k)
        pAp = jnp.sum(p_c * Ap_c) + jnp.sum(p_k * Ap_k)
        alpha = rz / jnp.maximum(pAp, _EPS)
        x_c = x_c + alpha * p_c
        x_k = x_k + alpha * p_k
        r_c = r_c - alpha * Ap_c
        r_k2 = r_k2 - alpha * Ap_k
        z_c, z_k = M_inv(r_c, r_k2)
        rz_new = jnp.sum(r_c * z_c) + jnp.sum(r_k2 * z_k)
        beta = rz_new / jnp.maximum(rz, _EPS)
        p_c = z_c + beta * p_c
        p_k = z_k + beta * p_k
        return i + 1, x_c, x_k, r_c, r_k2, p_c, p_k, rz_new

    state = (jnp.int32(0), x_c, x_k, r_c, r_k2, p_c, p_k, rz)
    _, x_c, x_k, *_ = jax.lax.while_loop(cg_cond, cg_body, state)
    d_cam = x_c * cam_w
    d_k = x_k

    t = jnp.sum(Jc * d_cam.T[:, p.obs_cam][None], axis=1) + jnp.sum(
        Jk * d_k[None, :, None], axis=1)
    g = b_p - _seg_vec_t(Jp, t, p.obs_pt, L, axis_name)
    d_pt = jnp.einsum("lij,lj->li", Vinv, g) * pt_w
    return d_cam, d_k, d_pt


def _back_substitute(d_cam, d_k, blk, Jc, Jp, Jk, p):
    """Landmark updates given camera/intrinsic updates."""
    t = jnp.einsum("okj,oj->ok", Jc, d_cam[p.obs_cam]) + jnp.einsum(
        "okj,j->ok", Jk, d_k
    )
    g = blk["b_p"] - _seg_vec(Jp, t, p.obs_pt, blk["L"], blk["axis_name"])
    return jnp.einsum("lij,lj->li", blk["Vinv"], g) * blk["pt_w"]


def _solve_schur_dense(r, Jc, Jp, Jk, priors, p: BAProblem, lam, cfg: BAConfig,
                       axis_name: str | None = None):
    """One LM linear solve via the MATERIALIZED reduced camera system.

    Builds W = [L, N, 6, 3] (one scatter-add), forms
    S = U - W V^-1 W^T with two einsums on the MXU, and solves the dense
    [6N+2] system directly — a handful of large operations instead of
    ~cg_iters sequential operator applications. This is the right trade on
    TPU whenever W fits in memory (every local BA; small/mid global BA);
    the implicit-PCG path remains for huge L or heavy sharding.
    """
    blk = _blocks(r, Jc, Jp, Jk, priors, p, lam, cfg, axis_name)
    N, L = blk["N"], blk["L"]
    cam_w, cam_upd = blk["cam_w"], blk["cam_upd"]
    Vinv = blk["Vinv"]

    # frozen cams contribute nothing to the reduced system (their updates
    # are pinned to zero), mirroring the PCG operator's vc_act masking
    Jc_act = Jc * cam_w[p.obs_cam][:, None, :]

    # W blocks, scattered by (landmark, camera) in the TRANSPOSED [18, L*N]
    # layout: a [L*N, 6, 3] scatter output tiles its (6, 3) minor dims to
    # (8, 128) — 6.6 GB physical for the 118 MB logical tensor at the
    # bench-global shape, and the single largest term of the 20 GB/iter
    # HBM traffic XLA counted for one dense LM iteration (r4). [18, L*N]
    # tiles at 1.33x instead.
    W18 = _reduce(
        jnp.zeros((18, L * N), Jc.dtype).at[
            :, p.obs_pt * N + p.obs_cam
        ].add(jnp.einsum("oki,okj->ijo", Jc_act, Jp).reshape(18, -1)),
        axis_name,
    )
    Wk = blk["seg_p"](jnp.einsum("oki,okj->oij", Jk, Jp), p.obs_pt)  # [L,2,3]
    # cam-K coupling (present in the implicit operator through t)
    Uck = blk["seg_c"](jnp.einsum("oki,okj->oij", Jc_act, Jk), p.obs_cam)

    # Packed layouts for the Schur products: arrays whose MINOR dims are
    # (6, 3) tile onto TPU as (8, 128) physical blocks — the dominant
    # product ran at 1.86% of fp32 peak through that inflation
    # (scripts/roofline.py, r4). Packing W and Y as [3, L, 6N] (minor dims
    # large) turns S_cc = Y V^-1 W^T into ONE [6N, 3L] x [3L, 6N] matmul
    # with MXU-shaped operands.
    n6 = 6 * N
    W_pack = W18.reshape(6, 3, L, N).transpose(1, 2, 3, 0) \
                .reshape(3, L, n6)                                 # [3,L,6N]
    Y_pack = jnp.einsum("blq,lbc->clq", W_pack, Vinv)              # [3,L,6N]
    Yk = jnp.einsum("lab,lbc->lac", Wk, Vinv)                      # [L,2,3]

    S_cc = -jax.lax.dot_general(
        Y_pack.reshape(3 * L, n6), W_pack.reshape(3 * L, n6),
        (((0,), (0,)), ((), ())),
    ).reshape(N, 6, N, 6)                                          # [N,6,N,6]
    S_ck = Uck - jnp.einsum("clq,lbc->qb", Y_pack, Wk).reshape(N, 6, 2)
    S_kk = blk["Ukk"] - jnp.einsum("lac,lbc->ab", Yk, Wk)          # [2,2]

    # add the diagonal U blocks (which already encode damping, priors, and
    # identity rows for frozen cameras)
    ii = jnp.arange(N)
    S_cc = S_cc.at[ii, :, ii, :].add(blk["U"])

    A = jnp.zeros((n6 + 2, n6 + 2), r.dtype)
    A = A.at[:n6, :n6].set(S_cc.reshape(n6, n6))
    Sck = (S_ck * cam_w[:, :, None]).reshape(n6, 2)
    A = A.at[:n6, n6:].set(Sck)
    A = A.at[n6:, :n6].set(Sck.T)
    A = A.at[n6:, n6:].set(S_kk)

    b = jnp.concatenate([blk["b_red_c"].reshape(n6), blk["b_red_k"]])
    if cfg.dense_cg_iters > 0:
        # Jacobi-preconditioned CG on the materialized matrix: each
        # iteration is ONE [n, n] matvec — far lower latency than TPU
        # Cholesky's sequential panel factorization, and exact enough for
        # an LM step (residual ~1e-4 after ~n/4 iterations on the damped
        # SPD system).
        diag = jnp.maximum(jnp.diagonal(A), 1e-12)

        def cg_body(_, st):
            x, r_, z_, pvec, rz = st
            Ap = A @ pvec
            alpha = rz / jnp.maximum(pvec @ Ap, 1e-20)
            x = x + alpha * pvec
            r_ = r_ - alpha * Ap
            z_ = r_ / diag
            rz2 = r_ @ z_
            pvec = z_ + (rz2 / jnp.maximum(rz, 1e-20)) * pvec
            return x, r_, z_, pvec, rz2

        x0 = jnp.zeros_like(b)
        z0 = b / diag
        st = (x0, b, z0, z0, b @ z0)
        dx, *_ = jax.lax.fori_loop(0, cfg.dense_cg_iters, cg_body, st)
    else:
        # S is SPD after LM damping -> Cholesky (TPU LU is ~4x slower)
        Lc = jnp.linalg.cholesky(A)
        y = jax.scipy.linalg.solve_triangular(Lc, b, lower=True)
        dx = jax.scipy.linalg.solve_triangular(Lc.T, y, lower=False)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
    d_cam = dx[:n6].reshape(N, 6) * cam_w
    d_k = dx[n6:]
    d_pt = _back_substitute(d_cam, d_k, blk, Jc, Jp, Jk, p)
    return d_cam, d_k, d_pt


def _solve_schur_pcg(r, Jc, Jp, Jk, priors, p: BAProblem, lam, cfg: BAConfig,
                     axis_name: str | None = None):
    """One LM linear solve.

    Eliminates landmark blocks, runs PCG on the reduced (cams + K) system
    applied implicitly, then back-substitutes the landmark updates.
    Returns (d_cam [N,6], d_k [2], d_pt [L,3]).

    With ``axis_name`` set (inside shard_map with the observation axis
    sharded), every reduction over observations is psum'd so all devices
    hold identical camera-system state; per-observation work stays local.
    """
    blk = _blocks(r, Jc, Jp, Jk, priors, p, lam, cfg, axis_name)
    N, L = blk["N"], blk["L"]
    cam_upd, cam_w, pt_w = blk["cam_upd"], blk["cam_w"], blk["pt_w"]
    U, Vinv, Ukk = blk["U"], blk["Vinv"], blk["Ukk"]
    extra_diag_c, extra_diag_k = blk["extra_diag_c"], blk["extra_diag_k"]
    b_c, b_p, b_k = blk["b_c"], blk["b_p"], blk["b_k"]
    b_red_c, b_red_k = blk["b_red_c"], blk["b_red_k"]

    Uinv = jnp.linalg.inv(U)                  # [N,6,6] (preconditioner)
    Ukk_inv = jnp.linalg.inv(Ukk)

    # --- implicit S @ v ------------------------------------------------------
    def S_mv(vc, vk):
        vc_act = vc * cam_w
        t = jnp.einsum("okj,oj->ok", Jc, vc_act[p.obs_cam]) + jnp.einsum(
            "okj,j->ok", Jk, vk
        )                                                           # [O,2]
        g = _seg_vec(Jp, t, p.obs_pt, L, axis_name)                 # [L,3]
        hh = jnp.einsum("lij,lj->li", Vinv, g) * pt_w               # [L,3]
        u = jnp.einsum("oki,oi->ok", Jp, hh[p.obs_pt])              # [O,2]
        Sc = _seg_vec(Jc, t - u, p.obs_cam, N, axis_name)
        Sc = Sc + extra_diag_c * vc_act
        Sc = jnp.where(cam_upd[:, None], Sc, vc)  # identity rows for frozen
        Sk = _reduce(jnp.einsum("oki,ok->i", Jk, t - u), axis_name) + extra_diag_k * vk
        return Sc, Sk

    def M_inv(vc, vk):
        return jnp.einsum("nij,nj->ni", Uinv, vc), Ukk_inv @ vk

    # --- PCG -----------------------------------------------------------------
    x_c = jnp.zeros_like(b_c)
    x_k = jnp.zeros_like(b_k)
    r_c, r_k2 = b_red_c, b_red_k
    z_c, z_k = M_inv(r_c, r_k2)
    p_c, p_k = z_c, z_k
    rz = jnp.sum(r_c * z_c) + jnp.sum(r_k2 * z_k)
    b_norm = jnp.sqrt(jnp.sum(b_red_c * b_red_c) + jnp.sum(b_red_k * b_red_k))

    def cg_cond(state):
        i, _, _, r_c, r_k2, *_ = state
        rn = jnp.sqrt(jnp.sum(r_c * r_c) + jnp.sum(r_k2 * r_k2))
        return (i < cfg.cg_iters) & (rn > cfg.cg_tol * (b_norm + 1e-20))

    def cg_body(state):
        i, x_c, x_k, r_c, r_k2, p_c, p_k, rz = state
        Ap_c, Ap_k = S_mv(p_c, p_k)
        pAp = jnp.sum(p_c * Ap_c) + jnp.sum(p_k * Ap_k)
        alpha = rz / jnp.maximum(pAp, _EPS)
        x_c = x_c + alpha * p_c
        x_k = x_k + alpha * p_k
        r_c = r_c - alpha * Ap_c
        r_k2 = r_k2 - alpha * Ap_k
        z_c, z_k = M_inv(r_c, r_k2)
        rz_new = jnp.sum(r_c * z_c) + jnp.sum(r_k2 * z_k)
        beta = rz_new / jnp.maximum(rz, _EPS)
        p_c = z_c + beta * p_c
        p_k = z_k + beta * p_k
        return i + 1, x_c, x_k, r_c, r_k2, p_c, p_k, rz_new

    state = (jnp.int32(0), x_c, x_k, r_c, r_k2, p_c, p_k, rz)
    _, x_c, x_k, *_ = jax.lax.while_loop(cg_cond, cg_body, state)
    d_cam = x_c * cam_w
    d_k = x_k

    # --- back-substitute landmarks -------------------------------------------
    t = jnp.einsum("okj,oj->ok", Jc, d_cam[p.obs_cam]) + jnp.einsum(
        "okj,j->ok", Jk, d_k
    )
    g = b_p - _seg_vec(Jp, t, p.obs_pt, L, axis_name)
    d_pt = jnp.einsum("lij,lj->li", Vinv, g) * pt_w
    return d_cam, d_k, d_pt


def _dogleg_step(r, Jc, Jp, Jk, priors, p: BAProblem, delta, cfg: BAConfig,
                 solve, axis_name):
    """Powell dogleg: blend the Gauss-Newton step with the Cauchy
    (steepest-descent) step inside trust radius ``delta``.

    Returns (d_cam, d_k, d_pt, model_decrease).
    """
    blk = _blocks(r, Jc, Jp, Jk, priors, p, 1e-8, cfg, axis_name)
    (r_pose, j_pose), (r_pt, j_pt), (r_k, j_k), (r_abs, j_abs) = priors

    # negative gradient g = b (blk already holds b = -J^T r, masked)
    g_c, g_k, g_p = blk["b_c"], blk["b_k"], blk["b_p"]

    def dot_all(ac, ak, ap, bc, bk, bp):
        return (jnp.sum(ac * bc) + jnp.sum(ak * bk) + jnp.sum(ap * bp))

    def Jh_sq(hc, hk, hp):
        """||J h||^2 over observations + prior rows."""
        t = (
            jnp.einsum("okj,oj->ok", Jc, hc[p.obs_cam])
            + jnp.einsum("okj,j->ok", Jk, hk)
            + jnp.einsum("okj,oj->ok", Jp, hp[p.obs_pt])
        )
        obs = _reduce(jnp.sum(t * t), axis_name)
        pri = (
            jnp.sum((j_pose * hc) ** 2)
            + jnp.sum((j_abs * hc) ** 2)
            + jnp.sum((j_pt * hp) ** 2)
            + jnp.sum((j_k * hk) ** 2)
        )
        return obs + pri

    g_norm2 = dot_all(g_c, g_k, g_p, g_c, g_k, g_p)
    alpha = g_norm2 / jnp.maximum(Jh_sq(g_c, g_k, g_p), _EPS)
    sd_c, sd_k, sd_p = alpha * g_c, alpha * g_k, alpha * g_p
    sd_norm = jnp.sqrt(alpha * alpha * g_norm2)

    gn_c, gn_k, gn_p = solve(r, Jc, Jp, Jk, priors, p, 1e-8, cfg, axis_name)
    gn_norm = jnp.sqrt(dot_all(gn_c, gn_k, gn_p, gn_c, gn_k, gn_p))

    # blend factor for the segment sd -> gn hitting the trust boundary
    d_c = gn_c - sd_c
    d_k2 = gn_k - sd_k
    d_p = gn_p - sd_p
    a = dot_all(d_c, d_k2, d_p, d_c, d_k2, d_p)
    b_lin = 2.0 * dot_all(sd_c, sd_k, sd_p, d_c, d_k2, d_p)
    c_quad = sd_norm * sd_norm - delta * delta
    disc = jnp.maximum(b_lin * b_lin - 4.0 * a * c_quad, 0.0)
    beta = (-b_lin + jnp.sqrt(disc)) / jnp.maximum(2.0 * a, _EPS)
    beta = jnp.clip(beta, 0.0, 1.0)

    use_gn = gn_norm <= delta
    sd_clip = jnp.minimum(1.0, delta / jnp.maximum(sd_norm, _EPS))
    use_sd = (~use_gn) & (sd_norm >= delta)

    def pick(gn, sd, d):
        blend = sd + beta * d
        return jnp.where(use_gn, gn, jnp.where(use_sd, sd_clip * sd, blend))

    h_c = pick(gn_c, sd_c, d_c)
    h_k = pick(gn_k, sd_k, d_k2)
    h_p = pick(gn_p, sd_p, d_p)

    # model decrease m(0) - m(h) = g^T h - 0.5 ||J h||^2
    m_dec = dot_all(g_c, g_k, g_p, h_c, h_k, h_p) - 0.5 * Jh_sq(h_c, h_k, h_p)
    return h_c, h_k, h_p, m_dec


@partial(jax.jit, static_argnames=("cfg", "axis_name"))
def refine_ba(p: BAProblem, cfg: BAConfig = BAConfig(),
              axis_name: str | None = None):
    """Run LM to convergence. Returns (poses, points, intr, info dict).

    The equivalent of RefineBA (BundleAdjuster.cpp:40-250): same factor
    structure, same write-back (poses, points, shared fx/fy), data-dependent
    LM loop expressed as lax.while_loop with masked convergence.

    ``axis_name``: when called inside shard_map with the observation arrays
    sharded over that mesh axis, the solve runs distributed (psum-reduced
    camera system); poses/points/intr must be replicated inputs.
    """
    if p.abs_pose is not None:
        # Absolute references replace the init-anchored weak priors: those
        # priors regularize toward the (drifted) initialization, which is
        # exactly the state the anchors exist to correct — measured on the
        # gauge-warp probe (tests/test_ba.py): residual 13.6% of the warp
        # with weak priors on, < 1e-6 with them off.
        cfg = cfg._replace(use_pose_priors=False, use_point_priors=False)
    anchors = (p.poses, p.points, p.intr)

    # static solver choice: dense reduced system when W = [L, N, 6, 3] fits
    # the budget (dominates on latency for local/medium BA), implicit PCG
    # beyond that (scales to any L, stays cheap sharded)
    if cfg.solver == "dense":
        use_dense = True
    elif cfg.solver == "pcg":
        use_dense = False
    else:
        # physical tiled size: minor dims (6, 3) pad to (8, 128) on TPU
        w_bytes = p.points.shape[0] * p.poses.shape[0] * 8 * 128 * 4
        use_dense = w_bytes <= cfg.dense_budget_bytes
    solve = _solve_schur_dense if use_dense else _solve_schur_pcg

    cost0 = ba_cost(p.poses, p.points, p.intr, p, anchors, cfg, axis_name)

    def cond(s):
        i, _, _, _, lam, cost, done = s
        return (i < cfg.max_iters) & (~done)

    dogleg = cfg.method.lower() == "dogleg"

    def body(s):
        i, poses, points, intr, lam, cost, done = s
        priors = _prior_terms(poses, points, intr, p, anchors, cfg)
        if dogleg:
            # lam slot carries the trust radius
            r, Jc, Jp, Jk, _ = _obs_linearize(poses, points, intr, p)
            d_cam, d_k, d_pt, m_dec = _dogleg_step(
                r, Jc, Jp, Jk, priors, p, lam, cfg, solve, axis_name
            )
        elif use_dense:
            r, Jc, Jp, Jk, _ = _obs_linearize(poses, points, intr, p)
            d_cam, d_k, d_pt = solve(
                r, Jc, Jp, Jk, priors, p, lam, cfg, axis_name
            )
        else:
            # PCG path: transposed per-obs layout end to end (the obs
            # axis stays the lane dim — see _obs_linearize_t)
            r, Jc, Jp, Jk, _ = _obs_linearize_t(poses, points, intr, p)
            d_cam, d_k, d_pt = _solve_schur_pcg_t(
                r, Jc, Jp, Jk, priors, p, lam, cfg, axis_name
            )

        new_poses = exp_se3(d_cam) @ poses
        new_points = points + d_pt
        new_intr = intr.at[:2].add(d_k)

        new_cost = ba_cost(new_poses, new_points, new_intr, p, anchors, cfg, axis_name)
        accept = new_cost < cost

        poses = jnp.where(accept, new_poses, poses)
        points = jnp.where(accept, new_points, points)
        intr = jnp.where(accept, new_intr, intr)
        if dogleg:
            rho = (cost - new_cost) / jnp.maximum(m_dec, _EPS)
            lam = jnp.where(
                rho > 0.75, lam * 2.0,
                jnp.where(rho < 0.25, lam * 0.5, lam),
            )
            lam = jnp.clip(lam, 1e-6, 1e6)
            stalled = lam <= 1e-6
        else:
            lam = jnp.where(accept, jnp.maximum(lam / 3.0, cfg.lambda_min),
                            jnp.minimum(lam * 4.0, cfg.lambda_max))
            stalled = lam >= cfg.lambda_max
        rel = jnp.abs(cost - new_cost) / jnp.maximum(cost, _EPS)
        done = (accept & (rel < cfg.tolerance)) | stalled
        cost = jnp.where(accept, new_cost, cost)
        return i + 1, poses, points, intr, lam, cost, done

    init = (
        jnp.int32(0), p.poses, p.points, p.intr,
        jnp.asarray(cfg.trust_radius_init if dogleg else cfg.lambda_init,
                    p.poses.dtype),
        cost0,
        jnp.asarray(False),
    )
    n_it, poses, points, intr, lam, cost, _ = jax.lax.while_loop(cond, body, init)
    info = {
        "initial_cost": cost0,
        "final_cost": cost,
        "iterations": n_it,
        "lambda": lam,
    }
    return poses, points, intr, info
