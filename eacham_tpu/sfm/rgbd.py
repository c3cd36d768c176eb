"""Metric-scale reconstruction from RGB-D / stereo frames.

The reference declares STEREO and RGBD source types (modules/base/
data_source/DataSourceTypes.h:7-18, ICamera.h:17-57) and ships the
per-point backprojection tools (Tools3d.h:14-60), but its SfM driver is
mono-only — the KITTI/TUM configs use an incompatible legacy schema
(SURVEY.md §2 #34). This module completes the modality: depth-seeded
landmarks make the reconstruction METRIC from frame zero, with no
essential-matrix scale ambiguity and no Umeyama scale fix-up needed.

Design (TPU-native): the sequential PnP chain reuses the mono machinery
(pnp_register, Scene tables); the only new kernels are batched depth
backprojection and landmark adoption — both O(K) masked array ops. Every
step is jitted; the per-frame host loop carries only scalars.

  1. frame 0 fixed at identity; its keypoints backproject through the
     depth channel into metric landmarks (Get3dPointByDepthMap /
     Get3dPointByStereoPair semantics).
  2. each later frame: PnP against the metric map (EPNP-parity RANSAC)
     -> adopt neighbors' landmarks for matched keypoints -> depth-seed
     the rest from its own depth channel.
  3. optional global BA: the reference's landmark-prior structure
     (BundleAdjuster.cpp:100-117, sigma = 1/observers) anchors the
     metric scale while poses and points polish.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from eacham_tpu.geometry.se3 import inverse_se3
from eacham_tpu.sfm.scene import (
    Scene, alloc_landmarks, frame_pair_table, make_scene,
)
from eacham_tpu.sfm.matches import build_match_tables, observers_of_frame
from eacham_tpu.sfm.pipeline import SfmOptions, pnp_register, _ba, BAConfig


def depth_at_keypoints(depth_maps: jnp.ndarray, xy: jnp.ndarray):
    """Sample per-keypoint depth from [N, H, W] maps at [N, K, 2] pixels."""
    N, H, W = depth_maps.shape
    xi = jnp.clip(xy[..., 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(xy[..., 1].astype(jnp.int32), 0, H - 1)
    return jax.vmap(lambda d, y, x: d[y, x])(depth_maps, yi, xi)


def stereo_depth_at_keypoints(xy: jnp.ndarray, right_x: jnp.ndarray,
                              intr: jnp.ndarray, baseline: float):
    """Per-keypoint metric depth from rectified stereo matches
    (Get3dPointByStereoPair, Tools3d.h:14-38): z = f * B / disparity.
    Non-positive disparity yields z = 0 (invalid)."""
    disparity = xy[..., 0] - right_x
    z = jnp.where(disparity > 0.1,
                  intr[0] * baseline / jnp.maximum(disparity, 0.1), 0.0)
    return z


@jax.jit
def _backproject(uv: jnp.ndarray, z: jnp.ndarray, intr: jnp.ndarray,
                 T_w2c: jnp.ndarray):
    """Pixels + depth -> WORLD points under world->cam pose T."""
    x = (uv[..., 0] - intr[2]) / intr[0] * z
    y = (uv[..., 1] - intr[3]) / intr[1] * z
    pc = jnp.stack([x, y, z], -1)
    T_c2w = inverse_se3(T_w2c)
    return pc @ T_c2w[:3, :3].T + T_c2w[:3, 3]


@jax.jit
def _seed_frame(scene: Scene, cur, kp_z, max_depth):
    """Depth-seed landmarks for ``cur``'s still-unlinked keypoints."""
    K = scene.kp_mask.shape[1]
    uv = scene.keypoints[cur]
    ok = (scene.kp_mask[cur] & (kp_z > 0.0) & (kp_z < max_depth)
          & (scene.kp2lm[cur] < 0))
    pts_w = _backproject(uv, kp_z, scene.intr, scene.pose[cur])
    scene, ids = alloc_landmarks(scene, pts_w, ok)
    got = ids >= 0
    kp2lm = scene.kp2lm.at[cur].set(
        jnp.where(got, ids, scene.kp2lm[cur]))
    return scene._replace(kp2lm=kp2lm), jnp.sum(got)


@jax.jit
def _adopt_links(scene: Scene, cur, pair_rows):
    """Adopt registered neighbors' landmarks for matched keypoints of
    ``cur`` (the link half of TriangulateFrame's merge logic,
    Triangulator.cpp:216-235 — no triangulation needed here)."""
    K = scene.kp_mask.shape[1]
    obs_frame, obs_kp, obs_on = observers_of_frame(
        cur, pair_rows, scene.pair_idx, scene.pair_ok,
        scene.match_ij, scene.valid_ij, scene.match_ji, scene.valid_ji,
    )
    obs_on = (obs_on & scene.pose_valid[obs_frame][:, None]
              & scene.kp_mask[cur][None, :])
    nb_lm = scene.kp2lm[obs_frame[:, None], obs_kp]
    has = obs_on & (nb_lm >= 0) & scene.lm_valid[jnp.maximum(nb_lm, 0)]
    src = jnp.argmax(has, axis=0)
    ok = jnp.any(has, axis=0) & (scene.kp2lm[cur] < 0)
    lm_id = jnp.maximum(nb_lm, 0)[src, jnp.arange(K)]
    kp2lm = scene.kp2lm.at[cur].set(
        jnp.where(ok, lm_id, scene.kp2lm[cur]))
    return scene._replace(kp2lm=kp2lm), jnp.sum(ok)


def run_sfm_rgbd(
    keypoints: jnp.ndarray,    # [N, K, 2]
    descriptors: jnp.ndarray,  # [N, K, D] L2-normalized
    kp_mask: jnp.ndarray,      # [N, K]
    kp_depth: jnp.ndarray,     # [N, K] metric depth per keypoint (0=invalid)
    intr: jnp.ndarray,         # [4]
    options: SfmOptions = SfmOptions(),
    max_depth: float = 100.0,
    verbose: bool = True,
):
    """Metric sequential reconstruction (see module docstring).

    ``kp_depth`` comes from ``depth_at_keypoints`` (RGB-D) or
    ``stereo_depth_at_keypoints`` (rectified stereo). Returns
    ``(scene, stats)`` with poses in the DEPTH CHANNEL'S metric scale.
    """
    opt = options
    N, K = kp_mask.shape

    def log(*a):
        if verbose:
            print("[rgbd]", *a, flush=True)

    tables = build_match_tables(
        descriptors, kp_mask, ratio=opt.match_ratio,
        min_matches=opt.min_matches, chunk=opt.match_chunk,
    )
    pair_idx, pair_ok = tables[0], tables[1]
    scene = make_scene(
        keypoints, kp_mask, jnp.asarray(pair_idx), *tables[1:],
        intr=intr, lm_capacity=opt.lm_capacity or N * K,
    )
    fp_tbl = jnp.asarray(frame_pair_table(np.asarray(pair_idx), N))

    # frame 0: gauge + metric anchor
    scene = scene._replace(
        pose_valid=scene.pose_valid.at[0].set(True),
        pose_fixed=scene.pose_fixed.at[0].set(True),
    )
    scene, n0 = _seed_frame(scene, jnp.int32(0), kp_depth[0], max_depth)
    log(f"frame 0: {int(n0)} depth-seeded landmarks (metric anchor)")

    key = jax.random.PRNGKey(opt.seed)
    registered = 1
    for f in range(1, N):
        key, k_pnp = jax.random.split(key)
        T, n_inl = pnp_register(
            scene, jnp.int32(f - 1), jnp.int32(f), fp_tbl[f], k_pnp,
            threshold=4.0, n_hyp=opt.ransac_hyps_pnp,
        )
        if int(n_inl) < opt.min_pnp_inliers:
            log(f"frame {f}: PnP failed ({int(n_inl)} inliers) — skipped")
            continue
        scene = scene._replace(
            pose=scene.pose.at[f].set(T),
            pose_valid=scene.pose_valid.at[f].set(True),
        )
        scene, n_adopt = _adopt_links(scene, jnp.int32(f), fp_tbl[f])
        scene, n_new = _seed_frame(scene, jnp.int32(f), kp_depth[f],
                                   max_depth)
        registered += 1
        log(f"frame {f}: PnP {int(n_inl)} inl, adopted {int(n_adopt)}, "
            f"seeded {int(n_new)}")

    if opt.run_global_ba and opt.global_max_iters > 0:
        global_cfg = BAConfig(
            max_iters=opt.global_max_iters, tolerance=opt.global_tolerance,
            method=opt.global_method.lower(),
            trust_radius_init=opt.global_delta, solver=opt.global_solver,
        )
        scene, info = _ba(scene, scene.pose_valid, global_cfg,
                          opt.min_ba_landmarks)
        if info is not None:
            log(f"global BA: {float(info['initial_cost']):.1f} -> "
                f"{float(info['final_cost']):.1f}")

    stats = {
        "registered": registered,
        "landmarks": int(jnp.sum(scene.lm_valid)),
        "initialized": True,
    }
    log(f"done: {registered}/{N} frames, {stats['landmarks']} landmarks")
    return scene, stats
