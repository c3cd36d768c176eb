"""End-to-end incremental SfM on a synthetic scene with known ground truth.

The reference has no tests (SURVEY.md §4); the strategy here is (a): project
random 3-D structure through known cameras, hand the pipeline perfect
"features" (GT pixel observations + unique random descriptors per track),
and require the reconstruction to recover the generating geometry up to a
similarity transform (monocular gauge).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import make_synthetic_scene
from eacham_tpu.sfm import run_sfm, SfmOptions
from eacham_tpu.utils.evaluate import align_umeyama, ate_rmse

import pytest

# e2e/scale tier — excluded from the core tier (pytest -m 'not slow', README)
pytestmark = pytest.mark.slow


def make_feature_world(rng, n_cams=8, n_pts=300, noise=0.3, img=(640, 480), f=600.0):
    """Synthetic GT -> (keypoints, descriptors, masks) in the frontend's
    output format. Every 3-D point gets a unique random unit descriptor, so
    matching recovers the GT tracks."""
    poses, pts, intr, uv = make_synthetic_scene(
        rng, n_cams=n_cams, n_pts=n_pts, noise=noise, img=img, f=f
    )
    desc_per_track = rng.normal(size=(n_pts, 256)).astype(np.float32)
    desc_per_track /= np.linalg.norm(desc_per_track, axis=1, keepdims=True)

    K = n_pts
    kps = uv.astype(np.float32)                         # [N, K, 2]
    desc = np.broadcast_to(desc_per_track, (n_cams, n_pts, 256)).copy()
    in_img = (
        (uv[..., 0] >= 0) & (uv[..., 0] < img[0])
        & (uv[..., 1] >= 0) & (uv[..., 1] < img[1])
    )
    return poses, pts, intr, kps, desc, in_img


@pytest.fixture(scope="module")
def sfm_result():
    rng = np.random.default_rng(7)
    poses_gt, pts_gt, intr, kps, desc, mask = make_feature_world(rng)
    opts = SfmOptions(
        min_initial_inliers=100,      # scene has 300 points
        min_matches=20,
        ransac_hyps_e=256,
        ransac_hyps_h=128,
        ransac_hyps_pnp=256,
        lm_capacity=4096,
    )
    scene, stats = run_sfm(
        jnp.asarray(kps), jnp.asarray(desc), jnp.asarray(mask),
        image_size=(640, 480), intr=jnp.asarray(intr, jnp.float32),
        options=opts, verbose=True,
    )
    return poses_gt, pts_gt, intr, scene, stats


def test_all_frames_registered(sfm_result):
    poses_gt, _, _, scene, stats = sfm_result
    assert stats["initialized"]
    assert stats["registered"] == poses_gt.shape[0]


def test_enough_landmarks(sfm_result):
    _, pts_gt, _, scene, stats = sfm_result
    assert stats["landmarks"] > 0.5 * pts_gt.shape[0]


def test_trajectory_ate(sfm_result):
    poses_gt, _, _, scene, stats = sfm_result
    valid = np.asarray(scene.pose_valid)
    est = np.asarray(scene.pose)[valid]
    gt = poses_gt[valid]
    # camera centers: C = -R^T t
    c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
    rmse = ate_rmse(c_est, c_gt)
    # GT trajectory spans ~4 units; sub-2% ATE after similarity alignment
    assert rmse < 0.08, f"ATE {rmse}"


def test_compact_global_ba_matches_dense(sfm_result):
    """The bucketed compact problem `_ba` builds for interim/global BA
    (pipeline.py) must hold exactly the observations/landmarks of the
    dense capacity-padded problem and reach the same cost."""
    _, _, _, scene, _ = sfm_result
    from eacham_tpu.ba import BAConfig, refine_ba, ba_cost
    from eacham_tpu.sfm.scene import (
        ba_problem_from_scene, ba_problem_counts, ba_problem_windowed,
    )

    n_obs, n_lms = ba_problem_counts(scene, scene.pose_valid)
    dense = ba_problem_from_scene(scene, scene.pose_valid)
    assert int(n_obs) == int(jnp.sum(dense.obs_mask))
    assert int(n_lms) == int(jnp.sum(dense.pt_in_ba))

    N = scene.kp_mask.shape[0]
    prob, cam_list, cam_on, lm_list, lm_on = ba_problem_windowed(
        scene, scene.pose_valid, max_cams=N,
        max_obs=int(n_obs) + 7, max_lms=int(n_lms) + 3,
    )
    assert int(jnp.sum(prob.obs_mask)) == int(n_obs)
    assert int(jnp.sum(prob.pt_in_ba)) == int(n_lms)

    cfg = BAConfig(max_iters=5, tolerance=1e-7)
    *_, info_d = refine_ba(dense, cfg)
    *_, info_w = refine_ba(prob, cfg)
    np.testing.assert_allclose(
        float(info_w["final_cost"]), float(info_d["final_cost"]),
        rtol=1e-3, atol=1e-5,
    )


def test_bucket_sizes():
    from eacham_tpu.sfm.pipeline import _bucket

    assert _bucket(1, 100000) == 1024          # floor
    assert _bucket(1024, 100000) == 1024       # exact
    assert _bucket(1025, 100000) == 1536       # 3*2^9
    assert _bucket(1537, 100000) == 2048       # next 2^k
    assert _bucket(99999999, 4096) == 4096     # capped
    for n in range(1, 20000, 37):
        got = _bucket(n, 1 << 20)
        assert got >= n                        # never truncates
        assert got <= max(2 * n, 1024)         # padding waste bounded
        k = got
        while k % 2 == 0:                      # from {2^a, 3*2^a} only
            k //= 2
        assert k in (1, 3)


def test_reprojection_quality(sfm_result):
    """Mean reprojection error of valid landmarks under optimized poses."""
    _, _, intr, scene, _ = sfm_result
    from eacham_tpu.sfm.scene import ba_problem_from_scene

    prob = ba_problem_from_scene(scene, scene.pose_valid)
    T = np.asarray(prob.poses)[np.asarray(prob.obs_cam)]
    X = np.asarray(prob.points)[np.asarray(prob.obs_pt)]
    pc = np.einsum("oij,oj->oi", T[:, :3, :3], X) + T[:, :3, 3]
    k = np.asarray(prob.intr)
    u = k[0] * pc[:, 0] / pc[:, 2] + k[2]
    v = k[1] * pc[:, 1] / pc[:, 2] + k[3]
    err = np.linalg.norm(
        np.stack([u, v], -1) - np.asarray(prob.obs_uv), axis=-1
    )
    m = np.asarray(prob.obs_mask)
    assert err[m].mean() < 1.5   # px, noise floor is 0.3 px


def test_local_ba_amortization():
    """local_ba_every > 1 must still register every frame and keep the
    trajectory within the quality gate — skipped per-frame refinements are
    recovered by overlapping windows and the interim/global BA."""
    rng = np.random.default_rng(11)
    poses_gt, pts_gt, intr, kps, desc, mask = make_feature_world(rng)
    opts = SfmOptions(
        min_initial_inliers=100, min_matches=20,
        ransac_hyps_e=256, ransac_hyps_h=128, ransac_hyps_pnp=256,
        lm_capacity=4096, local_ba_every=2,
    )
    scene, stats = run_sfm(
        jnp.asarray(kps), jnp.asarray(desc), jnp.asarray(mask),
        image_size=(640, 480), intr=jnp.asarray(intr, jnp.float32),
        options=opts, verbose=False,
    )
    assert stats["registered"] == poses_gt.shape[0]
    valid = np.asarray(scene.pose_valid)
    est = np.asarray(scene.pose)[valid]
    gt = poses_gt[valid]
    c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
    assert ate_rmse(c_est, c_gt) < 0.08


def test_run_sfm_with_absolute_anchors_recovers_gt_frame():
    """run_sfm(abs_anchors=...) must produce a reconstruction expressed in
    the anchor frame: with 3 frames anchored to GT, the UNALIGNED pose
    error (no similarity fitting) must be small — monocular SfM without
    anchors can only ever match GT up to gauge."""
    rng = np.random.default_rng(11)
    poses_gt, pts_gt, intr, kps, desc, mask = make_feature_world(rng)
    N = poses_gt.shape[0]
    amask = np.zeros(N, bool)
    amask[[0, N // 2, N - 1]] = True
    opts = SfmOptions(
        min_initial_inliers=100, min_matches=20,
        ransac_hyps_e=256, ransac_hyps_h=128, ransac_hyps_pnp=256,
        lm_capacity=4096, abs_sigma_pos=0.005, abs_sigma_rot=0.005,
    )
    scene, stats = run_sfm(
        jnp.asarray(kps), jnp.asarray(desc), jnp.asarray(mask),
        image_size=(640, 480), intr=jnp.asarray(intr, jnp.float32),
        options=opts, verbose=False,
        abs_anchors=(jnp.asarray(poses_gt, jnp.float32),
                     jnp.asarray(amask)),
    )
    assert stats["initialized"]
    valid = np.asarray(scene.pose_valid)
    assert valid.sum() == N
    est = np.asarray(scene.pose)
    # camera centers in ABSOLUTE coordinates (no alignment)
    ce = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    cg = -np.einsum("nij,ni->nj", poses_gt[:, :3, :3], poses_gt[:, :3, 3])
    err = np.linalg.norm(ce - cg, axis=1).max()
    scale = np.linalg.norm(cg - cg.mean(0), axis=1).mean()
    assert err < 0.05 * scale, f"absolute center error {err} vs scene scale {scale}"
