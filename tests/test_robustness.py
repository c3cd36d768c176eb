"""Robustness: disconnected scenes, matchless frames, tiny inputs.

The reference handles failures by exclusion counters and early returns
(SURVEY.md §5 "Failure detection"); these tests pin the equivalent
behavior: never crash, register what is connected, exclude the rest.
"""

import numpy as np
import jax.numpy as jnp

from tests.test_pipeline import make_feature_world
from eacham_tpu.sfm import run_sfm, SfmOptions

import pytest

# e2e/scale tier — excluded from the core tier (pytest -m 'not slow', README)
pytestmark = pytest.mark.slow


def _opts(**kw):
    base = dict(min_initial_inliers=60, min_matches=15,
                ransac_hyps_e=128, ransac_hyps_h=64, ransac_hyps_pnp=128,
                lm_capacity=2048, refine_max_iters=10, global_max_iters=15)
    base.update(kw)
    return SfmOptions(**base)


def test_disconnected_components(rng):
    """Two scenes with disjoint descriptors: only the connected component
    containing the init pair registers; the rest stay excluded/invalid."""
    p1, _, intr, k1, d1, m1 = make_feature_world(
        np.random.default_rng(1), n_cams=5, n_pts=150, noise=0.3)
    p2, _, _, k2, d2, m2 = make_feature_world(
        np.random.default_rng(2), n_cams=4, n_pts=150, noise=0.3)
    kps = np.concatenate([k1, k2])
    desc = np.concatenate([d1, d2])
    mask = np.concatenate([m1, m2])
    scene, stats = run_sfm(
        jnp.asarray(kps), jnp.asarray(desc), jnp.asarray(mask),
        image_size=(640, 480), intr=jnp.asarray(intr, jnp.float32),
        options=_opts(), verbose=False,
    )
    assert stats["initialized"]
    valid = np.asarray(scene.pose_valid)
    # exactly one component registered (5 or 4 frames), never a mix > max
    assert valid.sum() in (4, 5), valid
    assert valid[:5].sum() == valid.sum() or valid[5:].sum() == valid.sum()


def test_all_frames_matchless(rng):
    """Unique random descriptors everywhere -> no edges -> clean failure."""
    N, K = 5, 64
    desc = rng.normal(size=(N, K, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    kps = rng.uniform(0, 600, (N, K, 2)).astype(np.float32)
    scene, stats = run_sfm(
        jnp.asarray(kps), jnp.asarray(desc), jnp.ones((N, K), bool),
        image_size=(640, 480), options=_opts(lm_capacity=256), verbose=False,
    )
    assert not stats["initialized"]
    assert stats["registered"] == 0


def test_minimum_frame_count(rng):
    """Two frames: init pair is the whole reconstruction."""
    poses_gt, _, intr, kps, desc, mask = make_feature_world(
        np.random.default_rng(3), n_cams=2, n_pts=200, noise=0.2)
    scene, stats = run_sfm(
        jnp.asarray(kps), jnp.asarray(desc), jnp.asarray(mask),
        image_size=(640, 480), intr=jnp.asarray(intr, jnp.float32),
        options=_opts(lm_capacity=512), verbose=False,
    )
    assert stats["initialized"]
    assert stats["registered"] == 2


def test_photometric_noise_blur(rng):
    """Full rendered pipeline under sensor noise + blur (VERDICT r3 #4) —
    the small CI cell of scripts/robustness_matrix.py's sweep."""
    import jax.numpy as jnp
    from eacham_tpu.features.frontend import extract_features
    from eacham_tpu.utils.evaluate import ate_rmse
    from eacham_tpu.utils.synthetic import (
        gaussian_blur, make_surface_scene, orbit_poses, render_view,
    )

    W, H, N = 320, 240, 14
    f = 1.2 * max(W, H)
    intr = np.array([f, f, W / 2, H / 2], np.float32)
    world = make_surface_scene(rng, n_blobs=2500)
    poses = orbit_poses(N, radius=0.6, step_deg=1.2, advance=0.05)
    imgs = np.stack([render_view(world, T, intr, W, H) for T in poses])
    imgs = np.stack([gaussian_blur(im, 1.0) for im in imgs])
    imgs = np.clip(imgs + rng.normal(scale=0.03, size=imgs.shape), 0, 1)

    xy, desc, score, mask = extract_features(
        jnp.asarray(imgs.astype(np.float32)), max_keypoints=256)
    scene, stats = run_sfm(
        xy, desc, mask, image_size=(W, H), intr=jnp.asarray(intr),
        options=_opts(min_initial_inliers=60, match_ratio=0.85,
                      init_min_tri_angle_deg=1.0, min_tri_angle_deg=1.0,
                      lm_capacity=4096),
        verbose=False)
    valid = np.asarray(scene.pose_valid)
    assert valid.sum() >= N - 2, stats
    est = np.asarray(scene.pose)[valid]
    gt = poses[valid]
    c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
    assert ate_rmse(c_est, c_gt) < 0.1
