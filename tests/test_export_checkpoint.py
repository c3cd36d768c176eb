"""Checkpoint round-trip + export artifacts + match-overlay rendering."""

import numpy as np
import jax.numpy as jnp

from eacham_tpu.io.checkpoint import save_scene, load_scene
from eacham_tpu.io.export import export_cloud, export_trajectory
from eacham_tpu.sfm.matches import all_pairs_index
from eacham_tpu.sfm.scene import make_scene, alloc_landmarks
from eacham_tpu.utils.viz import draw_matches

import pytest

# e2e/scale tier — excluded from the core tier (pytest -m 'not slow', README)
pytestmark = pytest.mark.slow


def _tiny_scene(rng):
    N, K = 4, 16
    pair_idx = jnp.asarray(all_pairs_index(N))
    P = pair_idx.shape[0]
    scene = make_scene(
        keypoints=jnp.asarray(rng.uniform(0, 100, (N, K, 2)).astype(np.float32)),
        kp_mask=jnp.ones((N, K), bool),
        pair_idx=pair_idx,
        pair_ok=jnp.ones((P,), bool),
        match_ij=jnp.zeros((P, K), jnp.int32),
        valid_ij=jnp.zeros((P, K), bool),
        match_ji=jnp.zeros((P, K), jnp.int32),
        valid_ji=jnp.zeros((P, K), bool),
        intr=jnp.asarray([100.0, 100.0, 50.0, 50.0]),
        lm_capacity=32,
    )
    pts = jnp.asarray(rng.normal(size=(K, 3)).astype(np.float32) + [0, 0, 5])
    scene, ids = alloc_landmarks(scene, pts, jnp.ones((K,), bool))
    scene = scene._replace(
        pose_valid=scene.pose_valid.at[0].set(True).at[1].set(True),
        kp2lm=scene.kp2lm.at[0].set(ids).at[1].set(ids),
    )
    return scene


def test_checkpoint_roundtrip(tmp_path, rng):
    scene = _tiny_scene(rng)
    p = tmp_path / "scene.npz"
    save_scene(p, scene, excluded=np.zeros(4, bool))
    loaded, extra = load_scene(p)
    for f in scene._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(scene, f)), np.asarray(getattr(loaded, f)), f
        )
    assert "excluded" in extra and extra["excluded"].shape == (4,)


def test_export_artifacts(tmp_path, rng):
    scene = _tiny_scene(rng)
    n_pts = export_cloud(tmp_path / "cloud.ply", scene, min_observers=2)
    n_cams = export_trajectory(tmp_path / "traj.ply", scene)
    assert n_pts == 16 and n_cams == 2
    head = (tmp_path / "cloud.ply").read_text().splitlines()
    assert head[0] == "ply" and "element vertex 16" in head[2]
    # min_observers filter: raising the bar drops everything (2 observers each)
    assert export_cloud(tmp_path / "c2.ply", scene, min_observers=3) == 0


def test_draw_matches(tmp_path, rng):
    img1 = rng.random((40, 60)).astype(np.float32)
    img2 = rng.random((40, 60)).astype(np.float32)
    uv1 = rng.uniform(0, 50, (10, 2))
    uv2 = rng.uniform(0, 50, (10, 2))
    valid = np.ones(10, bool)
    canvas = draw_matches(img1, img2, uv1, uv2, valid, tmp_path / "m.png")
    assert canvas.shape == (40, 120, 3)
    assert (tmp_path / "m.png").exists()
    assert canvas.max() > 0


def test_checkpoint_resume_reconstruction(tmp_path):
    """Save mid-reconstruction, reload, resume to completion."""
    import jax.numpy as jnp
    from tests.test_pipeline import make_feature_world
    from eacham_tpu.sfm import run_sfm, resume_sfm, SfmOptions

    rng_np = np.random.default_rng(31)
    poses_gt, _, intr, kps, desc, mask = make_feature_world(
        rng_np, n_cams=7, n_pts=200, noise=0.3)
    opts = SfmOptions(min_initial_inliers=60, min_matches=20,
                      ransac_hyps_e=128, ransac_hyps_h=64,
                      ransac_hyps_pnp=128, lm_capacity=2048,
                      refine_max_iters=10, global_max_iters=15)
    scene, stats = run_sfm(
        jnp.asarray(kps), jnp.asarray(desc), jnp.asarray(mask),
        image_size=(640, 480), intr=jnp.asarray(intr, np.float32),
        options=opts, verbose=False)
    assert stats["registered"] == 7

    # simulate an interrupted run: de-register the last three frames
    valid = scene.pose_valid
    drop = jnp.zeros_like(valid).at[4:].set(True) & valid
    kp2lm = jnp.where(drop[:, None], -1, scene.kp2lm)
    scene_partial = scene._replace(
        pose_valid=valid & (~drop), kp2lm=kp2lm)

    p = tmp_path / "partial.npz"
    save_scene(p, scene_partial)
    loaded, _ = load_scene(p)
    assert int(loaded.pose_valid.sum()) == 4

    resumed, stats2 = resume_sfm(loaded, options=opts, verbose=False)
    assert stats2["registered"] == 7


def test_landmark_colors(rng):
    from eacham_tpu.io.export import landmark_colors

    scene = _tiny_scene(rng)
    images = rng.random((4, 120, 120)).astype(np.float32)
    colors = landmark_colors(scene, images)
    assert colors.shape == (32, 3)
    # landmark 0 observed at frame 0 kp 0 -> its keypoint's intensity
    kp = np.asarray(scene.keypoints)[0, 0]
    lm0 = int(np.asarray(scene.kp2lm)[0, 0])
    v = images[0, int(kp[1]), int(kp[0])]
    assert abs(int(colors[lm0][0]) - int(v * 255)) <= 1
