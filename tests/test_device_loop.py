"""The on-device registration sweep must reconstruct as well as the
host-driven loop (not bitwise — RANSAC keys differ — but same frames
registered and equivalent accuracy)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_pipeline import make_feature_world
from eacham_tpu.sfm import run_sfm, SfmOptions
from eacham_tpu.utils.evaluate import ate_rmse

import pytest

# e2e/scale tier — excluded from the core tier (pytest -m 'not slow', README)
pytestmark = pytest.mark.slow


def _ate(scene, poses_gt):
    valid = np.asarray(scene.pose_valid)
    est = np.asarray(scene.pose)[valid]
    gt = poses_gt[valid]
    c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
    return ate_rmse(c_est, c_gt)


@pytest.mark.parametrize("device_loop", [False, True])
def test_loops_agree(device_loop):
    rng = np.random.default_rng(5)
    poses_gt, pts_gt, intr, kps, desc, mask = make_feature_world(
        rng, n_cams=7, n_pts=250, noise=0.3
    )
    opts = SfmOptions(
        min_initial_inliers=80, min_matches=20,
        ransac_hyps_e=256, ransac_hyps_h=128, ransac_hyps_pnp=256,
        lm_capacity=4096, refine_max_iters=20, global_max_iters=30,
        device_loop=device_loop,
    )
    scene, stats = run_sfm(
        jnp.asarray(kps), jnp.asarray(desc), jnp.asarray(mask),
        image_size=(640, 480), intr=jnp.asarray(intr, jnp.float32),
        options=opts, verbose=False,
    )
    assert stats["registered"] == poses_gt.shape[0]
    assert _ate(scene, poses_gt) < 0.05
