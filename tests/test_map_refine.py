"""Post-BA map-refinement rounds (SfmOptions.map_refine_rounds).

Covers the rebuild_map pass (sfm/posegraph.py): after the global BA the
tracks are wiped and re-formed under the refined poses, pruned, and
re-solved — and frames that never registered (invalid pose) must be
skipped entirely, never self-observing or merge-linking landmarks.
"""

import numpy as np
import jax.numpy as jnp

from tests.test_pipeline import make_feature_world
from eacham_tpu.sfm import run_sfm, SfmOptions
from eacham_tpu.utils.evaluate import ate_rmse

import pytest

# e2e/scale tier — excluded from the core tier (pytest -m 'not slow', README)
pytestmark = pytest.mark.slow


def test_map_refine_with_unregistered_frame():
    rng = np.random.default_rng(11)
    poses_gt, pts_gt, intr, kps, desc, mask = make_feature_world(
        rng, n_cams=8, n_pts=220
    )
    # frame 6: junk keypoints + random descriptors -> matches nothing,
    # PnP fails, the frame stays unregistered (invalid pose)
    kps[6] = rng.uniform(0, 400, kps[6].shape).astype(np.float32)
    junk = rng.normal(size=desc[6].shape).astype(np.float32)
    desc[6] = junk / np.linalg.norm(junk, axis=-1, keepdims=True)

    opts = SfmOptions(
        min_initial_inliers=80, min_matches=20, min_pnp_inliers=10,
        ransac_hyps_e=256, ransac_hyps_h=128, ransac_hyps_pnp=256,
        lm_capacity=4096, global_max_iters=15,
        map_refine_rounds=1,
    )
    scene, stats = run_sfm(
        jnp.asarray(kps), jnp.asarray(desc), jnp.asarray(mask),
        image_size=(640, 480), intr=jnp.asarray(intr, jnp.float32),
        options=opts,
    )

    valid = np.asarray(scene.pose_valid)
    assert not valid[6], "junk frame must stay unregistered"
    assert stats["registered"] >= 6

    # the rebuild produced a live map...
    assert int(jnp.sum(scene.lm_valid)) > 50

    # ...and the unregistered frame has no landmark links: rebuild_map
    # skips invalid poses (they would otherwise self-observe every track
    # with a garbage camera and merge-link under a garbage reprojection)
    assert int((np.asarray(scene.kp2lm[6]) >= 0).sum()) == 0

    est = np.asarray(scene.pose)[valid]
    gt = poses_gt[valid]
    c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
    assert ate_rmse(c_est, c_gt) < 0.05
