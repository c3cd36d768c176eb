"""Deep-matcher pipeline integration: run_sfm on tables produced by the
attentional matcher (trained checkpoint) instead of the MXU ratio matcher."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_pipeline import make_feature_world
from eacham_tpu.sfm import run_sfm, SfmOptions
from eacham_tpu.sfm.matches import all_pairs_index
from eacham_tpu.utils.evaluate import ate_rmse

WEIGHTS = Path(__file__).resolve().parent.parent / "weights"


@pytest.mark.skipif(
    not (WEIGHTS / "lightglue.npz").exists(),
    reason="no trained weights checked in",
)
def test_deep_matching_reconstruction():
    from eacham_tpu.features.deep import lightglue as lg
    from eacham_tpu.features.deep.frontend import match_all_pairs_deep

    meta = (WEIGHTS / "lightglue.meta").read_text()
    n_layers = int([l for l in meta.splitlines() if l.startswith("n_layers")][0]
                   .split("=")[1])
    like = lg.init_params(jax.random.PRNGKey(0), n_layers=n_layers)
    params = lg.load_params(WEIGHTS / "lightglue.npz", like)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), params)

    rng = np.random.default_rng(21)
    poses_gt, pts_gt, intr, kps, desc, mask = make_feature_world(
        rng, n_cams=6, n_pts=64, noise=0.3
    )
    pair_idx = jnp.asarray(all_pairs_index(6))
    tables = match_all_pairs_deep(
        params, jnp.asarray(kps), jnp.asarray(desc), jnp.asarray(mask),
        pair_idx, (640, 480), n_layers=n_layers, min_matches=20, chunk=3,
    )
    assert int(tables[2].sum()) >= 10   # most pairs matched

    opts = SfmOptions(min_initial_inliers=25, min_matches=20,
                      ransac_hyps_e=128, ransac_hyps_h=64,
                      ransac_hyps_pnp=128, lm_capacity=1024,
                      refine_max_iters=15, global_max_iters=20)
    scene, stats = run_sfm(
        jnp.asarray(kps), jnp.asarray(desc), jnp.asarray(mask),
        image_size=(640, 480), intr=jnp.asarray(intr, jnp.float32),
        options=opts, verbose=False, match_tables=tables,
    )
    assert stats["initialized"]
    assert stats["registered"] >= 5

    valid = np.asarray(scene.pose_valid)
    est = np.asarray(scene.pose)[valid]
    gt = poses_gt[valid]
    c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
    assert ate_rmse(c_est, c_gt) < 0.1
