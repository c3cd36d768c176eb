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
