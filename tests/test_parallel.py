"""Distributed-path parity: sharded matching and sharded BA must agree with
their single-device counterparts on an 8-device virtual CPU mesh.

This is the multi-host logic test the reference has no analogue of
(SURVEY.md §4d): sharding correctness is validated without hardware via
``xla_force_host_platform_device_count`` (set in conftest.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import make_synthetic_scene
from eacham_tpu.ba.core import BAConfig, BAProblem, refine_ba
from eacham_tpu.features.matching import match_all_pairs
from eacham_tpu.parallel import make_mesh, match_all_pairs_sharded, refine_ba_sharded
from eacham_tpu.sfm.matches import all_pairs_index


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return make_mesh(8)


def _random_problem(rng, noise=1.0):
    poses, pts, intr, uv = make_synthetic_scene(rng, n_cams=6, n_pts=120, noise=0.5)
    n_cams, n_pts_ = poses.shape[0], pts.shape[0]
    obs_cam, obs_pt = np.meshgrid(
        np.arange(n_cams), np.arange(n_pts_), indexing="ij"
    )
    # perturb initial state so BA has work to do
    poses_init = poses.copy()
    poses_init[:, :3, 3] += rng.normal(scale=0.02, size=(n_cams, 3))
    pts_init = pts + rng.normal(scale=0.05, size=pts.shape)
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True
    return BAProblem(
        poses=jnp.asarray(poses_init, jnp.float32),
        points=jnp.asarray(pts_init, jnp.float32),
        intr=jnp.asarray(intr, jnp.float32),
        obs_cam=jnp.asarray(obs_cam.ravel(), jnp.int32),
        obs_pt=jnp.asarray(obs_pt.ravel(), jnp.int32),
        obs_uv=jnp.asarray(uv.reshape(-1, 2), jnp.float32),
        obs_mask=jnp.ones(n_cams * n_pts_, bool),
        cam_in_ba=jnp.ones(n_cams, bool),
        cam_fixed=jnp.asarray(fixed),
        pt_in_ba=jnp.ones(n_pts_, bool),
        pt_obs_count=jnp.full(n_pts_, float(n_cams)),
    ), poses, pts


def test_sharded_ba_matches_single_device(mesh, rng):
    prob, poses_gt, pts_gt = _random_problem(rng)
    cfg = BAConfig(max_iters=20, cg_iters=25)
    p1, x1, k1, info1 = refine_ba(prob, cfg)
    p8, x8, k8, info8 = refine_ba_sharded(prob, cfg, mesh)
    # identical control flow (same psum'd scalars); fp32 reduction order
    # differs across shards, so allow small drift around the shared optimum
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=2e-3)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k8), rtol=1e-3)
    assert abs(float(info1["final_cost"]) - float(info8["final_cost"])) < max(
        1e-3 * float(info1["final_cost"]), 1.0
    )


def test_sharded_ba_reduces_cost(mesh, rng):
    prob, _, _ = _random_problem(rng)
    cfg = BAConfig(max_iters=20, cg_iters=25)
    _, _, _, info = refine_ba_sharded(prob, cfg, mesh)
    assert float(info["final_cost"]) < 0.5 * float(info["initial_cost"])


def test_sharded_matching_parity(mesh, rng):
    N, K, D = 6, 64, 256
    desc = rng.normal(size=(N, K, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    # make some cross-frame correspondences
    desc[1, :32] = desc[0, :32]
    desc[3, :40] = desc[2, :40]
    desc = jnp.asarray(desc)
    mask = jnp.ones((N, K), bool)
    pair_idx = jnp.asarray(all_pairs_index(N))

    mj1, mv1, ok1 = match_all_pairs(desc, mask, pair_idx, min_matches=20, chunk=4)
    mj8, mv8, ok8 = match_all_pairs_sharded(
        desc, mask, pair_idx, mesh, min_matches=20, chunk=4
    )
    np.testing.assert_array_equal(np.asarray(mv1), np.asarray(mv8))
    np.testing.assert_array_equal(
        np.asarray(mj1)[np.asarray(mv1)], np.asarray(mj8)[np.asarray(mv8)]
    )
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok8))
