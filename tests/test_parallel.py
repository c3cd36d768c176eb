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

import pytest

# e2e/scale tier — excluded from the core tier (pytest -m 'not slow', README)
pytestmark = pytest.mark.slow


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


def test_run_sfm_mesh_parity(rng):
    """run_sfm with n_devices=8 (sharded matching + sharded global BA)
    must reconstruct the same scene as the single-device path."""
    from eacham_tpu.sfm import run_sfm, SfmOptions
    from eacham_tpu.utils.evaluate import ate_rmse

    n_frames, n_pts, f = 8, 160, 120.0
    pts = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    intr = np.array([f, f, 80.0, 60.0], np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    for i in range(n_frames):
        a = 0.04 * i
        c, s = np.cos(a), np.sin(a)
        poses[i, :3, :3] = [[c, 0, -s], [0, 1, 0], [s, 0, c]]
        poses[i, :3, 3] = [0.25 * i, 0.01 * i, 0.02 * i]
    pc = np.einsum("nij,pj->npi", poses[:, :3, :3], pts) + poses[:, None, :3, 3]
    uv = np.stack(
        [f * pc[..., 0] / pc[..., 2] + intr[2],
         f * pc[..., 1] / pc[..., 2] + intr[3]], -1
    ).astype(np.float32)
    vis = pc[..., 2] > 0.1
    desc = rng.normal(size=(n_pts, 64)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    desc = np.broadcast_to(desc, (n_frames, n_pts, 64)).copy()

    kw = dict(
        min_initial_inliers=40, min_matches=16,
        init_min_tri_angle_deg=0.5, min_tri_angle_deg=0.5,
        ransac_hyps_e=64, ransac_hyps_h=32, ransac_hyps_pnp=64,
        lm_capacity=1024, refine_max_iters=5, global_max_iters=8,
        local_ba_max_iters=4,
    )
    args = (jnp.asarray(uv), jnp.asarray(desc), jnp.asarray(vis))

    def ate(scene):
        valid = np.asarray(scene.pose_valid)
        est = np.asarray(scene.pose)[valid]
        gt = poses[valid]
        c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
        c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
        return ate_rmse(c_est, c_gt)

    s1, st1 = run_sfm(*args, image_size=(160, 120), intr=jnp.asarray(intr),
                      options=SfmOptions(**kw), verbose=False)
    s8, st8 = run_sfm(*args, image_size=(160, 120), intr=jnp.asarray(intr),
                      options=SfmOptions(n_devices=8, **kw), verbose=False)
    assert st8["registered"] == st1["registered"] >= n_frames - 1
    assert ate(s8) < 0.02 and ate(s1) < 0.02


@pytest.fixture(scope="module")
def mesh2d():
    """Virtual (hosts, chips) = (2, 4) mesh — the multi-host DCN x ICI
    layout (SURVEY §2.3/§5) validated without a pod slice."""
    from eacham_tpu.parallel.mesh import make_mesh_2d

    assert len(jax.devices()) >= 8
    return make_mesh_2d(2, 4)


def test_mesh2d_shape_and_flattening(mesh2d):
    from eacham_tpu.parallel.mesh import mesh_axes

    assert mesh2d.axis_names == ("dcn", "ici")
    assert mesh2d.shape["dcn"] == 2 and mesh2d.shape["ici"] == 4
    names, n = mesh_axes(mesh2d)
    assert names == ("dcn", "ici") and n == 8


def test_sharded_ba_parity_on_2d_mesh(mesh2d, rng):
    """The (hosts, chips) mesh must produce the same BA solution as the
    single device path — PartitionSpecs shard the obs axis over both
    axes flattened, psum reduces over the axis tuple."""
    prob, poses_gt, pts_gt = _random_problem(rng)
    cfg = BAConfig(max_iters=20, cg_iters=25)
    p1, x1, k1, info1 = refine_ba(prob, cfg)
    p8, x8, k8, info8 = refine_ba_sharded(prob, cfg, mesh2d)
    assert abs(float(info1["final_cost"]) - float(info8["final_cost"])) < (
        0.02 * max(float(info1["final_cost"]), 1.0))
    assert np.abs(np.asarray(p1) - np.asarray(p8)).max() < 5e-2


def test_sharded_matching_parity_on_2d_mesh(mesh2d, rng):
    desc = rng.normal(size=(6, 64, 32)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    kp_mask = np.ones((6, 64), bool)
    kp_mask[2, 40:] = False
    pair_idx = np.asarray(all_pairs_index(6))
    mj1, mv1, ok1 = match_all_pairs(
        jnp.asarray(desc), jnp.asarray(kp_mask), jnp.asarray(pair_idx),
        min_matches=5)
    mj8, mv8, ok8 = match_all_pairs_sharded(
        jnp.asarray(desc), jnp.asarray(kp_mask), jnp.asarray(pair_idx),
        mesh2d, min_matches=5)
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok8))
    np.testing.assert_array_equal(np.asarray(mv1), np.asarray(mv8))
    np.testing.assert_array_equal(
        np.asarray(mj1)[np.asarray(mv1)], np.asarray(mj8)[np.asarray(mv8)])


def test_init_distributed_single_process_noop():
    from eacham_tpu.parallel.mesh import init_distributed

    assert init_distributed() is False     # no coordinator configured


def test_sharded_ba_with_absolute_anchors(mesh, rng):
    """Absolute anchors must ride through the shard_map path (replicated
    specs for abs_pose/abs_mask) and agree with the single-device solve."""
    prob, poses_gt, pts_gt = _random_problem(rng)
    N = prob.poses.shape[0]
    anchor_mask = np.zeros(N, bool)
    anchor_mask[[0, N - 1]] = True
    anchors = np.zeros((N, 4, 4), np.float32)  # garbage rows off-mask
    anchors[0] = np.asarray(poses_gt[0])
    anchors[N - 1] = np.asarray(poses_gt[N - 1])
    prob = prob._replace(abs_pose=jnp.asarray(anchors),
                         abs_mask=jnp.asarray(anchor_mask),
                         cam_fixed=jnp.zeros(N, bool))
    cfg = BAConfig(max_iters=20, cg_iters=25)
    p1, _, _, info1 = refine_ba(prob, cfg)
    p8, _, _, info8 = refine_ba_sharded(prob, cfg, mesh)
    assert np.isfinite(np.asarray(p8)).all()
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=2e-3)
    # the anchored cams end at their anchors
    assert np.abs(np.asarray(p8)[0] - np.asarray(poses_gt[0])).max() < 5e-2
