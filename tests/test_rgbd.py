"""Metric RGB-D / stereo reconstruction (sfm/rgbd.py).

The decisive property vs the mono pipeline: poses come back in the DEPTH
CHANNEL'S metric scale, so trajectory error is evaluated with NO scale
(Umeyama) alignment — a mono reconstruction can only be compared up to
scale. Reference context: STEREO/RGBD source types exist but the C++
driver never consumes them (SURVEY.md §2 #34, Tools3d.h:14-60).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from eacham_tpu.sfm.pipeline import SfmOptions
from eacham_tpu.sfm.rgbd import (
    run_sfm_rgbd, depth_at_keypoints, stereo_depth_at_keypoints,
)


def _metric_world(rng, n_frames=8, n_pts=160, f=120.0, w=160, h=120,
                  spacing=0.5):
    """GT world with LARGE metric translations (spacing in meters) so a
    scale error is unmistakable in absolute ATE."""
    pts = rng.uniform(-3, 3, (n_pts, 3)).astype(np.float32)
    pts[:, 2] += 10.0
    intr = np.array([f, f, w / 2, h / 2], np.float32)
    Ts = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    for i in range(n_frames):
        a = 0.03 * i
        c, s = np.cos(a), np.sin(a)
        Ts[i, :3, :3] = [[c, 0, -s], [0, 1, 0], [s, 0, c]]
        Ts[i, :3, 3] = [spacing * i, 0.02 * i, 0.04 * i]
    pc = np.einsum("nij,pj->npi", Ts[:, :3, :3], pts) + Ts[:, None, :3, 3]
    uv = np.stack([f * pc[..., 0] / pc[..., 2] + intr[2],
                   f * pc[..., 1] / pc[..., 2] + intr[3]], -1)
    vis = pc[..., 2] > 0.1
    desc = rng.normal(size=(n_pts, 64)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    desc = desc[None] + rng.normal(
        scale=0.05, size=(n_frames, n_pts, 64)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    return (jnp.asarray(uv.astype(np.float32)), jnp.asarray(desc),
            jnp.asarray(vis), pc, Ts, jnp.asarray(intr))


def _abs_center_rmse(scene, Ts):
    valid = np.asarray(scene.pose_valid)
    est = np.asarray(scene.pose)[valid]
    gt = Ts[valid]
    c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
    # NO alignment of any kind: frame 0 is the shared gauge and the depth
    # channel is the shared scale.
    return float(np.sqrt(np.mean(np.sum((c_est - c_gt) ** 2, -1))))


OPTS = SfmOptions(
    min_matches=16, min_pnp_inliers=12, ransac_hyps_pnp=64,
    lm_capacity=2048, global_max_iters=8, match_chunk=4,
)


def test_rgbd_metric_scale(rng):
    uv, desc, vis, pc, Ts, intr = _metric_world(rng)
    kp_z = jnp.asarray(pc[..., 2].astype(np.float32)) * vis
    scene, stats = run_sfm_rgbd(uv, desc, vis, kp_z, intr,
                                options=OPTS, verbose=False)
    assert stats["registered"] >= 7, stats
    rmse = _abs_center_rmse(scene, Ts)
    # camera spacing is 0.5 m; an essential-matrix init would be off by an
    # arbitrary global scale — metric means absolute error well under the
    # inter-frame motion
    assert rmse < 0.05, rmse


def test_rgbd_noisy_depth(rng):
    uv, desc, vis, pc, Ts, intr = _metric_world(rng)
    z = pc[..., 2] * (1.0 + rng.normal(scale=0.01, size=pc.shape[:2]))
    kp_z = jnp.asarray(z.astype(np.float32)) * vis
    scene, stats = run_sfm_rgbd(uv, desc, vis, kp_z, intr,
                                options=OPTS, verbose=False)
    assert stats["registered"] >= 7, stats
    assert _abs_center_rmse(scene, Ts) < 0.15


def test_stereo_depth_roundtrip(rng):
    """stereo_depth_at_keypoints inverts a rendered rectified disparity."""
    uv, desc, vis, pc, Ts, intr = _metric_world(rng)
    baseline = 0.2
    f = float(intr[0])
    z = pc[..., 2]
    # right camera: shifted by baseline along +x in the camera frame
    u_right = np.asarray(uv[..., 0]) - f * baseline / z
    kp_z = stereo_depth_at_keypoints(uv, jnp.asarray(u_right), intr, baseline)
    np.testing.assert_allclose(np.asarray(kp_z)[np.asarray(vis)],
                               z[np.asarray(vis)], rtol=1e-4)


def test_stereo_metric_pipeline(rng):
    uv, desc, vis, pc, Ts, intr = _metric_world(rng)
    baseline = 0.2
    f = float(intr[0])
    u_right = np.asarray(uv[..., 0]) - f * baseline / pc[..., 2]
    kp_z = stereo_depth_at_keypoints(
        uv, jnp.asarray(u_right.astype(np.float32)), intr, baseline) * vis
    scene, stats = run_sfm_rgbd(uv, desc, vis, kp_z, intr,
                                options=OPTS, verbose=False)
    assert stats["registered"] >= 7
    assert _abs_center_rmse(scene, Ts) < 0.05


def test_depth_at_keypoints():
    depth = jnp.arange(12.0).reshape(1, 3, 4)
    xy = jnp.asarray([[[1.2, 0.4], [3.9, 2.1]]])
    z = depth_at_keypoints(depth, xy)
    np.testing.assert_allclose(np.asarray(z), [[1.0, 11.0]])


def test_tum_depth_loading(tmp_path):
    """TumDataset.load_depth: 16-bit PNG / 5000 association contract."""
    from PIL import Image
    from eacham_tpu.io.datasets import TumDataset

    root = tmp_path
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rgb_lines, depth_lines = ["# c"], ["# d"]
    for i, t in enumerate([1.00, 1.05, 1.10]):
        img = Image.fromarray((np.ones((8, 10)) * 80).astype(np.uint8))
        img.save(root / "rgb" / f"{t:.6f}.png")
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        if i != 1:  # frame 1 has NO depth -> must come back invalid
            d = (np.full((8, 10), 5000 * (i + 1))).astype(np.uint16)
            Image.fromarray(d, mode="I;16").save(
                root / "depth" / f"{t + 0.004:.6f}.png")
            depth_lines.append(f"{t + 0.004:.6f} depth/{t + 0.004:.6f}.png")
    (root / "rgb.txt").write_text("\n".join(rgb_lines))
    (root / "depth.txt").write_text("\n".join(depth_lines))

    ds = TumDataset.open(root)
    depth, has = ds.load_depth()
    assert has.tolist() == [True, False, True]
    np.testing.assert_allclose(depth[0], 1.0)
    np.testing.assert_allclose(depth[1], 0.0)
    np.testing.assert_allclose(depth[2], 3.0)
