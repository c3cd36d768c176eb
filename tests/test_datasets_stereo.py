"""Dataset readers + stereo/RGB-D/Hamming geometry tools."""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from eacham_tpu.geometry.stereo import (
    point_from_stereo, point_from_depth, hamming_distance, match_hamming,
)
from eacham_tpu.io.datasets import (
    TumDataset, KittiDataset, load_tum_groundtruth,
)


def test_stereo_backprojection(rng):
    f, b = 500.0, 0.25
    intr = jnp.asarray([f, f, 320.0, 240.0])
    pts = rng.uniform(-1, 1, (50, 3)) + [0, 0, 6.0]
    uL = f * pts[:, 0] / pts[:, 2] + 320
    vL = f * pts[:, 1] / pts[:, 2] + 240
    uR = f * (pts[:, 0] - b) / pts[:, 2] + 320
    got = point_from_stereo(
        jnp.asarray(np.stack([uL, vL], -1), jnp.float32),
        jnp.asarray(uR, jnp.float32), intr, b,
    )
    np.testing.assert_allclose(np.asarray(got), pts, rtol=1e-4)


def test_depth_backprojection(rng):
    intr = jnp.asarray([100.0, 100.0, 32.0, 24.0])
    depth = jnp.asarray(rng.uniform(1, 5, (48, 64)).astype(np.float32))
    depth = depth.at[10, 20].set(0.0)
    uv = jnp.asarray([[20.0, 10.0], [30.0, 15.0]])
    pts, valid = point_from_depth(uv, depth, intr)
    assert not bool(valid[0]) and bool(valid[1])
    z = float(depth[15, 30])
    np.testing.assert_allclose(
        np.asarray(pts[1]), [(30 - 32) / 100 * z, (15 - 24) / 100 * z, z],
        rtol=1e-5,
    )


def test_hamming(rng):
    d1 = rng.integers(0, 256, (8, 32), dtype=np.uint8)
    d2 = d1.copy()
    d2[0, 0] ^= 0b1011  # 3 bit flips
    dist = np.asarray(hamming_distance(jnp.asarray(d1), jnp.asarray(d2)))
    assert dist[0, 0] == 3
    assert all(dist[i, i] == 0 for i in range(1, 8))
    idx, ok = match_hamming(
        jnp.asarray(d1), jnp.asarray(d2),
        jnp.ones(8, bool), jnp.ones(8, bool),
    )
    assert np.array_equal(np.asarray(idx)[np.asarray(ok)],
                          np.arange(8)[np.asarray(ok)])
    assert np.asarray(ok).sum() >= 6


@pytest.fixture
def tum_dir(tmp_path):
    rng = np.random.default_rng(0)
    (tmp_path / "rgb").mkdir()
    lines = ["# color images", "# ts filename"]
    for i in range(4):
        name = f"rgb/{1000.0 + 0.1 * i:.4f}.png"
        arr = (rng.random((24, 32, 3)) * 255).astype("uint8")
        Image.fromarray(arr).save(tmp_path / name)
        lines.append(f"{1000.0 + 0.1 * i:.4f} {name}")
    (tmp_path / "rgb.txt").write_text("\n".join(lines))
    gt = ["# gt"]
    for i in range(40):
        t = 999.95 + 0.01 * i
        gt.append(f"{t:.4f} {0.01 * i:.3f} 0 0 0 0 0 1")
    (tmp_path / "groundtruth.txt").write_text("\n".join(gt))
    return tmp_path


def test_tum_reader(tum_dir):
    ds = TumDataset.open(tum_dir)
    assert len(ds.files) == 4
    batch = ds.load()
    assert batch.images.shape == (4, 24, 32)
    poses, valid = ds.gt_for_frames()
    assert poses.shape == (4, 4, 4) and valid.all()
    # frame 1 at ts 1000.1 -> x = 0.01 * 15 = 0.15
    np.testing.assert_allclose(poses[1, 0, 3], 0.15, atol=0.011)


@pytest.fixture
def kitti_dir(tmp_path):
    rng = np.random.default_rng(0)
    (tmp_path / "image_0").mkdir()
    for i in range(3):
        arr = (rng.random((20, 40)) * 255).astype("uint8")
        Image.fromarray(arr, "L").save(tmp_path / "image_0" / f"{i:06d}.png")
    (tmp_path / "calib.txt").write_text(
        "P0: 700.0 0.0 600.0 0.0 0.0 700.0 180.0 0.0 0.0 0.0 1.0 0.0\n"
    )
    poses = []
    for i in range(3):
        P = np.eye(4)[:3]
        P[0, 3] = 1.5 * i
        poses.append(" ".join(str(v) for v in P.reshape(-1)))
    (tmp_path / "poses.txt").write_text("\n".join(poses))
    return tmp_path


def test_kitti_reader(kitti_dir):
    ds = KittiDataset.open(kitti_dir, poses_file=kitti_dir / "poses.txt")
    assert len(ds.files) == 3
    np.testing.assert_allclose(ds.intr, [700, 700, 600, 180])
    assert ds.groundtruth_poses.shape == (3, 4, 4)
    assert ds.groundtruth_poses[2, 0, 3] == 3.0
    batch = ds.load(max_count=2)
    assert batch.images.shape[0] == 2


def test_tum_gt_quaternion():
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        # 90 deg about z: q = (0, 0, sin45, cos45)
        f.write("1.0 1 2 3 0 0 0.7071068 0.7071068\n")
        path = f.name
    gt = load_tum_groundtruth(path)
    os.unlink(path)
    R = gt.poses[0, :3, :3]
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(gt.poses[0, :3, 3], [1, 2, 3])
