"""Config/IO tests: schema parity with the reference's files and the
golden transform.json / transforms_nerf.json formats (test strategy (b),
SURVEY.md §4)."""

import json
import math
from pathlib import Path

import numpy as np
import pytest

from eacham_tpu.io.config import load_config, parse_config
from eacham_tpu.io.images import downsize_policy, load_image_dir
from eacham_tpu.io.nerf import convert_pose, transform_to_nerf
from eacham_tpu.io.saver import positions_json, save_positions

REFERENCE_CONFIG = {
    # the shipped config/SfmConfig.json schema, values included
    "root_path": "/data/scene", "images_path": "/images",
    "transform_path": "/transform.json", "nerfy": True,
    "max_data_count": 0, "ui": True,
    "feature": {"min_features_count": 100, "max_features_count": 15000,
                "inliers_ratio": 0.8},
    "reconstruction": {
        "initial_pair": {"min_inliers": 450, "min_matches": 10,
                         "min_corrs": 10, "max_reprojection_error": 4.0,
                         "min_angle": 3.0},
        "processing": {"min_matches": 10, "min_corrs": 10,
                       "max_reprojection_error": 8.0, "min_angle": 2.0,
                       "min_pnp_inliers": 15},
    },
    "refine_ba": {"method": "LM", "max_iter": 100, "max_toler": 1e-5,
                  "delta": 10.0, "use_preconditioner": False},
    "global_ba": {"method": "LM", "max_iter": 150, "max_toler": 1e-7,
                  "delta": 5.0, "use_preconditioner": True},
}


def test_config_parse_reference_schema():
    cfg = parse_config(REFERENCE_CONFIG)
    assert cfg.images_path == "/data/scene/images"
    assert cfg.output_transform_path == "/data/scene/transform.json"
    assert cfg.initial_min_inliers == 450
    assert abs(cfg.initial_min_tri_angle - math.radians(3.0)) < 1e-9
    assert abs(cfg.min_tri_angle - math.radians(2.0)) < 1e-9
    assert cfg.min_pnp_inliers == 15
    assert cfg.refine_opt.max_iter == 100
    assert cfg.global_opt.max_iter == 150
    # the knowing fix: global section's own delta/preconditioner are used
    # (the reference reads refine_ba's, SfmConfig.h:67-68)
    assert cfg.global_opt.delta == 5.0
    assert cfg.global_opt.use_preconditioner is True


def test_config_to_options():
    opts = parse_config(REFERENCE_CONFIG).to_options(max_keypoints=512)
    assert opts.min_initial_inliers == 450
    assert abs(opts.min_tri_angle - math.radians(2.0)) < 1e-6
    assert opts.global_max_iters == 150


def test_downsize_policy():
    assert downsize_policy(1500) == 1.0
    assert downsize_policy(800) == 1.0
    s = downsize_policy(3000)
    assert 3000 * s <= 1500 and 3000 * s / 0.95 > 1500   # minimal power


def test_transform_json_fields(tmp_path):
    poses = np.tile(np.eye(4), (2, 1, 1))
    poses[1, 0, 3] = 2.5
    save_positions(tmp_path / "transform.json", ["a.png", "b.png"], poses,
                   width=640, height=480, cx=320, cy=240, fx=600, fy=600)
    data = json.loads((tmp_path / "transform.json").read_text())
    # exact field set of Saver.h:20-44
    for key in ["version", "w", "h", "cx", "cy", "fl_x", "fl_y", "k1", "k2",
                "k3", "k4", "p1", "p2", "is_fisheye", "camera_angle_x",
                "camera_angle_y", "fovx", "fovy", "frames"]:
        assert key in data, key
    assert data["version"] == 0 and data["is_fisheye"] is False
    assert abs(data["camera_angle_x"] - 2 * math.atan(640 / 1200)) < 1e-9
    assert data["frames"][1]["file_path"] == "b.png"
    assert data["frames"][1]["transform_matrix"][0][3] == 2.5


def test_nerf_conversion_roundtrip(tmp_path):
    # world->cam with rotation + translation
    th = 0.3
    T = np.eye(4)
    T[:3, :3] = [[np.cos(th), -np.sin(th), 0],
                 [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    T[:3, 3] = [1.0, -2.0, 3.0]
    save_positions(tmp_path / "transform.json", ["x.png"], T[None],
                   width=64, height=48, cx=32, cy=24, fx=60, fy=60)
    out = transform_to_nerf(tmp_path)
    got = np.asarray(
        json.loads(out.read_text())["frames"][0]["transform_matrix"]
    )
    want = np.linalg.inv(T) @ np.diag([1.0, -1.0, -1.0, 1.0])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_image_dir_loading(tmp_path):
    from PIL import Image

    for i, (w, h) in enumerate([(64, 48), (64, 48), (60, 40)]):
        arr = (np.random.default_rng(i).random((h, w, 3)) * 255).astype("uint8")
        Image.fromarray(arr).save(tmp_path / f"im{i}.png")
    (tmp_path / "notes.txt").write_text("ignored")
    batch = load_image_dir(tmp_path)
    assert batch.images.shape == (3, 48, 64)          # padded to max
    assert batch.names == ["im0.png", "im1.png", "im2.png"]
    assert tuple(batch.sizes[2]) == (60, 40)
    assert 0.0 <= batch.images.min() and batch.images.max() <= 1.0
    batch2 = load_image_dir(tmp_path, max_count=2)
    assert len(batch2.names) == 2                      # SfmInputSource.h:24-27
