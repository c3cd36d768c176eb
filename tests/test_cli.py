"""Full-binary end-to-end test: images on disk -> CLI -> transform.json.

The closest thing the reference has is a manual run of ./sfm config.json
(apps/sfm/main.cpp); here it's automated on rendered synthetic views with
GT poses, checking registration rate, output schema, and ATE.
"""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from eacham_tpu.utils.synthetic import render_sequence
from eacham_tpu.utils.evaluate import ate_rmse

import pytest

# e2e/scale tier — excluded from the core tier (pytest -m 'not slow', README)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    (root / "images").mkdir()
    rng = np.random.default_rng(3)
    images, poses_gt, intr = render_sequence(
        rng, n_frames=10, width=320, height=240, n_blobs=300
    )
    for i, img in enumerate(images):
        Image.fromarray((img * 255).astype("uint8")).save(
            root / "images" / f"frame{i:03d}.png"
        )
    config = {
        "root_path": str(root), "images_path": "/images",
        "transform_path": "/transform.json", "nerfy": True,
        "max_data_count": 0, "ui": False,
        "feature": {"min_features_count": 50, "max_features_count": 512,
                    "inliers_ratio": 0.8},
        "reconstruction": {
            "initial_pair": {"min_inliers": 60, "min_matches": 10,
                             "min_corrs": 10, "max_reprojection_error": 4.0,
                             "min_angle": 1.0},
            "processing": {"min_matches": 10, "min_corrs": 10,
                           "max_reprojection_error": 8.0, "min_angle": 0.8,
                           "min_pnp_inliers": 15},
        },
        "refine_ba": {"method": "LM", "max_iter": 30, "max_toler": 1e-5,
                      "delta": 10.0, "use_preconditioner": False},
        "global_ba": {"method": "LM", "max_iter": 50, "max_toler": 1e-6,
                      "delta": 10.0, "use_preconditioner": False},
    }
    cfg_path = root / "config.json"
    cfg_path.write_text(json.dumps(config))
    return root, cfg_path, poses_gt, intr


@pytest.fixture(scope="module")
def cli_run(dataset):
    from eacham_tpu.cli import run

    root, cfg_path, poses_gt, intr = dataset
    stats = run(str(cfg_path), max_keypoints=512, verbose=True)
    return root, poses_gt, stats


def test_cli_registers_most_frames(cli_run):
    root, poses_gt, stats = cli_run
    assert stats["initialized"]
    assert stats["registered"] >= poses_gt.shape[0] - 2


def test_cli_output_schema_and_ate(cli_run):
    root, poses_gt, stats = cli_run
    data = json.loads((root / "transform.json").read_text())
    assert data["w"] == 320 and data["h"] == 240
    frames = data["frames"]
    assert len(frames) == stats["registered"]

    ids = [int(f["file_path"][5:8]) for f in frames]
    est = np.stack([np.asarray(f["transform_matrix"]) for f in frames])
    gt = poses_gt[ids]
    c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
    rmse = ate_rmse(c_est, c_gt)
    assert rmse < 0.08, f"ATE {rmse}"


def test_cli_nerf_output(cli_run):
    root, _, _ = cli_run
    nerf = json.loads((root / "transforms_nerf.json").read_text())
    src = json.loads((root / "transform.json").read_text())
    pose = np.asarray(src["frames"][0]["transform_matrix"])
    want = np.linalg.inv(pose) @ np.diag([1.0, -1.0, -1.0, 1.0])
    got = np.asarray(nerf["frames"][0]["transform_matrix"])
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_cli_dogleg_preconditioner_config(dataset, tmp_path):
    """Config-driven optimizer selection end-to-end: method=DogLeg +
    use_preconditioner=true must (a) map onto SfmOptions/BAConfig
    (SfmConfig.h:15-24 paths, with the globalOpt-reads-refine bug fixed)
    and (b) drive an observably different optimizer through the CLI."""
    import json as _json
    from eacham_tpu.cli import run
    from eacham_tpu.io.config import load_config

    root, cfg_path, poses_gt, intr = dataset
    cfg = _json.loads(Path(cfg_path).read_text())
    cfg["refine_ba"] = {"method": "DogLeg", "max_iter": 20,
                        "max_toler": 1e-5, "delta": 4.0,
                        "use_preconditioner": True}
    cfg["global_ba"] = {"method": "DogLeg", "max_iter": 30,
                        "max_toler": 1e-6, "delta": 6.0,
                        "use_preconditioner": True}
    cfg["transform_path"] = "/transform_dogleg.json"
    dl_path = tmp_path / "config_dogleg.json"
    dl_path.write_text(_json.dumps(cfg))

    parsed = load_config(dl_path)
    opts = parsed.to_options()
    assert opts.refine_method == "DogLeg" and opts.global_method == "DogLeg"
    assert opts.refine_solver == "pcg" and opts.global_solver == "pcg"
    assert opts.refine_delta == 4.0 and opts.global_delta == 6.0

    stats = run(str(dl_path), max_keypoints=512, verbose=False)
    assert stats["initialized"] and stats["registered"] >= 8
    out = _json.loads((root / "transform_dogleg.json").read_text())
    assert len(out["frames"]) == stats["registered"]
