"""Streaming source + example scripts stay functional."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from eacham_tpu.io.stream import ReplaySource, drain, frames

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture
def img_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(5):
        arr = (rng.random((32, 48, 3)) * 255).astype("uint8")
        Image.fromarray(arr).save(tmp_path / f"f{i}.png")
    return tmp_path


def test_replay_drain(img_dir):
    batch = drain(ReplaySource(img_dir))
    assert batch.images.shape == (5, 32, 48)
    assert batch.names[0] == "f0.png"
    batch2 = drain(ReplaySource(img_dir), max_frames=3)
    assert batch2.images.shape[0] == 3


def test_stream_iteration(img_dir):
    seen = list(frames(ReplaySource(img_dir)))
    assert len(seen) == 5
    assert seen[2][0] == 2 and seen[2][1].shape == (32, 48)


def test_extract_match_example(img_dir, tmp_path):
    out = tmp_path / "overlay.png"
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"}
    r = subprocess.run(
        [sys.executable, str(REPO / "examples" / "extract_match.py"),
         str(img_dir / "f0.png"), str(img_dir / "f1.png"), str(out),
         "--max-keypoints", "64"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
