"""Generate byte-exact miniature TUM and KITTI fixture trees.

The dataset readers (eacham_tpu/io/datasets.py) mirror the reference's
TUM/KITTI modalities (config/ConfigTUM.json:1-47, ConfigKITTI.json:1-48)
but had only ever parsed self-synthesized in-test files. This writes
REAL-format directory trees — TUM `rgb.txt`/`groundtruth.txt`/`rgb/*.png`
and KITTI `sequences/00/{image_0,calib.txt,times.txt}` + `poses/00.txt` —
from the first-party renderer, checked in under tests/data/ so the
reader -> pipeline -> ATE path is exercised on the exact on-disk formats
the real datasets use.

    python scripts/make_fixtures.py [--out tests/data]
"""
import argparse
import struct
import sys
import zlib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def write_png_gray(path: Path, img: np.ndarray) -> None:
    """Minimal 8-bit grayscale PNG encoder (filter 0, one IDAT)."""
    h, w = img.shape
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    path.write_bytes(png)


def rot_to_quat(R: np.ndarray) -> np.ndarray:
    """[3,3] -> (qx, qy, qz, qw), TUM component order."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[3] = (R[k, j] - R[j, k]) / s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        x, y, z, w = q
    return np.array([x, y, z, w])


def render_sequence(n, w, h, seed=0):
    from eacham_tpu.utils.synthetic import make_blob_scene, orbit_poses, render_view

    rng = np.random.default_rng(seed)
    f = 1.2 * max(w, h)
    intr = np.array([f, f, w / 2, h / 2], np.float32)
    scene = make_blob_scene(rng, n_blobs=500, depth=(3.5, 9.0), spread=2.6)
    poses = orbit_poses(n, radius=0.6, step_deg=0.9, advance=0.05)
    images = np.stack([render_view(scene, T, intr, w, h) for T in poses])
    img8 = np.clip(images * 255.0, 0, 255).astype(np.uint8)
    return img8, poses, intr


def make_tum(out: Path, n=12, w=256, h=192):
    """freiburg-style tree: rgb/<ts>.png, rgb.txt, groundtruth.txt.

    Ground truth runs at ~3x the frame rate with a small clock offset so
    the nearest-timestamp association (GroundTruth.associate) is
    genuinely exercised, exactly like the real sequences.
    """
    root = out / "tum_mini"
    (root / "rgb").mkdir(parents=True, exist_ok=True)
    img8, poses_wc, intr = render_sequence(n, w, h, seed=3)
    t0 = 1305031102.175304                      # freiburg1-style epoch
    frame_ts = t0 + np.arange(n) / 30.0

    rgb_lines = ["# color images", "# file: 'tum_mini'",
                 "# timestamp filename"]
    for k in range(n):
        name = f"rgb/{frame_ts[k]:.6f}.png"
        write_png_gray(root / name, img8[k])
        rgb_lines.append(f"{frame_ts[k]:.6f} {name}")
    (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")

    # cam->world at ~90 Hz with +4 ms offset vs the image clock
    gt_lines = ["# ground truth trajectory", "# file: 'tum_mini'",
                "# timestamp tx ty tz qx qy qz qw"]
    gt_ts = t0 + 0.004 + np.arange(3 * n) / 90.0
    for t in gt_ts:
        k = min(int(round((t - t0) * 30.0)), n - 1)     # nearest frame pose
        T_cw = np.linalg.inv(poses_wc[k])               # cam->world
        q = rot_to_quat(T_cw[:3, :3])
        tx, ty, tz = T_cw[:3, 3]
        gt_lines.append(
            f"{t:.6f} {tx:.4f} {ty:.4f} {tz:.4f} "
            f"{q[0]:.4f} {q[1]:.4f} {q[2]:.4f} {q[3]:.4f}")
    (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    print(f"wrote {root} ({n} frames {w}x{h})")


def make_kitti(out: Path, n=12, w=256, h=192):
    """odometry-style tree: sequences/00/{image_0,calib.txt,times.txt} and
    poses/00.txt (12 floats per line, cam0->world)."""
    seq = out / "kitti_mini" / "sequences" / "00"
    (seq / "image_0").mkdir(parents=True, exist_ok=True)
    (out / "kitti_mini" / "poses").mkdir(parents=True, exist_ok=True)
    img8, poses_wc, intr = render_sequence(n, w, h, seed=4)
    for k in range(n):
        write_png_gray(seq / "image_0" / f"{k:06d}.png", img8[k])
    fx, fy, cx, cy = (float(v) for v in intr)
    P = [fx, 0.0, cx, 0.0, 0.0, fy, cy, 0.0, 0.0, 0.0, 1.0, 0.0]
    Pline = " ".join(f"{v:.12e}" for v in P)
    calib = "\n".join(f"P{i}: {Pline}" for i in range(4))
    (seq / "calib.txt").write_text(calib + "\nTr: " + " ".join(
        f"{v:.12e}" for v in np.eye(3, 4).ravel()) + "\n")
    (seq / "times.txt").write_text("\n".join(
        f"{k / 10.0:.6e}" for k in range(n)) + "\n")
    lines = []
    for k in range(n):
        T_cw = np.linalg.inv(poses_wc[k])
        lines.append(" ".join(f"{v:.6e}" for v in T_cw[:3, :].ravel()))
    (out / "kitti_mini" / "poses" / "00.txt").write_text(
        "\n".join(lines) + "\n")
    print(f"wrote {out / 'kitti_mini'} ({n} frames {w}x{h})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/data")
    ap.add_argument("--frames", type=int, default=12)
    args = ap.parse_args()
    out = Path(args.out)
    make_tum(out, n=args.frames)
    make_kitti(out, n=args.frames)
