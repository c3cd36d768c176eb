"""End-to-end demo on a rendered synthetic scene (no dataset needed).

Renders a blob-field sequence with known poses, reconstructs it with the
full pipeline, reports ATE against the generating trajectory, and writes
transform.json + PLY exports.

    python examples/reconstruct_synthetic.py /tmp/demo_out
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/eacham_demo")
    out_dir.mkdir(parents=True, exist_ok=True)

    import jax.numpy as jnp
    from eacham_tpu.features.frontend import extract_features
    from eacham_tpu.io.export import export_cloud, export_trajectory
    from eacham_tpu.io.saver import save_positions
    from eacham_tpu.sfm import run_sfm, SfmOptions
    from eacham_tpu.utils.evaluate import ate_rmse
    from eacham_tpu.utils.synthetic import render_sequence

    rng = np.random.default_rng(0)
    print("rendering 12-frame synthetic sequence ...")
    images, poses_gt, intr = render_sequence(
        rng, n_frames=12, width=320, height=240, n_blobs=350)

    xy, desc, score, mask = extract_features(
        jnp.asarray(images), max_keypoints=512)

    opts = SfmOptions(min_initial_inliers=60, min_matches=15,
                      init_min_tri_angle_deg=1.0, min_tri_angle_deg=0.8,
                      lm_capacity=8192)
    scene, stats = run_sfm(xy, desc, mask, image_size=(320, 240),
                           options=opts, verbose=True)

    valid = np.asarray(scene.pose_valid)
    est = np.asarray(scene.pose)[valid]
    gt = poses_gt[valid]
    c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
    print(f"ATE RMSE: {ate_rmse(c_est, c_gt):.4f} "
          f"(trajectory span ~{np.ptp(c_gt, 0).max():.2f})")

    names = [f"frame{i:03d}.png" for i in np.nonzero(valid)[0]]
    k = np.asarray(scene.intr)
    save_positions(out_dir / "transform.json", names, est,
                   320, 240, float(k[2]), float(k[3]), float(k[0]), float(k[1]))
    n_pts = export_cloud(out_dir / "cloud.ply", scene)
    export_trajectory(out_dir / "trajectory.ply", scene)
    print(f"wrote transform.json, cloud.ply ({n_pts} points), trajectory.ply "
          f"to {out_dir}")


if __name__ == "__main__":
    main()
