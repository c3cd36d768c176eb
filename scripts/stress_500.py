"""Capacity stress: 500-frame image-driven reconstruction on one chip.

The match graph must survive reference-scale N (BASELINE.md targets KITTI
seq 00, N≈4500): dense all-pairs [P, K] tables are quadratic in N, so this
run exercises the capacity policy instead — windowed candidate pairs +
pooled-descriptor retrieval (SfmOptions.pair_window) bounding P to O(N).

    python scripts/stress_500.py            # real chip
    JAX_PLATFORMS=cpu python scripts/stress_500.py --frames 60   # smoke
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--width", type=int, default=384)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--kps", type=int, default=512)
    args = ap.parse_args()

    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    from eacham_tpu.features.frontend import extract_features
    from eacham_tpu.sfm import run_sfm, SfmOptions
    from eacham_tpu.utils.evaluate import ate_rmse
    from eacham_tpu.utils.synthetic import (
        make_blob_scene, render_view,
    )

    N = args.frames
    W, H = args.width, args.height
    f = 1.2 * max(W, H)
    intr = np.array([f, f, W / 2, H / 2], np.float32)
    rng = np.random.default_rng(0)

    # long slow orbit: the camera advances along a circle around a large
    # blob field; consecutive frames overlap heavily, distant ones don't
    scene_blobs = make_blob_scene(rng, n_blobs=4000, depth=(4.0, 14.0),
                                  spread=7.0)
    t0 = time.perf_counter()
    poses = []
    for i in range(N):
        # ~0.4 deg/frame yaw + 0.045/frame translation: 10-frame pairs see
        # 2.5-5 deg of parallax at the 4-14 blob depth — realistic video
        # motion (0.12 deg/frame left every triangulation at the 0.8 deg
        # floor and the map drowned in depth noise)
        a = np.deg2rad(0.4 * i)
        c, s = np.cos(a), np.sin(a)
        R = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)
        t = np.array([0.04 * i, 0.005 * i, 0.02 * i], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        poses.append(T)
    poses = np.stack(poses)
    images = np.stack([
        render_view(scene_blobs, T, intr, W, H) for T in poses
    ])
    print(f"rendered {N} frames {W}x{H} in {time.perf_counter() - t0:.0f}s",
          flush=True)

    opts = SfmOptions(
        pair_window=10, pair_retrieval_k=3,
        min_initial_inliers=80, min_matches=25, match_ratio=0.85,
        init_min_tri_angle_deg=0.8, min_tri_angle_deg=0.8,
        ransac_hyps_e=256, ransac_hyps_h=128, ransac_hyps_pnp=256,
        lm_capacity=65536, refine_max_iters=30, global_max_iters=40,
        match_chunk=32,
    )

    t0 = time.perf_counter()
    xy, desc, score, mask = extract_features(
        jnp.asarray(images), max_keypoints=args.kps)
    np.asarray(xy)
    t_extract = time.perf_counter() - t0
    print(f"extract: {t_extract:.1f}s", flush=True)

    t0 = time.perf_counter()
    scene, stats = run_sfm(
        xy, desc, mask, image_size=(W, H), intr=jnp.asarray(intr),
        options=opts, verbose=True,
    )
    np.asarray(scene.pose)
    t_recon = time.perf_counter() - t0

    valid = np.asarray(scene.pose_valid)
    est = np.asarray(scene.pose)[valid]
    gt = poses[valid]
    c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
    rmse = ate_rmse(c_est, c_gt) if valid.sum() >= 3 else float("nan")
    total = t_extract + t_recon
    print(f"registered {stats['registered']}/{N}, "
          f"landmarks {stats['landmarks']}, ATE {rmse:.4f}")
    print(f"extract {t_extract:.1f}s + reconstruct {t_recon:.1f}s "
          f"= {total:.1f}s -> {N / total:.2f} frames/s")


if __name__ == "__main__":
    main()
