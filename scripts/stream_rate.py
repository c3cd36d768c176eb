"""Sustained streaming-rate measurement (SENSOR modality at scale).

Feeds a rendered 256-frame orbit to StreamingReconstructor in fixed
windows at max_frames=512 capacity and prints per-window latency for
finalize_every in {1, k}: with per-window global BA the latency grows
with arrived frames (superlinear total); with amortized finalize the
intermediate windows pay only extract + incremental match + sweep —
the sensor-rate design (VERDICT r2 weak #6).

    python scripts/stream_rate.py [--frames 256 --window 16 --every 4]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--every", type=int, default=4)
    ap.add_argument("--capacity", type=int, default=512)
    ap.add_argument("--kps", type=int, default=512)
    ap.add_argument("--compare", action="store_true",
                    help="also run finalize_every=1 for the latency curve")
    args = ap.parse_args()

    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp  # noqa: F401  (forces backend init before timing)
    from eacham_tpu.sfm import SfmOptions
    from eacham_tpu.sfm.streaming import StreamingReconstructor
    from eacham_tpu.utils.evaluate import ate_rmse
    from eacham_tpu.utils.synthetic import (
        make_surface_scene, render_view,
    )

    N, W, H = args.frames, 512, 384
    f = 1.2 * max(W, H)
    intr = np.array([f, f, W / 2, H / 2], np.float32)
    rng = np.random.default_rng(0)
    center = np.array([0.0, 0.0, 9.0], np.float32)
    poses = []
    for i in range(N):
        a = np.deg2rad(360.0 * 1.04 * i / max(N, 1) * (N / 500.0))
        cam = center + 14.0 * np.array(
            [np.sin(a), 0.025 * np.sin(5 * a), -np.cos(a)], np.float32)
        fwd = center - cam
        fwd /= np.linalg.norm(fwd)
        right = np.cross([0.0, 1.0, 0.0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        R = np.stack([right, up, fwd]).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = -R @ cam
        poses.append(T)
    poses = np.stack(poses)
    t0 = time.perf_counter()
    blobs = make_surface_scene(rng, n_blobs=4000, jitter=0.05)
    images = np.stack([render_view(blobs, T, intr, W, H) for T in poses])
    print(f"rendered {N} frames in {time.perf_counter() - t0:.0f}s",
          flush=True)

    opts = SfmOptions(
        max_features=args.kps, min_initial_inliers=80, min_matches=20,
        match_ratio=0.85, init_min_tri_angle_deg=0.8,
        min_tri_angle_deg=0.8, ransac_hyps_e=256, ransac_hyps_h=128,
        ransac_hyps_pnp=256, lm_capacity=65536, refine_max_iters=20,
        global_max_iters=30, local_ba_free_span=6,
    )

    def run(every):
        rec = StreamingReconstructor(
            image_size=(W, H), intr=intr, options=opts,
            max_frames=args.capacity, window=8, retrieval_k=2,
            finalize_every=every,
        )
        lat = []
        for lo in range(0, N, args.window):
            t0 = time.perf_counter()
            st = rec.process(images[lo:lo + args.window])
            lat.append(time.perf_counter() - t0)
            print(f"  window {lo // args.window:3d}: {lat[-1]:6.2f}s "
                  f"reg={st.get('registered', 0)}", flush=True)
        t0 = time.perf_counter()
        stf = rec.finalize()
        t_fin = time.perf_counter() - t0
        valid = np.asarray(rec.scene.pose_valid)[:N]
        est = np.asarray(rec.scene.pose)[:N][valid]
        gt = poses[valid]
        ce = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
        cg = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
        rmse = ate_rmse(ce, cg) if valid.sum() >= 3 else float("nan")
        half = len(lat) // 2
        print(f"finalize_every={every}: registered "
              f"{stf['registered']}/{N}, ATE {rmse:.3f}; per-window "
              f"latency first-half mean {np.mean(lat[1:half]):.2f}s, "
              f"second-half mean {np.mean(lat[half:]):.2f}s "
              f"(warmup window 0: {lat[0]:.1f}s); final polish {t_fin:.1f}s; "
              f"sustained {N / sum(lat[1:]):.2f} frames/s post-warmup",
              flush=True)

    run(args.every)
    if args.compare:
        run(1)


if __name__ == "__main__":
    main()
