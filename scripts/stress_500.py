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
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--kps", type=int, default=1024)
    ap.add_argument("--interim", type=int, default=10)
    ap.add_argument("--max-observers", type=int, default=12)
    ap.add_argument("--retrieval-k", type=int, default=3)
    ap.add_argument("--loop-close", type=int, default=1)
    ap.add_argument("--global-iters", type=int, default=100)
    ap.add_argument("--refine-rounds", type=int, default=-1,
                    help="-1 = the library AUTO policy (repair rounds when loop edges exist)")
    ap.add_argument("--ba-every", type=int, default=1,
                    help="run the windowed local BA on every M-th "
                         "registration (SfmOptions.local_ba_every)")
    ap.add_argument("--lm-capacity", type=int, default=131072)
    ap.add_argument("--segment", type=int, default=128)
    ap.add_argument("--ba-program-iters", type=int, default=10)
    ap.add_argument("--free-span", type=int, default=6,
                    help="freeze window-BA cams more than this many ids "
                         "from the current frame (0 = all free)")
    ap.add_argument("--cache", default="/tmp/stress500_feat.npz",
                    help="feature cache (skips render+extract on reruns)")
    args = ap.parse_args()

    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    from eacham_tpu.features.frontend import extract_features
    from eacham_tpu.sfm import run_sfm, SfmOptions
    from eacham_tpu.utils.evaluate import ate_rmse
    from eacham_tpu.utils.synthetic import (
        make_surface_scene, render_view,
    )

    N = args.frames
    W, H = args.width, args.height
    f = 1.2 * max(W, H)
    intr = np.array([f, f, W / 2, H / 2], np.float32)
    rng = np.random.default_rng(0)

    from pathlib import Path
    cache = Path(args.cache) if args.cache else None
    cached = None
    if cache is not None and cache.exists():
        d = np.load(cache)
        if (int(d["n"]) == N and int(d["w"]) == W and int(d["h"]) == H
                and int(d["kps"]) == args.kps):
            cached = d
            print(f"features from cache {cache}", flush=True)

    # long slow orbit: the camera advances along a circle around a large
    # blob field; consecutive frames overlap heavily, distant ones don't
    # 2200 blobs at 512x384: dense enough for 512 keypoints/frame but
    # distinctive enough that descriptor matches stay unambiguous
    # (4000 blobs at 384x288 was visual clutter: false matches stitched
    # different blobs into one track and the map drifted, ATE ~1)
    # look-at orbit around the blob-field center: every frame faces the
    # structure (no walk-off at 500 frames); the orbit overshoots 360 deg
    # so the tail revisits the start and the retrieval candidates close
    # the loop (a non-closing arc has no long-range constraints and the
    # scale drift of windowed-BA frontiers goes unchecked), and the arc at
    # radius 8 gives 10-frame pairs ~4-5 deg of parallax — comfortably
    # above the 0.8 deg triangulation floor (0.12 deg/frame drowned the
    # map in depth noise; a straight 0.04/frame walk left the field)
    img_cache = (Path(str(cache) + ".imgs.npy")
                 if cache is not None else None)
    # orbit_r 14: field half-extent ~7 -> blobs sit 7-21 units away.
    # SHARED generator (anchor_probe/kitti_rehearsal reuse the feature
    # caches, so the geometry must come from one definition)
    from eacham_tpu.utils.synthetic import stress_orbit_poses

    poses = stress_orbit_poses(N)
    if cached is None:
        if img_cache is not None and img_cache.exists():
            images = np.load(img_cache, mmap_mode="r")
            assert images.shape == (N, H, W), images.shape
            print(f"images from cache {img_cache}", flush=True)
        else:
            t0 = time.perf_counter()
            # textured SURFACE world (blobs on a jittered sphere): a
            # volumetric blob cloud cannot support wide-baseline matching —
            # overlapping blobs at different depths rearrange every
            # descriptor window between views (make_surface_scene docstring)
            scene_blobs = make_surface_scene(rng, n_blobs=4000, jitter=0.05)
            images = np.stack([
                render_view(scene_blobs, T, intr, W, H) for T in poses
            ])
            print(f"rendered {N} frames {W}x{H} in "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
            if img_cache is not None and N > 1000:
                np.save(img_cache, images)

    opts = SfmOptions(
        pair_window=10, pair_retrieval_k=args.retrieval_k,
        max_observers=args.max_observers,
        min_initial_inliers=80, min_matches=20, match_ratio=0.85,
        init_min_tri_angle_deg=0.8, min_tri_angle_deg=0.8,
        ransac_hyps_e=256, ransac_hyps_h=128, ransac_hyps_pnp=256,
        lm_capacity=args.lm_capacity, refine_max_iters=30,
        global_max_iters=args.global_iters,
        match_chunk=32, interim_ba_iters=args.interim,
        loop_close=bool(args.loop_close),
        local_ba_every=args.ba_every,
        local_ba_free_span=args.free_span,
        map_refine_rounds=args.refine_rounds,
        sweep_segment=args.segment,
        ba_program_iters=args.ba_program_iters,
    )

    if cached is None:
        t0 = time.perf_counter()
        # chunked extraction: the whole 4500-frame batch (3.5 GB of
        # images + pyramid intermediates) crashes the 16 GB chip — the
        # first KITTI-scale wall found (r3 rehearsal log)
        ex_chunk = 500
        parts = []
        for lo in range(0, N, ex_chunk):
            part = extract_features(
                jnp.asarray(images[lo:lo + ex_chunk]),
                max_keypoints=args.kps)
            parts.append(tuple(np.asarray(a) for a in part))
        xy, desc, score, mask = (
            jnp.asarray(np.concatenate([p[i] for p in parts]))
            for i in range(4))
        np.asarray(xy)
        t_extract = time.perf_counter() - t0
        print(f"extract: {t_extract:.1f}s", flush=True)
        if cache is not None:
            # fp32 descriptors: fp16 storage was measured to NOT be
            # match-lossless — quantizing flips enough near-tie ratio
            # tests to move the 500-frame ATE 1.05 -> 1.16
            np.savez(cache, xy=np.asarray(xy),
                     desc=np.asarray(desc),
                     mask=np.asarray(mask), n=N, w=W, h=H, kps=args.kps,
                     t_extract=t_extract)
    else:
        xy = jnp.asarray(cached["xy"])
        # keep descriptors on the HOST: run_sfm uploads them for the match
        # graph and drops the device buffer afterwards — holding a device
        # copy here kept 4.7 GB resident through the final global BA and
        # crashed the chip at N=4500 (r3 rehearsal)
        desc = np.asarray(cached["desc"]).astype(np.float32)
        mask = jnp.asarray(cached["mask"])
        t_extract = float(cached["t_extract"])

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
