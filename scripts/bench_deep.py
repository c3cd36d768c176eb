"""Deep-frontend benchmark: fps + ATE at N=100 with windowed pairs.

The deep twin of bench.py (VERDICT r2 #4 "bench the deep path at 100
frames ... with windowed pairs"): images -> SuperPoint extract ->
LightGlue windowed matching (+ epipolar verify) -> run_sfm, ATE-gated,
np.asarray-fetch timing.

    python scripts/bench_deep.py [--frames 100 --window 10]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

ROOT = Path(__file__).resolve().parent.parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--window", type=int, default=10)
    ap.add_argument("--kps", type=int, default=1024)
    ap.add_argument("--threshold", type=float, default=0.15,
                    help="production operating point: median ATE 0.047 over 7 worlds (max 0.085) vs 0.10 median at t=0.1 (SCALING.md r4)")
    ap.add_argument("--scenes", type=int, default=5,
                    help="worlds for the median-ATE claim")
    ap.add_argument("--surface-scenes", type=int, default=3,
                    help="textured-surface worlds for the second-domain "
                         "rows (0 = blob only)")
    ap.add_argument("--weights", default=None,
                    help="alternate weights dir (default: repo weights/)")
    ap.add_argument("--no-gate", action="store_true",
                    help="report without asserting the ATE<0.1 gate")
    args = ap.parse_args()

    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from eacham_tpu.features.deep import lightglue as lg
    from eacham_tpu.features.deep import superpoint as sp
    from eacham_tpu.features.deep.frontend import (
        build_match_tables_deep, extract_deep_batch,
    )
    from eacham_tpu.geometry.camera import intrinsics_from_image_size
    from eacham_tpu.sfm import SfmOptions, run_sfm
    from eacham_tpu.utils.evaluate import ate_rmse
    from eacham_tpu.utils.synthetic import (
        make_blob_scene, orbit_poses, render_view,
    )

    N = args.frames
    W, H = 512, 384
    f = 1.2 * max(W, H)
    intr = np.array([f, f, W / 2, H / 2], np.float32)
    rng = np.random.default_rng(0)
    scene_b = make_blob_scene(rng, n_blobs=900, depth=(3.5, 9.0), spread=2.6)
    poses = orbit_poses(N, radius=0.6, step_deg=0.5, advance=0.03)
    t0 = time.perf_counter()
    images = np.stack([render_view(scene_b, T, intr, W, H) for T in poses])
    print(f"# rendered {N} frames in {time.perf_counter() - t0:.1f}s",
          flush=True)

    from eacham_tpu.features.deep.frontend import load_frontend_params

    sp_params, lg_params, n_layers = load_frontend_params(
        weights_dir=args.weights)
    print(f"# matcher: {n_layers}-layer (threshold {args.threshold})",
          flush=True)

    opts = SfmOptions(
        min_initial_inliers=60, min_matches=20, match_ratio=0.85,
        init_min_tri_angle_deg=1.0, min_tri_angle_deg=1.0,
        ransac_hyps_e=256, ransac_hyps_h=128, ransac_hyps_pnp=256,
        lm_capacity=16384, refine_max_iters=30, global_max_iters=50,
        # every=3, NOT the classical bench's every=4: measured 12.2 fps/
        # median ATE 0.054 vs 15.1 fps/0.065 — the deep path's binding
        # target is accuracy and fps already clears the bar
        local_ba_every=3,
    )

    def full(imgs_dev):
        t0 = time.perf_counter()
        xy, desc, score, mask = extract_deep_batch(
            sp_params, imgs_dev, max_keypoints=args.kps)
        np.asarray(xy)
        t_ex = time.perf_counter() - t0
        t0 = time.perf_counter()
        tables = build_match_tables_deep(
            lg_params, xy, desc, mask, (W, H), n_layers=n_layers,
            min_matches=opts.min_matches, pair_window=args.window,
            retrieval_k=3, threshold=args.threshold,
            verify=(intrinsics_from_image_size(W, H),
                    jax.random.PRNGKey(7), opts.max_repr_error,
                    opts.verify_hyps))
        np.asarray(tables[1])
        t_match = time.perf_counter() - t0
        scene, stats = run_sfm(
            xy, desc, mask, image_size=(W, H), intr=jnp.asarray(intr),
            options=opts, verbose=False, match_tables=tables)
        np.asarray(scene.pose)
        return scene, stats, t_ex, t_match

    # device upload happens OUTSIDE the timed region — the same protocol
    # as bench.py (its jnp.asarray(images) precedes the timed passes); the
    # tunnel's ~30 MB/s H2D otherwise dominates the extract split.
    imgs_dev = jnp.asarray(images)
    t0 = time.perf_counter()
    full(imgs_dev)
    print(f"# warmup: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    scene, stats, t_ex, t_match = full(imgs_dev)
    total = time.perf_counter() - t0

    def eval_ate(scene, stats, poses):
        valid = np.asarray(scene.pose_valid)
        est = np.asarray(scene.pose)[valid]
        gt = poses[valid]
        ce = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
        cg = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
        return ate_rmse(ce, cg)

    rmse = eval_ate(scene, stats, poses)
    print(f"# registered {stats['registered']}/{N}, ATE {rmse:.4f} "
          f"(extract {t_ex:.2f}s, match {t_match:.2f}s, total {total:.2f}s)",
          flush=True)

    # ATE is CHAOTICALLY sensitive to tiny input perturbations on this
    # pipeline (measured: top-k tie-breaks — 0.2% of keypoints — swing a
    # single-scene ATE 0.06..0.40, SCALING.md r4), so the accuracy claim
    # is the MEDIAN over --scenes independently rendered worlds. fps stays
    # single-scene (scene 0) — throughput is shape-bound, not content-bound.
    ates = [rmse]
    regs = [int(stats["registered"])]
    for s in range(1, args.scenes):
        rng_s = np.random.default_rng(s)
        scene_s = make_blob_scene(rng_s, n_blobs=900, depth=(3.5, 9.0),
                                  spread=2.6)
        imgs_s = np.stack([
            render_view(scene_s, T, intr, W, H) for T in poses])
        sc, st, _, _ = full(jnp.asarray(imgs_s))  # same shapes, no recompiles
        ates.append(eval_ate(sc, st, poses))
        regs.append(int(st["registered"]))
        print(f"# scene {s}: registered {st['registered']}/{N}, "
              f"ATE {ates[-1]:.4f}", flush=True)
    med_ate = float(np.median(ates))

    # SURFACE-domain rows (VERDICT r4 #1: "report BOTH domains"): the
    # textured-surface world at the robustness matrix's orbit geometry —
    # the domain the blob-only r4 weights collapsed on (0/100, 52/100,
    # 78/100 registration over three worlds)
    from eacham_tpu.utils.synthetic import make_surface_scene

    surf_ates, surf_regs = [], []
    for w in range(args.surface_scenes):
        scene_w = make_surface_scene(np.random.default_rng(w), n_blobs=4000)
        poses_s = orbit_poses(N, radius=0.6, step_deg=0.8, advance=0.04)
        imgs_w = np.stack([
            render_view(scene_w, T, intr, W, H) for T in poses_s])
        sc, st, _, _ = full(jnp.asarray(imgs_w))
        surf_ates.append(eval_ate(sc, st, poses_s))
        surf_regs.append(int(st["registered"]))
        print(f"# surface world {w}: registered {st['registered']}/{N}, "
              f"ATE {surf_ates[-1]:.4f}", flush=True)
    med_surf = (float(np.median(surf_ates)) if surf_ates else None)

    # held to bench.py's own correctness standard (VERDICT r3 weak #2)
    if not args.no_gate:
        assert min(regs) >= N - 5, regs
        assert med_ate < 0.1, f"median ATE {med_ate} fails the bench gate"
    print(json.dumps({
        "metric": "deep_sfm_frames_per_s",
        "value": round(N / total, 3),
        "unit": "frames/s",
        "ate": round(med_ate, 4) if np.isfinite(med_ate) else None,
        "ate_scenes": [round(float(a), 4) for a in ates],
        "registered": int(stats["registered"]),
        "surface_registered": surf_regs,
        "surface_ate": (round(med_surf, 4)
                        if med_surf is not None and np.isfinite(med_surf)
                        else None),
        "surface_ates": [round(float(a), 4) for a in surf_ates],
    }))


if __name__ == "__main__":
    main()
