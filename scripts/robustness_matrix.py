"""Photometric/temporal nuisance matrix (VERDICT r3 #4).

Every prior benchmark ran on CLEAN renders; the reference's demonstrated
use-case is real photo collections (/root/reference/README.md:3-8), whose
frames carry sensor noise, motion blur, exposure variation, vignetting,
and gaps. This sweep renders the textured-surface world once, applies each
nuisance at increasing severity, runs the FULL classical pipeline
(bench.py's configuration), and reports registration rate + ATE per cell.

    python scripts/robustness_matrix.py [--frames 60] [--md]

--md prints the SCALING.md-ready markdown table.
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

WIDTH, HEIGHT = 512, 384
MAX_KPS = 512


from eacham_tpu.utils.synthetic import gaussian_blur  # noqa: E402


def vignette(h, w, strength):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r2 = ((xx - w / 2) / (w / 2)) ** 2 + ((yy - h / 2) / (h / 2)) ** 2
    return 1.0 - strength * r2


NUISANCES = {
    "clean":        [("", {})],
    "noise":        [(f"sigma={s}", {"noise": s}) for s in (0.01, 0.03, 0.06)],
    "blur":         [(f"sigma={s}px", {"blur": s}) for s in (0.5, 1.0, 2.0)],
    "exposure":     [(f"{p}%+vignette", {"exposure": p / 100})
                     for p in (15, 30, 50)],
    "noise+blur":   [("0.03/1.0px", {"noise": 0.03, "blur": 1.0})],
    "drop-frames":  [(f"{p}%", {"drop": p / 100}) for p in (10, 20, 30)],
}


def apply_nuisance(images, rng, noise=0.0, blur=0.0, exposure=0.0, drop=0.0):
    out = images
    if blur > 0:
        out = np.stack([gaussian_blur(im, blur) for im in out])
    if exposure > 0:
        vig = vignette(out.shape[1], out.shape[2], 0.4 * exposure / 0.5)
        gains = np.exp(rng.uniform(-exposure, exposure, len(out)))
        gammas = np.exp(rng.uniform(-exposure, exposure, len(out)))
        out = np.stack([
            np.clip((np.clip(im * g * vig, 0, 1)) ** gm, 0, 1)
            for im, g, gm in zip(out, gains, gammas)])
    if noise > 0:
        out = np.clip(out + rng.normal(scale=noise, size=out.shape), 0, 1)
    keep = None
    if drop > 0:
        n = len(out)
        kill = rng.choice(np.arange(1, n - 1), int(drop * n), replace=False)
        keep = np.setdiff1d(np.arange(n), kill)
        out = out[keep]
    return out.astype(np.float32), keep


def run_cell(images_np, poses_gt, intr, opts, frontend="classical",
             deep_params=None, threshold=0.15):
    import jax
    import jax.numpy as jnp
    from eacham_tpu.sfm import run_sfm
    from eacham_tpu.utils.evaluate import ate_rmse

    images = jnp.asarray(images_np)
    match_tables = None
    if frontend == "deep":
        from eacham_tpu.features.deep.frontend import (
            build_match_tables_deep, extract_deep_batch,
        )
        from eacham_tpu.geometry.camera import intrinsics_from_image_size

        sp_params, lg_params, n_layers = deep_params
        xy, desc, score, mask = extract_deep_batch(
            sp_params, images, max_keypoints=1024)
        match_tables = build_match_tables_deep(
            lg_params, xy, desc, mask, (WIDTH, HEIGHT), n_layers=n_layers,
            min_matches=opts.min_matches, threshold=threshold,
            verify=(intrinsics_from_image_size(WIDTH, HEIGHT),
                    jax.random.PRNGKey(7), opts.max_repr_error,
                    opts.verify_hyps))
    else:
        from eacham_tpu.features.frontend import extract_features

        xy, desc, score, mask = extract_features(
            images, max_keypoints=MAX_KPS)
    scene, stats = run_sfm(
        xy, desc, mask, image_size=(WIDTH, HEIGHT),
        intr=jnp.asarray(intr), options=opts, verbose=False,
        match_tables=match_tables)
    valid = np.asarray(scene.pose_valid)
    n = len(images_np)
    if valid.sum() < 3:
        return 0.0, float("inf")
    est = np.asarray(scene.pose)[valid]
    gt = poses_gt[valid]
    c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
    return valid.sum() / n, float(ate_rmse(c_est, c_gt))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--md", action="store_true")
    ap.add_argument("--worlds", type=int, default=3)
    ap.add_argument("--frontend", choices=["classical", "deep"],
                    default="classical",
                    help="deep = SuperPoint+LightGlue column (VERDICT r4 "
                         "#9); needs the mixed-domain weights to pass")
    ap.add_argument("--threshold", type=float, default=0.15)
    ap.add_argument("--weights", default=None)
    args = ap.parse_args()

    from eacham_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from eacham_tpu.sfm import SfmOptions
    from eacham_tpu.utils.synthetic import (
        make_surface_scene, orbit_poses, render_view,
    )

    f = 1.2 * max(WIDTH, HEIGHT)
    intr = np.array([f, f, WIDTH / 2, HEIGHT / 2], np.float32)
    poses = orbit_poses(args.frames, radius=0.6, step_deg=0.8, advance=0.04)
    t0 = time.time()
    # single-world ATE on this pipeline is chaos-dominated (top-k
    # tie-break sensitivity, SCALING.md r4) — every cell is the MEDIAN
    # over --worlds independently rendered surface worlds
    worlds = []
    for w in range(args.worlds):
        scene = make_surface_scene(np.random.default_rng(w), n_blobs=4000)
        worlds.append(np.stack([
            render_view(scene, T, intr, WIDTH, HEIGHT) for T in poses]))
    print(f"# rendered {args.worlds} x {args.frames} textured-surface "
          f"frames in {time.time()-t0:.0f}s", flush=True)

    opts = SfmOptions(
        min_initial_inliers=100, min_matches=25, match_ratio=0.85,
        init_min_tri_angle_deg=1.0, min_tri_angle_deg=1.0,
        ransac_hyps_e=256, ransac_hyps_h=128, ransac_hyps_pnp=256,
        lm_capacity=16384, refine_max_iters=30, global_max_iters=50,
        match_chunk=32, local_ba_every=3,
    )

    deep_params = None
    if args.frontend == "deep":
        from eacham_tpu.features.deep.frontend import load_frontend_params

        deep_params = load_frontend_params(weights_dir=args.weights)
        print(f"# deep frontend: {deep_params[2]}-layer matcher, "
              f"t={args.threshold}; budgets are PER-FRONTEND production "
              f"operating points (classical {MAX_KPS} kps, deep 1024) — "
              f"columns compare production configs, not equal budgets",
              flush=True)

    rows = []
    for family, cells in NUISANCES.items():
        for label, kw in cells:
            regs, ates, n_frames = [], [], 0
            t0 = time.time()
            for w, images in enumerate(worlds):
                nrng = np.random.default_rng(7 + w)
                imgs, keep = apply_nuisance(images, nrng, **kw)
                gt = poses[keep] if keep is not None else poses
                reg, ate = run_cell(imgs, gt, intr, opts,
                                    frontend=args.frontend,
                                    deep_params=deep_params,
                                    threshold=args.threshold)
                regs.append(reg)
                ates.append(ate)
                n_frames = len(imgs)
            reg = float(np.min(regs))
            ate = float(np.median(ates))
            rows.append((family, label, n_frames, reg, ate,
                         time.time() - t0))
            print(f"[{family:12s} {label:14s}] frames={n_frames:3d} "
                  f"reg>={reg:5.1%} ATE~{ate:8.4f} "
                  f"({'/'.join(f'{a:.3f}' for a in ates)}) "
                  f"({rows[-1][5]:.0f}s)", flush=True)

    if args.md:
        print("\n| Nuisance | Level | Frames | Registered | ATE |")
        print("|---|---|---|---|---|")
        for fam, label, n, reg, ate, _ in rows:
            print(f"| {fam} | {label or '—'} | {n} | {reg:.1%} | "
                  f"{ate:.4f} |")
    out = [{"family": fam, "level": label, "frames": n,
            "registered": round(reg, 4), "ate": round(ate, 4)}
           for fam, label, n, reg, ate, _ in rows]
    name = ("robustness_matrix.json" if args.frontend == "classical"
            else "robustness_matrix_deep.json")
    Path(name).write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
