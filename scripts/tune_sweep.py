"""Full-pipeline A/B of local-BA budgets on the bench workload.

Each variant runs the COMPLETE bench pipeline (extract -> match ->
reconstruct) and reports steady-state wall time + ATE, so quality
regressions are visible, not just sweep speed.
"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np

sys.argv = [sys.argv[0]]


def main():
    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import bench
    from dataclasses import replace

    from eacham_tpu.features.frontend import extract_features
    from eacham_tpu.sfm import run_sfm, SfmOptions
    from eacham_tpu.utils.evaluate import ate_rmse

    rng = np.random.default_rng(0)
    images_np, poses_gt, intr = bench.render_workload(rng)
    images = jnp.asarray(images_np)
    W, H, N = bench.WIDTH, bench.HEIGHT, bench.N_FRAMES

    base = SfmOptions(
        min_initial_inliers=100, min_matches=25, match_ratio=0.85,
        init_min_tri_angle_deg=1.0, min_tri_angle_deg=1.0,
        ransac_hyps_e=256, ransac_hyps_h=128, ransac_hyps_pnp=256,
        lm_capacity=16384, refine_max_iters=30, global_max_iters=50,
        match_chunk=32,
    )

    variants = [
        ("ba_every=1", base),
        ("ba_every=3 (r3 bench)", replace(base, local_ba_every=3)),
        ("ba_every=4 (r4 bench)", replace(base, local_ba_every=4)),
        ("ba_every=5", replace(base, local_ba_every=5)),
    ]

    for label, opts in variants:
        def run():
            xy, desc, score, mask = extract_features(
                images, max_keypoints=bench.MAX_KPS)
            np.asarray(desc[-1, -1, -1])
            scene, stats = run_sfm(
                xy, desc, mask, image_size=(W, H),
                intr=jnp.asarray(intr), options=opts, verbose=False)
            np.asarray(scene.pose)
            return scene, stats

        run()  # compile
        t0 = time.perf_counter()
        scene, stats = run()
        dt = time.perf_counter() - t0

        valid = np.asarray(scene.pose_valid)
        est = np.asarray(scene.pose)[valid]
        gt = poses_gt[valid]
        c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
        c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
        rmse = ate_rmse(c_est, c_gt)
        print(f"{label:24s} {dt:6.2f}s  {N / dt:5.2f} fps  "
              f"reg {stats['registered']}/{N}  ATE {rmse:.4f}", flush=True)


if __name__ == "__main__":
    main()
