"""Stage timing of the EXACT bench.py workload (post-warmup, np.asarray sync).

Splits the bench's `run_sfm` call into its internal stages so optimization
targets the real bottleneck: match graph (incl. epipolar verify), init-pair
search, on-device sweep, prune+global BA.
"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np

sys.argv = [sys.argv[0]]


def main():
    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import bench

    from eacham_tpu.features.frontend import extract_features
    from eacham_tpu.geometry.camera import intrinsics_from_image_size
    from eacham_tpu.sfm import SfmOptions
    from eacham_tpu.sfm.matches import build_match_tables
    from eacham_tpu.sfm.scene import make_scene, frame_pair_table
    from eacham_tpu.sfm.twoview import find_best_pair
    from eacham_tpu.sfm.pipeline import (
        rank_init_pairs, seed_initial_pair, _ba,
    )
    from eacham_tpu.sfm.device_loop import registration_sweep
    from eacham_tpu.sfm.filtering import prune_observations
    from eacham_tpu.ba.core import BAConfig

    rng = np.random.default_rng(0)
    images_np, poses_gt, intr = bench.render_workload(rng)
    images = jnp.asarray(images_np)
    W, H, N = bench.WIDTH, bench.HEIGHT, bench.N_FRAMES

    opt = SfmOptions(
        min_initial_inliers=100, min_matches=25, match_ratio=0.85,
        init_min_tri_angle_deg=1.0, min_tri_angle_deg=1.0,
        ransac_hyps_e=256, ransac_hyps_h=128, ransac_hyps_pnp=256,
        lm_capacity=16384, refine_max_iters=30, global_max_iters=50,
        match_chunk=32, local_ba_every=3,   # keep in lockstep with bench.py
    )
    intr_j = jnp.asarray(intr)

    def sync(x):
        return jax.tree_util.tree_map(
            lambda a: np.asarray(a) if hasattr(a, "shape") else a, x)

    times = {}

    def stage(label, fn, n=1):
        out = fn()
        sync(out)           # compile + warm
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
            sync(out)
        dt = (time.perf_counter() - t0) / n
        times[label] = dt
        print(f"{label:32s} {dt * 1e3:9.0f} ms", flush=True)
        return out

    xy, desc, score, mask = stage(
        "extract[100]",
        lambda: extract_features(images, max_keypoints=bench.MAX_KPS))

    key = jax.random.PRNGKey(0)
    key, k_ver = jax.random.split(key)
    verify = (xy, intr_j, k_ver, opt.max_repr_error, opt.verify_hyps)

    mt = stage(
        "match+verify[4950 pairs]",
        lambda: build_match_tables(
            desc, mask, ratio=opt.match_ratio, min_matches=opt.min_matches,
            chunk=opt.match_chunk, verify=verify))
    pair_idx, pair_ok, m_ij, v_ij, m_ji, v_ji = mt

    mt_nv = stage(
        "match only (no verify)",
        lambda: build_match_tables(
            desc, mask, ratio=opt.match_ratio, min_matches=opt.min_matches,
            chunk=opt.match_chunk))

    scene = make_scene(xy, mask, pair_idx, pair_ok, m_ij, v_ij, m_ji, v_ji,
                       intr_j, lm_capacity=opt.lm_capacity)
    pid_tbl = jnp.asarray(frame_pair_table(pair_idx, N))

    sc = stage("rank_init_pairs", lambda: rank_init_pairs(scene, float(max(W, H))))
    score_np = np.asarray(sc)
    order = np.argsort(-score_np)
    order = order[score_np[order] > 0]

    key, k_init = jax.random.split(key)

    def init_fn():
        return find_best_pair(
            k_init, scene, order,
            min_initial_inliers=opt.min_initial_inliers,
            max_repr_error=opt.init_max_repr_error,
            min_tri_angle=opt.init_min_tri_angle,
            chunk=opt.init_chunk,
            n_hyp_e=opt.ransac_hyps_e, n_hyp_h=opt.ransac_hyps_h)

    pair_row, init = stage("find_best_pair", init_fn)
    scene2 = seed_initial_pair(scene, pair_row, init.T, init.points,
                               init.point_ok)

    refine_cfg = BAConfig(
        max_iters=min(opt.refine_max_iters, opt.local_ba_max_iters),
        tolerance=max(opt.refine_tolerance, opt.local_ba_tolerance),
        method="lm", trust_radius_init=opt.refine_delta,
        solver=opt.refine_solver)
    global_cfg = BAConfig(
        max_iters=opt.global_max_iters, tolerance=opt.global_tolerance,
        method="lm", trust_radius_init=opt.global_delta,
        solver=opt.global_solver)

    excluded = jnp.zeros((N,), bool)

    def sweep_fn():
        return registration_sweep(
            scene2, excluded, pid_tbl, jax.random.PRNGKey(7),
            opt.max_repr_error, opt.min_tri_angle,
            min_pnp_inliers=opt.min_pnp_inliers,
            min_ba_landmarks=opt.min_ba_landmarks,
            ba_cfg=refine_cfg, max_observers=opt.max_observers,
            n_hyp_pnp=opt.ransac_hyps_pnp,
            pnp_pair_only=opt.pnp_pair_only,
            ba_max_cams=opt.local_ba_max_cams,
            ba_max_obs=min(opt.local_ba_max_obs, N * xy.shape[1]),
            segment=opt.sweep_segment)

    scene3, excluded3, n_reg = stage("registration_sweep[100]", sweep_fn)
    print(f"   registered: +{int(n_reg)}")

    scene4, n_obs, n_lm = stage(
        "prune_observations",
        lambda: prune_observations(scene3, opt.max_repr_error))

    scene5, info = stage(
        "global BA (50 it)",
        lambda: _ba(scene4, scene4.pose_valid, global_cfg,
                    opt.min_ba_landmarks))

    scene6, _, _ = stage(
        "prune 2", lambda: prune_observations(scene5, opt.max_repr_error))
    stage("global BA 2",
          lambda: _ba(scene6, scene6.pose_valid, global_cfg,
                      opt.min_ba_landmarks))

    total = sum(v for k, v in times.items() if k != "match only (no verify)")
    print(f"\n{'TOTAL (timed stages)':32s} {total * 1e3:9.0f} ms")


if __name__ == "__main__":
    main()
