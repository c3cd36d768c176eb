"""Ablate the registration sweep's internal stages on the bench workload.

Variants isolate where the ~12 s (100-frame) sweep goes: local BA, PnP
hypothesis count, triangulation observer cap. Sync cost is one scalar
fetch (n_reg), not the whole scene.
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
    from eacham_tpu.sfm import SfmOptions
    from eacham_tpu.sfm.matches import build_match_tables
    from eacham_tpu.sfm.scene import make_scene, frame_pair_table
    from eacham_tpu.sfm.twoview import find_best_pair
    from eacham_tpu.sfm.pipeline import rank_init_pairs, seed_initial_pair
    from eacham_tpu.sfm.device_loop import registration_sweep
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
        match_chunk=32,
    )
    intr_j = jnp.asarray(intr)
    xy, desc, score, mask = extract_features(images, max_keypoints=bench.MAX_KPS)

    key = jax.random.PRNGKey(0)
    key, k_ver = jax.random.split(key)
    verify = (xy, intr_j, k_ver, opt.max_repr_error, opt.verify_hyps)
    pair_idx, pair_ok, m_ij, v_ij, m_ji, v_ji = build_match_tables(
        desc, mask, ratio=opt.match_ratio, min_matches=opt.min_matches,
        chunk=opt.match_chunk, verify=verify)
    scene = make_scene(xy, mask, pair_idx, pair_ok, m_ij, v_ij, m_ji, v_ji,
                       intr_j, lm_capacity=opt.lm_capacity)
    pid_tbl = jnp.asarray(frame_pair_table(pair_idx, N))

    sc = np.asarray(rank_init_pairs(scene, float(max(W, H))))
    order = np.argsort(-sc)
    order = order[sc[order] > 0]
    key, k_init = jax.random.split(key)
    pair_row, init = find_best_pair(
        k_init, scene, order, min_initial_inliers=opt.min_initial_inliers,
        max_repr_error=opt.init_max_repr_error,
        min_tri_angle=opt.init_min_tri_angle, chunk=opt.init_chunk,
        n_hyp_e=opt.ransac_hyps_e, n_hyp_h=opt.ransac_hyps_h)
    scene2 = seed_initial_pair(scene, pair_row, init.T, init.points,
                               init.point_ok)
    np.asarray(scene2.pose)

    refine_cfg = BAConfig(
        max_iters=min(opt.refine_max_iters, opt.local_ba_max_iters),
        tolerance=max(opt.refine_tolerance, opt.local_ba_tolerance),
        method="lm", trust_radius_init=opt.refine_delta,
        solver=opt.refine_solver)

    excluded = jnp.zeros((N,), bool)

    def run(label, **kw):
        base = dict(
            min_pnp_inliers=opt.min_pnp_inliers,
            min_ba_landmarks=opt.min_ba_landmarks,
            ba_cfg=refine_cfg, max_observers=opt.max_observers,
            n_hyp_pnp=opt.ransac_hyps_pnp, pnp_pair_only=False,
            ba_max_cams=opt.local_ba_max_cams,
            ba_max_obs=min(opt.local_ba_max_obs, N * xy.shape[1]),
            segment=opt.sweep_segment)
        base.update(kw)
        fn = lambda: registration_sweep(
            scene2, excluded, pid_tbl, jax.random.PRNGKey(7),
            opt.max_repr_error, opt.min_tri_angle, **base)
        s, e, n = fn()
        int(n)  # compile+run sync
        t0 = time.perf_counter()
        s, e, n = fn()
        n = int(n)
        dt = time.perf_counter() - t0
        print(f"{label:44s} {dt * 1e3:8.0f} ms  (+{n} reg)", flush=True)

    run("full (baseline)")
    run("no local BA (min_ba_landmarks=1e9)", min_ba_landmarks=10**9)
    run("local BA 4 iters", ba_cfg=refine_cfg._replace(max_iters=4))
    run("pnp 64 hyps", n_hyp_pnp=64)
    run("pnp 128 hyps", n_hyp_pnp=128)
    run("max_observers=8", max_observers=8)
    run("ba_max_obs=8192", ba_max_obs=8192)
    run("ba_max_cams=8", ba_max_cams=8)
    run("dense_cg 32", ba_cfg=refine_cfg._replace(dense_cg_iters=32))


if __name__ == "__main__":
    main()
