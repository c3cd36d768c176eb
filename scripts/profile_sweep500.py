"""Attribute the 500-frame sweep's per-frame cost by ablation.

At N=100 the local BA is ~80% of the sweep; at N=500 disabling it barely
moved the wall time (stress runs with local_ba_every=3 were no faster),
so something that scales with N/P/lm_capacity dominates. Each variant
re-runs ``registration_sweep_step`` from the same seeded state over the
same 60 frames (second dispatch timed, warm program), stress-500 shapes
and options, features from the stress cache.

    python scripts/profile_sweep500.py            # real chip
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

CACHE = "/tmp/stress500_feat_v2.npz"


def main():
    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from eacham_tpu.ba.core import BAConfig
    from eacham_tpu.sfm import SfmOptions
    from eacham_tpu.sfm.device_loop import registration_sweep_step
    from eacham_tpu.sfm.matches import build_match_tables, candidate_pairs
    from eacham_tpu.sfm.pipeline import rank_init_pairs, seed_initial_pair
    from eacham_tpu.sfm.scene import make_scene, frame_pair_table
    from eacham_tpu.sfm.twoview import find_best_pair

    d = np.load(CACHE)
    xy = jnp.asarray(d["xy"])
    desc = jnp.asarray(d["desc"]).astype(jnp.float32)
    mask = jnp.asarray(d["mask"])
    N, K = mask.shape
    W, H = int(d["w"]), int(d["h"])
    f = 1.2 * max(W, H)
    intr = jnp.asarray([f, f, W / 2, H / 2], jnp.float32)
    print(f"N={N} K={K}", flush=True)

    opt = SfmOptions(
        pair_window=10, pair_retrieval_k=3,
        min_initial_inliers=80, min_matches=20, match_ratio=0.85,
        init_min_tri_angle_deg=0.8, min_tri_angle_deg=0.8,
        ransac_hyps_e=256, ransac_hyps_h=128, ransac_hyps_pnp=256,
        lm_capacity=131072, match_chunk=32,
    )

    key = jax.random.PRNGKey(0)
    cand = jnp.asarray(candidate_pairs(
        desc, mask, window=opt.pair_window,
        retrieval_k=opt.pair_retrieval_k, ladder=opt.pair_ladder))
    key, k_ver = jax.random.split(key)
    verify = (xy, intr, k_ver, opt.max_repr_error, opt.verify_hyps)
    tables = build_match_tables(
        desc, mask, ratio=opt.match_ratio, min_matches=opt.min_matches,
        chunk=opt.match_chunk, pair_idx=cand, verify=verify)
    pair_idx, pair_ok, m_ij, v_ij, m_ji, v_ji = tables
    scene0 = make_scene(xy, mask, pair_idx, pair_ok, m_ij, v_ij, m_ji, v_ji,
                        intr, lm_capacity=opt.lm_capacity)
    pid_tbl = jnp.asarray(frame_pair_table(pair_idx, N))

    score = np.asarray(rank_init_pairs(scene0, float(max(W, H))))
    order = np.argsort(-score)
    order = order[score[order] > 0]
    key, k_init = jax.random.split(key)
    pair_row, init = find_best_pair(
        k_init, scene0, order, min_initial_inliers=opt.min_initial_inliers,
        max_repr_error=opt.init_max_repr_error,
        min_tri_angle=opt.init_min_tri_angle, chunk=opt.init_chunk,
        n_hyp_e=opt.ransac_hyps_e, n_hyp_h=opt.ransac_hyps_h)
    seeded = seed_initial_pair(scene0, pair_row, init.T, init.points,
                               init.point_ok)
    print(f"init pair row {pair_row}", flush=True)

    ba_cfg = BAConfig(max_iters=opt.local_ba_max_iters,
                      tolerance=opt.local_ba_tolerance,
                      method="lm", solver=opt.refine_solver)
    base = dict(
        min_pnp_inliers=opt.min_pnp_inliers,
        min_ba_landmarks=opt.min_ba_landmarks,
        ba_cfg=ba_cfg, max_observers=opt.max_observers,
        n_hyp_pnp=opt.ransac_hyps_pnp, pnp_pair_only=False,
        ba_max_cams=opt.local_ba_max_cams,
        ba_max_obs=min(opt.local_ba_max_obs, opt.local_ba_max_cams * K),
        max_steps=60,
    )
    variants = [
        ("full", base),
        ("no local BA", {**base, "min_ba_landmarks": 1 << 30}),
        ("ba_max_lms=8192", {**base, "ba_max_lms": 8192}),
        ("ba_max_lms=4096", {**base, "ba_max_lms": 4096}),
    ]

    key, k_sweep = jax.random.split(key)

    # how full do mid-sweep windows actually get? (sizes the lm axis)
    from eacham_tpu.sfm.pipeline import local_neighbors
    from eacham_tpu.sfm.scene import ba_problem_windowed
    probe, _, n_reg, _ = registration_sweep_step(
        seeded, jnp.zeros((N,), bool), pid_tbl, k_sweep,
        opt.max_repr_error, opt.min_tri_angle, **base)
    for cur in (int(n_reg) // 2, int(n_reg) - 1):
        nb = local_neighbors(probe, jnp.int32(cur))
        prob = ba_problem_windowed(
            probe, nb, max_cams=base["ba_max_cams"],
            max_obs=base["ba_max_obs"], cur=jnp.int32(cur))[0]
        print(f"window@{cur}: obs {int(jnp.sum(prob.obs_mask))}, "
              f"lms {int(jnp.sum(prob.pt_in_ba))}", flush=True)

    for label, kw in variants:
        excl = jnp.zeros((N,), bool)
        t0 = time.perf_counter()
        scene, excl, n1, more = registration_sweep_step(
            seeded, excl, pid_tbl, k_sweep,
            opt.max_repr_error, opt.min_tri_angle, **kw)
        int(n1)
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        scene, excl, n2, more = registration_sweep_step(
            scene, excl, pid_tbl, k_sweep,
            opt.max_repr_error, opt.min_tri_angle, **kw)
        n2 = int(n2)
        t_warm = time.perf_counter() - t0
        print(f"{label:18s} cold(compile+60f) {t_cold:6.1f} s   "
              f"warm 60f {t_warm:6.1f} s  -> {t_warm / max(n2, 1) * 1e3:6.0f} "
              f"ms/frame (reg {n2})", flush=True)


if __name__ == "__main__":
    main()
