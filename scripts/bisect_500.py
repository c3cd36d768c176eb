"""Bisect the N=500 sweep kernel fault: run each sweep stage standalone.

Caches rendered features in /tmp/feat500.npz so iterations skip the
render+extract cost.  Usage: python scripts/bisect_500.py [stage]
stage in {features, nbv, pnp, tri, ba, sweep} (default: all in order).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

CACHE = Path("/tmp/feat500.npz")
import os as _os
N_FULL, W, H, KPS = 500, 384, 288, 512
N = int(_os.environ.get("BISECT_N", N_FULL))


def get_features():
    import jax.numpy as jnp

    if CACHE.exists():
        d = np.load(CACHE)
        return (jnp.asarray(d["xy"]), jnp.asarray(d["desc"]),
                jnp.asarray(d["mask"]), d["intr"], d["poses"])
    from eacham_tpu.features.frontend import extract_features
    from eacham_tpu.utils.synthetic import make_blob_scene, render_view

    rng = np.random.default_rng(0)
    f = 1.2 * max(W, H)
    intr = np.array([f, f, W / 2, H / 2], np.float32)
    blobs = make_blob_scene(rng, n_blobs=4000, depth=(4.0, 14.0), spread=7.0)
    poses = []
    for i in range(N):
        a = np.deg2rad(0.12 * i)
        c, s = np.cos(a), np.sin(a)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = [[c, 0, -s], [0, 1, 0], [s, 0, c]]
        T[:3, 3] = [0.02 * i, 0.004 * i, 0.01 * i]
        poses.append(T)
    poses = np.stack(poses)
    t0 = time.perf_counter()
    images = np.stack([render_view(blobs, T, intr, W, H) for T in poses])
    print(f"render {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    xy, desc, score, mask = extract_features(
        jnp.asarray(images), max_keypoints=KPS)
    xy, desc, mask = map(np.asarray, (xy, desc, mask))
    print(f"extract {time.perf_counter() - t0:.0f}s", flush=True)
    np.savez(CACHE, xy=xy, desc=desc, mask=mask, intr=intr, poses=poses)
    import jax.numpy as jnp
    return (jnp.asarray(xy), jnp.asarray(desc), jnp.asarray(mask),
            intr, poses)


def main():
    stages = sys.argv[1:] or ["nbv", "pnp", "tri", "ba", "sweep"]
    import jax
    import jax.numpy as jnp
    from eacham_tpu.ba.core import BAConfig, refine_ba
    from eacham_tpu.sfm import SfmOptions
    from eacham_tpu.sfm.matches import build_match_tables, candidate_pairs
    from eacham_tpu.sfm.pipeline import (
        next_best_view, pnp_register, rank_init_pairs, seed_initial_pair,
        local_neighbors,
    )
    from eacham_tpu.sfm.scene import (
        make_scene, frame_pair_table, ba_problem_windowed,
    )
    from eacham_tpu.sfm.triangulate import triangulate_frame
    from eacham_tpu.sfm.twoview import find_best_pair
    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    xy, desc, mask, intr, poses = get_features()
    xy, desc, mask, poses = xy[:N], desc[:N], mask[:N], poses[:N]

    t0 = time.perf_counter()
    cand = jnp.asarray(candidate_pairs(desc, mask, window=10, retrieval_k=3))
    pair_idx, pair_ok, m_ij, v_ij, m_ji, v_ji = build_match_tables(
        desc, mask, min_matches=25, ratio=0.85, chunk=32, pair_idx=cand)
    scene = make_scene(xy, mask, pair_idx, pair_ok, m_ij, v_ij, m_ji, v_ji,
                       jnp.asarray(intr), lm_capacity=int(os.environ.get("BISECT_LMCAP", 65536)))
    pid = jnp.asarray(frame_pair_table(np.asarray(pair_idx), N))
    print(f"match+scene {time.perf_counter() - t0:.0f}s "
          f"({int(pair_ok.sum())} edges)", flush=True)

    # init
    t0 = time.perf_counter()
    score = np.asarray(rank_init_pairs(scene, float(max(W, H))))
    order = np.argsort(-score)
    order = order[score[order] > 0]
    key = jax.random.PRNGKey(0)
    pair_row, init = find_best_pair(
        key, scene, order, min_initial_inliers=80, max_repr_error=4.0,
        min_tri_angle=np.deg2rad(0.8), chunk=8, n_hyp_e=256, n_hyp_h=128)
    scene = seed_initial_pair(scene, pair_row, init.T, init.points,
                              init.point_ok)
    i0, j0 = (int(x) for x in np.asarray(pair_idx[pair_row]))
    print(f"init ({i0},{j0}) {time.perf_counter() - t0:.0f}s", flush=True)

    excluded = jnp.zeros((N,), bool)

    def clock(label, thunk):
        t0 = time.perf_counter()
        out = thunk()
        jax.tree_util.tree_map(
            lambda a: np.asarray(a) if hasattr(a, "shape") else a, out)
        print(f"{label:28s} {time.perf_counter() - t0:8.1f} s", flush=True)
        return out

    cfg = BAConfig(max_iters=8, tolerance=3e-4,
                   solver=os.environ.get("BISECT_SOLVER", "auto"))
    if "nbv" in stages:
        prev, cur, sc = clock("next_best_view", lambda: next_best_view(
            scene, excluded))
        print("  nbv ->", int(prev), int(cur), int(sc))
    else:
        prev, cur = jnp.int32(i0), jnp.int32(j0)

    if "pnp" in stages:
        T, n_inl = clock("pnp_register", lambda: pnp_register(
            scene, prev, cur, pid[int(cur)], key, threshold=4.0, n_hyp=256))
        print("  pnp inliers:", int(n_inl))

    if "tri" in stages:
        scene2, nm, nn = clock("triangulate_frame", lambda: triangulate_frame(
            scene, cur, pid[int(cur)], jnp.int32(2), 8.0,
            float(np.deg2rad(0.8)), max_observers=12))
        print("  tri merged/new:", int(nm), int(nn))

    if "ba" in stages:
        nb = local_neighbors(scene, cur)
        prob, cam_list, cam_on, lm_list, lm_on = clock(
            "ba_problem_windowed", lambda: ba_problem_windowed(
                scene, nb, max_cams=16, max_obs=16384, cur=cur))
        clock("refine_ba (windowed)", lambda: refine_ba(prob, cfg))

    if "sweep" in stages:
        from eacham_tpu.sfm.device_loop import registration_sweep

        out = clock("registration_sweep", lambda: registration_sweep(
            scene, excluded, pid, key, 8.0, float(np.deg2rad(0.8)),
            min_pnp_inliers=15, min_ba_landmarks=50, ba_cfg=cfg,
            max_observers=12, n_hyp_pnp=256, pnp_pair_only=False,
            ba_max_cams=16, ba_max_obs=16384,
            segment=int(os.environ.get("BISECT_SEGMENT", 0))))
        print("  sweep registered:", int(out[2]))


if __name__ == "__main__":
    main()
