"""Cold-compile breakdown at benchmark shapes (N=100 frames, K=512).

Times `jit(...).lower(args).compile()` per pipeline stage so the ~8-minute
first-run cost is attributed instead of guessed (VERDICT r1 #7). Run on
the TPU; add EACHAM_CACHE_DIR=/tmp/fresh to defeat the persistent cache.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from eacham_tpu.ba.core import BAConfig, refine_ba
    from eacham_tpu.features.frontend import extract_features
    from eacham_tpu.features.matching import match_all_pairs
    from eacham_tpu.sfm import SfmOptions
    from eacham_tpu.sfm.device_loop import registration_sweep_step
    from eacham_tpu.sfm.filtering import prune_observations
    from eacham_tpu.sfm.matches import build_match_tables
    from eacham_tpu.sfm.pipeline import rank_init_pairs, seed_initial_pair
    from eacham_tpu.sfm.scene import (
        make_scene, frame_pair_table, ba_problem_from_scene,
    )
    from eacham_tpu.sfm.twoview import _eval_pairs

    N, K, D = 100, 512, 256
    W, H = 512, 384
    rng = np.random.default_rng(0)
    total = 0.0

    def clock(label, thunk):
        nonlocal total
        t0 = time.perf_counter()
        thunk()
        dt = time.perf_counter() - t0
        total += dt
        print(f"{label:42s} {dt:8.1f} s", flush=True)

    images = jnp.asarray(rng.random((N, H, W)).astype(np.float32))
    clock("extract_features (compile)", lambda: jax.jit(
        partial(extract_features, max_keypoints=K)
    ).lower(images).compile())

    desc = rng.normal(size=(N, K, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    desc = jnp.asarray(desc)
    mask = jnp.ones((N, K), bool)

    t0 = time.perf_counter()
    pair_idx, pair_ok, m_ij, v_ij, m_ji, v_ji = build_match_tables(
        desc, mask, min_matches=25, chunk=32)
    jax.block_until_ready(v_ji)
    total += time.perf_counter() - t0
    print(f"{'match tables (compile+run)':42s} "
          f"{time.perf_counter() - t0:8.1f} s", flush=True)

    kps = jnp.asarray(rng.uniform(0, 500, (N, K, 2)).astype(np.float32))
    intr = jnp.asarray([600.0, 600.0, 256.0, 192.0])
    scene = make_scene(kps, mask, pair_idx, pair_ok, m_ij, v_ij, m_ji, v_ji,
                       intr, lm_capacity=16384)
    pid = jnp.asarray(frame_pair_table(pair_idx, N))

    clock("rank_init_pairs (compile)", lambda: rank_init_pairs.lower(
        scene, 512.0).compile())

    key = jax.random.PRNGKey(0)
    rows = jnp.zeros((8,), jnp.int32)
    keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(rows)
    clock("two-view eval chunk (compile)", lambda: _eval_pairs.lower(
        keys, rows, kps, m_ij, v_ij, pair_idx, intr,
        4.0, np.deg2rad(1.0), n_hyp_e=256, n_hyp_h=128,
    ).compile())

    opt = SfmOptions()
    cfg = BAConfig(max_iters=8, tolerance=3e-4)
    clock("registration_sweep (compile)", lambda: registration_sweep_step.lower(
        scene, jnp.zeros((N,), bool), pid, key,
        8.0, np.deg2rad(1.0),
        min_pnp_inliers=15, min_ba_landmarks=50, ba_cfg=cfg,
        max_observers=12, n_hyp_pnp=256, pnp_pair_only=False,
        ba_max_cams=16, ba_max_obs=16384,
    ).compile())

    clock("prune_observations (compile)", lambda: jax.jit(
        prune_observations, static_argnames=()
    ).lower(scene, 8.0).compile())

    prob = ba_problem_from_scene(scene, scene.pose_valid)
    gcfg = BAConfig(max_iters=50, tolerance=1e-7)
    clock("global refine_ba (compile)", lambda: jax.jit(
        partial(refine_ba, cfg=gcfg)
    ).lower(prob).compile())

    print(f"{'TOTAL':42s} {total:8.1f} s")


if __name__ == "__main__":
    main()
