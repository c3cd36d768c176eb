"""Attribute the fully-cached warm start (VERDICT r4 weak #7).

BENCH_r04 recorded a 32.4 s warmup pass with ZERO fresh compiles — where
does a no-compile warm start spend half a minute? This script times every
component of the bench warmup path separately, on the first call (cache
load + executable transfer + dispatch) and the second call (steady
state); first-minus-second is that program's one-time warm cost.

    python scripts/profile_warmstart.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    t_wall = time.perf_counter()

    def stamp(msg):
        print(f"[{time.perf_counter() - t_wall:7.2f}s] {msg}", flush=True)

    stamp("python start (imports next)")
    import jax

    stamp("jax imported")
    from eacham_tpu.utils.cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    stamp(f"compilation cache on ({cache_dir})")

    import jax.numpy as jnp

    x = jnp.zeros((8,), jnp.float32)
    np.asarray(x + 1.0)
    stamp("backend init + first trivial dispatch")
    floor = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(x + 1.0)
        floor.append(time.perf_counter() - t0)
    stamp(f"dispatch+fetch floor: {min(floor) * 1e3:.1f} ms")

    from eacham_tpu.features.frontend import extract_features
    from eacham_tpu.sfm import run_sfm, SfmOptions

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    rng = np.random.default_rng(0)
    images_np, poses_gt, intr = bench.render_workload(rng)
    stamp("workload rendered (untimed in bench)")
    images = jnp.asarray(images_np)
    np.asarray(images[0, 0, 0])
    stamp("images uploaded")

    opts = SfmOptions(
        min_initial_inliers=100, min_matches=25, match_ratio=0.85,
        init_min_tri_angle_deg=1.0, min_tri_angle_deg=1.0,
        ransac_hyps_e=256, ransac_hyps_h=128, ransac_hyps_pnp=256,
        lm_capacity=16384, refine_max_iters=30, global_max_iters=50,
        match_chunk=32, local_ba_every=4,
    )

    for rep in (1, 2):
        t0 = time.perf_counter()
        xy, desc, score, mask = extract_features(
            images, max_keypoints=bench.MAX_KPS)
        np.asarray(xy)
        np.asarray(desc[-1, -1, -1])
        t_ex = time.perf_counter() - t0
        stamp(f"extract pass {rep}: {t_ex:.2f}s")

    # run_sfm with verbose=True: its [sfm +t] stamps attribute the interior
    for rep in (1, 2):
        t0 = time.perf_counter()
        scene, stats = run_sfm(
            xy, desc, mask, image_size=(bench.WIDTH, bench.HEIGHT),
            intr=jnp.asarray(intr), options=opts, verbose=(rep == 1))
        np.asarray(scene.pose)
        stamp(f"run_sfm pass {rep}: {time.perf_counter() - t0:.2f}s "
              f"(registered {stats['registered']})")


if __name__ == "__main__":
    main()
