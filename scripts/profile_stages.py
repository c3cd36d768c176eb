"""Stage-level wall profiling of the pipeline on the current backend.

Times each jitted stage separately (post-warmup) so optimization targets
the real bottleneck instead of guesses. Run on TPU: `python
scripts/profile_stages.py`; CPU: prefix JAX_PLATFORMS=cpu (and update
jax config in-process, see tests/conftest.py).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(label, fn, n=3):
    fn()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    dt = (time.perf_counter() - t0) / n
    print(f"{label:35s} {dt * 1e3:9.1f} ms")
    return dt


def main():
    from eacham_tpu.features.frontend import extract_features
    from eacham_tpu.features.matching import match_all_pairs
    from eacham_tpu.geometry.epipolar import estimate_essential
    from eacham_tpu.geometry.pnp import solve_pnp_ransac
    from eacham_tpu.geometry.camera import pixel_to_normalized
    from eacham_tpu.sfm import run_sfm, SfmOptions
    from eacham_tpu.sfm.matches import all_pairs_index
    from eacham_tpu.sfm.twoview import recover_pose_two_view
    from eacham_tpu.ba.core import BAConfig, refine_ba
    from tests.test_parallel import _random_problem

    rng = np.random.default_rng(0)
    n_frames, n_pts = 32, 400
    f = 600.0
    intr = jnp.asarray([f, f, 320.0, 240.0], jnp.float32)

    images = jnp.asarray(rng.random((n_frames, 480, 640)).astype(np.float32))
    timeit("extract_features[32]", lambda: extract_features(images, max_keypoints=512))

    desc = rng.normal(size=(n_pts, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    desc = jnp.asarray(np.broadcast_to(desc, (n_frames, n_pts, 256)).copy())
    mask = jnp.ones((n_frames, n_pts), bool)
    pair_idx = jnp.asarray(all_pairs_index(n_frames))
    timeit("match_all_pairs[496]", lambda: match_all_pairs(desc, mask, pair_idx))

    uv1 = jnp.asarray(rng.uniform(0, 640, (n_pts, 2)).astype(np.float32))
    uv2 = uv1 + 5.0
    key = jax.random.PRNGKey(0)
    xy1 = pixel_to_normalized(uv1, intr)
    xy2 = pixel_to_normalized(uv2, intr)
    m = jnp.ones((n_pts,), bool)
    timeit("estimate_essential[256hyp]",
           lambda: estimate_essential(key, xy1, xy2, m, 4.0 / f, n_hyp=256))
    timeit("recover_pose_two_view",
           lambda: recover_pose_two_view(key, uv1, uv2, m, intr,
                                         n_hyp_e=256, n_hyp_h=128))

    pts3d = jnp.asarray(rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32) +
                        np.array([0, 0, 5], np.float32))
    timeit("solve_pnp_ransac[256hyp]",
           lambda: solve_pnp_ransac(key, pts3d, uv1, m, intr, n_hyp=256))

    prob, _, _ = _random_problem(np.random.default_rng(1))
    cfg = BAConfig(max_iters=20, cg_iters=25)
    timeit("refine_ba[20 LM]", lambda: refine_ba(prob, cfg)[0])

    # triangulate_frame proxy: consensus triangulation of 512 tracks x 12 obs
    from eacham_tpu.geometry.triangulation import triangulate_consensus
    V = 12
    Ts = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (512, V, 1, 1)))
    Ts = Ts.at[:, :, 0, 3].set(jnp.asarray(rng.normal(size=(512, V)).astype(np.float32)))
    uvv = jnp.asarray(rng.uniform(0, 640, (512, V, 2)).astype(np.float32))
    mv = jnp.ones((512, V), bool)
    tri = jax.jit(jax.vmap(
        lambda T, u, mm: triangulate_consensus(T, u, mm, intr, 8.0, 0.03)
    ))
    timeit("triangulate_consensus[512x12]", lambda: tri(Ts, uvv, mv))

    # full pipeline for the composite number
    from tests.test_pipeline import make_feature_world
    poses_gt, pts_gt, intr_np, kps, dsc, msk = make_feature_world(
        np.random.default_rng(7), n_cams=16, n_pts=400, noise=0.3
    )
    opts = SfmOptions(min_initial_inliers=100, min_matches=20,
                      ransac_hyps_e=256, ransac_hyps_h=128,
                      ransac_hyps_pnp=256, lm_capacity=8192,
                      refine_max_iters=30, global_max_iters=50)
    args = (jnp.asarray(kps), jnp.asarray(dsc), jnp.asarray(msk))

    def full():
        return run_sfm(*args, image_size=(640, 480),
                       intr=jnp.asarray(intr_np, jnp.float32),
                       options=opts, verbose=False)[0].pose

    timeit("run_sfm[16 frames]", full, n=1)


if __name__ == "__main__":
    main()
