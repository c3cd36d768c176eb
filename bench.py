"""Benchmark: end-to-end SfM throughput (frames/s) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (mirrors the reference's pipeline stages, apps/sfm/main.cpp):
  1. feature extraction on a batch of images (HOT LOOP 1, main.cpp:72-79)
  2. exhaustive pair matching (HOT LOOP 2, main.cpp:84-147)
  3. init pair + incremental PnP/triangulation/BA loop + global BA
     (HOT LOOP 3, main.cpp:195-231)

The scene is synthetic with known ground truth so the run also asserts
correctness (all frames registered, ATE bound) — a benchmark that
reconstructs garbage quickly would be meaningless.

Baseline: the reference publishes no numbers (BASELINE.md). The divisor
used for ``vs_baseline`` is 1.0 frames/s — a generous estimate of the
reference's end-to-end rate on its target scenes (~100 frames in ~2 min of
C++ SIFT + FLANN + GTSAM on a desktop CPU, per its own timing printouts'
orders of magnitude). The driver's measured reference runs supersede this.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_FRAMES_PER_S = 1.0


def main():
    import jax
    import jax.numpy as jnp
    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from eacham_tpu.features.frontend import extract_features
    from eacham_tpu.sfm import run_sfm, SfmOptions
    from eacham_tpu.utils.evaluate import ate_rmse

    n_frames, n_pts = 32, 400
    img_w, img_h = 640, 480
    max_kps = 512
    rng = np.random.default_rng(0)

    # ---- synthetic scene with GT ------------------------------------------
    pts = rng.uniform(-1, 1, (n_pts, 3))
    pts[:, 2] += 5.0
    f = 600.0
    intr = np.array([f, f, img_w / 2, img_h / 2], np.float32)
    poses = []
    for i in range(n_frames):
        c, s = np.cos(0.02 * i), np.sin(0.02 * i)
        R = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
        t = np.array([0.12 * (i - n_frames / 2), 0.02 * i, 0.05 * i])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        poses.append(T)
    poses = np.stack(poses).astype(np.float32)
    pc = np.einsum("nij,pj->npi", poses[:, :3, :3], pts) + poses[:, None, :3, 3]
    uv = np.stack(
        [f * pc[..., 0] / pc[..., 2] + intr[2],
         f * pc[..., 1] / pc[..., 2] + intr[3]], -1
    ) + rng.normal(scale=0.3, size=(n_frames, n_pts, 2))
    mask = (
        (uv[..., 0] >= 0) & (uv[..., 0] < img_w)
        & (uv[..., 1] >= 0) & (uv[..., 1] < img_h) & (pc[..., 2] > 0.1)
    )
    desc = rng.normal(size=(n_pts, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    desc = np.broadcast_to(desc, (n_frames, n_pts, 256)).copy()

    # images for the extraction-stage timing (texture noise)
    images = jnp.asarray(rng.random((n_frames, img_h, img_w)).astype(np.float32))

    # ---- stage 1: feature extraction (timed after warmup) ------------------
    ex = lambda: jax.block_until_ready(
        extract_features(images, max_keypoints=max_kps)
    )
    ex()  # compile
    t0 = time.perf_counter()
    ex()
    t_extract = time.perf_counter() - t0

    # ---- stages 2+3: full reconstruction -----------------------------------
    opts = SfmOptions(
        min_initial_inliers=100, min_matches=20,
        ransac_hyps_e=256, ransac_hyps_h=128, ransac_hyps_pnp=256,
        lm_capacity=8192, refine_max_iters=30, global_max_iters=50,
    )
    kps = jnp.asarray(uv.astype(np.float32))
    dsc = jnp.asarray(desc)
    msk = jnp.asarray(mask)

    # warmup pass compiles every stage; timed pass measures steady state
    run_sfm(kps, dsc, msk, image_size=(img_w, img_h),
            intr=jnp.asarray(intr), options=opts, verbose=False)
    t0 = time.perf_counter()
    scene, stats = run_sfm(kps, dsc, msk, image_size=(img_w, img_h),
                           intr=jnp.asarray(intr), options=opts, verbose=False)
    t_recon = time.perf_counter() - t0

    # ---- correctness gate ---------------------------------------------------
    assert stats["registered"] >= n_frames - 2, stats
    valid = np.asarray(scene.pose_valid)
    est = np.asarray(scene.pose)[valid]
    gt = poses[valid]
    c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
    rmse = ate_rmse(c_est, c_gt)
    assert rmse < 0.1, f"ATE {rmse}"

    total = t_extract + t_recon
    fps = n_frames / total
    print(json.dumps({
        "metric": "sfm_frames_per_s",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FRAMES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
