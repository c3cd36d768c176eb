"""Reference-scale stress run: 100 frames x 1024 keypoints (the lego-class
workload from BASELINE.md) end-to-end on the current backend."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from eacham_tpu.sfm import run_sfm, SfmOptions
    from eacham_tpu.utils.evaluate import ate_rmse

    rng = np.random.default_rng(0)
    n_frames, n_pts, f = 100, 1024, 600.0
    pts = rng.uniform(-2, 2, (n_pts, 3)); pts[:, 2] += 6.0
    intr = np.array([f, f, 320., 240.], np.float32)
    poses = []
    for i in range(n_frames):
        a = 0.012 * i
        c, s = np.cos(a), np.sin(a)
        T = np.eye(4); T[:3, :3] = [[c, 0, -s], [0, 1, 0], [s, 0, c]]
        T[:3, 3] = [0.05 * (i - n_frames / 2), 0.01 * i, 0.02 * i]
        poses.append(T)
    poses = np.stack(poses).astype(np.float32)
    pc = np.einsum("nij,pj->npi", poses[:, :3, :3], pts) + poses[:, None, :3, 3]
    uv = np.stack([f * pc[..., 0] / pc[..., 2] + 320,
                   f * pc[..., 1] / pc[..., 2] + 240], -1)
    uv = (uv + rng.normal(scale=0.3, size=uv.shape)).astype(np.float32)
    mask = ((uv[..., 0] >= 0) & (uv[..., 0] < 640) &
            (uv[..., 1] >= 0) & (uv[..., 1] < 480) & (pc[..., 2] > 0.1))
    print("visible pts/frame:", mask.sum(1).min(), "-", mask.sum(1).max())
    desc = rng.normal(size=(n_pts, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    desc = np.broadcast_to(desc, (n_frames, n_pts, 256)).copy()
    # 10% outlier corruption
    corrupt = rng.random((n_frames, n_pts)) < 0.10
    nz = rng.normal(size=(n_frames, n_pts, 256)).astype(np.float32)
    nz /= np.linalg.norm(nz, axis=-1, keepdims=True)
    desc[corrupt] = nz[corrupt]

    opts = SfmOptions(min_initial_inliers=150, min_matches=25,
                      ransac_hyps_e=256, ransac_hyps_h=128,
                      ransac_hyps_pnp=256, lm_capacity=16384,
                      refine_max_iters=30, global_max_iters=50,
                      match_chunk=32)
    args = (jnp.asarray(uv), jnp.asarray(desc), jnp.asarray(mask))

    t0 = time.perf_counter()
    scene, stats = run_sfm(*args, image_size=(640, 480),
                           intr=jnp.asarray(intr), options=opts, verbose=True)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    scene, stats = run_sfm(*args, image_size=(640, 480),
                           intr=jnp.asarray(intr), options=opts, verbose=False)
    t_steady = time.perf_counter() - t0

    valid = np.asarray(scene.pose_valid)
    est = np.asarray(scene.pose)[valid]
    gt = poses[valid]
    c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
    print(f"registered {stats['registered']}/{n_frames}, "
          f"landmarks {stats['landmarks']}, ATE {ate_rmse(c_est, c_gt):.4f}")
    print(f"first (with compile): {t_first:.1f}s; steady: {t_steady:.1f}s "
          f"= {n_frames / t_steady:.2f} frames/s")


if __name__ == "__main__":
    main()
