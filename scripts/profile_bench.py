"""Timestamped run of the exact bench workload (second/steady pass)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from eacham_tpu.sfm import run_sfm, SfmOptions

    rng = np.random.default_rng(0)
    n_frames, n_pts, f = 32, 400, 600.0
    pts = rng.uniform(-1, 1, (n_pts, 3)); pts[:, 2] += 5.0
    intr = np.array([f, f, 320., 240.], np.float32)
    poses = []
    for i in range(n_frames):
        c, s = np.cos(0.02 * i), np.sin(0.02 * i)
        T = np.eye(4); T[:3, :3] = [[c, 0, -s], [0, 1, 0], [s, 0, c]]
        T[:3, 3] = [0.12 * (i - 16), 0.02 * i, 0.05 * i]
        poses.append(T)
    poses = np.stack(poses).astype(np.float32)
    pc = np.einsum("nij,pj->npi", poses[:, :3, :3], pts) + poses[:, None, :3, 3]
    uv = np.stack([f * pc[..., 0] / pc[..., 2] + 320,
                   f * pc[..., 1] / pc[..., 2] + 240], -1)
    uv = (uv + rng.normal(scale=0.3, size=uv.shape)).astype(np.float32)
    mask = ((uv[..., 0] >= 0) & (uv[..., 0] < 640) &
            (uv[..., 1] >= 0) & (uv[..., 1] < 480) & (pc[..., 2] > 0.1))
    desc = rng.normal(size=(n_pts, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    desc = np.broadcast_to(desc, (n_frames, n_pts, 256)).copy()

    opts = SfmOptions(min_initial_inliers=100, min_matches=20,
                      ransac_hyps_e=256, ransac_hyps_h=128,
                      ransac_hyps_pnp=256, lm_capacity=8192,
                      refine_max_iters=30, global_max_iters=50)
    args = (jnp.asarray(uv), jnp.asarray(desc), jnp.asarray(mask))

    t0 = time.perf_counter()

    def ts_log(*a):
        print(f"[{time.perf_counter() - t0:7.2f}s]", *a, flush=True)

    import eacham_tpu.sfm.pipeline as pl
    run_sfm(*args, image_size=(640, 480), intr=jnp.asarray(intr),
            options=opts, verbose=True)
    ts_log("--- warmup done; timed pass ---")
    t1 = time.perf_counter()
    run_sfm(*args, image_size=(640, 480), intr=jnp.asarray(intr),
            options=opts, verbose=True)
    ts_log(f"timed pass total: {time.perf_counter() - t1:.2f}s")


if __name__ == "__main__":
    import builtins
    _t0 = time.perf_counter()
    _orig = builtins.print
    builtins.print = lambda *a, **k: _orig(
        f"[{time.perf_counter() - _t0:7.2f}s]", *a, **k)
    main()
