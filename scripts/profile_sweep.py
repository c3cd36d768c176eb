"""Ablation-profile the on-device registration sweep: time full vs
stage-weakened variants to attribute the per-frame cost."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from eacham_tpu.sfm import SfmOptions
    from eacham_tpu.sfm.matches import build_match_tables
    from eacham_tpu.sfm.scene import make_scene, frame_pair_table
    from eacham_tpu.sfm.twoview import find_best_pair
    from eacham_tpu.sfm.pipeline import seed_initial_pair
    from eacham_tpu.sfm.device_loop import registration_sweep
    from eacham_tpu.ba.core import BAConfig

    rng = np.random.default_rng(0)
    n_frames, n_pts = 32, 400
    f = 600.0
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

    opt = SfmOptions(min_initial_inliers=100, min_matches=20,
                     ransac_hyps_e=256, ransac_hyps_h=128,
                     ransac_hyps_pnp=256, lm_capacity=8192)
    kps, dsc, msk = jnp.asarray(uv), jnp.asarray(desc), jnp.asarray(mask)
    tbl = build_match_tables(dsc, msk, ratio=0.8, min_matches=20)
    scene0 = make_scene(kps, msk, *tbl, jnp.asarray(intr), lm_capacity=8192)
    pid = jnp.asarray(frame_pair_table(tbl[0], n_frames))
    order = np.argsort(-np.asarray(jnp.sum(tbl[3], axis=1)))
    order = order[np.asarray(tbl[1])[order]]
    key = jax.random.PRNGKey(0)
    row, init = find_best_pair(key, scene0, order, 100, 4.0, 0.05,
                               chunk=4, n_hyp_e=256, n_hyp_h=128)
    scene = seed_initial_pair(scene0, row, init.T, init.points, init.point_ok)
    excluded = jnp.zeros((n_frames,), bool)

    def run(label, **kw):
        args = dict(min_pnp_inliers=15, min_ba_landmarks=50,
                    ba_cfg=BAConfig(max_iters=30, cg_iters=25),
                    max_observers=12, n_hyp_pnp=256)
        args.update(kw)
        out = registration_sweep(scene, excluded, pid, key, 8.0, 0.035, **args)
        n = int(np.asarray(out[2]))
        t0 = time.perf_counter()
        out = registration_sweep(scene, excluded, pid, key, 8.0, 0.035, **args)
        _ = np.asarray(out[2])
        print(f"{label:34s} {(time.perf_counter()-t0)*1e3:8.0f} ms  (+{n})")

    run("full (LM30/CG25)")
    run("LM30/CG12", ba_cfg=BAConfig(max_iters=30, cg_iters=12))
    run("no BA (LM1/CG1)", ba_cfg=BAConfig(max_iters=1, cg_iters=1))
    run("pnp 64 hyp", n_hyp_pnp=64)
    run("obs cap 6", max_observers=6)


if __name__ == "__main__":
    main()
