"""Break the bench reconstruction into timed substages (forced syncs)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return jax.tree_util.tree_map(
        lambda a: np.asarray(a) if hasattr(a, "shape") else a, x
    )


def main():
    from eacham_tpu.sfm import SfmOptions
    from eacham_tpu.sfm.matches import build_match_tables
    from eacham_tpu.sfm.scene import make_scene, frame_pair_table
    from eacham_tpu.sfm.twoview import find_best_pair
    from eacham_tpu.sfm.pipeline import seed_initial_pair, _ba
    from eacham_tpu.sfm.device_loop import registration_sweep
    from eacham_tpu.ba.core import BAConfig

    rng = np.random.default_rng(0)
    n_frames, n_pts = 32, 400
    f = 600.0
    # same synthetic world as bench.py
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
                     ransac_hyps_pnp=256, lm_capacity=8192,
                     refine_max_iters=30, global_max_iters=50)
    kps, dsc, msk = jnp.asarray(uv), jnp.asarray(desc), jnp.asarray(mask)

    def stage(label, fn):
        out = sync(fn())   # compile+run
        t0 = time.perf_counter()
        out = sync(fn())
        print(f"{label:30s} {(time.perf_counter() - t0) * 1e3:9.0f} ms")
        return out

    t_all0 = time.perf_counter()
    pi, ok, mij, vij, mji, vji = stage(
        "match", lambda: build_match_tables(dsc, msk, ratio=opt.match_ratio,
                                            min_matches=opt.min_matches))
    pi, ok, mij, vij, mji, vji = (
        jnp.asarray(x) for x in (pi, ok, mij, vij, mji, vji)
    )
    scene = make_scene(kps, msk, pi, ok, mij, vij, mji, vji,
                       jnp.asarray(intr), lm_capacity=opt.lm_capacity)
    pid = jnp.asarray(frame_pair_table(pi, n_frames))
    order = np.argsort(-np.asarray(jnp.sum(vij, axis=1)))
    order = order[np.asarray(ok)[order]]
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    row, init = find_best_pair(key, scene, order, opt.min_initial_inliers,
                               opt.init_max_repr_error, opt.init_min_tri_angle,
                               chunk=opt.init_chunk,
                               n_hyp_e=256, n_hyp_h=128)
    print(f"{'find_best_pair(compile+run)':30s} {(time.perf_counter()-t0)*1e3:9.0f} ms")
    scene = seed_initial_pair(scene, row, init.T, init.points, init.point_ok)

    excluded = jnp.zeros((n_frames,), bool)
    cfg = BAConfig(max_iters=opt.refine_max_iters, tolerance=opt.refine_tolerance)
    t0 = time.perf_counter()
    scene2, excl2, n_reg = registration_sweep(
        scene, excluded, pid, key, opt.max_repr_error, opt.min_tri_angle,
        min_pnp_inliers=opt.min_pnp_inliers, min_ba_landmarks=opt.min_ba_landmarks,
        ba_cfg=cfg, max_observers=opt.max_observers, n_hyp_pnp=256)
    n_reg = int(n_reg)
    print(f"{'sweep(compile+run)':30s} {(time.perf_counter()-t0)*1e3:9.0f} ms  (+{n_reg} frames)")
    t0 = time.perf_counter()
    s3 = registration_sweep(
        scene, excluded, pid, key, opt.max_repr_error, opt.min_tri_angle,
        min_pnp_inliers=opt.min_pnp_inliers, min_ba_landmarks=opt.min_ba_landmarks,
        ba_cfg=cfg, max_observers=opt.max_observers, n_hyp_pnp=256)
    _ = np.asarray(s3[2])
    print(f"{'sweep(steady)':30s} {(time.perf_counter()-t0)*1e3:9.0f} ms")

    gcfg = BAConfig(max_iters=opt.global_max_iters, tolerance=opt.global_tolerance)
    t0 = time.perf_counter()
    scene4, info = _ba(scene2, scene2.pose_valid, gcfg, opt.min_ba_landmarks)
    _ = np.asarray(scene4.pose)
    print(f"{'global BA(compile+run)':30s} {(time.perf_counter()-t0)*1e3:9.0f} ms")
    print(f"{'TOTAL wall':30s} {(time.perf_counter()-t_all0)*1e3:9.0f} ms")


if __name__ == "__main__":
    main()
