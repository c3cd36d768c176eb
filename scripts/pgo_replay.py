"""Replay a pose-graph solve from an EACHAM_PGO_DUMP file.

The stress/CLI runs save every PGO input (poses, edge measurements, PnP
loop measurements, the loop-start local maps) when EACHAM_PGO_DUMP=<path>
is set; this tool re-runs `optimize_pose_graph` offline so loop-closing
variants iterate in seconds instead of full N=500 reconstructions.

    python scripts/pgo_replay.py /tmp/pgo500_new.npz [--gt poses.npy]

Prints the loop-consistency metric before/after and, when ground-truth
poses are available (the stress workload's orbit is re-derivable from its
frame count), the similarity-aligned ATE before/after.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def orbit_gt(n):
    """The stress_500 orbit (keep in sync with scripts/stress_500.py)."""
    center = np.array([0.0, 0.0, 9.0], np.float32)
    orbit_r = 14.0
    poses = []
    for i in range(n):
        a = np.deg2rad(360.0 * 1.04 * i / n)
        cam = center + orbit_r * np.array(
            [np.sin(a), 0.025 * np.sin(5 * a), -np.cos(a)], np.float32)
        fwd = center - cam
        fwd /= np.linalg.norm(fwd)
        right = np.cross([0.0, 1.0, 0.0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        R = np.stack([right, up, fwd]).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = -R @ cam
        poses.append(T)
    return np.stack(poses)


def centers(T):
    return -np.einsum("nij,ni->nj", T[:, :3, :3], T[:, :3, 3])


def ate(T_est, T_gt, valid):
    from eacham_tpu.utils.evaluate import ate_rmse

    return ate_rmse(centers(T_est[valid]), centers(T_gt[valid]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--no-pnp", action="store_true",
                    help="drop the metric PnP loop edges (direction-only)")
    ap.add_argument("--gt-frames", type=int, default=0,
                    help="derive stress-orbit GT for this frame count")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from eacham_tpu.sfm.posegraph import loop_consistency, optimize_pose_graph

    d = np.load(args.dump)
    pose = jnp.asarray(d["pose_before"])
    valid = jnp.asarray(d["pose_valid"])
    fixed = jnp.asarray(d["pose_fixed"])
    pair_idx = jnp.asarray(d["pair_idx"])
    T_meas = jnp.asarray(d["T_meas"])
    w_meas = jnp.asarray(d["w_meas"])
    has_pnp = "loop_rows" in d.files and not args.no_pnp
    kw = {}
    if has_pnp:
        kw = dict(loop_rows=jnp.asarray(d["loop_rows"]),
                  T_loop=jnp.asarray(d["T_loop"]),
                  w_loop=jnp.asarray(d["w_loop"]))
        print(f"loop PnP edges: {int((d['loop_rows'] >= 0).sum())} "
              f"(weights med {np.median(d['w_loop'][d['loop_rows'] >= 0]):.0f})")

    out = optimize_pose_graph(pose, valid, fixed, pair_idx, T_meas, w_meas,
                              iters=args.iters, **kw)

    if has_pnp:
        e0 = loop_consistency(pose, pair_idx, kw["loop_rows"],
                              kw["T_loop"], kw["w_loop"])
        e1 = loop_consistency(out, pair_idx, kw["loop_rows"],
                              kw["T_loop"], kw["w_loop"])
        print(f"loop consistency: {e0:.3f} -> {e1:.3f} deg "
              f"({'ACCEPT' if e1 < 0.7 * e0 else 'REJECT'})")

    n = args.gt_frames or pose.shape[0]
    gt = orbit_gt(n)
    if gt.shape[0] == pose.shape[0]:
        v = np.asarray(valid)
        print(f"ATE: {ate(np.asarray(pose), gt, v):.4f} -> "
              f"{ate(np.asarray(out), gt, v):.4f}")


if __name__ == "__main__":
    main()
