"""Pose-graph optimization: drift-corrupted trajectories must snap back
when relative measurements (including a loop closure) are consistent.

No reference counterpart (the reference has no loop handling, SURVEY §2);
this covers the TPU-native loop-closing stage (sfm/posegraph.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eacham_tpu.geometry.se3 import exp_se3, inverse_se3
from eacham_tpu.sfm.posegraph import optimize_pose_graph


def _orbit_poses(n, radius=10.0, closing=1.0):
    center = np.array([0.0, 0.0, 9.0], np.float32)
    poses = []
    for i in range(n):
        a = np.deg2rad(360.0 * closing * i / n)
        cam = center + radius * np.array(
            [np.sin(a), 0.0, -np.cos(a)], np.float32)
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


def _edges_from_gt(poses, pairs):
    """Exact relative measurements with unit translations."""
    T = []
    for i, j in pairs:
        rel = poses[j] @ np.linalg.inv(poses[i])
        t = rel[:3, 3]
        rel = rel.copy()
        rel[:3, 3] = t / max(np.linalg.norm(t), 1e-9)
        T.append(rel)
    return np.stack(T).astype(np.float32)


def _centers(T):
    return -np.einsum("nij,ni->nj", T[:, :3, :3], T[:, :3, 3])


@pytest.mark.parametrize("seed", [0])
def test_pgo_recovers_drifted_loop(seed):
    N = 48
    gt = _orbit_poses(N)
    rng = np.random.default_rng(seed)

    # simulate accumulated drift the way the local-window sweep produces
    # it: LOCALLY tight (tiny white noise) but with a smooth low-frequency
    # error growing along the chain — by the loop closure it is large
    ramp = (np.arange(N, dtype=np.float32) / N) ** 2
    direction = rng.normal(size=6).astype(np.float32)
    direction *= np.array([0.12] * 3 + [1.2] * 3, np.float32) / max(
        np.linalg.norm(direction), 1e-9)
    drift = ramp[:, None] * direction[None, :]
    drift += rng.normal(scale=[2e-4] * 3 + [2e-3] * 3,
                        size=(N, 6)).astype(np.float32)
    drift[0] = 0.0
    noisy = np.asarray(jax.vmap(exp_se3)(jnp.asarray(drift))) @ gt
    noisy[0] = gt[0]

    # chain + window edges + one loop closure
    pairs = [(i, i + 1) for i in range(N - 1)]
    pairs += [(i, i + 3) for i in range(N - 3)]
    pairs += [(0, N - 1), (1, N - 1), (0, N - 2)]
    pairs = np.asarray(pairs, np.int32)
    T_meas = _edges_from_gt(gt, pairs)
    w = np.full(len(pairs), 100.0, np.float32)

    valid = np.ones(N, bool)
    fixed = np.zeros(N, bool)
    fixed[0] = True

    from eacham_tpu.utils.evaluate import align_umeyama

    def shape_err(T):
        # global scale+translation are monocular gauge freedoms — compare
        # the similarity-aligned shape (what ATE evaluation does too)
        s, R, t = align_umeyama(_centers(T), _centers(gt))
        aligned = s * _centers(T) @ R.T + t
        return np.abs(aligned - _centers(gt)).max()

    err_before = shape_err(noisy)
    out = np.asarray(optimize_pose_graph(
        jnp.asarray(noisy), jnp.asarray(valid), jnp.asarray(fixed),
        jnp.asarray(pairs), jnp.asarray(T_meas), jnp.asarray(w),
        iters=15,
    ))
    err_after = shape_err(out)
    assert err_before > 0.2, err_before          # the drift is real
    assert err_after < 0.15 * err_before, (err_before, err_after)
    # rotations recovered too
    r_err = np.abs(out[:, :3, :3] - gt[:, :3, :3]).max()
    assert r_err < 0.02, r_err


def test_pgo_ignores_invalid_and_weak_edges():
    N = 8
    gt = _orbit_poses(N)
    pairs = np.asarray([(i, i + 1) for i in range(N - 1)] + [(2, 5)],
                       np.int32)
    T_meas = _edges_from_gt(gt, pairs)
    w = np.full(len(pairs), 100.0, np.float32)
    w[-1] = 1.0                                   # under min_weight -> unused
    valid = np.ones(N, bool)
    valid[5] = False                              # edges touching 5 drop out
    fixed = np.zeros(N, bool)
    fixed[0] = True
    out = np.asarray(optimize_pose_graph(
        jnp.asarray(gt), jnp.asarray(valid), jnp.asarray(fixed),
        jnp.asarray(pairs), jnp.asarray(T_meas), jnp.asarray(w), iters=5,
    ))
    assert np.isfinite(out).all()
    # already-consistent poses stay put
    assert np.abs(out[valid] - gt[valid]).max() < 1e-3
    # invalid poses pass through untouched
    assert np.allclose(out[5], gt[5])


def _loop_pnp_setup(drift_scale=1.0):
    """Scene where frame j revisits frame i's neighborhood: frame i's
    local map is built in ITS drifted frame (locally consistent), frame
    j observes the same structure with exact pixels."""
    from eacham_tpu.geometry.camera import project
    from eacham_tpu.geometry.se3 import transform_points

    N, L, K = 12, 96, 96
    gt = _orbit_poses(N)
    rng = np.random.default_rng(3)
    # world structure: cloud around the orbit center, in front of all cams
    X_gt = (np.array([0.0, 0.0, 9.0]) +
            rng.uniform(-3, 3, size=(L, 3))).astype(np.float32)
    intr = jnp.asarray([400.0, 400.0, 320.0, 240.0], jnp.float32)

    # smooth drift, zero at frame 0, large at the end
    ramp = (np.arange(N, dtype=np.float32) / N) ** 2 * drift_scale
    d6 = rng.normal(size=6).astype(np.float32)
    d6 *= np.array([0.1] * 3 + [1.0] * 3, np.float32) / np.linalg.norm(d6)
    drift = ramp[:, None] * d6[None, :]
    noisy = np.asarray(jax.vmap(exp_se3)(jnp.asarray(drift))) @ gt

    # exact pixel observations of the GT structure
    kps = np.zeros((N, K, 2), np.float32)
    for n in range(N):
        uv, _ = project(jnp.asarray(gt[n]), jnp.asarray(X_gt), intr)
        kps[n] = np.asarray(uv)

    i, j = 0, N - 1                       # loop pair: j revisits i
    # frame i's local map: GT structure re-expressed so that projecting it
    # through the DRIFTED pose i reproduces frame i's pixels
    Ti_fix = np.asarray(inverse_se3(jnp.asarray(noisy[i]))) @ gt[i]
    X_map = np.asarray(transform_points(jnp.asarray(Ti_fix),
                                        jnp.asarray(X_gt)))

    pairs = np.asarray([(n, n + 1) for n in range(N - 1)] + [(i, j)],
                       np.int32)
    P = len(pairs)
    match = np.tile(np.arange(K, dtype=np.int32), (P, 1))
    vmask = np.ones((P, K), bool)
    kp2lm = np.full((N, K), -1, np.int32)
    kp2lm[i] = np.arange(L)
    return (gt, noisy, X_map, kps, intr, pairs, match, vmask, kp2lm, P, i, j)


def test_loop_pnp_measurement_recovers_metric_relative():
    from eacham_tpu.sfm.posegraph import loop_pnp_measurements

    (gt, noisy, X_map, kps, intr, pairs, match, vmask, kp2lm,
     P, i, j) = _loop_pnp_setup()
    loop_rows = jnp.asarray([P - 1, -1], jnp.int32)      # incl. a pad row
    T_loop, w_loop = loop_pnp_measurements(
        jnp.asarray(noisy), jnp.asarray(X_map),
        jnp.ones(X_map.shape[0], bool), jnp.asarray(kp2lm),
        jnp.asarray(kps), jnp.asarray(pairs), jnp.asarray(match),
        jnp.asarray(vmask), intr, loop_rows, jax.random.PRNGKey(0),
    )
    T_loop = np.asarray(T_loop)
    w_loop = np.asarray(w_loop)
    assert w_loop[1] == 0.0                              # pad row off
    assert w_loop[0] >= 48, w_loop                       # most points inliers
    rel_gt = gt[j] @ np.linalg.inv(gt[i])
    # full metric SE(3), scale included (the local map carries GT scale)
    assert np.abs(T_loop[0] - rel_gt).max() < 5e-2, (
        np.abs(T_loop[0] - rel_gt).max())


def test_pgo_with_pnp_loop_edges_and_gate():
    from eacham_tpu.sfm.posegraph import (
        loop_consistency, loop_pnp_measurements, optimize_pose_graph)

    (gt, noisy, X_map, kps, intr, pairs, match, vmask, kp2lm,
     P, i, j) = _loop_pnp_setup()
    N = gt.shape[0]
    loop_rows = jnp.asarray([P - 1], jnp.int32)
    T_loop, w_loop = loop_pnp_measurements(
        jnp.asarray(noisy), jnp.asarray(X_map),
        jnp.ones(X_map.shape[0], bool), jnp.asarray(kp2lm),
        jnp.asarray(kps), jnp.asarray(pairs), jnp.asarray(match),
        jnp.asarray(vmask), intr, loop_rows, jax.random.PRNGKey(0),
    )
    T_meas = _edges_from_gt(gt, pairs)
    w = np.full(P, 100.0, np.float32)
    valid = np.ones(N, bool)
    fixed = np.zeros(N, bool)
    fixed[0] = True
    out = np.asarray(optimize_pose_graph(
        jnp.asarray(noisy), jnp.asarray(valid), jnp.asarray(fixed),
        jnp.asarray(pairs), jnp.asarray(T_meas), jnp.asarray(w), iters=10,
        loop_rows=loop_rows, T_loop=T_loop, w_loop=w_loop,
    ))
    # the consistency gate's metric must improve through the correction
    e_before = loop_consistency(jnp.asarray(noisy), jnp.asarray(pairs),
                                loop_rows, T_loop, w_loop)
    e_after = loop_consistency(jnp.asarray(out), jnp.asarray(pairs),
                               loop_rows, T_loop, w_loop)
    assert e_after < e_before, (e_before, e_after)
    # and the trajectory actually improves toward GT
    err_b = np.abs(_centers(noisy) - _centers(gt)).max()
    err_a = np.abs(_centers(out) - _centers(gt)).max()
    assert err_a < 0.5 * err_b, (err_b, err_a)
    # no loop edge above the weight gate -> inf (gate rejects)
    e_none = loop_consistency(jnp.asarray(noisy), jnp.asarray(pairs),
                              loop_rows, T_loop, jnp.zeros_like(w_loop))
    assert np.isinf(e_none)
