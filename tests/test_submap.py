"""Hierarchical submap alignment (sfm/submap.py): large accumulated
drift — beyond the frame-level PGO's linearization regime (measured
39.5 deg loop inconsistency at N=1000, SCALING.md) — must be repaired by
rigid-submap Sim(3) alignment from metric loop measurements.

No reference counterpart (fatlipp/eacham has no loop handling, SURVEY §2).
"""

import numpy as np
import jax
import jax.numpy as jnp

from eacham_tpu.geometry.se3 import exp_se3
from eacham_tpu.sfm.posegraph import loop_consistency
from eacham_tpu.sfm.submap import split_submaps, submap_align


def _orbit_poses(n, radius=10.0):
    center = np.array([0.0, 0.0, 9.0], np.float32)
    poses = []
    for i in range(n):
        a = np.deg2rad(360.0 * i / n)
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


def _centers(T):
    return -np.einsum("nij,ni->nj", T[:, :3, :3], T[:, :3, 3])


def _drifted(gt, rot_mag, trans_mag, seed=0):
    """Smooth low-frequency drift: locally tight, loop-endpoint large."""
    N = gt.shape[0]
    rng = np.random.default_rng(seed)
    ramp = (np.arange(N, dtype=np.float32) / N) ** 2
    d6 = rng.normal(size=6).astype(np.float32)
    d6[:3] *= rot_mag / max(np.linalg.norm(d6[:3]), 1e-9)
    d6[3:] *= trans_mag / max(np.linalg.norm(d6[3:]), 1e-9)
    drift = ramp[:, None] * d6[None, :]
    return np.asarray(jax.vmap(exp_se3)(jnp.asarray(drift))) @ gt


def _loop_setup(N, noisy, gt, n_loops=10):
    """Chain pair rows + metric loop rows with exact GT relative SE(3)
    (what loop_pnp_measurements returns for clean pixels).

    The metric rows mirror the PRODUCTION edge structure
    (pipeline.py loop_rows = every span > pair_window edge): mid-range
    ladder rungs at several spans — which make the trajectory INTERIOR
    observable — plus true revisit edges at the loop closure.
    """
    pairs = [(i, i + 1) for i in range(N - 1)]
    loop_pairs = [(i * 3, N - 1 - i * 3) for i in range(n_loops)]
    for span in (N // 8, N // 4, N // 2):
        loop_pairs += [(k, k + span) for k in range(0, N - span, N // 12)]
    pairs += loop_pairs
    pairs = np.asarray(pairs, np.int32)
    P = len(pairs)
    n_metric = len(loop_pairs)
    loop_rows = np.arange(P - n_metric, P, dtype=np.int32)
    T_loop = np.stack([
        gt[j] @ np.linalg.inv(gt[i]) for i, j in loop_pairs
    ]).astype(np.float32)
    w_loop = np.full(n_metric, 100.0, np.float32)
    return pairs, loop_rows, T_loop, w_loop


def test_split_submaps_covers_and_reps_valid():
    valid = np.ones(457, bool)
    valid[100:140] = False
    member, rep, ok = split_submaps(valid, size=100)
    assert member.shape == (457,)
    assert (np.diff(member) >= 0).all() and member[0] == 0
    assert ok.all()
    for s in range(len(rep)):
        assert member[rep[s]] == s and valid[rep[s]]
    # a fully-invalid core is marked not-ok
    valid2 = np.ones(300, bool)
    valid2[100:200] = False
    member2, rep2, ok2 = split_submaps(valid2, size=100)
    assert ok2[0] and not ok2[1] and ok2[2]


def test_submap_align_repairs_large_drift():
    """~30 deg loop inconsistency (the measured N=1000 failure regime)
    must drop to the few-degree range, and the PIPELINE COMPOSITION —
    submap alignment followed by the frame-level PGO it preconditions —
    must recover the absolute trajectory."""
    from eacham_tpu.sfm.posegraph import optimize_pose_graph

    N = 600
    gt = _orbit_poses(N)
    noisy = _drifted(gt, rot_mag=0.5, trans_mag=3.0, seed=1)
    pairs, loop_rows, T_loop, w_loop = _loop_setup(N, noisy, gt)

    valid = np.ones(N, bool)
    fixed = np.zeros(N, bool)
    fixed[0] = True

    err0 = loop_consistency(jnp.asarray(noisy), jnp.asarray(pairs),
                            jnp.asarray(loop_rows), jnp.asarray(T_loop),
                            jnp.asarray(w_loop))
    assert err0 > 20.0, err0              # the failure regime is real

    out = submap_align(noisy, valid, fixed, pairs, loop_rows, T_loop,
                       w_loop, size=50)
    err1 = loop_consistency(jnp.asarray(out), jnp.asarray(pairs),
                            jnp.asarray(loop_rows), jnp.asarray(T_loop),
                            jnp.asarray(w_loop))
    assert err1 < 0.2 * err0, (err0, err1)

    e0 = np.abs(_centers(noisy) - _centers(gt)).max()
    e1 = np.abs(_centers(out) - _centers(gt)).max()
    assert e1 < 0.5 * e0, (e0, e1)        # rigid stage alone halves it
    # rotations into the frame-PGO linearization regime
    r1 = np.abs(out[:, :3, :3] - gt[:, :3, :3]).max()
    assert r1 < 0.25, r1
    # the fixed frame's pose is the gauge: unchanged
    assert np.abs(out[0] - noisy[0]).max() < 1e-5

    # composition: the frame PGO can now linearize and polish
    T_meas = np.stack([
        gt[j] @ np.linalg.inv(gt[i]) for i, j in pairs
    ]).astype(np.float32)
    T_meas[:, :3, 3] /= np.maximum(np.linalg.norm(
        T_meas[:, :3, 3], axis=-1, keepdims=True), 1e-9)
    w = np.full(len(pairs), 100.0, np.float32)
    out2 = np.asarray(optimize_pose_graph(
        jnp.asarray(out), jnp.asarray(valid), jnp.asarray(fixed),
        jnp.asarray(pairs), jnp.asarray(T_meas), jnp.asarray(w), iters=12,
        loop_rows=jnp.asarray(loop_rows), T_loop=jnp.asarray(T_loop),
        w_loop=jnp.asarray(w_loop)))
    e2 = np.abs(_centers(out2) - _centers(gt)).max()
    assert e2 < 0.2 * e0, (e0, e1, e2)    # measured: 2.285 -> 0.31
    r2 = np.abs(out2[:, :3, :3] - gt[:, :3, :3]).max()
    assert r2 < 5e-3, r2        # sub-0.3 deg


def test_submap_align_absorbs_scale_drift():
    """Per-submap scale variables must absorb smooth monocular scale
    drift (windowed-BA frontier scale creep) once a metric loop pins it."""
    N = 400
    gt = _orbit_poses(N)
    # scale-ramped centers: c -> (1 + 0.3 ramp) * c about the start camera
    c = _centers(gt)
    ramp = 1.0 + 0.3 * (np.arange(N, dtype=np.float32) / N) ** 2
    c_s = c[0] + ramp[:, None] * (c - c[0])
    noisy = gt.copy()
    for n in range(N):
        noisy[n, :3, 3] = -gt[n, :3, :3] @ c_s[n]
    pairs, loop_rows, T_loop, w_loop = _loop_setup(N, noisy, gt, n_loops=8)
    valid = np.ones(N, bool)
    fixed = np.zeros(N, bool)
    fixed[0] = True
    out = submap_align(noisy, valid, fixed, pairs, loop_rows, T_loop,
                       w_loop, size=50)
    e0 = np.abs(_centers(noisy) - _centers(gt)).max()
    e1 = np.abs(_centers(out) - _centers(gt)).max()
    assert e1 < 0.35 * e0, (e0, e1)


def test_submap_align_noop_without_loops():
    """No metric loop edge above the gate -> poses returned unchanged."""
    N = 200
    gt = _orbit_poses(N)
    noisy = _drifted(gt, rot_mag=0.3, trans_mag=2.0, seed=2)
    pairs, loop_rows, T_loop, w_loop = _loop_setup(N, noisy, gt, n_loops=4)
    out = submap_align(noisy, np.ones(N, bool),
                       np.eye(1, N, 0, dtype=bool)[0], pairs, loop_rows,
                       T_loop, np.zeros_like(w_loop), size=50)
    assert np.allclose(out, noisy)


def test_submap_align_passes_invalid_through():
    N = 300
    gt = _orbit_poses(N)
    noisy = _drifted(gt, rot_mag=0.4, trans_mag=2.0, seed=3)
    valid = np.ones(N, bool)
    valid[40:70] = False
    garbage = noisy.copy()
    garbage[40:70] = 1e30                      # invalid poses hold junk
    pairs, loop_rows, T_loop, w_loop = _loop_setup(N, garbage, gt)
    fixed = np.zeros(N, bool)
    fixed[0] = True
    out = submap_align(garbage, valid, fixed, pairs, loop_rows, T_loop,
                       w_loop, size=50)
    assert np.allclose(out[40:70], garbage[40:70])   # untouched
    assert np.isfinite(out[valid]).all()
    # the measured inconsistency must still improve despite the gap
    e_raw = loop_consistency(jnp.asarray(garbage), jnp.asarray(pairs),
                             jnp.asarray(loop_rows), jnp.asarray(T_loop),
                             jnp.asarray(w_loop))
    e_out = loop_consistency(jnp.asarray(out), jnp.asarray(pairs),
                             jnp.asarray(loop_rows), jnp.asarray(T_loop),
                             jnp.asarray(w_loop))
    assert e_out < 0.75 * e_raw, (e_raw, e_out)
    # and the valid trajectory must not degrade materially (the absolute
    # polish is the downstream frame-PGO's job)
    e0 = np.abs(_centers(noisy[valid]) - _centers(gt[valid])).max()
    e1 = np.abs(_centers(out[valid]) - _centers(gt[valid])).max()
    assert e1 < 1.3 * e0, (e0, e1)
