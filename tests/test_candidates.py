"""Candidate-pair selection: window ∪ retrieval subset of the pair matrix
(sfm/matches.candidate_pairs) and its use inside run_sfm — the capacity
policy that replaces the reference's O(N^2) enumeration
(apps/sfm/main.cpp:84-96) past toy N."""

import numpy as np
import jax.numpy as jnp

from eacham_tpu.sfm.matches import all_pairs_index, candidate_pairs

import pytest

# e2e/scale tier — excluded from the core tier (pytest -m 'not slow', README)
pytestmark = pytest.mark.slow


def _frames_with_loop(rng, n_frames=30, n_pts=96, d=64):
    """Sequence descriptors where frame N-1 revisits frame 0's content
    (a loop closure outside any reasonable window)."""
    desc = rng.normal(size=(n_frames, n_pts, d)).astype(np.float32)
    # adjacent frames share most content
    for i in range(1, n_frames):
        desc[i, : n_pts // 2] = desc[i - 1, : n_pts // 2]
    desc[-1] = desc[0]  # loop closure
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    return jnp.asarray(desc), jnp.ones((n_frames, n_pts), bool)


def test_window_pairs_complete(rng):
    desc, mask = _frames_with_loop(rng)
    pairs = candidate_pairs(desc, mask, window=4, retrieval_k=0,
                            ladder=False)
    got = set(map(tuple, np.asarray(pairs)))
    for i in range(30):
        for j in range(i + 1, min(i + 5, 30)):
            assert (i, j) in got
    assert all(j - i <= 4 for i, j in got)


def test_ladder_rungs_cover_all_spans(rng):
    desc, mask = _frames_with_loop(rng)
    pairs = candidate_pairs(desc, mask, window=4, retrieval_k=0, ladder=True)
    got = set(map(tuple, np.asarray(pairs)))
    # exponential offsets 8, 16 exist for every frame that fits
    for off in (8, 16):
        for i in range(30 - off):
            assert (i, i + off) in got
    # total stays O(N log N), far below exhaustive
    assert len(got) < 30 * 29 // 2 / 2


def test_retrieval_recovers_loop_closure(rng):
    desc, mask = _frames_with_loop(rng)
    pairs = candidate_pairs(desc, mask, window=3, retrieval_k=2)
    got = set(map(tuple, np.asarray(pairs)))
    assert (0, 29) in got, "pooled-descriptor retrieval must find the loop"


def test_degenerate_window_falls_back_to_all_pairs(rng):
    desc, mask = _frames_with_loop(rng, n_frames=6)
    pairs = candidate_pairs(desc, mask, window=0)
    np.testing.assert_array_equal(np.asarray(pairs), all_pairs_index(6))
    pairs = candidate_pairs(desc, mask, window=9)
    np.testing.assert_array_equal(np.asarray(pairs), all_pairs_index(6))


def test_run_sfm_windowed_matches_exhaustive(rng):
    """Windowed matching must reconstruct the same scene as exhaustive on a
    sequence whose edges all live inside the window."""
    from eacham_tpu.sfm import run_sfm, SfmOptions
    from eacham_tpu.utils.evaluate import ate_rmse

    n_frames, n_pts, f = 12, 160, 120.0
    pts = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    intr = np.array([f, f, 80.0, 60.0], np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    for i in range(n_frames):
        a = 0.03 * i
        c, s = np.cos(a), np.sin(a)
        poses[i, :3, :3] = [[c, 0, -s], [0, 1, 0], [s, 0, c]]
        poses[i, :3, 3] = [0.2 * i, 0.01 * i, 0.015 * i]
    pc = np.einsum("nij,pj->npi", poses[:, :3, :3], pts) + poses[:, None, :3, 3]
    uv = np.stack(
        [f * pc[..., 0] / pc[..., 2] + intr[2],
         f * pc[..., 1] / pc[..., 2] + intr[3]], -1
    ).astype(np.float32)
    vis = pc[..., 2] > 0.1
    desc = rng.normal(size=(n_pts, 64)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    desc = np.broadcast_to(desc, (n_frames, n_pts, 64)).copy()

    kw = dict(
        min_initial_inliers=40, min_matches=16,
        init_min_tri_angle_deg=0.5, min_tri_angle_deg=0.5,
        ransac_hyps_e=64, ransac_hyps_h=32, ransac_hyps_pnp=64,
        lm_capacity=1024, refine_max_iters=5, global_max_iters=8,
        local_ba_max_iters=4,
    )
    args = (jnp.asarray(uv), jnp.asarray(desc), jnp.asarray(vis))

    def ate(scene):
        valid = np.asarray(scene.pose_valid)
        est = np.asarray(scene.pose)[valid]
        gt = poses[valid]
        c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
        c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
        return ate_rmse(c_est, c_gt)

    _, st_full = run_sfm(*args, image_size=(160, 120), intr=jnp.asarray(intr),
                         options=SfmOptions(**kw), verbose=False)
    s_win, st_win = run_sfm(
        *args, image_size=(160, 120), intr=jnp.asarray(intr),
        options=SfmOptions(pair_window=4, pair_retrieval_k=2, **kw),
        verbose=False,
    )
    assert st_win["registered"] >= st_full["registered"] - 1 >= n_frames - 2
    assert ate(s_win) < 0.02
