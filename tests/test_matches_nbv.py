"""Unit tests for the match-graph internals: observer gathering, inverse
tables, next-best-view scoring, init-pair ranking."""

import numpy as np
import jax.numpy as jnp

from eacham_tpu.sfm.matches import (
    all_pairs_index, invert_matches, observers_of_frame,
)
from eacham_tpu.sfm.pipeline import next_best_view, rank_init_pairs
from eacham_tpu.sfm.scene import (
    make_scene, frame_pair_table, alloc_landmarks,
)


def _scene_with_matches(rng, N=4, K=8):
    pair_idx = jnp.asarray(all_pairs_index(N))
    P = pair_idx.shape[0]
    # identity matches between every pair (track k visible everywhere)
    match_ij = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (P, K))
    valid_ij = jnp.ones((P, K), bool)
    match_ji, valid_ji = invert_matches(match_ij, valid_ij)
    scene = make_scene(
        keypoints=jnp.asarray(rng.uniform(0, 100, (N, K, 2)).astype(np.float32)),
        kp_mask=jnp.ones((N, K), bool),
        pair_idx=pair_idx,
        pair_ok=jnp.ones((P,), bool),
        match_ij=match_ij, valid_ij=valid_ij,
        match_ji=match_ji, valid_ji=valid_ji,
        intr=jnp.asarray([100.0, 100.0, 50.0, 50.0]),
        lm_capacity=64,
    )
    return scene, pair_idx


def test_invert_matches(rng):
    K = 6
    mj = jnp.asarray([[2, 0, 5, 1, 3, 4]], jnp.int32)
    v = jnp.asarray([[True, True, False, True, True, True]])
    inv, inv_v = invert_matches(mj, v)
    # kp 2 of frame j was matched from kp 0 of frame i
    assert int(inv[0, 2]) == 0
    assert int(inv[0, 0]) == 1
    assert not bool(inv_v[0, 5])   # masked forward match -> no inverse
    assert int(inv[0, 1]) == 3


def test_observers_of_frame(rng):
    scene, pair_idx = _scene_with_matches(rng)
    N = 4
    tbl = jnp.asarray(frame_pair_table(pair_idx, N))
    obs_frame, obs_kp, obs_on = observers_of_frame(
        jnp.int32(2), tbl[2], scene.pair_idx, scene.pair_ok,
        scene.match_ij, scene.valid_ij, scene.match_ji, scene.valid_ji,
    )
    # identity matching: every neighbor observes kp k of frame 2 at its
    # own kp k; neighbor slots list frames in ascending order
    on = np.asarray(obs_on)
    frames = np.asarray(obs_frame)[on.any(axis=1)]
    assert sorted(frames.tolist()) == [v for v in range(N) if v != 2]
    assert np.array_equal(frames, np.sort(frames))
    for d in range(len(np.asarray(obs_frame))):
        if on[d].any():
            assert np.array_equal(np.asarray(obs_kp[d]), np.arange(8))
            assert on[d].all()


def test_next_best_view_prefers_landmark_rich_edges(rng):
    scene, pair_idx = _scene_with_matches(rng)
    # register frames 0,1; give frame 0's kps landmarks with 3 observers
    scene = scene._replace(
        pose_valid=scene.pose_valid.at[0].set(True).at[1].set(True))
    pts = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32) + [0, 0, 5])
    scene, ids = alloc_landmarks(scene, pts, jnp.ones((8,), bool))
    scene = scene._replace(
        kp2lm=scene.kp2lm.at[0].set(ids).at[1].set(ids).at[3].set(ids))
    # landmarks observed by 0,1,3 -> not two-view; candidates: 2 and 3(excl)
    excluded = jnp.zeros((4,), bool)
    prev, cur, score = next_best_view(scene, excluded)
    assert int(cur) in (2, 3)
    assert int(score) > 0
    # exclude 3: next must be 2
    prev, cur, _ = next_best_view(scene, excluded.at[3].set(True))
    assert int(cur) == 2
    assert bool(scene.pose_valid[int(prev)])
    # nothing left once all unregistered frames are excluded
    _, _, s = next_best_view(scene, jnp.asarray([False, False, True, True]))
    assert int(s) < 0


def test_rank_init_pairs_prefers_motion(rng):
    scene, pair_idx = _scene_with_matches(rng, N=3, K=8)
    # pair (0,1): tiny motion; pair (0,2): large motion — same match count
    kps = np.zeros((3, 8, 2), np.float32)
    kps[0] = rng.uniform(0, 100, (8, 2))
    kps[1] = kps[0] + 1.0        # ~1px
    kps[2] = kps[0] + 60.0       # large
    scene = scene._replace(keypoints=jnp.asarray(kps))
    scores = np.asarray(rank_init_pairs(scene, 100.0))
    pi = np.asarray(pair_idx)
    s01 = scores[(pi == [0, 1]).all(1)][0]
    s02 = scores[(pi == [0, 2]).all(1)][0]
    assert s02 > s01
