"""Per-frame multi-view triangulation with landmark merge + relink.

TPU-native equivalent of ``TriangulateFrame``
(modules/sfm/reconstruction/Triangulator.cpp:188-303):

  * merge step: a keypoint of the new frame links to an existing landmark
    when some matched neighbor keypoint already carries a landmark with >2
    observers and that landmark reprojects into the new frame under the
    error bound (cpp:216-235)
  * otherwise the keypoint's observers across all registered neighbors form
    a track; tracks with >= minObservers go through exhaustive-pair
    consensus triangulation (cpp:247-263 -> TriangulatePointRansac)
  * a track is accepted only if EVERY observer is an inlier (cpp:276-278)
  * accepted points are added to the map and all observers are re-linked,
    overwriting stale links (cpp:280-294)

Everything is one jitted pass over the [K] keypoints of the frame: observer
gathering is a degree-compacted [D, K] table (D = max candidate-pair degree,
O(window) under windowed candidates — NOT O(N)), per-track observers are
capped to a static ``max_observers`` (tracks are short in practice; the cap
bounds the pair-enumeration tensor), and landmark allocation is a cumsum
scatter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from eacham_tpu.geometry.camera import project
from eacham_tpu.geometry.triangulation import triangulate_consensus
from eacham_tpu.sfm.matches import observers_of_frame
from eacham_tpu.sfm.scene import Scene, alloc_landmarks, lm_observer_counts


@partial(jax.jit, static_argnames=("max_observers",))
def triangulate_frame(
    scene: Scene,
    frame: jnp.ndarray,          # [] int32
    pair_rows: jnp.ndarray,      # [D] int32 — frame_pair_table[frame]
    min_observers: jnp.ndarray,  # [] int32 (2 on first pass, 3 on second — main.cpp:203,209)
    max_repr_error: float,
    min_tri_angle: float,
    max_observers: int = 12,
):
    """Returns ``(scene, n_merged, n_new)``."""
    N, K = scene.kp_mask.shape
    D = pair_rows.shape[0]
    L = scene.lm_capacity

    obs_frame, obs_kp, obs_on = observers_of_frame(
        frame, pair_rows, scene.pair_idx, scene.pair_ok,
        scene.match_ij, scene.valid_ij, scene.match_ji, scene.valid_ji,
    )                                                    # [D], [D, K]
    obs_on = (obs_on & scene.pose_valid[obs_frame][:, None]
              & scene.kp_mask[frame][None, :])

    # ---- merge into existing landmarks (cpp:216-235) -------------------------
    counts = lm_observer_counts(scene)                   # [L]
    nb_lm = scene.kp2lm[obs_frame[:, None], obs_kp]      # [D, K] landmark of the matched neighbor kp
    nb_lm_safe = jnp.maximum(nb_lm, 0)
    cand = (
        obs_on
        & (nb_lm >= 0)
        & scene.lm_valid[nb_lm_safe]
        & (counts[nb_lm_safe] > 2)
    )
    # reproject candidate landmarks into the new frame
    uv_proj, z = project(scene.pose[frame], scene.points[nb_lm_safe], scene.intr)
    err = jnp.linalg.norm(uv_proj - scene.keypoints[frame][None, :, :], axis=-1)
    cand = cand & (z > 0.0) & (err < max_repr_error)

    # first qualifying neighbor per keypoint wins (argmax over bool is
    # first-True; neighbor slots are in ascending frame order)
    merge_src = jnp.argmax(cand, axis=0)                 # [K]
    merge_ok = jnp.any(cand, axis=0)
    merge_lm = nb_lm_safe[merge_src, jnp.arange(K)]

    # ---- build tracks for the rest (cpp:238-263) ------------------------------
    track_on = obs_on.T                                  # [K, D] slot per neighbor
    track_kp = obs_kp.T
    # the new frame itself observes the track
    self_col = jnp.arange(K, dtype=jnp.int32)
    track_on_full = jnp.concatenate(
        [track_on, scene.kp_mask[frame][:, None]], axis=1
    )                                                    # [K, D+1]
    track_kp_full = jnp.concatenate([track_kp, self_col[:, None]], axis=1)
    track_frame_full = jnp.concatenate(
        [
            jnp.broadcast_to(obs_frame[None, :], (K, D)),
            jnp.broadcast_to(frame, (K, 1)).astype(jnp.int32),
        ],
        axis=1,
    )

    n_obs = jnp.sum(track_on_full, axis=1)
    candidate = (~merge_ok) & (n_obs >= min_observers)

    # cap observers per track to a static budget (first-valid-first; ties in
    # top_k resolve to lower index, so earlier frames win)
    v_cap = min(max_observers, D + 1)
    sel_val, sel_idx = jax.lax.top_k(track_on_full.astype(jnp.int32), v_cap)
    take = jnp.take_along_axis
    sel_on = take(track_on_full, sel_idx, 1) & (sel_val > 0)
    sel_kp = take(track_kp_full, sel_idx, 1)
    sel_frame = take(track_frame_full, sel_idx, 1)

    transforms = scene.pose[sel_frame]                   # [K, V, 4, 4]
    uv = scene.keypoints[sel_frame, sel_kp]              # [K, V, 2]

    tri = jax.vmap(
        lambda T, u, m: triangulate_consensus(
            T, u, m, scene.intr, max_repr_error, min_tri_angle
        )
    )
    pts, inl, ok = tri(transforms, uv, sel_on)
    all_inliers = jnp.all(inl | (~sel_on), axis=1)       # cpp:276-278
    new_ok = candidate & ok & all_inliers

    scene, ids = alloc_landmarks(scene, pts, new_ok)

    # ---- relink (cpp:280-294): merges first, new landmarks overwrite ---------
    kp2lm_flat = scene.kp2lm.reshape(-1)
    pad = jnp.concatenate([kp2lm_flat, jnp.zeros((1,), jnp.int32)])

    merge_target = jnp.where(merge_ok, frame * K + self_col, N * K)
    pad = pad.at[merge_target].set(jnp.where(merge_ok, merge_lm, 0))

    got_id = ids >= 0
    link_on = sel_on & got_id[:, None]
    link_target = jnp.where(link_on, sel_frame * K + sel_kp, N * K).reshape(-1)
    link_val = jnp.broadcast_to(ids[:, None], sel_kp.shape).reshape(-1)
    pad = pad.at[link_target].set(jnp.where(link_target < N * K, link_val, 0))

    scene = scene._replace(kp2lm=pad[:-1].reshape(N, K))
    return scene, jnp.sum(merge_ok), jnp.sum(got_id)
