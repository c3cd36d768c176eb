"""Struct-of-arrays SfM scene state.

TPU-native replacement for the reference's pointer graph + mutex data model
(modules/sfm/data/Graph.h:15-140, Node.h:18-231, Map.h:15-208): every
container is a padded, statically-shaped array with a validity mask, so the
whole state is a jit-friendly pytree that shards over a device mesh.

Correspondence with the reference:
  * ``Node`` keypoints/descriptors/pose/valid  -> keypoints/kp_mask/pose/
    pose_valid rows (Node.h:218-226)
  * ``Factor`` match edges (Node.h:24-31)      -> pair tables
    (pair_idx/pair_ok/match_ij/match_ji)
  * ``Map`` landmark dict + observer hash maps (Map.h:15-23)
                                               -> points/lm_valid/lm_two_view
                                                  + the inverse kp2lm table
  * fixed-node set (Graph.h:137)               -> pose_fixed mask

The observation table needed by bundle adjustment is *derived*, not stored:
every (frame, kp) slot with a landmark link is an observation, so the COO
arrays are just reshapes of ``kp2lm`` — no compaction pass.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.ops import segment_sum

from eacham_tpu.ba.core import BAProblem


class Scene(NamedTuple):
    """Whole-reconstruction state. N frames, K kps/frame, P pairs, L landmarks."""

    # frames
    keypoints: jnp.ndarray    # [N, K, 2] pixel coords
    kp_mask: jnp.ndarray      # [N, K] bool
    pose: jnp.ndarray         # [N, 4, 4] world->cam
    pose_valid: jnp.ndarray   # [N] bool — registered frames
    pose_fixed: jnp.ndarray   # [N] bool — gauge-fixed frames
    # match graph (undirected edges stored once with both direction tables)
    pair_idx: jnp.ndarray     # [P, 2] int32 (i, j), i < j
    pair_ok: jnp.ndarray      # [P] bool — edge survived the match gate
    match_ij: jnp.ndarray     # [P, K] int32 — kp of frame i -> kp of frame j
    valid_ij: jnp.ndarray     # [P, K] bool
    match_ji: jnp.ndarray     # [P, K] int32 — kp of frame j -> kp of frame i
    valid_ji: jnp.ndarray     # [P, K] bool
    # landmarks
    points: jnp.ndarray       # [L, 3]
    lm_valid: jnp.ndarray     # [L] bool
    lm_two_view: jnp.ndarray  # [L] bool — seeded by the init pair (Types.h:17-34)
    n_landmarks: jnp.ndarray  # [] int32 allocation counter
    kp2lm: jnp.ndarray        # [N, K] int32 landmark id per keypoint, -1 = none
    # shared camera
    intr: jnp.ndarray         # [4] fx fy cx cy

    @property
    def n_frames(self) -> int:
        return self.keypoints.shape[0]

    @property
    def n_kps(self) -> int:
        return self.keypoints.shape[1]

    @property
    def lm_capacity(self) -> int:
        return self.points.shape[0]


@partial(jax.jit, static_argnames=("lm_capacity",))
def make_scene(
    keypoints: jnp.ndarray,
    kp_mask: jnp.ndarray,
    pair_idx: jnp.ndarray,
    pair_ok: jnp.ndarray,
    match_ij: jnp.ndarray,
    valid_ij: jnp.ndarray,
    match_ji: jnp.ndarray,
    valid_ji: jnp.ndarray,
    intr: jnp.ndarray,
    lm_capacity: int | None = None,
) -> Scene:
    N, K = kp_mask.shape
    if lm_capacity is None:
        lm_capacity = N * K
    dt = keypoints.dtype
    return Scene(
        keypoints=keypoints,
        kp_mask=kp_mask,
        pose=jnp.broadcast_to(jnp.eye(4, dtype=dt), (N, 4, 4)),
        pose_valid=jnp.zeros((N,), bool),
        pose_fixed=jnp.zeros((N,), bool),
        pair_idx=pair_idx,
        pair_ok=pair_ok,
        match_ij=match_ij,
        valid_ij=valid_ij,
        match_ji=match_ji,
        valid_ji=valid_ji,
        points=jnp.zeros((lm_capacity, 3), dt),
        lm_valid=jnp.zeros((lm_capacity,), bool),
        lm_two_view=jnp.zeros((lm_capacity,), bool),
        n_landmarks=jnp.int32(0),
        kp2lm=jnp.full((N, K), -1, jnp.int32),
        intr=intr,
    )


def pair_id_table(pair_idx: np.ndarray, n_frames: int) -> np.ndarray:
    """Host-side [N, N] lookup: pair_id[i, j] = row of (i, j) in pair_idx
    (symmetric), -1 when the frames share no edge slot."""
    tbl = np.full((n_frames, n_frames), -1, np.int32)
    pi = np.asarray(pair_idx)
    tbl[pi[:, 0], pi[:, 1]] = np.arange(pi.shape[0], dtype=np.int32)
    tbl[pi[:, 1], pi[:, 0]] = np.arange(pi.shape[0], dtype=np.int32)
    return tbl


def frame_pair_table(pair_idx: np.ndarray, n_frames: int,
                     bucket: int = 8, d_min: int = 16) -> np.ndarray:
    """Host-side degree-compacted adjacency: [N, D] pair rows touching each
    frame (-1 padded), neighbors in ASCENDING frame order so first-True
    selections match the old dense [N, K] observer-table semantics exactly.

    D is the max frame degree rounded up to ``bucket`` (≥ ``d_min``): the
    per-registration observer tables become [D, K] instead of [N, K] —
    with windowed candidate pairs D is O(window + ladder + retrieval),
    independent of N, which is what keeps the sweep's per-frame cost flat
    on reference-scale sequences (BASELINE.md: KITTI seq 00, N≈4500)."""
    pi = np.asarray(pair_idx)
    row_ids = np.arange(pi.shape[0], dtype=np.int32)
    keep = pi[:, 0] != pi[:, 1]     # drop (0, 0) bucket-padding dummy rows
    pi, row_ids = pi[keep], row_ids[keep]
    deg = np.zeros((n_frames,), np.int64)
    np.add.at(deg, pi[:, 0], 1)
    np.add.at(deg, pi[:, 1], 1)
    D = max(d_min, int(deg.max()) if deg.size else 0)
    D = ((D + bucket - 1) // bucket) * bucket
    tbl = np.full((n_frames, D), -1, np.int32)
    # rows sorted by (frame, neighbor): emit both directions then sort
    frames = np.concatenate([pi[:, 0], pi[:, 1]])
    nbrs = np.concatenate([pi[:, 1], pi[:, 0]])
    rows = np.concatenate([row_ids, row_ids])
    order = np.lexsort((nbrs, frames))
    frames, rows = frames[order], rows[order]
    slot = np.arange(len(frames)) - np.searchsorted(frames, frames)
    tbl[frames, slot] = rows
    return tbl


@jax.jit
def lm_observer_counts(scene: Scene) -> jnp.ndarray:
    """[L] observer count per landmark, from registered frames only.

    Derived equivalent of ``MapPointData::observers.size()`` (Map.h:20-22).
    """
    obs_on = (
        (scene.kp2lm >= 0) & scene.kp_mask & scene.pose_valid[:, None]
    )
    flat_lm = jnp.where(obs_on, scene.kp2lm, scene.lm_capacity).reshape(-1)
    counts = segment_sum(
        jnp.ones_like(flat_lm, jnp.float32), flat_lm,
        num_segments=scene.lm_capacity + 1,
    )
    return counts[:-1]


def ba_problem_from_scene(
    scene: Scene,
    cam_in_ba: jnp.ndarray,
    min_observers: int = 2,
) -> BAProblem:
    """Materialize the (derived) observation table into a BAProblem.

    Mirrors the factor-collection pass of RefineBA
    (BundleAdjuster.cpp:57-121): an observation participates when its frame
    is selected, the landmark is valid and has >= ``min_observers``
    registered observers (cpp:82-88).
    """
    N, K = scene.kp_mask.shape
    L = scene.lm_capacity
    counts = lm_observer_counts(scene)

    obs_cam = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None], (N, K)
    ).reshape(-1)
    lm = scene.kp2lm.reshape(-1)
    obs_pt = jnp.maximum(lm, 0)
    obs_uv = scene.keypoints.reshape(-1, 2)
    obs_mask = (
        (lm >= 0)
        & scene.kp_mask.reshape(-1)
        & scene.pose_valid.reshape(N, 1).repeat(K, 1).reshape(-1)
        & (counts[obs_pt] >= min_observers)
        & scene.lm_valid[obs_pt]
    )

    pt_in_ba = scene.lm_valid & (counts >= min_observers)
    return BAProblem(
        poses=scene.pose,
        points=scene.points,
        intr=scene.intr,
        obs_cam=obs_cam,
        obs_pt=obs_pt,
        obs_uv=obs_uv,
        obs_mask=obs_mask,
        cam_in_ba=cam_in_ba & scene.pose_valid,
        cam_fixed=scene.pose_fixed,
        pt_in_ba=pt_in_ba,
        pt_obs_count=jnp.maximum(counts, 1.0),
    )


@partial(jax.jit, static_argnames=("min_observers",))
def ba_problem_counts(scene: Scene, cam_in_ba: jnp.ndarray,
                      min_observers: int = 2):
    """(n_obs, n_lms) the BA problem would hold — the host fetches these
    two scalars to pick bucketed compact axis sizes before building the
    problem (padded N*K / lm_capacity axes cost every LM iteration)."""
    counts = lm_observer_counts(scene)
    in_ba = cam_in_ba & scene.pose_valid
    lm = scene.kp2lm
    lm0 = jnp.maximum(lm, 0)
    ok = (
        (lm >= 0) & scene.kp_mask & in_ba[:, None]
        & (counts[lm0] >= min_observers) & scene.lm_valid[lm0]
    )
    pt = scene.lm_valid & (counts >= min_observers)
    return jnp.sum(ok), jnp.sum(pt)


def _compact_mask(mask: jnp.ndarray, m: int):
    """Indices of the first ``m`` True entries of a flat bool mask.

    Order-preserving compaction via cumsum + scatter — O(n), replacing the
    sort-based ``top_k`` (which at n = N*K or lm_capacity dominates the
    windowed-problem build inside the sweep program).

    Returns ``(idx [m] int32 — clamped to 0 where off, on [m] bool,
    pos [n] int32 — destination slot per entry, -1 where not taken)``.
    """
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    take = mask & (pos < m)
    pos = jnp.where(take, pos, -1)
    dst = jnp.where(take, pos, m)                       # m = dump slot
    idx = jnp.full((m + 1,), -1, jnp.int32).at[dst].set(
        jnp.arange(n, dtype=jnp.int32)
    )[:-1]
    on = idx >= 0
    return jnp.maximum(idx, 0), on, pos


@partial(jax.jit, static_argnames=("max_cams", "max_obs", "min_observers",
                                   "max_lms", "free_span"))
def ba_problem_windowed(
    scene: Scene,
    cam_in_ba: jnp.ndarray,
    max_cams: int = 16,
    max_obs: int = 16384,
    min_observers: int = 2,
    cur: jnp.ndarray | None = None,
    max_lms: int | None = None,
    free_span: int = 0,
):
    """Compact local-BA problem: participating cameras gathered into a
    static [max_cams] window, their observations into [max_obs] slots, and
    the landmark axis into [min(max_obs, L)] rows.

    At reference scale (100+ frames) the full padded problem makes every
    local-BA iteration pay for all N*K observation slots and all N camera
    blocks; a local window (the current frame + its registered neighbors,
    BundleAdjuster.cpp:123-145 — rarely more than a dozen cameras) is
    6-10x smaller and small enough for the dense Schur path.

    The landmark compaction matters on TPU: the dense Schur W blocks are
    [L_prob * C, 6, 3] and the chip tiles the minor dims to (8, 128) — a
    7x physical inflation. At lm_capacity 65536, C=16 that is ~4.3 GB per
    W-shaped tensor and the worker OOM-crashes; a window of max_cams
    frames can observe at most max_obs distinct landmarks, so compacting
    to that bound keeps the sweep's memory independent of scene capacity.

    Returns (BAProblem, cam_list [max_cams] int32, cam_on [max_cams] bool,
    lm_list [max_lms] int32, lm_on [max_lms] bool); write back with
    ``scatter_window_poses`` / ``scatter_window_points``.
    """
    N, K = scene.kp_mask.shape
    L = scene.lm_capacity
    max_cams = min(max_cams, N)
    max_obs = min(max_obs, max_cams * K)   # a C-cam window holds <= C*K obs
    counts = lm_observer_counts(scene)

    # key: 2 for the just-registered frame, 1 for neighbors — guarantees the
    # current frame is never dropped from its own local window when the
    # neighborhood exceeds max_cams (top_k ties break toward low indices)
    sel_key = (cam_in_ba & scene.pose_valid).astype(jnp.int32)
    if cur is not None:
        sel_key = sel_key + sel_key * (
            jnp.arange(scene.kp_mask.shape[0], dtype=jnp.int32) == cur
        )
    sel_val, cam_list = jax.lax.top_k(sel_key, max_cams)
    cam_on = sel_val > 0
    C = max_cams

    # gather ONLY the window rows [C, K]: observation discovery over the
    # full N*K table made every local-BA build pay O(scene) instead of
    # O(window) — the dominant per-registration cost at N=500
    lm = scene.kp2lm[cam_list].reshape(-1)               # [C*K]
    lm0 = jnp.maximum(lm, 0)
    lm_ok = scene.lm_valid[lm0] & (counts[lm0] >= min_observers)
    in_window = (
        (lm >= 0)
        & (scene.kp_mask[cam_list] & cam_on[:, None]).reshape(-1)
        & lm_ok
    )
    if max_obs >= C * K:
        # the obs axis IS the window table — no compaction pass at all
        obs_cam = jnp.repeat(jnp.arange(C, dtype=jnp.int32), K)
        obs_pt = jnp.where(in_window, lm, 0)
        obs_uv = scene.keypoints[cam_list].reshape(-1, 2)
        o_mask = in_window
    else:
        pick, o_mask, _ = _compact_mask(in_window, max_obs)
        obs_cam = (pick // K).astype(jnp.int32)
        obs_pt = jnp.where(o_mask, lm[pick], 0)
        obs_uv = scene.keypoints[cam_list].reshape(-1, 2)[pick]

    seen = jnp.zeros((L + 1,), bool).at[
        jnp.where(o_mask, obs_pt, L)
    ].set(True)[:-1]
    pt_in_ba = scene.lm_valid & (counts >= min_observers) & seen

    # --- landmark compaction (O(L) cumsum; a sort-unique over the window's
    # own [max_obs] ids was tried and measured SLOWER on TPU: sort +
    # searchsorted cost ~2x the [L]-axis scatter/cumsum pass) -------------
    max_lms = min(max_obs, L) if max_lms is None else min(max_lms, L)
    lm_list, lm_on, lm_remap = _compact_mask(pt_in_ba, max_lms)
    obs_pt_w = lm_remap[obs_pt]
    o_mask = o_mask & (obs_pt_w >= 0)
    obs_pt_w = jnp.maximum(obs_pt_w, 0)

    prob = BAProblem(
        poses=scene.pose[cam_list],
        points=scene.points[lm_list],
        intr=scene.intr,
        obs_cam=obs_cam,
        obs_pt=obs_pt_w,
        obs_uv=obs_uv,
        obs_mask=o_mask,
        cam_in_ba=cam_on,
        # free_span > 0: hard-freeze window cameras more than free_span
        # ids from the current frame (incl. loop-closure neighbors). A
        # window whose every camera is free keeps its similarity gauge,
        # and the per-solve gauge random-walk COMPOUNDS over a long sweep
        # (measured: the 1000-frame orbit's mid-trajectory scale collapsed
        # 100-250x, /tmp scale-profile analysis r3); two or more frozen
        # cameras pin scale so fresh triangulations inherit it.
        cam_fixed=(scene.pose_fixed[cam_list] | (~cam_on))
        if (free_span <= 0 or cur is None) else (
            scene.pose_fixed[cam_list] | (~cam_on)
            | (jnp.abs(cam_list - cur) > free_span)),
        pt_in_ba=lm_on,
        pt_obs_count=jnp.maximum(counts[lm_list], 1.0),
    )
    return prob, cam_list, cam_on, lm_list, lm_on


@jax.jit
def scatter_window_poses(scene: Scene, cam_list, cam_on, new_poses):
    """Write optimized window poses back into the scene."""
    merged = jnp.where(cam_on[:, None, None], new_poses, scene.pose[cam_list])
    return scene._replace(pose=scene.pose.at[cam_list].set(merged))


@jax.jit
def scatter_window_points(scene: Scene, lm_list, lm_on, new_points):
    """Write optimized window landmarks back into the scene."""
    merged = jnp.where(lm_on[:, None], new_points, scene.points[lm_list])
    return scene._replace(points=scene.points.at[lm_list].set(merged))


def alloc_landmarks(scene: Scene, new_points: jnp.ndarray, new_ok: jnp.ndarray):
    """Allocate landmark slots for ``new_ok`` rows of ``new_points``.

    Functional replacement for ``Map::Add`` (Map.h:40-66): ids are handed
    out compactly from the allocation counter with a cumsum — one pass, no
    mutex. Returns ``(scene, ids [M] int32)`` where ids[m] is the new
    landmark id (or -1 where ~new_ok or capacity was exceeded).
    """
    offs = jnp.cumsum(new_ok.astype(jnp.int32)) - 1
    ids = scene.n_landmarks + offs
    in_cap = ids < scene.lm_capacity
    ok = new_ok & in_cap
    ids = jnp.where(ok, ids, -1)

    scatter = jnp.where(ok, ids, scene.lm_capacity)  # dump row for rejects
    points_pad = jnp.concatenate(
        [scene.points, jnp.zeros((1, 3), scene.points.dtype)]
    )
    points = points_pad.at[scatter].set(new_points)[:-1]
    valid_pad = jnp.concatenate([scene.lm_valid, jnp.zeros((1,), bool)])
    lm_valid = valid_pad.at[scatter].set(True)[:-1]

    n_new = jnp.sum(ok.astype(jnp.int32))
    return scene._replace(
        points=points,
        lm_valid=lm_valid,
        n_landmarks=scene.n_landmarks + n_new,
    ), ids
