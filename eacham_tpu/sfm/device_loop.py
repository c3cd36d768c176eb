"""Whole-reconstruction-on-device: the incremental loop as ONE XLA program.

The reference's incremental loop is host-driven by necessity (pointer
graph + GTSAM calls, apps/sfm/main.cpp:195-225). Here every stage is
statically shaped, so the *entire* loop — next-best-view selection, PnP
registration, two-pass triangulation, local bundle adjustment — runs as a
single ``lax.while_loop`` on the TPU. The host dispatches once and reads
back the finished scene: no per-frame host round-trips, which is the
dominant cost when the host talks to the chip over a network tunnel.

This file is the "HOT LOOP 3" replacement; the host-driven variant in
pipeline.py remains for step-by-step debugging/verbose runs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from eacham_tpu.ba.core import BAConfig, refine_ba
from eacham_tpu.sfm.pipeline import next_best_view, pnp_register, local_neighbors
from eacham_tpu.sfm.scene import (
    Scene, ba_problem_windowed, scatter_window_poses, scatter_window_points,
)
from eacham_tpu.sfm.triangulate import triangulate_frame


@partial(
    jax.jit,
    static_argnames=(
        "min_pnp_inliers", "min_ba_landmarks", "ba_cfg", "max_observers",
        "n_hyp_pnp", "pnp_pair_only", "ba_max_cams", "ba_max_obs",
        "ba_max_lms", "max_steps", "ba_every", "ba_free_span",
    ),
)
def registration_sweep_step(
    scene: Scene,
    excluded: jnp.ndarray,       # [N] bool
    fp_tbl: jnp.ndarray,         # [N, D] int32 frame_pair_table
    key,
    max_repr_error: float,
    min_tri_angle: float,
    min_pnp_inliers: int = 15,
    min_ba_landmarks: int = 50,
    ba_cfg: BAConfig = BAConfig(),
    max_observers: int = 12,
    n_hyp_pnp: int = 512,
    pnp_pair_only: bool = False,
    ba_max_cams: int = 16,
    ba_max_obs: int = 16384,
    ba_max_lms: int | None = None,
    max_steps: int | None = None,
    ba_every: int = 1,
    ba_free_span: int = 0,
):
    """Register up to ``max_steps`` frames (one dispatch).
    Returns (scene, excluded, n_registered, more) where ``more`` means the
    loop stopped on the step limit with candidates remaining.

    Per iteration (mirroring main.cpp:195-225):
      next_best_view -> PnP (gate: min_pnp_inliers) -> triangulate(minObs=2)
      -> local BA (gate: min_ba_landmarks) -> triangulate(minObs=3);
      PnP failures mark the frame excluded, exactly like the driver's
      excluded set (main.cpp:212-217).
    """
    N = scene.kp_mask.shape[0]
    limit = N if max_steps is None else min(max_steps, N)

    def do_register(op):
        scene, cur, T, it = op
        scene = scene._replace(
            pose=scene.pose.at[cur].set(T),
            pose_valid=scene.pose_valid.at[cur].set(True),
        )
        pid_row = fp_tbl[cur]
        scene, _, _ = triangulate_frame(
            scene, cur, pid_row, jnp.int32(2),
            max_repr_error, min_tri_angle, max_observers=max_observers,
        )
        nb = local_neighbors(scene, cur)
        # compact the local problem to a static window: the current frame's
        # neighborhood is small, and the windowed shapes keep every LM
        # iteration cheap (and dense-Schur-eligible) at any scene size
        prob, cam_list, cam_on, lm_list, lm_on = ba_problem_windowed(
            scene, nb, max_cams=ba_max_cams, max_obs=ba_max_obs, cur=cur,
            max_lms=ba_max_lms, free_span=ba_free_span,
        )
        n_lm = jnp.sum(prob.pt_in_ba)

        def run_ba(s):
            poses, points, intr, _ = refine_ba(prob, ba_cfg)
            s = scatter_window_poses(s, cam_list, cam_on, poses)
            s = scatter_window_points(s, lm_list, lm_on, points)
            return s._replace(intr=intr)

        # local BA dominates the sweep (measured ~80% at the production
        # budget); ba_every > 1 amortizes it over registrations — skipped
        # frames get their refinement from the next window that contains
        # them / the interim global BA (lax.cond executes one branch only)
        want_ba = (n_lm >= min_ba_landmarks) & (it % ba_every == 0)
        scene = jax.lax.cond(want_ba, run_ba, lambda s: s, scene)
        scene, _, _ = triangulate_frame(
            scene, cur, pid_row, jnp.int32(3),
            max_repr_error, min_tri_angle, max_observers=max_observers,
        )
        return scene

    def body(state):
        scene, excluded, key, n_reg, it, _ = state
        prev, cur, score = next_best_view(scene, excluded)
        has = score >= 0
        key, k = jax.random.split(key)
        T, n_inl = pnp_register(
            scene, prev, cur, fp_tbl[cur], k,
            threshold=4.0, n_hyp=n_hyp_pnp, pair_only=pnp_pair_only,
        )
        ok = has & (n_inl >= min_pnp_inliers)
        scene = jax.lax.cond(
            ok, do_register, lambda op: op[0], (scene, cur, T, it)
        )
        fail = has & (~ok)
        excluded = excluded.at[cur].set(
            jnp.where(fail, True, excluded[cur])
        )
        return scene, excluded, key, n_reg + ok.astype(jnp.int32), it + 1, has

    def cond(state):
        _, _, _, _, it, cont = state
        return cont & (it < limit)

    init = (scene, excluded, key, jnp.int32(0), jnp.int32(0), jnp.asarray(True))
    scene, excluded, _, n_reg, it, cont = jax.lax.while_loop(cond, body, init)
    return scene, excluded, n_reg, cont & (it >= limit)


def registration_sweep(
    scene: Scene,
    excluded: jnp.ndarray,
    fp_tbl: jnp.ndarray,
    key,
    max_repr_error: float,
    min_tri_angle: float,
    segment: int = 0,
    on_segment=None,
    **kw,
):
    """Register every reachable frame. Returns (scene, excluded, n_registered).

    ``segment`` > 0 splits the on-device loop into dispatches of that many
    frames: state stays on the device between dispatches (the host only
    reads one scalar), so the cost is one dispatch round-trip per segment —
    but no single XLA program runs longer than ~segment frame-iterations,
    which keeps long reconstructions inside the TPU runtime's per-program
    patience and gives the host a progress heartbeat.

    ``on_segment(scene) -> scene`` runs between segment dispatches (NOT
    after the final one) — the hook for interim global BA, which arrests
    the pose drift a purely local-window sweep accumulates over hundreds
    of frames.
    """
    N = scene.kp_mask.shape[0]
    if segment <= 0 or segment >= N:
        scene, excluded, n_reg, _ = registration_sweep_step(
            scene, excluded, fp_tbl, key, max_repr_error, min_tri_angle,
            **kw)
        return scene, excluded, n_reg
    total = jnp.int32(0)
    for s in range(0, N + segment, segment):
        key, k = jax.random.split(key)
        scene, excluded, n_reg, more = registration_sweep_step(
            scene, excluded, fp_tbl, k, max_repr_error, min_tri_angle,
            max_steps=segment, **kw)
        total = total + n_reg
        if not bool(more):
            break
        if on_segment is not None:
            scene = on_segment(scene)
    return scene, excluded, total
