"""Mesh-sharded bundle adjustment.

Distributed Schur-complement BA (SURVEY.md §5): the observation table is
sharded over the mesh axis; each device eliminates its landmark-block
contributions locally and the reduced camera system is assembled with
``psum`` over ICI inside the PCG operator (ba/core.py ``_reduce``). Camera
and landmark states are replicated, so every device computes the identical
LM trajectory — no parameter resharding, no host round-trips.

This is the TPU-native answer to GTSAM's single-threaded LM
(modules/sfm/reconstruction/BundleAdjuster.cpp:182-216), and it scales the
global-BA problem (all cameras x all landmarks, cpp:148-162) with devices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from eacham_tpu.ba.core import BAConfig, BAProblem, refine_ba


def _pad_axis0(x: jnp.ndarray, pad: int, fill=0):
    if pad == 0:
        return x
    pad_block = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad_block], axis=0)


def refine_ba_sharded(prob: BAProblem, cfg: BAConfig, mesh: Mesh):
    """Distributed ``refine_ba``: same results, observation axis sharded."""
    from eacham_tpu.parallel.mesh import mesh_axes

    axis, n_dev = mesh_axes(mesh)     # 1-D or (hosts, chips): same specs
    O = prob.obs_cam.shape[0]
    pad = (-O) % n_dev
    prob = prob._replace(
        obs_cam=_pad_axis0(prob.obs_cam, pad),
        obs_pt=_pad_axis0(prob.obs_pt, pad),
        obs_uv=_pad_axis0(prob.obs_uv, pad),
        obs_mask=_pad_axis0(prob.obs_mask, pad, fill=False),
    )

    obs_spec = P(axis)
    rep = P()
    in_specs = (
        BAProblem(
            poses=rep, points=rep, intr=rep,
            obs_cam=obs_spec, obs_pt=obs_spec, obs_uv=obs_spec,
            obs_mask=obs_spec,
            cam_in_ba=rep, cam_fixed=rep, pt_in_ba=rep, pt_obs_count=rep,
            abs_pose=rep if prob.abs_pose is not None else None,
            abs_mask=rep if prob.abs_mask is not None else None,
        ),
    )
    out_specs = (
        rep, rep, rep,
        {"initial_cost": rep, "final_cost": rep, "iterations": rep,
         "lambda": rep},
    )

    f = shard_map(
        partial(refine_ba, cfg=cfg, axis_name=axis),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(f)(prob)
