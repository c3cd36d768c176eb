"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware the JAX way —
`xla_force_host_platform_device_count` (the reference has no analogue: it is
a single-process CPU program, SURVEY.md §4).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The environment's sitecustomize registers a TPU plugin and forces
# jax_platforms; override it here — tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_synthetic_scene(rng, n_cams=6, n_pts=200, noise=0.0, img=(640, 480), f=600.0):
    """Random 3D points in front of a camera ring; returns GT poses (world->cam),
    points, intrinsics, and per-camera pixel observations."""
    from eacham_tpu.geometry import se3
    import jax.numpy as jnp

    pts = rng.uniform(-1.0, 1.0, size=(n_pts, 3))
    pts[:, 2] += 5.0  # push points in front

    poses = []
    for i in range(n_cams):
        w = rng.normal(scale=0.1, size=3)
        t = np.array([0.5 * (i - n_cams / 2), 0.05 * i, 0.1 * i])
        xi = np.concatenate([w, t])
        poses.append(np.asarray(se3.exp_se3(jnp.asarray(xi, dtype=jnp.float64))))
    poses = np.stack(poses)

    intr = np.array([f, f, img[0] / 2, img[1] / 2])
    uv = np.zeros((n_cams, n_pts, 2))
    for c in range(n_cams):
        pc = pts @ poses[c, :3, :3].T + poses[c, :3, 3]
        uv[c, :, 0] = intr[0] * pc[:, 0] / pc[:, 2] + intr[2]
        uv[c, :, 1] = intr[1] * pc[:, 1] / pc[:, 2] + intr[3]
    if noise > 0:
        uv += rng.normal(scale=noise, size=uv.shape)
    return poses, pts, intr, uv


@pytest.fixture
def synthetic_scene(rng):
    return make_synthetic_scene(rng)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    One process compiles hundreds of XLA:CPU programs across the suite;
    past a threshold the CPU backend's JIT aborts/segfaults
    nondeterministically (observed at test_pipeline/test_pnp compile time
    once ~70 earlier tests had run). Dropping the executable caches at
    module boundaries keeps the live-program count bounded; each module
    recompiles its own programs anyway.
    """
    yield
    jax.clear_caches()
