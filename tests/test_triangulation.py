import numpy as np
import jax.numpy as jnp

from eacham_tpu.geometry import (
    triangulate_dlt,
    triangulate_consensus,
    triangulation_angle,
    pixel_to_normalized,
)


def test_dlt_recovers_points(synthetic_scene):
    poses, pts, intr, uv = synthetic_scene
    T1 = jnp.asarray(poses[0], dtype=jnp.float32)
    T2 = jnp.asarray(poses[3], dtype=jnp.float32)
    intr_j = jnp.asarray(intr, dtype=jnp.float32)
    xy1 = pixel_to_normalized(jnp.asarray(uv[0], dtype=jnp.float32), intr_j)
    xy2 = pixel_to_normalized(jnp.asarray(uv[3], dtype=jnp.float32), intr_j)
    est = triangulate_dlt(T1, T2, xy1, xy2)
    np.testing.assert_allclose(np.asarray(est), pts, atol=5e-2)


def test_triangulation_angle_known_geometry():
    # Two cameras at (+-1, 0, 0) looking at a point at z=1: the rays span
    # an angle of 2*atan(1) = 90deg.
    T1 = jnp.eye(4).at[0, 3].set(-1.0)   # world->cam with center at (1,0,0)
    T2 = jnp.eye(4).at[0, 3].set(1.0)    # center at (-1,0,0)
    point = jnp.array([0.0, 0.0, 1.0])
    ang = triangulation_angle(T1, T2, point)
    np.testing.assert_allclose(float(ang), np.pi / 2, atol=1e-5)


def test_consensus_all_inliers(synthetic_scene):
    poses, pts, intr, uv = synthetic_scene
    V = poses.shape[0]
    k = 7  # one track
    point, inl, ok = triangulate_consensus(
        jnp.asarray(poses, dtype=jnp.float32),
        jnp.asarray(uv[:, k], dtype=jnp.float32),
        jnp.ones(V, dtype=bool),
        jnp.asarray(intr, dtype=jnp.float32),
        max_repr_error=2.0,
        min_tri_angle=np.deg2rad(1.0),
    )
    assert bool(ok)
    assert np.all(np.asarray(inl))
    np.testing.assert_allclose(np.asarray(point), pts[k], atol=5e-2)


def test_consensus_rejects_outlier_observer(synthetic_scene):
    poses, pts, intr, uv = synthetic_scene
    V = poses.shape[0]
    k = 11
    uv_track = uv[:, k].copy()
    uv_track[2] += 80.0  # corrupt one observation
    point, inl, ok = triangulate_consensus(
        jnp.asarray(poses, dtype=jnp.float32),
        jnp.asarray(uv_track, dtype=jnp.float32),
        jnp.ones(V, dtype=bool),
        jnp.asarray(intr, dtype=jnp.float32),
        max_repr_error=2.0,
        min_tri_angle=np.deg2rad(1.0),
    )
    assert bool(ok)
    inl = np.asarray(inl)
    assert not inl[2]           # the corrupted observer is flagged
    assert inl.sum() == V - 1
    np.testing.assert_allclose(np.asarray(point), pts[k], atol=5e-2)


def test_consensus_two_view_angle_gate(synthetic_scene):
    poses, pts, intr, uv = synthetic_scene
    # Same camera twice -> zero triangulation angle -> rejected.
    T = jnp.asarray(np.stack([poses[0], poses[0]]), dtype=jnp.float32)
    uv2 = jnp.asarray(np.stack([uv[0, 0], uv[0, 0]]), dtype=jnp.float32)
    _, _, ok = triangulate_consensus(
        T, uv2, jnp.ones(2, dtype=bool), jnp.asarray(intr, dtype=jnp.float32),
        max_repr_error=2.0, min_tri_angle=np.deg2rad(3.0),
    )
    assert not bool(ok)


def test_consensus_masked_slots(synthetic_scene):
    poses, pts, intr, uv = synthetic_scene
    V = poses.shape[0]
    k = 3
    mask = np.ones(V, dtype=bool)
    mask[4:] = False  # only 4 real observers; padded slots hold garbage
    uv_track = uv[:, k].copy()
    uv_track[4:] = 1e6
    point, inl, ok = triangulate_consensus(
        jnp.asarray(poses, dtype=jnp.float32),
        jnp.asarray(uv_track, dtype=jnp.float32),
        jnp.asarray(mask),
        jnp.asarray(intr, dtype=jnp.float32),
        max_repr_error=2.0,
        min_tri_angle=np.deg2rad(1.0),
    )
    assert bool(ok)
    assert np.asarray(inl)[:4].all()
    assert not np.asarray(inl)[4:].any()
    np.testing.assert_allclose(np.asarray(point), pts[k], atol=5e-2)
