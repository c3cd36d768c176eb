import numpy as np
import jax
import jax.numpy as jnp

from eacham_tpu.geometry import se3


def test_exp_log_roundtrip(rng):
    # keep |omega| < pi so the log branch is unique
    xi = jnp.asarray(rng.normal(scale=0.5, size=(64, 6)), dtype=jnp.float32)
    xi = xi.at[:, :3].set(jnp.clip(xi[:, :3], -0.9, 0.9))
    T = se3.exp_se3(xi)
    xi2 = se3.log_se3(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-4)
    # exp(log(T)) == T is the invariant that must hold for any T
    T2 = se3.exp_se3(se3.log_se3(T))
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-4)


def test_exp_zero_is_identity():
    T = se3.exp_se3(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)


def test_exp_is_rigid(rng):
    xi = jnp.asarray(rng.normal(size=(16, 6)), dtype=jnp.float32)
    T = se3.exp_se3(xi)
    R = np.asarray(T[..., :3, :3])
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)


def test_inverse(rng):
    xi = jnp.asarray(rng.normal(size=(8, 6)), dtype=jnp.float32)
    T = se3.exp_se3(xi)
    I = np.asarray(T @ se3.inverse_se3(T))
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), I.shape), atol=1e-5)


def test_transform_points_matches_matmul(rng):
    xi = jnp.asarray(rng.normal(size=6), dtype=jnp.float32)
    T = se3.exp_se3(xi)
    pts = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
    out = se3.transform_points(T, pts)
    Tn = np.asarray(T)
    expected = pts @ Tn[:3, :3].T + Tn[:3, 3]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_camera_center(rng):
    xi = jnp.asarray(rng.normal(size=6), dtype=jnp.float32)
    T = se3.exp_se3(xi)
    C = se3.camera_center(T)
    expected = np.linalg.inv(np.asarray(T))[:3, 3]
    np.testing.assert_allclose(np.asarray(C), expected, atol=1e-5)


def test_retract_differentiable():
    T = se3.exp_se3(jnp.array([0.1, -0.2, 0.3, 1.0, 2.0, -0.5]))

    def loss(xi):
        return jnp.sum(se3.retract(T, xi) ** 2)

    g = jax.grad(loss)(jnp.zeros(6))
    assert np.all(np.isfinite(np.asarray(g)))
