import numpy as np
import jax
import jax.numpy as jnp

from eacham_tpu.geometry import se3
from eacham_tpu.geometry.pnp import dlt_pnp, solve_pnp_ransac
from eacham_tpu.geometry.camera import pixel_to_normalized


def _pnp_problem(rng, n=100, outliers=0, noise_px=0.0, f=600.0):
    pts = rng.uniform(-2, 2, size=(n, 3))
    pts[:, 2] += 6.0
    T = np.asarray(
        se3.exp_se3(jnp.asarray([0.2, -0.1, 0.15, 0.3, -0.2, 0.5], dtype=jnp.float64))
    )
    intr = np.array([f, f, 320.0, 240.0])
    pc = pts @ T[:3, :3].T + T[:3, 3]
    uv = np.stack(
        [intr[0] * pc[:, 0] / pc[:, 2] + intr[2], intr[1] * pc[:, 1] / pc[:, 2] + intr[3]],
        axis=-1,
    )
    if noise_px:
        uv += rng.normal(scale=noise_px, size=uv.shape)
    if outliers:
        idx = rng.choice(n, size=outliers, replace=False)
        uv[idx] += rng.uniform(30, 120, size=(outliers, 2))
    return pts, T, intr, uv


def test_dlt_pnp_exact(rng):
    pts, T, intr, uv = _pnp_problem(rng, n=6)
    xy = pixel_to_normalized(jnp.asarray(uv, jnp.float32), jnp.asarray(intr, jnp.float32))
    T_est = np.asarray(dlt_pnp(jnp.asarray(pts, jnp.float32), xy, exact=True))
    # fp32 12x12 eigh resolves the null vector to ~2e-2; hypotheses only
    # need to rank inliers — the Gauss-Newton polish restores full accuracy
    # (asserted tightly in test_pnp_ransac_with_outliers).
    np.testing.assert_allclose(T_est, T, atol=5e-2)


def test_pnp_ransac_with_outliers(rng):
    n, n_out = 200, 60
    pts, T, intr, uv = _pnp_problem(rng, n=n, outliers=n_out, noise_px=0.5)
    T_est, inl, n_inl = solve_pnp_ransac(
        jax.random.PRNGKey(0),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(uv, jnp.float32),
        jnp.ones(n, dtype=bool),
        jnp.asarray(intr, jnp.float32),
        threshold=4.0,
    )
    assert int(n_inl) >= n - n_out - 5
    T_est = np.asarray(T_est)
    np.testing.assert_allclose(T_est[:3, :3], T[:3, :3], atol=5e-3)
    np.testing.assert_allclose(T_est[:3, 3], T[:3, 3], atol=2e-2)


def test_pnp_respects_mask(rng):
    n = 100
    pts, T, intr, uv = _pnp_problem(rng, n=n, noise_px=0.2)
    # corrupt half the data but also mask it out
    uv2 = uv.copy()
    uv2[50:] += 500.0
    mask = np.zeros(n, dtype=bool)
    mask[:50] = True
    T_est, inl, n_inl = solve_pnp_ransac(
        jax.random.PRNGKey(1),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(uv2, jnp.float32),
        jnp.asarray(mask),
        jnp.asarray(intr, jnp.float32),
    )
    assert not np.asarray(inl)[50:].any()
    np.testing.assert_allclose(np.asarray(T_est)[:3, :3], T[:3, :3], atol=1e-2)
