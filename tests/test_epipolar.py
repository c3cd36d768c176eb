import numpy as np
import jax
import jax.numpy as jnp

from eacham_tpu.geometry import se3, pixel_to_normalized
from eacham_tpu.geometry.epipolar import (
    eight_point,
    sampson_distance,
    estimate_essential,
    recover_pose,
)


def _two_view(rng, n=200, outliers=0, noise=0.0):
    pts = rng.uniform(-1, 1, size=(n, 3))
    pts[:, 2] += 4.0
    T2 = np.asarray(
        se3.exp_se3(jnp.asarray([0.05, -0.1, 0.02, 0.8, 0.1, 0.05], dtype=jnp.float64))
    )
    xy1 = pts[:, :2] / pts[:, 2:3]
    pc2 = pts @ T2[:3, :3].T + T2[:3, 3]
    xy2 = pc2[:, :2] / pc2[:, 2:3]
    if noise:
        xy1 += rng.normal(scale=noise, size=xy1.shape)
        xy2 += rng.normal(scale=noise, size=xy2.shape)
    if outliers:
        idx = rng.choice(n, size=outliers, replace=False)
        xy2[idx] += rng.uniform(0.1, 0.5, size=(outliers, 2))
    return pts, T2, xy1, xy2


def test_eight_point_epipolar_constraint(rng):
    _, T2, xy1, xy2 = _two_view(rng, n=8)
    E = eight_point(jnp.asarray(xy1, jnp.float32), jnp.asarray(xy2, jnp.float32))
    d = sampson_distance(E, jnp.asarray(xy1, jnp.float32), jnp.asarray(xy2, jnp.float32))
    assert float(jnp.max(d)) < 1e-4


def test_essential_ransac_with_outliers(rng):
    n, n_out = 300, 90
    _, T2, xy1, xy2 = _two_view(rng, n=n, outliers=n_out, noise=1e-4)
    key = jax.random.PRNGKey(0)
    res = estimate_essential(
        key,
        jnp.asarray(xy1, jnp.float32),
        jnp.asarray(xy2, jnp.float32),
        jnp.ones(n, dtype=bool),
        threshold=2e-3,
        n_hyp=512,
    )
    assert int(res.n_inliers) >= n - n_out - 10
    # outlier indices must be mostly excluded
    assert int(res.n_inliers) <= n - n_out + 10


def test_recover_pose_direction(rng):
    n = 200
    _, T2, xy1, xy2 = _two_view(rng, n=n, noise=1e-4)
    key = jax.random.PRNGKey(1)
    res = estimate_essential(
        key,
        jnp.asarray(xy1, jnp.float32),
        jnp.asarray(xy2, jnp.float32),
        jnp.ones(n, dtype=bool),
        threshold=2e-3,
    )
    T, n_good, _ = recover_pose(
        res.model,
        jnp.asarray(xy1, jnp.float32),
        jnp.asarray(xy2, jnp.float32),
        res.inliers,
    )
    T = np.asarray(T)
    assert int(n_good) > 0.8 * n
    # rotation parity
    np.testing.assert_allclose(T[:3, :3], T2[:3, :3], atol=2e-2)
    # translation is recovered up to scale
    t_est = T[:3, 3] / np.linalg.norm(T[:3, 3])
    t_gt = T2[:3, 3] / np.linalg.norm(T2[:3, 3])
    np.testing.assert_allclose(t_est, t_gt, atol=2e-2)
