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


class TestDistortion:
    """Brown-Conrady distortion hook (geometry/camera.py; the reference's
    ICamera.h:30-44 carries these coefficients but never applies them)."""

    def test_roundtrip(self, rng):
        import jax.numpy as jnp
        from eacham_tpu.geometry.camera import (
            distort_normalized, undistort_normalized,
        )
        xy = jnp.asarray(rng.uniform(-0.6, 0.6, (500, 2)).astype(np.float32))
        dist = jnp.asarray([-0.28, 0.07, 0.001, -0.0005, 0.02], jnp.float32)
        xy_d = distort_normalized(xy, dist)
        back = undistort_normalized(xy_d, dist)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xy),
                                   atol=2e-4)

    def test_zero_is_identity(self, rng):
        import jax.numpy as jnp
        from eacham_tpu.geometry.camera import undistort_keypoints
        uv = jnp.asarray(rng.uniform(0, 640, (64, 2)).astype(np.float32))
        intr = jnp.asarray([600.0, 600.0, 320.0, 240.0])
        out = undistort_keypoints(uv, intr, jnp.zeros(5))
        np.testing.assert_allclose(np.asarray(out), np.asarray(uv),
                                   atol=1e-4)

    def test_e2e_two_view_through_distortion(self, rng):
        """Distorted observations break E-geometry; undistorted ones
        recover the generating pose — the ingest hook's whole point."""
        import jax
        import jax.numpy as jnp
        from eacham_tpu.geometry.camera import (
            K_matrix, distort_normalized, pixel_to_normalized,
            undistort_keypoints,
        )
        from eacham_tpu.geometry.epipolar import (
            estimate_essential, recover_pose,
        )

        f, w, h = 500.0, 640, 480
        intr = jnp.asarray([f, f, w / 2, h / 2])
        pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
        pts[:, 2] += 4.0
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.5, 0.05, 0.02]
        dist = jnp.asarray([-0.3, 0.08, 0.0, 0.0, 0.0], jnp.float32)

        def observe(Tw):
            pc = pts @ Tw[:3, :3].T + Tw[:3, 3]
            xy = pc[:, :2] / pc[:, 2:]
            xy_d = distort_normalized(jnp.asarray(xy), dist)
            u = xy_d[:, 0] * f + w / 2
            v = xy_d[:, 1] * f + h / 2
            return jnp.stack([u, v], -1)

        uv1 = observe(np.eye(4, dtype=np.float32))
        uv2 = observe(T)
        mask = jnp.ones(len(pts), bool)
        key = jax.random.PRNGKey(0)

        def pose_err(uv1p, uv2p):
            xy1 = pixel_to_normalized(uv1p, intr)
            xy2 = pixel_to_normalized(uv2p, intr)
            res = estimate_essential(key, xy1, xy2, mask, 4.0 / f, n_hyp=128)
            Te, n_good, _ = recover_pose(res.model, xy1, xy2, res.inliers)
            t_est = np.asarray(Te)[:3, 3]
            t_gt = T[:3, 3] / np.linalg.norm(T[:3, 3])
            return 1.0 - abs(float(t_est @ t_gt) / np.linalg.norm(t_est))

        raw = pose_err(uv1, uv2)
        und = pose_err(undistort_keypoints(uv1, intr, dist),
                       undistort_keypoints(uv2, intr, dist))
        assert und < 1e-3, und          # undistorted: direction recovered
        assert und < raw                 # and strictly better than raw
