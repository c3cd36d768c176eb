import numpy as np
import jax
import jax.numpy as jnp

from eacham_tpu.geometry import se3
from eacham_tpu.geometry.homography import (
    dlt_homography,
    estimate_homography,
    decompose_homography,
    transfer_error,
)


def _planar_scene(rng, n=150, f=600.0, outliers=0):
    """Points on the plane z=5 seen by two cameras -> exact homography."""
    intr = np.array([f, f, 320.0, 240.0])
    K = np.array([[f, 0, 320.0], [0, f, 240.0], [0, 0, 1]])
    pts = np.concatenate(
        [rng.uniform(-2, 2, size=(n, 2)), np.full((n, 1), 5.0)], axis=-1
    )
    T2 = np.asarray(
        se3.exp_se3(jnp.asarray([0.08, -0.12, 0.05, 0.6, 0.1, 0.2], dtype=jnp.float64))
    )
    n_plane = np.array([0.0, 0.0, 1.0])
    d = 5.0
    H_euc = T2[:3, :3] + np.outer(T2[:3, 3], n_plane) / d
    H = K @ H_euc @ np.linalg.inv(K)

    def proj(T, p):
        pc = p @ T[:3, :3].T + T[:3, 3]
        return np.stack(
            [intr[0] * pc[:, 0] / pc[:, 2] + intr[2], intr[1] * pc[:, 1] / pc[:, 2] + intr[3]],
            axis=-1,
        )

    uv1 = proj(np.eye(4), pts)
    uv2 = proj(T2, pts)
    if outliers:
        idx = rng.choice(n, size=outliers, replace=False)
        uv2[idx] += rng.uniform(20, 80, size=(outliers, 2))
    return pts, T2, intr, H, uv1, uv2


def test_dlt_homography_exact(rng):
    _, _, _, H_gt, uv1, uv2 = _planar_scene(rng, n=4)
    H = np.asarray(dlt_homography(jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32), exact=True))
    np.testing.assert_allclose(H / H[2, 2], H_gt / H_gt[2, 2], atol=1e-2)


def test_homography_ransac(rng):
    n, n_out = 150, 40
    _, _, _, H_gt, uv1, uv2 = _planar_scene(rng, n=n, outliers=n_out)
    res = estimate_homography(
        jax.random.PRNGKey(0),
        jnp.asarray(uv1, jnp.float32),
        jnp.asarray(uv2, jnp.float32),
        jnp.ones(n, dtype=bool),
        threshold=4.0,
    )
    assert int(res.n_inliers) >= n - n_out - 5
    err = transfer_error(res.model, jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32))
    assert float(jnp.median(err)) < 2.0


def test_decompose_homography_contains_gt(rng):
    _, T2, intr, H_gt, uv1, uv2 = _planar_scene(rng, n=100)
    Rs, ts, ns, valid = decompose_homography(
        jnp.asarray(H_gt, jnp.float32), jnp.asarray(intr, jnp.float32)
    )
    Rs, ts = np.asarray(Rs), np.asarray(ts)
    # one candidate must match GT rotation and translation direction
    r_errs = [np.abs(R - T2[:3, :3]).max() for R in Rs]
    best = int(np.argmin(r_errs))
    assert r_errs[best] < 5e-3
    t_gt = T2[:3, 3] / np.linalg.norm(T2[:3, 3])
    t_est = ts[best] / (np.linalg.norm(ts[best]) + 1e-12)
    assert min(np.abs(t_est - t_gt).max(), np.abs(t_est + t_gt).max()) < 1e-2


def _plane_crossing_scene(f=600.0, n=120, seed=3):
    """Camera 2 on the OPPOSITE side of the plane (d' < 0 configuration):
    points on z=2 (cam-1 frame), camera 2 at z=4 looking back. Only the
    negative-d' decomposition family contains the true pose."""
    rng_l = np.random.default_rng(seed)
    intr = np.array([f, f, 320.0, 240.0])
    K = np.array([[f, 0, 320.0], [0, f, 240.0], [0, 0, 1]])
    pts = np.concatenate(
        [rng_l.uniform(-1.2, 1.2, size=(n, 2)), np.full((n, 1), 2.0)], -1
    )
    # cam2: center at [0.2, 0.1, 4], rotated pi about y (looking back at z-)
    R = np.array([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
    C = np.array([0.2, 0.1, 4.0])
    T2 = np.eye(4)
    T2[:3, :3] = R
    T2[:3, 3] = -R @ C
    n_plane = np.array([0.0, 0.0, 1.0])
    H_euc = T2[:3, :3] + np.outer(T2[:3, 3], n_plane) / 2.0
    H = K @ H_euc @ np.linalg.inv(K)

    def proj(T, p):
        pc = p @ T[:3, :3].T + T[:3, 3]
        assert (pc[:, 2] > 0).all()
        return np.stack(
            [intr[0] * pc[:, 0] / pc[:, 2] + intr[2],
             intr[1] * pc[:, 1] / pc[:, 2] + intr[3]], -1)

    uv1 = proj(np.eye(4), pts)
    uv2 = proj(T2, pts)
    return pts, T2, intr, H, uv1, uv2


def test_decompose_homography_plane_crossing():
    """The true pose lives in the negative-d' family (candidates 4-7),
    which used to be hard-masked invalid."""
    _, T2, intr, H_gt, _, _ = _plane_crossing_scene()
    Rs, ts, ns, valid = decompose_homography(
        jnp.asarray(H_gt, jnp.float32), jnp.asarray(intr, jnp.float32)
    )
    assert bool(valid.all()), "all 8 candidates must be selectable"
    Rs, ts = np.asarray(Rs), np.asarray(ts)
    r_errs = np.array([np.abs(R - T2[:3, :3]).max() for R in Rs])
    best = int(np.argmin(r_errs))
    assert r_errs[best] < 5e-3, r_errs
    assert best >= 4, f"GT pose must come from the negative family, got {best}"
    assert r_errs[:4].min() > 0.1, "no positive-family candidate matches GT"
    t_gt = T2[:3, 3] / np.linalg.norm(T2[:3, 3])
    t_est = ts[best] / (np.linalg.norm(ts[best]) + 1e-12)
    assert min(np.abs(t_est - t_gt).max(), np.abs(t_est + t_gt).max()) < 1e-2


def test_two_view_recovers_plane_crossing_pose(rng):
    """End-to-end: recover_pose_two_view must return the crossing pose
    (reachable only through the homography path's negative family)."""
    import jax
    from eacham_tpu.sfm.twoview import recover_pose_two_view

    _, T2, intr, _, uv1, uv2 = _plane_crossing_scene()
    res = recover_pose_two_view(
        jax.random.PRNGKey(0),
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.ones(uv1.shape[0], bool), jnp.asarray(intr, jnp.float32),
        min_tri_angle=np.deg2rad(1.0),
    )
    assert int(res.n_good) > 60, int(res.n_good)
    T = np.asarray(res.T)
    assert np.abs(T[:3, :3] - T2[:3, :3]).max() < 0.05, T
    t_gt = T2[:3, 3] / np.linalg.norm(T2[:3, 3])
    t_est = T[:3, 3] / (np.linalg.norm(T[:3, 3]) + 1e-12)
    assert np.abs(t_est - t_gt).max() < 0.05
