"""Deep frontend contract tests (architecture-level; weights are random
here — training lives in eacham_tpu.features.deep.train)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eacham_tpu.features.deep import lightglue as lg
from eacham_tpu.features.deep import superpoint as sp


@pytest.fixture(scope="module")
def lg_params():
    return lg.init_params(jax.random.PRNGKey(0), n_layers=2, n_kps=32)


@pytest.fixture(scope="module")
def sp_params():
    return sp.init_params(jax.random.PRNGKey(0))


def test_normalize_keypoints():
    uv = jnp.asarray([[0.0, 0.0], [640.0, 480.0], [320.0, 240.0]])
    out = np.asarray(lg.normalize_keypoints(uv, 640, 480))
    # center/scale by max(w,h)/2 (Tools2d.h:25-45)
    np.testing.assert_allclose(out[2], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[0], [-1.0, -0.75], atol=1e-6)
    np.testing.assert_allclose(out[1], [1.0, 0.75], atol=1e-6)


def test_matcher_shapes_and_threshold(lg_params, rng):
    B, N = 2, 32
    kps0 = jnp.asarray(rng.uniform(-1, 1, (B, N, 2)).astype(np.float32))
    kps1 = jnp.asarray(rng.uniform(-1, 1, (B, N, 2)).astype(np.float32))
    d0 = jnp.asarray(rng.normal(size=(B, N, 256)).astype(np.float32))
    d1 = jnp.asarray(rng.normal(size=(B, N, 256)).astype(np.float32))
    m0 = jnp.ones((B, N), bool).at[0, -5:].set(False)
    m1 = jnp.ones((B, N), bool).at[1, :3].set(False)
    idx, valid, scores = lg.match_deep(
        lg_params, kps0, d0, m0, kps1, d1, m1, n_layers=2
    )
    assert idx.shape == (B, N) and valid.shape == (B, N)
    s = np.asarray(scores)
    assert s.shape == (B, N, N)
    assert np.all(s >= 0) and np.all(s <= 1)
    # masked rows can never be valid matches; masked cols get zero score
    assert not np.asarray(valid)[0, -5:].any()
    assert np.all(s[1, :, :3] == 0)
    # every reported match clears the 0.5 gate (cpp:118)
    v = np.asarray(valid)
    picked = np.take_along_axis(s, np.asarray(idx)[..., None], 2)[..., 0]
    assert np.all(picked[v] > 0.5) if v.any() else True


def test_matcher_mask_invariance(lg_params, rng):
    """Padded-slot contents must not affect live outputs."""
    B, N = 1, 32
    kps = jnp.asarray(rng.uniform(-1, 1, (B, N, 2)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(B, N, 256)).astype(np.float32))
    m = jnp.ones((B, N), bool).at[0, 20:].set(False)
    _, _, s1 = lg.match_deep(lg_params, kps, d, m, kps, d, m, n_layers=2)
    d_garbage = d.at[0, 20:].set(999.0)
    kps_garbage = kps.at[0, 20:].set(-77.0)
    _, _, s2 = lg.match_deep(
        lg_params, kps_garbage, d_garbage, m, kps_garbage, d_garbage, m,
        n_layers=2,
    )
    np.testing.assert_allclose(
        np.asarray(s1)[0, :20, :20], np.asarray(s2)[0, :20, :20], atol=1e-5
    )


def test_superpoint_contract(sp_params, rng):
    B, H, W = 2, 64, 96
    images = jnp.asarray(rng.random((B, H, W)).astype(np.float32))
    xy, desc, score, mask = sp.extract_deep(
        sp_params, images, max_keypoints=128, score_threshold=0.0
    )
    assert xy.shape == (B, 128, 2) and desc.shape == (B, 128, 256)
    n = np.linalg.norm(np.asarray(desc), axis=-1)
    live = np.asarray(mask)
    np.testing.assert_allclose(n[live], 1.0, atol=1e-4)
    uv = np.asarray(xy)
    assert (uv[..., 0] < W).all() and (uv[..., 1] < H).all()


def test_params_roundtrip(tmp_path, lg_params, rng):
    p = tmp_path / "lg.npz"
    lg.save_params(p, lg_params)
    loaded = lg.load_params(p, lg_params)
    a = jax.tree_util.tree_leaves(lg_params)
    b = jax.tree_util.tree_leaves(loaded)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_image_quadratic_refine_recovers_subpixel_peak():
    """_image_quadratic_refine must localize a known subpixel Gaussian
    peak from its integer detection to well under quantization error
    (the deep frontend's refine=True path, SCALING.md r4)."""
    from eacham_tpu.features.deep.superpoint import _image_quadratic_refine

    H, W = 64, 64
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    truths = [(20.3, 31.7), (40.85, 12.15), (9.5, 50.25)]
    img = np.zeros((H, W), np.float32)
    for cy, cx in truths:
        img += np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 2.0 ** 2)))
    xy_int = jnp.asarray(
        [[[round(cx), round(cy)] for cy, cx in truths]], jnp.int32)
    off, ok = _image_quadratic_refine(jnp.asarray(img)[None], xy_int)
    off = np.asarray(off[0])
    assert np.asarray(ok[0]).all()
    for k, (cy, cx) in enumerate(truths):
        rx = round(cx) + off[k, 0]
        ry = round(cy) + off[k, 1]
        err0 = np.hypot(round(cx) - cx, round(cy) - cy)
        err1 = np.hypot(rx - cx, ry - cy)
        assert err1 < 0.15 and err1 < err0, (k, err0, err1)


def test_extract_deep_refine_integer_vs_subpixel(sp_params, rng):
    """refine=False returns integer peaks; refine=True moves a healthy
    fraction off-integer while keeping every coordinate in-frame."""
    from eacham_tpu.features.deep import superpoint as sp

    B, H, W = 2, 64, 64
    images = jnp.asarray(rng.random((B, H, W)).astype(np.float32))
    xy0, _, _, m0 = sp.extract_deep(
        sp_params, images, max_keypoints=64, score_threshold=0.0,
        refine=False)
    xy1, _, _, m1 = sp.extract_deep(
        sp_params, images, max_keypoints=64, score_threshold=0.0,
        refine=True)
    a = np.asarray(xy0)[np.asarray(m0)]
    assert np.abs(a - np.rint(a)).max() < 1e-6
    b = np.asarray(xy1)[np.asarray(m1)]
    frac = (np.abs(b - np.rint(b)) > 1e-3).any(-1).mean()
    assert frac > 0.2, frac
    assert (b[:, 0] >= -1) .all() and (b[:, 0] < W + 1).all()


def test_flow_transfer_labels_are_geometrically_correct():
    """The flow-transfer labeler (train._label_correspondence) must label
    detected keypoints by the governing blob's sprite translation, and
    never through the occluded far hemisphere of a surface world."""
    import numpy as np
    from eacham_tpu.features.deep.train import (
        _label_correspondence, _orbit_pose,
    )
    from eacham_tpu.utils.synthetic import make_surface_scene

    rng = np.random.default_rng(3)
    scene = make_surface_scene(rng, n_blobs=400)
    W, H = 160, 120
    f = 1.2 * W
    intr = np.array([f, f, W / 2, H / 2], np.float32)
    center = np.array([0.0, 0.0, 9.0], np.float32)
    T0 = _orbit_pose(0.3, center, 14.0)
    T1 = _orbit_pose(0.3 + np.deg2rad(3.0), center, 14.0)

    def project(T):
        pc = scene["pts"] @ T[:3, :3].T + T[:3, 3]
        z = np.maximum(pc[:, 2], 1e-6)
        u = intr[0] * pc[:, 0] / z + intr[2]
        v = intr[1] * pc[:, 1] / z + intr[3]
        cam = -T[:3, :3].T @ T[:3, 3]
        vis = ((pc[:, 2] > 0.5) & (u > 5) & (u < W - 5) & (v > 5)
               & (v < H - 5)
               & (np.sum((scene["pts"] - center)
                         * (cam - scene["pts"]), axis=1) > 0))
        return np.stack([u, v], -1), vis

    proj0, vis0 = project(T0)
    proj1, vis1 = project(T1)
    both = np.nonzero(vis0 & vis1)[0][:32]
    # synthetic "detections": texture corners at a fixed sprite offset
    # from blob centers — the sprite is pixel-anchored, so the offset is
    # identical in both views
    off = np.array([2.5, -1.5], np.float32)
    xy0 = (proj0[both] + off).astype(np.float32)
    perm = rng.permutation(len(both))
    xy1 = (proj1[both][perm] + off).astype(np.float32)
    m = np.ones(len(both), bool)
    gt = _label_correspondence(xy0, m, xy1, m, scene, T0, T1, intr)
    assert (gt >= 0).mean() > 0.9, f"labeled only {(gt >= 0).mean():.0%}"
    lab = gt >= 0
    assert (gt[lab] == np.argsort(perm)[lab]).all()
