import numpy as np
import jax
import jax.numpy as jnp

from eacham_tpu.features import (
    detect_keypoints,
    describe_keypoints,
    match_pair,
    match_all_pairs,
    extract_features,
)

import pytest

# e2e/scale tier — excluded from the core tier (pytest -m 'not slow', README)
pytestmark = pytest.mark.slow


def _texture(rng, H=240, W=320, blobs=60):
    """Random blob texture with strong local structure."""
    img = np.zeros((H, W), np.float32)
    ys = rng.uniform(20, H - 20, blobs)
    xs = rng.uniform(20, W - 20, blobs)
    amps = rng.uniform(0.4, 1.0, blobs)
    sig = rng.uniform(1.5, 4.0, blobs)
    yy, xx = np.mgrid[0:H, 0:W]
    for x, y, a, s in zip(xs, ys, amps, sig):
        img += a * np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * s * s))
    img += 0.02 * rng.standard_normal((H, W)).astype(np.float32)
    return np.clip(img, 0, 1).astype(np.float32), np.stack([xs, ys], -1)


def test_detector_finds_blobs(rng):
    img, centers = _texture(rng)
    xy, sidx, score, mask = detect_keypoints(jnp.asarray(img), max_keypoints=256)
    xy = np.asarray(xy)[np.asarray(mask)]
    assert len(xy) > 30
    # most blob centers should have a detection within 3 px
    d = np.linalg.norm(centers[:, None, :] - xy[None, :, :], axis=-1).min(axis=1)
    hits = (d < 3.0).mean()
    assert hits > 0.5, f"only {hits:.0%} of blobs detected"


def test_descriptor_normalized(rng):
    img, _ = _texture(rng)
    xy, sidx, score, mask = detect_keypoints(jnp.asarray(img), max_keypoints=128)
    desc = describe_keypoints(jnp.asarray(img), xy, sidx, mask)
    desc = np.asarray(desc)
    m = np.asarray(mask)
    norms = np.linalg.norm(desc[m], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    assert np.all(desc[~m] == 0.0)


def test_matching_under_shift(rng):
    """Features of a translated image must match back to their source."""
    img, _ = _texture(rng)
    shift = 12
    img2 = np.roll(img, shift, axis=1)
    xy1, d1, s1, m1 = extract_features(jnp.asarray(img[None]), max_keypoints=256)
    xy2, d2, s2, m2 = extract_features(jnp.asarray(img2[None]), max_keypoints=256)
    bj, valid = match_pair(d1[0], d2[0], m1[0], m2[0])
    valid = np.asarray(valid)
    assert valid.sum() > 30
    p1 = np.asarray(xy1[0])[valid]
    p2 = np.asarray(xy2[0])[np.asarray(bj)[valid]]
    dx = p2[:, 0] - p1[:, 0]
    dy = p2[:, 1] - p1[:, 1]
    # the dominant displacement must be the applied shift
    assert np.abs(np.median(dx) - shift) < 1.0
    assert np.abs(np.median(dy)) < 1.0
    inlier_frac = ((np.abs(dx - shift) < 2) & (np.abs(dy) < 2)).mean()
    assert inlier_frac > 0.8


def test_match_all_pairs_gate(rng):
    img, _ = _texture(rng)
    imgs = np.stack([img, np.roll(img, 10, 1), rng.uniform(0, 1, img.shape).astype(np.float32)])
    xy, d, s, m = extract_features(jnp.asarray(imgs), max_keypoints=256)
    pair_idx = jnp.asarray([[0, 1], [0, 2], [1, 2]], dtype=jnp.int32)
    mj, mv, ok = match_all_pairs(d, m, pair_idx, min_matches=30)
    ok = np.asarray(ok)
    assert ok[0]            # shifted copy matches
    assert not ok[1]        # pure noise does not
    assert not ok[2]


def test_match_pair_respects_masks(rng):
    img, _ = _texture(rng)
    xy, d, s, m = extract_features(jnp.asarray(img[None]), max_keypoints=128)
    m0 = np.asarray(m[0]).copy()
    half = np.zeros_like(m0)
    half[: len(half) // 2] = m0[: len(half) // 2]
    bj, valid = match_pair(d[0], d[0], jnp.asarray(half), m[0])
    valid = np.asarray(valid)
    assert not valid[len(half) // 2:].any()
    # self-matching on the unmasked half should be near-perfect identity
    idx = np.where(valid)[0]
    assert (np.asarray(bj)[idx] == idx).mean() > 0.95


def test_scale_invariant_matching(rng):
    """Multi-octave: the same scene at 2x scale difference still matches."""
    import numpy as np
    import jax.numpy as jnp
    from eacham_tpu.utils.synthetic import make_blob_scene, render_view
    from eacham_tpu.features.frontend import extract_features
    from eacham_tpu.features.matching import match_pair

    scene = make_blob_scene(np.random.default_rng(4), n_blobs=150)
    intr1 = np.array([400.0, 400.0, 160.0, 120.0], np.float32)
    intr2 = intr1 * np.array([2.0, 2.0, 2.0, 2.0], np.float32)  # 2x zoom
    T = np.eye(4, dtype=np.float32)
    img1 = render_view(scene, T, intr1, 320, 240)
    img2 = render_view(scene, T, intr2, 640, 480)   # double focal = 2x scale
    # pad img1 into a 640x480 canvas for a uniform batch
    batch = np.zeros((2, 480, 640), np.float32)
    batch[0, :240, :320] = img1
    batch[1] = img2
    xy, desc, score, mask = extract_features(jnp.asarray(batch),
                                             max_keypoints=256)
    mj, valid = match_pair(desc[0], desc[1], mask[0], mask[1])
    v = np.asarray(valid)
    assert v.sum() > 30, f"only {v.sum()} matches across 2x scale"
    # matched coordinates should obey uv2 ~= 2 * uv1
    uv1 = np.asarray(xy[0])[v]
    uv2 = np.asarray(xy[1])[np.asarray(mj)[v]]
    err = np.linalg.norm(uv2 - 2.0 * uv1, axis=-1)
    assert np.median(err) < 4.0, np.median(err)


def test_blur_stack_matmul_matches_conv():
    """The banded-matmul pyramid (accelerator path) must match the
    separable-conv path to float rounding — same SAME-zero padding."""
    import numpy as np
    import jax.numpy as jnp
    from eacham_tpu.features.detector import (
        N_SCALES, SIGMA0, STEP, _blur_stack_mm, _gauss_kernel, _sep_blur,
    )

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((96, 128)).astype(np.float32))
    sigmas = [SIGMA0 * STEP ** i for i in range(N_SCALES)]
    ref = jnp.stack([_sep_blur(img, _gauss_kernel(s)) for s in sigmas])
    mm = _blur_stack_mm(img, sigmas)
    assert np.abs(np.asarray(ref) - np.asarray(mm)).max() < 2e-6


def test_descriptor_batched_matches_unrolled(rng):
    """The level/cell-batched descriptor must reproduce the unrolled
    per-(octave, level, cell) form exactly (same math, one grouped conv
    + one gather instead of ~1000 HLOs)."""
    from eacham_tpu.features.descriptor import (
        _describe_unrolled, describe_from_stacks,
    )
    from eacham_tpu.features.detector import octave_stacks

    img, _ = _texture(rng)
    xy, sidx, score, mask = detect_keypoints(jnp.asarray(img), max_keypoints=128)
    stacks = octave_stacks(jnp.asarray(img), 3)
    new = np.asarray(describe_from_stacks(stacks, xy, sidx, mask))
    old = np.asarray(_describe_unrolled(stacks, xy, sidx, mask))
    np.testing.assert_allclose(new, old, atol=2e-5)
