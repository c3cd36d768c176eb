"""SuperPoint-class deep keypoint detector + descriptor (Flax).

First-party TPU replacement for the reference's ONNX SuperPoint session
(modules/onnx/lightglue/feature/FeatureExtractorLightglue.cpp:9-126, model
``superpoint2.onnx`` — weights absent, .MISSING_LARGE_BLOBS). I/O contract
preserved:

  * input: grayscale image scaled to [0, 1] (cpp:35-41; callers resize to
    max-dim 512 as in example/src/extract_match.cpp:21-27)
  * output: keypoint pixel coords, scores filtered at >= 0.05 (cpp:101),
    L2-normalized 256-d descriptors

Architecture (SuperPoint-style, re-designed not ported): a shared VGG-ish
encoder at 1/8 resolution; a detector head producing a 65-way cell softmax
(8x8 positions + dustbin) unpacked to a full-resolution heatmap; a
descriptor head producing a 256-d field bilinearly sampled at keypoints.
Static top-K selection with masks (no dynamic shapes).

Weights: random init via ``init_params``; the npz round-trip in
lightglue.py (save_params/load_params) applies here too.
"""

from __future__ import annotations

from functools import partial

import os

import jax
import jax.numpy as jnp
import flax.linen as nn

CELL = 8
DESC_DIM = 256
SCORE_THRESHOLD = 0.05    # FeatureExtractorLightglue.cpp:101
_REFINE_OVERRIDE = {"0": False, "1": True}.get(
    os.environ.get("EACHAM_DEEP_REFINE", ""))


class _Backbone(nn.Module):
    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, 1]
        for i, ch in enumerate((64, 64)):
            x = nn.relu(nn.Conv(ch, (3, 3), name=f"c1{chr(97 + i)}")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i, ch in enumerate((64, 64)):
            x = nn.relu(nn.Conv(ch, (3, 3), name=f"c2{chr(97 + i)}")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i, ch in enumerate((128, 128)):
            x = nn.relu(nn.Conv(ch, (3, 3), name=f"c3{chr(97 + i)}")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i, ch in enumerate((128, 128)):
            x = nn.relu(nn.Conv(ch, (3, 3), name=f"c4{chr(97 + i)}")(x))
        return x                                   # [B, H/8, W/8, 128]


class SuperPointNet(nn.Module):
    @nn.compact
    def __call__(self, images):
        """images: [B, H, W] in [0, 1] with H, W multiples of 8.

        Returns (heatmap [B, H, W], desc_field [B, H/8, W/8, 256]).
        """
        x = images[..., None]
        feat = _Backbone(name="backbone")(x)

        det = nn.relu(nn.Conv(256, (3, 3), name="det1")(feat))
        det = nn.Conv(CELL * CELL + 1, (1, 1), name="det2")(det)  # [B,h,w,65]
        prob = jax.nn.softmax(det, axis=-1)[..., :-1]             # drop dustbin
        B, h, w, _ = prob.shape
        heat = prob.reshape(B, h, w, CELL, CELL)
        heat = heat.transpose(0, 1, 3, 2, 4).reshape(B, h * CELL, w * CELL)

        desc = nn.relu(nn.Conv(256, (3, 3), name="desc1")(feat))
        desc = nn.Conv(DESC_DIM, (1, 1), name="desc2")(desc)
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
        return heat, desc


def _nms_heat(heat: jnp.ndarray, radius: int = 4):
    """Suppress non-local-maxima within a (2r+1)^2 window."""
    pooled = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max,
        (1, 2 * radius + 1, 2 * radius + 1), (1, 1, 1), "SAME",
    )
    return jnp.where(heat >= pooled, heat, 0.0)


def _bilinear_field(field: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Sample [h, w, C] at float coords (in field units), clamped."""
    h, w, _ = field.shape
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    v00 = field[y0, x0]
    v01 = field[y0, x0 + 1]
    v10 = field[y0 + 1, x0]
    v11 = field[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy + v11 * fx * fy
    )


def _soft_refine(heat: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Per-keypoint subpixel offset in [-1, 1]^2: probability-weighted
    centroid of the 3x3 heat neighborhood. heat [B, H, W], xy [B, K, 2]."""
    B, H, W = heat.shape
    d = jnp.arange(-1, 2, dtype=jnp.int32)

    def one(hb, ptsb):
        x0 = ptsb[:, 0].astype(jnp.int32)
        y0 = ptsb[:, 1].astype(jnp.int32)
        ys = jnp.clip(y0[:, None, None] + d[None, :, None], 0, H - 1)
        xs = jnp.clip(x0[:, None, None] + d[None, None, :], 0, W - 1)
        w = hb[ys, xs]                                    # [K, 3, 3]
        wsum = jnp.maximum(w.sum(axis=(1, 2)), 1e-12)
        fx = (w.sum(axis=1) * d[None, :]).sum(-1) / wsum  # [K]
        fy = (w.sum(axis=2) * d[None, :]).sum(-1) / wsum
        return jnp.stack([fx, fy], -1)

    return jax.vmap(one)(heat, xy)


def _image_quadratic_refine(images: jnp.ndarray, xy_int: jnp.ndarray,
                            sigma: float = 1.0):
    """Classical-grade subpixel localization for deep keypoints: a full 2-D
    quadratic fit (offset = -H^{-1} g, the same formula as the DoG frontend,
    features/detector.py:194-225) on the sigma-blurred IMAGE intensity at
    each integer detection. Returns (offsets [B, K, 2], ok [B, K]).

    Why the image rather than the heatmap or better labels: SfM accuracy
    needs CROSS-VIEW photometric consistency, not label fidelity — snapping
    detections to exact ground-truth projections measurably WORSENS e2e ATE
    (0.077 -> 0.19, N=100 bench_deep probe), because the rendered photometric
    peak is not the projected center under perspective/overlap. Fitting the
    image localizes the same photometric structure every view sees.
    Measured: bench_deep N=100 ATE 0.077 -> 0.064 at ~zero cost.
    """
    from eacham_tpu.features.detector import _gauss_kernel, _sep_blur

    B, H, W = images.shape
    taps = _gauss_kernel(sigma)
    blur = jax.vmap(lambda im: _sep_blur(im, taps))(images)

    def one(im, pts):
        xi = pts[:, 0]
        yi = pts[:, 1]

        def v(dy, dx):
            return im[jnp.clip(yi + dy, 0, H - 1),
                      jnp.clip(xi + dx, 0, W - 1)]

        c = v(0, 0)
        dx1, dx0 = v(0, 1), v(0, -1)
        dy1, dy0 = v(1, 0), v(-1, 0)
        dpp, dpm = v(1, 1), v(1, -1)
        dmp, dmm = v(-1, 1), v(-1, -1)
        gx = 0.5 * (dx1 - dx0)
        gy = 0.5 * (dy1 - dy0)
        hxx = dx1 + dx0 - 2 * c
        hyy = dy1 + dy0 - 2 * c
        hxy = 0.25 * (dpp - dpm - dmp + dmm)
        det = hxx * hyy - hxy * hxy
        ds = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        ox = -(hyy * gx - hxy * gy) / ds
        oy = -(hxx * gy - hxy * gx) / ds
        # refine only true photometric peaks with an in-cell solution
        ok = ((jnp.abs(det) > 1e-12) & (jnp.abs(ox) < 1.0)
              & (jnp.abs(oy) < 1.0) & (hxx < 0) & (hyy < 0))
        off = jnp.stack([jnp.clip(ox, -0.6, 0.6),
                         jnp.clip(oy, -0.6, 0.6)], -1)
        return off, ok

    return jax.vmap(one)(blur, xy_int)


@partial(jax.jit, static_argnames=("max_keypoints", "nms_radius", "refine"))
def extract_deep(
    params,
    images: jnp.ndarray,      # [B, H, W] float32 in [0, 1], H, W % 8 == 0
    max_keypoints: int = 1024,
    score_threshold: float = SCORE_THRESHOLD,
    nms_radius: int = 4,
    refine: bool = True,
):
    """Deep frontend inference honoring the classical frontend's contract:
    returns (xy [B, K, 2], desc [B, K, 256], score [B, K], mask [B, K])."""
    heat_raw, desc_field = SuperPointNet().apply(params, images)
    heat = _nms_heat(heat_raw, nms_radius)
    B, H, W = heat.shape

    flat = heat.reshape(B, -1)
    score, idx = jax.lax.top_k(flat, max_keypoints)
    yy = (idx // W).astype(jnp.float32)
    xx = (idx % W).astype(jnp.float32)
    mask = score >= score_threshold
    xy = jnp.stack([xx, yy], -1)
    # Subpixel refinement, two tiers (integer peaks carry +-0.5 px
    # quantization the classical DoG frontend does not have):
    #   1. image-space quadratic fit at photometric peaks (preferred —
    #      cross-view-consistent localization, see _image_quadratic_refine);
    #   2. fallback 3x3 soft-argmax on the RAW heatmap (NMS zeros the
    #      neighbors, so read pre-NMS) where the image fit is invalid.
    # Measured across 4 rendered worlds at N=100 (SCALING.md r4): at the
    # production density K=1024 refinement lowers the median e2e ATE
    # 0.104 -> 0.095; at sparse K=512 the pipeline is chaos-dominated
    # (top-k tie-breaks swing single runs 0.06..0.40) and refinement does
    # not help. EACHAM_DEEP_REFINE=0/1 overrides for A/B — read once at
    # import (it is not part of the jit cache key, so a mid-process flip
    # would otherwise serve stale traces).
    if _REFINE_OVERRIDE is not None:
        refine = _REFINE_OVERRIDE
    if refine:
        xy_soft = xy + _soft_refine(heat_raw, xy)
        xy_int = jnp.round(xy_soft).astype(jnp.int32)
        off_img, ok_img = _image_quadratic_refine(images, xy_int)
        xy = jnp.where(ok_img[..., None],
                       xy_int.astype(jnp.float32) + off_img, xy_soft)
    else:
        xy_soft = xy

    def sample(field, pts):
        return _bilinear_field(field, pts[:, 0] / CELL, pts[:, 1] / CELL)

    # descriptors are sampled at the soft-refined position: the final
    # image-fit moves points <=0.6 px (far below the CELL=8 desc-field
    # granularity), and the match set it was validated with used these
    desc = jax.vmap(sample)(desc_field, xy_soft)
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
    return xy, desc, jnp.where(mask, score, 0.0), mask


def init_params(key, height: int = 64, width: int = 64):
    return SuperPointNet().init(key, jnp.zeros((1, height, width)))
