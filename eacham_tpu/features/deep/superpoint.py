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

import jax
import jax.numpy as jnp
import flax.linen as nn

CELL = 8
DESC_DIM = 256
SCORE_THRESHOLD = 0.05    # FeatureExtractorLightglue.cpp:101


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


@partial(jax.jit, static_argnames=("max_keypoints", "nms_radius"))
def extract_deep(
    params,
    images: jnp.ndarray,      # [B, H, W] float32 in [0, 1], H, W % 8 == 0
    max_keypoints: int = 1024,
    score_threshold: float = SCORE_THRESHOLD,
    nms_radius: int = 4,
):
    """Deep frontend inference honoring the classical frontend's contract:
    returns (xy [B, K, 2], desc [B, K, 256], score [B, K], mask [B, K])."""
    heat, desc_field = SuperPointNet().apply(params, images)
    heat = _nms_heat(heat, nms_radius)
    B, H, W = heat.shape

    flat = heat.reshape(B, -1)
    score, idx = jax.lax.top_k(flat, max_keypoints)
    yy = (idx // W).astype(jnp.float32)
    xx = (idx % W).astype(jnp.float32)
    mask = score >= score_threshold
    xy = jnp.stack([xx, yy], -1)

    def sample(field, pts):
        return _bilinear_field(field, pts[:, 0] / CELL, pts[:, 1] / CELL)

    desc = jax.vmap(sample)(desc_field, xy)
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
    return xy, desc, jnp.where(mask, score, 0.0), mask


def init_params(key, height: int = 64, width: int = 64):
    return SuperPointNet().init(key, jnp.zeros((1, height, width)))
