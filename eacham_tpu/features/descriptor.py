"""256-d gradient-histogram descriptor (upright SIFT-style), pure JAX.

Fills the reference's descriptor contract (256-d float vectors, matching
the LightGlue path's descriptor width, modules/onnx/lightglue/feature/
FeatureExtractorLightglue.cpp:99-119; the SIFT path's contract is just
"a row per keypoint", FeatureExtractorSift.cpp:14-26): a 4x4 spatial grid
of 16-bin gradient-orientation histograms computed at the keypoint's
detected scale, Gaussian-windowed, L2-normalized with the standard 0.2
clip-renormalize. Upright (no dominant-orientation estimation): SfM frame
sequences are roll-stable, and skipping it keeps the whole descriptor a
fixed dense gather + segment-sum — TPU-friendly.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from eacham_tpu.features.detector import SIGMA0, STEP, build_scale_space

GRID = 4          # spatial cells per side
BINS = 16         # orientation bins
SAMPLES = 16      # samples per side
DESC_DIM = GRID * GRID * BINS  # 256


def _bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Bilinear sample of [H, W] at float coords (clamped)."""
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _descriptor_one(gx_all, gy_all, xy, sidx, window, cell_of_sample):
    """Descriptor for a single keypoint.

    gx_all/gy_all: [S, H, W] per-level gradients; xy: [2]; sidx: [] level.
    window: [SAMPLES*SAMPLES] Gaussian weights; cell_of_sample: [SxS] int.

    The sample pattern is evaluated on EVERY level with a static level
    index, then the keypoint's level is selected from the tiny [S, n]
    result. A dynamic ``gx_all[sidx]`` here would make XLA materialize a
    full [H, W] gather per keypoint under vmap (tens of GB at batch scale);
    S-fold redundant sampling of 256 points is ~free by comparison.
    """
    S = gx_all.shape[0]
    half = (SAMPLES - 1) / 2.0
    base = jnp.arange(SAMPLES, dtype=jnp.float32) - half
    gxs, gys = jnp.meshgrid(base, base, indexing="xy")

    gx_lvls = []
    gy_lvls = []
    for s in range(S):
        sigma_s = SIGMA0 * (STEP ** (s + 0.5))
        spacing = 0.75 * sigma_s
        px = (xy[0] + gxs * spacing).reshape(-1)
        py = (xy[1] + gys * spacing).reshape(-1)
        gx_lvls.append(_bilinear(gx_all[s], px, py))
        gy_lvls.append(_bilinear(gy_all[s], px, py))
    gx = jnp.stack(gx_lvls)[sidx]          # [n]
    gy = jnp.stack(gy_lvls)[sidx]

    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12) * window
    ori = jnp.arctan2(gy, gx)  # [-pi, pi]

    # soft orientation binning
    b = (ori / (2.0 * np.pi) + 0.5) * BINS
    b0 = jnp.floor(b).astype(jnp.int32) % BINS
    b1 = (b0 + 1) % BINS
    w1 = b - jnp.floor(b)
    w0 = 1.0 - w1

    idx0 = cell_of_sample * BINS + b0
    idx1 = cell_of_sample * BINS + b1
    desc = jnp.zeros(DESC_DIM, dtype=jnp.float32)
    desc = desc.at[idx0].add(mag * w0)
    desc = desc.at[idx1].add(mag * w1)

    # normalize -> clip 0.2 -> renormalize (standard SIFT illumination guard)
    desc = desc / (jnp.linalg.norm(desc) + 1e-8)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / (jnp.linalg.norm(desc) + 1e-8)
    return desc


@jax.jit
def describe_keypoints(
    img: jnp.ndarray,        # [H, W] grayscale
    xy: jnp.ndarray,         # [K, 2]
    scale_idx: jnp.ndarray,  # [K] int32 DoG level
    mask: jnp.ndarray,       # [K] bool
):
    """Returns L2-normalized descriptors [K, 256] (zeros where mask=False)."""
    g, _ = build_scale_space(img)
    gx_all = 0.5 * (jnp.roll(g, -1, axis=2) - jnp.roll(g, 1, axis=2))
    gy_all = 0.5 * (jnp.roll(g, -1, axis=1) - jnp.roll(g, 1, axis=1))

    half = (SAMPLES - 1) / 2.0
    ii = np.arange(SAMPLES)
    cell = np.clip((ii[None, :] * GRID) // SAMPLES, 0, GRID - 1)
    cell_x = np.broadcast_to(cell, (SAMPLES, SAMPLES))
    cell_y = cell_x.T
    cell_of_sample = jnp.asarray((cell_y * GRID + cell_x).reshape(-1))

    r2 = ((ii - half) ** 2)[None, :] + ((ii - half) ** 2)[:, None]
    window = jnp.asarray(
        np.exp(-r2 / (2.0 * (0.5 * SAMPLES) ** 2)).reshape(-1).astype(np.float32)
    )

    desc = jax.vmap(
        lambda p, s: _descriptor_one(gx_all, gy_all, p, s, window, cell_of_sample)
    )(xy, scale_idx)
    return jnp.where(mask[:, None], desc, 0.0)
