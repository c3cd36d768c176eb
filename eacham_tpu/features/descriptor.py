"""256-d gradient-histogram descriptor (upright SIFT-style), dense TPU form.

Fills the reference's descriptor contract (256-d float vectors, matching
the LightGlue path's descriptor width, modules/onnx/lightglue/feature/
FeatureExtractorLightglue.cpp:99-119; the SIFT path's contract is just
"a row per keypoint", FeatureExtractorSift.cpp:14-26): a 4x4 spatial grid
of 16-bin gradient-orientation histograms at the keypoint's detected
scale, Gaussian-weighted, L2-normalized with the standard 0.2
clip-renormalize. Upright (no dominant-orientation estimation): SfM frame
sequences are roll-stable.

TPU-first formulation (dense-SIFT): per scale level, soft-bin gradients
into BINS orientation-channel maps (pure VPU elementwise), aggregate
spatially with one separable depthwise Gaussian blur (conv), then read the
descriptor as BINS-wide bilinear samples at the 4x4 cell centers — 16
vector gathers per keypoint instead of per-sample scalar gathers (which
were ~3M random gathers per frame and 25x slower end-to-end).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from eacham_tpu.features.detector import (
    SIGMA0, STEP, N_SCALES, octave_stacks, _gauss_kernel,
)

GRID = 4          # spatial cells per side
BINS = 16         # orientation bins
DESC_DIM = GRID * GRID * BINS  # 256


def _cell_size(s: int) -> float:
    """Cell side in pixels at level s (3 sigma_s, as in the sampled form)."""
    return 3.0 * SIGMA0 * (STEP ** (s + 0.5))


def _depthwise_blur(x: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Separable blur of [C, H, W] (channels as conv batch)."""
    k = jnp.asarray(taps)
    r = (len(taps) - 1) // 2
    y = x[:, None, :, :]
    kh = k[None, None, :, None]
    kw = k[None, None, None, :]
    y = jax.lax.conv_general_dilated(y, kh, (1, 1), [(r, r), (0, 0)])
    y = jax.lax.conv_general_dilated(y, kw, (1, 1), [(0, 0), (r, r)])
    return y[:, 0]


def _bilinear_chw(field: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Sample [C, H, W] at K float points -> [K, C] (4 row-gathers)."""
    C, H, W = field.shape
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    f = field.transpose(1, 2, 0)          # [H, W, C]
    v00 = f[y0, x0]
    v01 = f[y0, x0 + 1]
    v10 = f[y0 + 1, x0]
    v11 = f[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy + v11 * fx * fy
    )


# 4x4 cell-center offsets in cell units, and the SIFT Gaussian cell window
_CELL_POS = np.arange(GRID, dtype=np.float32) - (GRID - 1) / 2.0   # [-1.5..1.5]
_CELL_R2 = (_CELL_POS[None, :] ** 2 + _CELL_POS[:, None] ** 2).reshape(-1)
_CELL_WINDOW = np.exp(-_CELL_R2 / (2.0 * (GRID / 2.0) ** 2)).astype(np.float32)


@partial(jax.jit, static_argnames=("n_octaves",))
def describe_keypoints(
    img: jnp.ndarray,        # [H, W] grayscale
    xy: jnp.ndarray,         # [K, 2] full-resolution pixels
    scale_idx: jnp.ndarray,  # [K] int32 octave * (N_SCALES-1) + level
    mask: jnp.ndarray,       # [K] bool
    n_octaves: int = 3,
):
    """Returns L2-normalized descriptors [K, 256] (zeros where mask=False).

    ``scale_idx`` follows the detector's multi-octave encoding; sampling
    happens in the keypoint's own octave (coords / 2^o, per-level cell
    size), so descriptor support scales with detected blob size.
    """
    return describe_from_stacks(octave_stacks(img, n_octaves), xy,
                                scale_idx, mask)


def _level_blur_multi(hist: jnp.ndarray) -> jnp.ndarray:
    """Blur [S, BINS, H, W] with each level's own separable Gaussian in
    ONE grouped conv pair (feature_group_count = S*BINS). Shorter levels'
    taps are zero-padded to the longest radius — identical to a smaller
    SAME conv, since both pad the border with zeros."""
    S, C, H, W = hist.shape
    taps = [_gauss_kernel(0.5 * _cell_size(s)) for s in range(S)]
    r = max((len(t) - 1) // 2 for t in taps)
    T = 2 * r + 1
    padded = np.zeros((S, T), np.float32)
    for s, t in enumerate(taps):
        rs = (len(t) - 1) // 2
        padded[s, r - rs:r + rs + 1] = t
    k = jnp.asarray(np.repeat(padded, C, axis=0))        # [S*C, T]
    x = hist.reshape(1, S * C, H, W)
    kh = k[:, None, :, None]                             # [S*C, 1, T, 1]
    kw = k[:, None, None, :]
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(r, r), (0, 0)], feature_group_count=S * C)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (r, r)], feature_group_count=S * C)
    return x.reshape(S, C, H, W)


def describe_from_stacks(
    stacks,                  # octave_stacks(img, n_octaves)
    xy: jnp.ndarray,         # [K, 2] full-resolution pixels
    scale_idx: jnp.ndarray,  # [K] int32
    mask: jnp.ndarray,       # [K] bool
):
    """Descriptors from precomputed per-octave Gaussian stacks (shared
    with the detector — the pyramid convs dominate extraction cost).

    All DoG levels of an octave are processed as one batch (grouped conv
    for the per-level blurs, one vmapped 4-gather bilinear read for all
    16 cells x S levels): the unrolled form emitted ~1000 gather HLOs and
    dominated the pipeline's cold-compile time (75 s of 141 s at N=100).
    """
    K = xy.shape[0]
    S = N_SCALES - 1
    cells = np.array([_cell_size(s) for s in range(S)], np.float32)
    # cell-center offsets, cy-major to match _CELL_WINDOW's layout
    cxs = np.tile(_CELL_POS, GRID)                       # [16]
    cys = np.repeat(_CELL_POS, GRID)

    level_desc = []                                      # [S, K, 16, BINS] per octave
    for o, g in enumerate(stacks):
        factor = float(2 ** o)
        lvls = g[:S]                                     # DoG levels only
        gx = 0.5 * (jnp.roll(lvls, -1, axis=2) - jnp.roll(lvls, 1, axis=2))
        gy = 0.5 * (jnp.roll(lvls, -1, axis=1) - jnp.roll(lvls, 1, axis=1))
        mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
        ori = jnp.arctan2(gy, gx)

        b = (ori / (2.0 * np.pi) + 0.5) * BINS
        b0 = jnp.floor(b)
        w1 = b - b0
        b0i = b0.astype(jnp.int32) % BINS
        b1i = (b0i + 1) % BINS
        # orientation channel maps [S, BINS, H, W] — elementwise selects
        ch = jnp.arange(BINS, dtype=jnp.int32)[None, :, None, None]
        hist = (mag[:, None] * (1.0 - w1)[:, None] * (b0i[:, None] == ch)
                + mag[:, None] * w1[:, None] * (b1i[:, None] == ch))
        hist = _level_blur_multi(hist)

        # all 16 cell centers x S levels in octave coords: [S, 16, K]
        px = (xy[None, None, :, 0] / factor
              + cxs[None, :, None] * cells[:, None, None])
        py = (xy[None, None, :, 1] / factor
              + cys[None, :, None] * cells[:, None, None])
        samp = jax.vmap(_bilinear_chw)(
            hist, px.reshape(S, -1), py.reshape(S, -1))  # [S, 16K, BINS]
        level_desc.append(
            samp.reshape(S, GRID * GRID, K, BINS).transpose(0, 2, 1, 3)
        )

    all_levels = jnp.concatenate(level_desc, axis=0)     # [L, K, 16, BINS]
    idx = jnp.clip(scale_idx, 0, all_levels.shape[0] - 1)
    desc = all_levels[idx, jnp.arange(K)]                # [K, 16, BINS]
    desc = desc * jnp.asarray(_CELL_WINDOW)[None, :, None]

    desc = desc.reshape(K, DESC_DIM)
    # normalize -> clip 0.2 -> renormalize (standard SIFT illumination guard)
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
    return jnp.where(mask[:, None], desc, 0.0)


def _describe_unrolled(stacks, xy, scale_idx, mask):
    """Reference (pre-batching) form of describe_from_stacks — kept for the
    equivalence test only; same math, one Python iteration per (octave,
    level, cell)."""
    K = xy.shape[0]

    desc = jnp.zeros((K, GRID * GRID, BINS), jnp.float32)
    for o, g in enumerate(stacks):
        factor = float(2 ** o)
        for s in range(N_SCALES - 1):                 # DoG levels only
            lvl = g[s]
            gx = 0.5 * (jnp.roll(lvl, -1, axis=1) - jnp.roll(lvl, 1, axis=1))
            gy = 0.5 * (jnp.roll(lvl, -1, axis=0) - jnp.roll(lvl, 1, axis=0))
            mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
            ori = jnp.arctan2(gy, gx)

            b = (ori / (2.0 * np.pi) + 0.5) * BINS
            b0 = jnp.floor(b)
            w1 = b - b0
            b0i = b0.astype(jnp.int32) % BINS
            b1i = (b0i + 1) % BINS
            ch = jnp.arange(BINS, dtype=jnp.int32)[:, None, None]
            hist = (mag * (1.0 - w1) * (b0i[None] == ch)
                    + mag * w1 * (b1i[None] == ch))

            cell = _cell_size(s)
            hist = _depthwise_blur(hist, _gauss_kernel(0.5 * cell))

            samples = []
            for cy in _CELL_POS:
                for cx in _CELL_POS:
                    px = xy[:, 0] / factor + cx * cell
                    py = xy[:, 1] / factor + cy * cell
                    samples.append(_bilinear_chw(hist, px, py))  # [K, BINS]
            d_s = jnp.stack(samples, axis=1)                     # [K, 16, BINS]
            d_s = d_s * jnp.asarray(_CELL_WINDOW)[None, :, None]
            combined = o * (N_SCALES - 1) + s
            desc = jnp.where(
                (scale_idx == combined)[:, None, None], d_s, desc
            )

    desc = desc.reshape(K, DESC_DIM)
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
    return jnp.where(mask[:, None], desc, 0.0)
