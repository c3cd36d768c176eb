"""Pinhole camera model, batched (pure jnp).

Intrinsics are a flat (..., 4) array ``[fx, fy, cx, cy]`` (zero skew; the
reference also fixes skew via a ~zero-sigma prior,
modules/sfm/reconstruction/BundleAdjuster.cpp:173-178).
"""

from __future__ import annotations

import jax.numpy as jnp

from eacham_tpu.geometry.se3 import transform_points


def make_intrinsics(fx, fy, cx, cy, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([fx, fy, cx, cy], dtype=dtype)


def intrinsics_from_image_size(width: int, height: int, focal_scale: float = 1.2):
    """Initial-K heuristic of the reference (utils::ImageToCameraParams,
    modules/sfm/utils/Utils.h:13-22): f = focal_scale * max(w, h), principal
    point at the image center."""
    f = focal_scale * max(width, height)
    return make_intrinsics(f, f, 0.5 * width, 0.5 * height)


def K_matrix(intr: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (..., 3, 3) calibration matrix."""
    fx, fy, cx, cy = intr[..., 0], intr[..., 1], intr[..., 2], intr[..., 3]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    rows = [
        jnp.stack([fx, zeros, cx], axis=-1),
        jnp.stack([zeros, fy, cy], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def project_hom(pts_cam: jnp.ndarray, intr: jnp.ndarray, eps: float = 1e-12):
    """Project camera-frame points (..., 3) to pixels (..., 2).

    Equivalent of tools::Project3dPoint (modules/base/tools/Tools3d.h:103-113).
    Guarded divide: callers must mask out non-positive depths themselves.
    """
    z = pts_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < eps, eps, z)
    u = intr[..., 0] * pts_cam[..., 0] * inv_z + intr[..., 2]
    v = intr[..., 1] * pts_cam[..., 1] * inv_z + intr[..., 3]
    return jnp.stack([u, v], axis=-1)


def project(T: jnp.ndarray, pts_world: jnp.ndarray, intr: jnp.ndarray):
    """World points -> pixels through a world->cam transform.

    Returns (uv, z) so callers can apply cheirality masks.
    """
    pc = transform_points(T, pts_world)
    return project_hom(pc, intr), pc[..., 2]


def backproject(uv: jnp.ndarray, depth: jnp.ndarray, intr: jnp.ndarray):
    """Pixels + depth -> camera-frame 3D points (equivalent of
    tools::Get3dPointByDepthMap, modules/base/tools/Tools3d.h)."""
    x = (uv[..., 0] - intr[..., 2]) / intr[..., 0] * depth
    y = (uv[..., 1] - intr[..., 3]) / intr[..., 1] * depth
    return jnp.stack([x, y, depth], axis=-1)


def pixel_to_normalized(uv: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Pixels -> normalized camera coordinates (the K^{-1} map used before DLT
    triangulation in the reference, modules/sfm/reconstruction/Triangulator.cpp:65-77)."""
    x = (uv[..., 0] - intr[..., 2]) / intr[..., 0]
    y = (uv[..., 1] - intr[..., 3]) / intr[..., 1]
    return jnp.stack([x, y], axis=-1)


# --------------------------------------------------------------- distortion

def distort_normalized(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Brown-Conrady forward distortion of normalized coords (..., 2).

    ``dist`` = [k1, k2, p1, p2, k3] — the layout the reference's camera
    interface carries (ICamera.h:30-44 exposes distortion alongside K but
    the C++ SfM path never applies it; here it is a first-class ingest
    hook). Fully batched; zero coefficients are the identity.
    """
    x, y = xy[..., 0], xy[..., 1]
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xt = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yt = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xt, yt], axis=-1)


def undistort_normalized(xy_d: jnp.ndarray, dist: jnp.ndarray,
                         iters: int = 8) -> jnp.ndarray:
    """Inverse of ``distort_normalized`` by fixed-point iteration.

    Fixed iteration count (no data-dependent control flow — jit/vmap
    friendly); 8 rounds converge to <1e-3 px for lens models up to
    GoPro-class distortion.
    """
    x = xy_d
    for _ in range(iters):
        d = distort_normalized(x, dist) - x
        x = xy_d - d
    return x


def undistort_keypoints(uv: jnp.ndarray, intr: jnp.ndarray,
                        dist: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Ingest hook: distorted pixel keypoints -> ideal-pinhole pixels.

    Applied once after feature extraction, the entire downstream pipeline
    (matching geometry, RANSAC, triangulation, BA) stays pinhole-exact —
    the undistort-on-ingest design the reference's distortion-carrying
    camera interface implies but never implements.
    """
    xy = pixel_to_normalized(uv, intr)
    xy_u = undistort_normalized(xy, dist, iters=iters)
    u = xy_u[..., 0] * intr[..., 0] + intr[..., 2]
    v = xy_u[..., 1] * intr[..., 1] + intr[..., 3]
    return jnp.stack([u, v], axis=-1)


def reprojection_error(uv: jnp.ndarray, pts_cam: jnp.ndarray, intr: jnp.ndarray):
    """Euclidean pixel reprojection error of camera-frame points
    (CalcReprojectionError, modules/sfm/reconstruction/ProjectionHelper.cpp:32-38)."""
    proj = project_hom(pts_cam, intr)
    d = proj - uv
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-20)
