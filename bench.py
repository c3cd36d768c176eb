"""Benchmark: end-to-end SfM throughput (frames/s) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is the reference's own meaning of a frame rate
(apps/sfm/main.cpp:62-264): IMAGES IN -> REGISTERED POSES OUT. A 100-frame
synthetic sequence is rendered (untimed) with exact ground truth, then the
timed region runs the full pipeline exactly as the CLI does:

  1. feature extraction on the image batch (HOT LOOP 1, main.cpp:72-79)
  2. exhaustive pair matching (HOT LOOP 2, main.cpp:84-147)
  3. init pair + incremental PnP/triangulation/local-BA sweep + global BA
     (HOT LOOP 3 + global refine, main.cpp:195-231)

All device results are fetched with ``np.asarray`` (block_until_ready is
a no-op on the tunnel platform), and the run is correctness-gated: nearly
all frames must register and the ATE vs ground truth must pass — a
benchmark that reconstructs garbage quickly would be meaningless.

Baseline: the reference publishes no numbers (BASELINE.md,
BASELINE.json "published": {}), so no ratio is invented here.
``vs_baseline`` is reported only when a MEASURED reference figure is
provided — env var ``EACHAM_REFERENCE_FPS`` or a ``REFERENCE_FPS``
file at the repo root containing the reference's frames/s on the same
workload — and is null otherwise.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np


def reference_fps() -> float | None:
    """Measured reference frames/s, if the driver provided one."""
    v = os.environ.get("EACHAM_REFERENCE_FPS")
    if v:
        return float(v)
    f = Path(__file__).parent / "REFERENCE_FPS"
    if f.exists():
        return float(f.read_text().strip())
    return None

N_FRAMES = 100
WIDTH, HEIGHT = 512, 384
MAX_KPS = 512


def render_workload(rng):
    """100-frame orbit through a blob field, with GT poses (untimed)."""
    from eacham_tpu.utils.synthetic import (
        make_blob_scene, orbit_poses, render_view,
    )

    f = 1.2 * max(WIDTH, HEIGHT)
    intr = np.array([f, f, WIDTH / 2, HEIGHT / 2], np.float32)
    scene = make_blob_scene(rng, n_blobs=900, depth=(3.5, 9.0), spread=2.6)
    poses = orbit_poses(N_FRAMES, radius=0.6, step_deg=0.5, advance=0.03)
    images = np.stack([
        render_view(scene, T, intr, WIDTH, HEIGHT) for T in poses
    ])
    return images, poses, intr


def main():
    import jax
    import jax.numpy as jnp
    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from eacham_tpu.features.frontend import extract_features
    from eacham_tpu.sfm import run_sfm, SfmOptions
    from eacham_tpu.utils.evaluate import ate_rmse

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    images_np, poses_gt, intr = render_workload(rng)
    print(f"# rendered {N_FRAMES} frames {WIDTH}x{HEIGHT} "
          f"in {time.perf_counter() - t0:.1f}s", flush=True)
    images = jnp.asarray(images_np)

    opts = SfmOptions(
        min_initial_inliers=100, min_matches=25, match_ratio=0.85,
        init_min_tri_angle_deg=1.0, min_tri_angle_deg=1.0,
        ransac_hyps_e=256, ransac_hyps_h=128, ransac_hyps_pnp=256,
        lm_capacity=16384, refine_max_iters=30, global_max_iters=50,
        match_chunk=32,
        # local BA every 4th registration: r4 sweep (scripts/tune_sweep.py
        # variants) measured 13.5 fps/ATE 0.020 at every=3 vs 18.2 fps/ATE
        # 0.0196 at every=4 (deterministic across repeats; every=5/6 are
        # SLOWER and less accurate) — skipped frames are refined by
        # overlapping windows + interim/global BA
        local_ba_every=4,
        # window-BA gauge freezing (see SfmOptions.local_ba_free_span);
        # override for A/B probes: EACHAM_FREE_SPAN=6 python bench.py
        local_ba_free_span=int(os.environ.get("EACHAM_FREE_SPAN", "0")),
    )

    def full_pipeline():
        """images -> features -> match -> reconstruct, one path (the CLI
        path, eacham_tpu/cli.py run()). Returns (scene, stats, t_extract)."""
        t0 = time.perf_counter()
        xy, desc, score, mask = extract_features(images, max_keypoints=MAX_KPS)
        # fetch to host: the only sync that counts on this platform
        xy_h = np.asarray(xy)
        np.asarray(desc[-1, -1, -1])
        t_extract = time.perf_counter() - t0
        scene, stats = run_sfm(
            xy, desc, mask, image_size=(WIDTH, HEIGHT),
            intr=jnp.asarray(intr), options=opts, verbose=False,
        )
        np.asarray(scene.pose)  # force the final state onto the host
        return scene, stats, t_extract

    # warmup pass compiles every stage; timed pass measures steady state.
    # cold/warm split: new persistent-cache entries = programs compiled
    # fresh this run; a fully warm start writes ~0 new entries.
    cache_dir = enable_compilation_cache()
    def _n_entries():
        try:
            return len(os.listdir(cache_dir)) if cache_dir else -1
        except OSError:
            return -1
    before = _n_entries()
    t0 = time.perf_counter()
    full_pipeline()
    warm_s = time.perf_counter() - t0
    after = _n_entries()
    print(f"# warmup (compile) pass: {warm_s:.1f}s "
          f"(persistent cache: {before} entries before, "
          f"{max(after - before, 0) if after >= 0 else -1} compiled fresh)",
          flush=True)

    t0 = time.perf_counter()
    scene, stats, t_extract = full_pipeline()
    total = time.perf_counter() - t0

    # ---- correctness gate ---------------------------------------------------
    assert stats["registered"] >= N_FRAMES - 5, stats
    valid = np.asarray(scene.pose_valid)
    est = np.asarray(scene.pose)[valid]
    gt = poses_gt[valid]
    c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
    rmse = ate_rmse(c_est, c_gt)
    assert rmse < 0.1, f"ATE {rmse}"
    print(f"# registered {stats['registered']}/{N_FRAMES}, "
          f"landmarks {stats['landmarks']}, ATE {rmse:.4f}, "
          f"extract {t_extract:.2f}s / total {total:.2f}s", flush=True)

    fps = N_FRAMES / total
    ref = reference_fps()
    print(json.dumps({
        "metric": "sfm_frames_per_s",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / ref, 3) if ref else None,
    }))


if __name__ == "__main__":
    main()
