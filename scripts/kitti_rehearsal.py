"""Reference-scale (KITTI seq 00 ≈ 4500 frames) end-to-end rehearsal with
crash-resume (VERDICT r4 next #2).

The r4 re-run died in tunnel infrastructure (a remote compile hung >55
min) with nothing persisted. This driver survives that class of failure:

  * features render/extract once into an npz cache (stress_500 format);
  * the reconstruction checkpoints the Scene after every sweep segment
    (SfmOptions.checkpoint_path -> io.checkpoint.save_scene, atomic);
  * the worker runs under a watchdog — no checkpoint/log progress for
    --stall-timeout seconds kills the process group;
  * the outer loop relaunches, and the worker resumes from the last
    checkpoint via resume_sfm (sweeping only still-unregistered frames).

    python scripts/kitti_rehearsal.py --frames 4500
    python scripts/kitti_rehearsal.py --frames 4500 --worker   # one attempt
"""
import argparse
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

CKPT = "/tmp/kitti_rehearsal_scene.npz"
FEAT = "/tmp/stress500_feat.npz"          # share the stress_500 cache
DONE = "/tmp/kitti_rehearsal_done.npz"


def worker(args):
    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    from eacham_tpu.features.frontend import extract_features
    from eacham_tpu.io.checkpoint import load_scene, save_scene
    from eacham_tpu.sfm import run_sfm, resume_sfm, SfmOptions
    from eacham_tpu.utils.evaluate import ate_rmse
    from eacham_tpu.utils.synthetic import make_surface_scene, render_view
    from scripts.anchor_probe import orbit_poses_stress

    N = args.frames
    W, H = 512, 384
    f = 1.2 * max(W, H)
    intr = np.array([f, f, W / 2, H / 2], np.float32)
    poses = orbit_poses_stress(N)

    feat = Path(args.feat)
    t_extract = 0.0
    if feat.exists():
        d = np.load(feat)
        if int(d["n"]) == N:
            xy = jnp.asarray(d["xy"])
            desc = np.asarray(d["desc"]).astype(np.float32)
            mask = jnp.asarray(d["mask"])
            t_extract = float(d["t_extract"]) if "t_extract" in d else 0.0
            print(f"features from cache {feat}", flush=True)
        else:
            raise SystemExit(f"{feat} holds n={int(d['n'])}, want {N} — "
                             "delete it or pass --feat")
    else:
        img_cache = Path(str(feat) + ".imgs.npy")
        if img_cache.exists():
            images = np.load(img_cache, mmap_mode="r")
        else:
            t0 = time.perf_counter()
            rng = np.random.default_rng(0)
            world = make_surface_scene(rng, n_blobs=4000, jitter=0.05)
            images = np.stack([
                render_view(world, T, intr, W, H) for T in poses])
            print(f"rendered {N} in {time.perf_counter() - t0:.0f}s",
                  flush=True)
            np.save(img_cache, images)
        t0 = time.perf_counter()
        parts = []
        for lo in range(0, N, 500):
            part = extract_features(jnp.asarray(images[lo:lo + 500]),
                                    max_keypoints=1024)
            parts.append(tuple(np.asarray(a) for a in part))
            print(f"extract {lo + 500}/{N}", flush=True)
        xy = np.concatenate([p[0] for p in parts])
        desc = np.concatenate([p[1] for p in parts]).astype(np.float32)
        mask = np.concatenate([p[3] for p in parts])
        t_extract = time.perf_counter() - t0
        np.savez(feat, xy=xy, desc=desc, mask=mask, n=N, w=W, h=H,
                 kps=1024, t_extract=t_extract)
        xy, mask = jnp.asarray(xy), jnp.asarray(mask)

    opts = SfmOptions(
        pair_window=10, pair_retrieval_k=3, max_observers=12,
        min_initial_inliers=80, min_matches=20, match_ratio=0.85,
        init_min_tri_angle_deg=0.8, min_tri_angle_deg=0.8,
        ransac_hyps_e=256, ransac_hyps_h=128, ransac_hyps_pnp=256,
        lm_capacity=262144, refine_max_iters=30,
        global_max_iters=args.global_iters,
        match_chunk=32, interim_ba_iters=10,
        local_ba_free_span=6,
        sweep_segment=128, ba_program_iters=10,
        checkpoint_path=args.ckpt, checkpoint_every=1,
    )

    t0 = time.perf_counter()
    if Path(args.ckpt).exists():
        scene, _ = load_scene(args.ckpt)
        print(f"resuming from {args.ckpt} "
              f"({int(np.asarray(scene.pose_valid).sum())} registered)",
              flush=True)
        scene, stats = resume_sfm(scene, options=opts, verbose=True)
    else:
        scene, stats = run_sfm(xy, desc, mask, image_size=(W, H),
                               intr=jnp.asarray(intr), options=opts,
                               verbose=True)
    np.asarray(scene.pose)
    t_recon = time.perf_counter() - t0

    valid = np.asarray(scene.pose_valid)
    est = np.asarray(scene.pose)[valid]
    gt = poses[valid]
    c_est = -np.einsum("nij,ni->nj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("nij,ni->nj", gt[:, :3, :3], gt[:, :3, 3])
    rmse = ate_rmse(c_est, c_gt)
    print(f"REHEARSAL DONE: {stats['registered']}/{N} registered, "
          f"landmarks {stats['landmarks']}, ATE {rmse:.4f}, "
          f"reconstruct {t_recon:.0f}s (+extract {t_extract:.0f}s cached)",
          flush=True)
    save_scene(DONE, scene)


def driver(args):
    """Relaunch the worker until it prints REHEARSAL DONE; kill it (whole
    process group) whenever the log stops advancing for --stall-timeout."""
    log_path = Path(args.log)
    attempt = 0
    while attempt < args.max_attempts:
        attempt += 1
        print(f"[driver] attempt {attempt}", flush=True)
        with open(log_path, "ab") as logf:
            proc = subprocess.Popen(
                [sys.executable, __file__, "--worker",
                 "--frames", str(args.frames),
                 "--global-iters", str(args.global_iters),
                 "--ckpt", args.ckpt, "--feat", args.feat],
                stdout=logf, stderr=subprocess.STDOUT,
                start_new_session=True,
            )
            last_size = -1
            last_progress = time.time()
            while True:
                time.sleep(20)
                rc = proc.poll()
                size = log_path.stat().st_size if log_path.exists() else 0
                if size != last_size:
                    last_size = size
                    last_progress = time.time()
                if rc is not None:
                    break
                if time.time() - last_progress > args.stall_timeout:
                    print(f"[driver] stalled {args.stall_timeout}s — "
                          "killing worker group", flush=True)
                    os.killpg(proc.pid, signal.SIGKILL)
                    proc.wait()
                    rc = -9
                    break
        tail = log_path.read_text(errors="ignore")[-2000:]
        if "REHEARSAL DONE" in tail:
            print("[driver] success", flush=True)
            print("\n".join(tail.splitlines()[-4:]))
            return 0
        print(f"[driver] worker exited rc={rc}; retrying from checkpoint",
              flush=True)
    print("[driver] out of attempts", flush=True)
    return 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4500)
    ap.add_argument("--global-iters", type=int, default=100)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--ckpt", default=CKPT)
    ap.add_argument("--feat", default=FEAT)
    ap.add_argument("--log", default="/tmp/kitti_rehearsal.log")
    ap.add_argument("--stall-timeout", type=int, default=1500,
                    help="no log progress for this long kills the attempt "
                         "(the r4 hang sat silent 55 min in one compile)")
    ap.add_argument("--max-attempts", type=int, default=8)
    args = ap.parse_args()
    if args.worker:
        worker(args)
    else:
        raise SystemExit(driver(args))


if __name__ == "__main__":
    main()
