"""Streaming reconstruction demo: a live-style frame source feeding the
incremental pipeline window by window, with checkpoints between windows.

The SENSOR-modality analogue (DataSourceTypes.h:7-18 declares it; the
reference never implements a streaming reconstruction). Any object with
``read() -> (id, gray_image, name) | None`` (io/stream.FrameSource) can
replace ReplaySource — a real camera integration only implements read().

    python examples/stream_reconstruct.py <image_dir> [--window 8]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image_dir")
    ap.add_argument("--window", type=int, default=8,
                    help="frames per processing window")
    ap.add_argument("--max-frames", type=int, default=128)
    ap.add_argument("--max-keypoints", type=int, default=512)
    ap.add_argument("--checkpoint", default="stream_state.npz")
    ap.add_argument("--out", default="transform.json")
    args = ap.parse_args()

    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from eacham_tpu.io.saver import save_positions
    from eacham_tpu.io.stream import ReplaySource, frames
    from eacham_tpu.sfm import SfmOptions
    from eacham_tpu.sfm.streaming import StreamingReconstructor

    source = ReplaySource(args.image_dir)
    rec = None
    window_imgs, window_names = [], []

    def flush():
        nonlocal rec
        if not window_imgs:
            return
        imgs = np.stack(window_imgs)
        if rec is None:
            h, w = imgs.shape[1:]
            rec = StreamingReconstructor(
                image_size=(w, h),
                options=SfmOptions(max_features=args.max_keypoints),
                max_frames=args.max_frames, window=args.window,
            )
        t0 = time.perf_counter()
        stats = rec.process(imgs, names=list(window_names))
        print(f"[stream] +{imgs.shape[0]} frames -> "
              f"registered {stats.get('registered', 0)}/{stats['arrived']} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
        rec.checkpoint(args.checkpoint)
        window_imgs.clear()
        window_names.clear()

    for idx, img, name in frames(source):
        window_imgs.append(img)
        window_names.append(name)
        if len(window_imgs) >= args.window:
            flush()
    flush()

    if rec is None or not rec.initialized:
        print("stream produced no reconstruction")
        return 1

    scene = rec.scene
    valid = np.asarray(scene.pose_valid)[: rec.n_frames]
    poses = np.asarray(scene.pose)[: rec.n_frames]
    intr = np.asarray(scene.intr)
    names = [n for n, v in zip(rec.names, valid) if v]
    save_positions(
        args.out, names, poses[valid],
        width=rec.image_size[0], height=rec.image_size[1],
        cx=float(intr[2]), cy=float(intr[3]),
        fx=float(intr[0]), fy=float(intr[1]),
    )
    print(f"saved {args.out} ({valid.sum()}/{rec.n_frames} frames), "
          f"checkpoint at {args.checkpoint}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
