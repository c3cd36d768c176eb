"""Fused end-to-end deep matching: two images in, matched pairs out.

Equivalent of the reference's `lightglue_e2e` example binary
(modules/onnx/lightglue/example/src/extract_end_2_end.cpp:15-180), which
runs the single fused ONNX graph `superpoint_lightglue_e2e.onnx`. Here
the fusion is XLA's: `match_images_e2e` traces SuperPoint extraction and
LightGlue matching into ONE compiled program, so keypoints/descriptors
never round-trip to the host between the stages.

    python examples/extract_end2end.py img1.png img2.png [out.png]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image1")
    ap.add_argument("image2")
    ap.add_argument("output", nargs="?", default="matches_e2e.png")
    ap.add_argument("--max-keypoints", type=int, default=512)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--weights", help="directory with deep-frontend .npz")
    args = ap.parse_args()

    import jax.numpy as jnp
    from PIL import Image
    from eacham_tpu.features.deep.frontend import (
        load_frontend_params, match_images_e2e,
    )
    from eacham_tpu.utils.viz import draw_matches
    from examples.extract_match import resize_max_dim

    def load(path):
        im = Image.open(path).convert("L")
        return np.asarray(im, dtype=np.float32) / 255.0

    # reference resizes e2e inputs to max-dim 512 (extract_end_2_end.cpp)
    img1 = resize_max_dim(load(args.image1))
    img2 = resize_max_dim(load(args.image2))
    H = max(img1.shape[0], img2.shape[0])
    W = max(img1.shape[1], img2.shape[1])
    batch = np.zeros((2, H, W), np.float32)
    batch[0, :img1.shape[0], :img1.shape[1]] = img1
    batch[1, :img2.shape[0], :img2.shape[1]] = img2

    sp_params, lg_params, n_layers = load_frontend_params(args.weights)
    uv0, uv1, valid, mscore = match_images_e2e(
        sp_params, lg_params, jnp.asarray(batch),
        max_keypoints=args.max_keypoints, n_layers=n_layers,
        threshold=args.threshold,
    )

    v = np.asarray(valid)
    print(f"e2e: {int(v.sum())} matches "
          f"(mean score {float(np.asarray(mscore)[v].mean()):.3f})"
          if v.any() else "e2e: 0 matches")
    draw_matches(img1, img2, np.asarray(uv0), np.asarray(uv1), v, args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
