"""Extract + match two images and save a match overlay.

Equivalent of the reference's example binaries
(modules/onnx/lightglue/example/src/extract_match.cpp:14-68 `lightglue_seq`
and extract_end_2_end.cpp `lightglue_e2e`): resize to max-dim 512, extract,
match, draw. `--frontend classical` uses the DoG+dense-descriptor path;
`--frontend deep` runs the SuperPoint/LightGlue-class models (random or
trained weights via --weights).

    python examples/extract_match.py img1.png img2.png out.png
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def resize_max_dim(img: np.ndarray, max_dim: int = 512) -> np.ndarray:
    """Reference resizes inputs so max(h, w) == 512 (extract_match.cpp:21-27)."""
    from PIL import Image

    h, w = img.shape
    s = max_dim / max(h, w)
    if s >= 1.0:
        return img
    im = Image.fromarray((img * 255).astype("uint8"))
    im = im.resize((int(w * s), int(h * s)), Image.BILINEAR)
    return np.asarray(im, dtype=np.float32) / 255.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image1")
    ap.add_argument("image2")
    ap.add_argument("output", nargs="?", default="matches.png")
    ap.add_argument("--frontend", choices=["classical", "deep"],
                    default="classical")
    ap.add_argument("--max-keypoints", type=int, default=512)
    ap.add_argument("--weights", help="npz weights for the deep models")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image
    from eacham_tpu.utils.viz import draw_matches

    def load(path):
        im = Image.open(path).convert("L")
        return np.asarray(im, dtype=np.float32) / 255.0

    img1 = resize_max_dim(load(args.image1))
    img2 = resize_max_dim(load(args.image2))
    H = max(img1.shape[0], img2.shape[0])
    W = max(img1.shape[1], img2.shape[1])
    batch = np.zeros((2, H, W), np.float32)
    batch[0, :img1.shape[0], :img1.shape[1]] = img1
    batch[1, :img2.shape[0], :img2.shape[1]] = img2
    images = jnp.asarray(batch)

    if args.frontend == "classical":
        from eacham_tpu.features.frontend import extract_features
        from eacham_tpu.features.matching import match_pair

        xy, desc, score, mask = extract_features(
            images, max_keypoints=args.max_keypoints)
        mj, valid = match_pair(desc[0], desc[1], mask[0], mask[1])
    else:
        from eacham_tpu.features.deep import superpoint as sp
        from eacham_tpu.features.deep import lightglue as lg

        key = jax.random.PRNGKey(0)
        sp_params = sp.init_params(key)
        lg_params = lg.init_params(key)
        if args.weights:
            data = Path(args.weights)
            sp_params = lg.load_params(data / "superpoint.npz", sp_params)
            lg_params = lg.load_params(data / "lightglue.npz", lg_params)
        # pad to multiples of 8 for the conv encoder
        H8, W8 = -(-H // 8) * 8, -(-W // 8) * 8
        padded = jnp.zeros((2, H8, W8)).at[:, :H, :W].set(images)
        xy, desc, score, mask = sp.extract_deep(
            sp_params, padded, max_keypoints=args.max_keypoints)
        k0 = lg.normalize_keypoints(xy[0], W, H)[None]
        k1 = lg.normalize_keypoints(xy[1], W, H)[None]
        idx, v, _ = lg.match_deep(
            lg_params, k0, desc[0][None], mask[0][None],
            k1, desc[1][None], mask[1][None])
        mj, valid = idx[0], v[0]

    n = int(jnp.sum(valid))
    print(f"{args.frontend}: {n} matches")
    uv1 = np.asarray(xy[0])
    uv2 = np.asarray(xy[1])[np.asarray(mj)]
    draw_matches(img1, img2, uv1, uv2, np.asarray(valid), args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
