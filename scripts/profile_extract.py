"""Per-stage timing of feature extraction at bench shapes.

Times the pyramid, detection, and description separately (all jitted at
[H, W] frame granularity, vmapped over a small frame chunk like the
production scan step does), plus the full extract_features path. Two reps
per stage: run0 = compile+run, run1 = steady state. np.asarray fetches.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from eacham_tpu.features.detector import (
        octave_stacks, detect_from_stacks,
    )
    from eacham_tpu.features.descriptor import describe_from_stacks
    from eacham_tpu.features.frontend import extract_features
    from eacham_tpu.utils.cache import enable_compilation_cache
    from eacham_tpu.utils.synthetic import make_blob_scene, render_view

    enable_compilation_cache()
    N, W, H, K = 100, 512, 384, 512
    rng = np.random.default_rng(0)
    f = 1.2 * max(W, H)
    intr = np.array([f, f, W / 2, H / 2], np.float32)
    blobs = make_blob_scene(rng, n_blobs=900, depth=(3.5, 9.0), spread=2.6)
    T = np.eye(4, dtype=np.float32)
    imgs = np.stack([
        render_view(blobs, T, intr, W, H) for _ in range(8)
    ])
    imgs = jnp.asarray(imgs)
    batch = jnp.asarray(np.tile(np.asarray(imgs), (13, 1, 1))[:N])

    def clock(label, thunk, reps=2):
        out = None
        for r in range(reps):
            t0 = time.perf_counter()
            out = thunk()
            jax.tree_util.tree_map(
                lambda a: np.asarray(a) if hasattr(a, "shape") else a, out)
            print(f"{label:40s} run{r}: {time.perf_counter() - t0:7.2f} s",
                  flush=True)
        return out

    pyr_j = jax.jit(lambda im: jax.vmap(lambda x: octave_stacks(x, 3))(im))
    stacks = clock("octave_stacks x8 frames", lambda: pyr_j(imgs))

    det_j = jax.jit(lambda st: jax.vmap(
        lambda s: detect_from_stacks(s, max_keypoints=K))(st))
    det = clock("detect_from_stacks x8", lambda: det_j(stacks))
    xy, sidx, score, mask = det

    desc_j = jax.jit(lambda st, xy, si, m: jax.vmap(describe_from_stacks)(
        st, xy, si, m))
    clock("describe_from_stacks x8", lambda: desc_j(stacks, xy, sidx, mask))

    clock(f"extract_features N={N}", lambda: extract_features(
        batch, max_keypoints=K))


if __name__ == "__main__":
    main()
