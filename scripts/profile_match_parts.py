"""Attribute the pair-matcher's wall time to its component ops on TPU.

The roofline (scripts/roofline.py) shows the full matcher at ~10x the
similarity matmul's time even after the packed int32 top-2 rewrite; this
microbench isolates WHERE the rest goes: the per-pair descriptor gather,
the masked matmul, each top-2 direction, and the mutual check, all under
the production scan/chunk structure.

    python scripts/profile_match_parts.py [--pairs 2048 --k 1024 --chunk 32]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=2048)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from eacham_tpu.features.matching import NEG, _top2_packed, match_pair
    from eacham_tpu.fp import FAST
    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform, flush=True)

    N, K, D, P, CH = 64, args.k, 256, args.pairs, args.chunk
    rng = np.random.default_rng(0)
    desc = rng.normal(size=(N, K, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    mask = np.ones((N, K), bool)
    pairs = rng.integers(0, N, size=(P, 2)).astype(np.int32)
    pairs = np.where((pairs[:, :1] == pairs[:, 1:]),
                     (pairs + [0, 1]) % N, pairs)
    d = jnp.asarray(desc)
    m = jnp.asarray(mask)
    pi = jnp.asarray(pairs).reshape(-1, CH, 2)

    def scan_over(pair_fn):
        def step(_, pr):
            out = jax.vmap(pair_fn)(pr)
            return None, jax.tree_util.tree_map(
                lambda a: a if a.ndim <= 2 else jnp.sum(a, axis=(1, 2)), out)
        return jax.jit(lambda: jax.lax.scan(step, None, pi)[1])

    def timed(label, fn):
        out = fn()
        jax.tree_util.tree_map(np.asarray, out)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            jax.tree_util.tree_map(np.asarray, out)
            best = min(best, time.perf_counter() - t0)
        print(f"{label:44s} {best * 1e3:8.1f} ms", flush=True)
        return best

    def gather_only(pr):
        return d[pr[0]].sum() + d[pr[1]].sum()

    def matmul(pr):
        s = jnp.dot(d[pr[0]], d[pr[1]].T,
                    preferred_element_type=jnp.float32, precision=FAST)
        return s

    def matmul_masked(pr):
        s = matmul(pr)
        return jnp.where(m[pr[0]][:, None] & m[pr[1]][None, :], s, NEG)

    def top2_one_dir(pr):
        s = matmul_masked(pr)
        b, a, s2 = _top2_packed(s, 1)
        return b + s2, a

    def top2_both(pr):
        s = matmul_masked(pr)
        b12, a12, s12 = _top2_packed(s, 1)
        b21, a21, s21 = _top2_packed(s, 0)
        return b12 + s12, a12, b21 + s21, a21

    def full(pr):
        return match_pair(d[pr[0]], d[pr[1]], m[pr[0]], m[pr[1]])

    timed("gather only", scan_over(gather_only))
    timed("+ matmul", scan_over(matmul))
    timed("+ mask", scan_over(matmul_masked))
    timed("+ packed top-2 (one dir)", scan_over(top2_one_dir))
    timed("+ packed top-2 (both dirs)", scan_over(top2_both))
    timed("full match_pair (ratio+mutual)", scan_over(full))


if __name__ == "__main__":
    main()
