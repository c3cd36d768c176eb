"""On-chip micro-bench: fused Pallas match kernel vs plain-jnp matcher.

Decides whether ops/match_kernel.match_pair_fused backs
features.matching.match_all_pairs on TPU (VERDICT r1 #5): run both at
production shapes on the real chip, compare wall time and agreement.

    python scripts/bench_match_kernel.py [--pairs 1024] [--k 1024]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=1024)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from eacham_tpu.features.matching import match_all_pairs
    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)

    rng = np.random.default_rng(0)
    N, K, D = 64, args.k, 256
    desc = rng.normal(size=(N, K, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    # correlated pairs so the decision logic has real work
    for i in range(1, N):
        desc[i, : K // 2] = desc[i - 1, : K // 2]
    desc = jnp.asarray(desc)
    mask = jnp.ones((N, K), bool)
    ii = rng.integers(0, N - 1, size=args.pairs)
    jj = ii + 1
    pair_idx = jnp.asarray(np.stack([ii, jj], -1).astype(np.int32))

    def timed(fn):
        out = fn()                     # compile
        np.asarray(out[0])
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out[0])
            best = min(best, time.perf_counter() - t0)
        return best, out

    t_jnp, out_jnp = timed(lambda: match_all_pairs(
        desc, mask, pair_idx, chunk=args.chunk, backend="jnp"))
    print(f"jnp matcher:   {t_jnp * 1e3:8.1f} ms "
          f"({args.pairs / t_jnp:.0f} pairs/s)")

    t_fus, out_fus = timed(lambda: match_all_pairs(
        desc, mask, pair_idx, chunk=args.chunk, backend="fused"))
    print(f"fused kernel:  {t_fus * 1e3:8.1f} ms "
          f"({args.pairs / t_fus:.0f} pairs/s)")

    mv1, mv2 = np.asarray(out_jnp[1]), np.asarray(out_fus[1])
    mj1, mj2 = np.asarray(out_jnp[0]), np.asarray(out_fus[0])
    agree = (mv1 == mv2).mean()
    match_agree = (mj1[mv1 & mv2] == mj2[mv1 & mv2]).mean()
    print(f"valid agreement {agree * 100:.2f}%, "
          f"match agreement {match_agree * 100:.2f}%, "
          f"speedup {t_jnp / t_fus:.2f}x")


if __name__ == "__main__":
    main()
