"""Sharded-path scaling measurement on a virtual CPU mesh.

Real multi-chip ICI scaling needs hardware this environment doesn't have
(one chip via a tunnel); this script validates the *sharding structure* —
pair-matrix matching and observation-sharded BA — and measures speedup on
N virtual CPU devices (bounded by host cores, so treat the numbers as a
lower bound / smoke signal, not an ICI efficiency claim).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/scaling_bench.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    from eacham_tpu.ba.core import BAConfig, refine_ba
    from eacham_tpu.features.matching import match_all_pairs
    from eacham_tpu.parallel import make_mesh, match_all_pairs_sharded, refine_ba_sharded
    from eacham_tpu.sfm.matches import all_pairs_index
    from tests.test_parallel import _random_problem

    rng = np.random.default_rng(0)

    # --- matching: 48 frames x 512 kps -> 1128 pairs -----------------------
    N, K, D = 48, 512, 256
    desc = rng.normal(size=(N, K, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    desc = jnp.asarray(desc)
    mask = jnp.ones((N, K), bool)
    pair_idx = jnp.asarray(all_pairs_index(N))

    def t_once(fn):
        fn()
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    t1 = t_once(lambda: np.asarray(
        match_all_pairs(desc, mask, pair_idx, chunk=32)[2]))
    for nd in (2, 4, 8):
        mesh = make_mesh(nd)
        tn = t_once(lambda: np.asarray(match_all_pairs_sharded(
            desc, mask, pair_idx, mesh, chunk=32)[2]))
        print(f"matching x{nd}: {t1 / tn:.2f}x speedup "
              f"({t1 * 1e3:.0f} -> {tn * 1e3:.0f} ms), "
              f"efficiency {t1 / tn / nd * 100:.0f}%")

    # --- BA: shared problem, obs axis sharded ------------------------------
    prob, _, _ = _random_problem(np.random.default_rng(1))
    cfg = BAConfig(max_iters=15, cg_iters=20, solver="pcg")
    t1 = t_once(lambda: np.asarray(refine_ba(prob, cfg)[0]))
    for nd in (2, 4, 8):
        mesh = make_mesh(nd)
        tn = t_once(lambda: np.asarray(refine_ba_sharded(prob, cfg, mesh)[0]))
        print(f"BA x{nd}: {t1 / tn:.2f}x speedup "
              f"({t1 * 1e3:.0f} -> {tn * 1e3:.0f} ms)")


if __name__ == "__main__":
    main()
