"""Isolate the slow op inside the packed top-2 selection on TPU.

profile_match_parts.py shows one packed top-2 direction costs ~600 ms at
[2048, 1024, 1024] while the producing matmul costs 37 ms; this bench
times candidate implementations of the same reduction to find a fast one.

    python scripts/profile_top2_variants.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from eacham_tpu.features.matching import NEG, _top2_packed
    from eacham_tpu.fp import FAST
    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform, flush=True)

    N, K, D, P, CH = 64, 1024, 256, 2048, 32
    rng = np.random.default_rng(0)
    desc = rng.normal(size=(N, K, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    pairs = rng.integers(0, N, size=(P, 2)).astype(np.int32)
    d = jnp.asarray(desc)
    pi = jnp.asarray(pairs).reshape(-1, CH, 2)

    def scan_over(fn):
        def step(_, pr):
            s = jnp.einsum("ckd,cld->ckl", d[pr[:, 0]], d[pr[:, 1]],
                           preferred_element_type=jnp.float32,
                           precision=FAST)
            out = fn(s)
            return None, out
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
        print(f"{label:46s} {best * 1e3:8.1f} ms", flush=True)

    # baselines
    timed("plain max (rows, axis=2)", scan_over(lambda s: jnp.max(s, 2)))
    timed("plain max (cols, axis=1)", scan_over(lambda s: jnp.max(s, 1)))
    timed("max+argmax (rows)", scan_over(
        lambda s: (jnp.max(s, 2), jnp.argmax(s, 2))))

    # old r2 selection: max/argmax + one-hot-masked second max
    def old_top2(s):
        b = jnp.max(s, 2)
        a = jnp.argmax(s, 2)
        masked = jnp.where(
            jax.nn.one_hot(a, s.shape[2], dtype=bool), NEG, s)
        return b, a, jnp.max(masked, 2)
    timed("old one_hot top-2 (rows)", scan_over(old_top2))

    # current packed int32 (rows)
    timed("packed int32 top-2 (rows)", scan_over(
        lambda s: _top2_packed(s, 2)))

    # float-packed: value quantized to 2^-13, index in the low bits of the
    # float integer range (exact for |v| < 2^24)
    def top2_fpacked(s, axis):
        Kax = s.shape[axis]
        idx = jax.lax.broadcasted_iota(jnp.float32, s.shape, axis)
        q = jnp.round(s * 8192.0) * float(Kax) + idx
        top = jnp.max(q, axis)
        a = jnp.mod(top, float(Kax)).astype(jnp.int32)
        topx = jnp.expand_dims(top, axis)
        q2 = jnp.max(jnp.where(q == topx, -3e7, q), axis)
        return top, a, q2
    timed("packed float top-2 (rows)", scan_over(
        lambda s: top2_fpacked(s, 2)))

    # lax.top_k (sort-based)
    timed("lax.top_k k=2 (rows)", scan_over(
        lambda s: jax.lax.top_k(s, 2)))

    # two-pass float max + argmax + eq-masked second max (no one_hot)
    def eqmask_top2(s):
        b = jnp.max(s, 2)
        a = jnp.argmax(s, 2)
        s2 = jnp.max(jnp.where(s == b[..., None], NEG, s), 2)
        return b, a, s2
    timed("eq-masked float top-2 (rows)", scan_over(eqmask_top2))


if __name__ == "__main__" and "--hier" not in sys.argv:
    main()


def hier_variant():
    """Hierarchical reshape top-2 in plain jnp (appended probe): reduce
    [*, K] as [*, K//128, 128] -> lanes -> sublanes; the flat lane
    reduction is the measured hot spot both in XLA and Mosaic."""
    import jax
    import jax.numpy as jnp
    from eacham_tpu.features.matching import NEG
    from eacham_tpu.fp import FAST
    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np
    N, K, D, P, CH = 64, 1024, 256, 2048, 32
    rng = np.random.default_rng(0)
    desc = rng.normal(size=(N, K, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    pairs = rng.integers(0, N, size=(P, 2)).astype(np.int32)
    d = jnp.asarray(desc)
    pi = jnp.asarray(pairs).reshape(-1, CH, 2)

    def scan_over(fn):
        def step(_, pr):
            s = jnp.einsum("ckd,cld->ckl", d[pr[:, 0]], d[pr[:, 1]],
                           preferred_element_type=jnp.float32,
                           precision=FAST)
            return None, fn(s)
        return jax.jit(lambda: jax.lax.scan(step, None, pi)[1])

    def timed(label, fn):
        import time
        out = fn()
        jax.tree_util.tree_map(np.asarray, out)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            jax.tree_util.tree_map(np.asarray, out)
            best = min(best, time.perf_counter() - t0)
        print(f"{label:46s} {best * 1e3:8.1f} ms", flush=True)

    QS = 16384.0
    IMIN = jnp.int32(-(2 ** 30))

    def top2_hier(s, axis):
        # pack, then reduce [**, K] hierarchically over (K//128, 128)
        Kax = s.shape[axis]
        bits = max(Kax - 1, 1).bit_length()
        idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, axis)
        q = (jnp.round(s * QS).astype(jnp.int32) << bits) | idx
        qm = jnp.moveaxis(q, axis, -1)
        lead = qm.shape[:-1]
        qh = qm.reshape(*lead, Kax // 128, 128)
        m = jnp.max(jnp.max(qh, -1), -1)
        sec = jnp.max(jnp.where(qm == m[..., None], IMIN, qm), -1)
        return m, m & (2 ** bits - 1), sec

    timed("hier packed top-2 (rows)", scan_over(
        lambda s: top2_hier(s, 2)))
    timed("hier packed top-2 (both)", scan_over(
        lambda s: (top2_hier(s, 2), top2_hier(s, 1))))


if __name__ == "__main__":
    hier_variant() if "--hier" in sys.argv else main()
