"""MFU / roofline analysis of the two dominant kernels (VERDICT r2 #5).

1. The pair matcher (features/matching.py): one [K, D] x [D, K] similarity
   matmul per pair + top-2 ratio + mutual check. FLOPs are exact
   (2 K^2 D per pair); the matmul runs bf16 MXU passes (fp.FAST — ranking
   tolerates bf16, measured round 2).
2. One local-BA LM iteration (ba/core.py dense-Schur path) at the
   production window shape (C=16 cams, O=16k observations): FLOPs and
   minimum HBM bytes are counted analytically from the einsum shapes.

Peaks used (TPU v5e, per chip): 197 TFLOP/s bf16, ~49 TFLOP/s fp32
(fp32 dots lower to multi-pass bf16), 819 GB/s HBM.

    python scripts/roofline.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

PEAK_BF16 = 197e12
PEAK_FP32 = 49e12
PEAK_HBM = 819e9


def fetch(x):
    return np.asarray(x)    # block_until_ready is a no-op on the tunnel


def bench_matcher():
    import jax
    import jax.numpy as jnp
    from eacham_tpu.features.matching import match_all_pairs

    N, K, D = 64, 1024, 256
    P = 2048
    rng = np.random.default_rng(0)
    desc = rng.normal(size=(N, K, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    mask = np.ones((N, K), bool)
    pairs = rng.integers(0, N, size=(P, 2)).astype(np.int32)
    pairs = np.where((pairs[:, :1] == pairs[:, 1:]),
                     (pairs + [0, 1]) % N, pairs)
    d, m, pi = jnp.asarray(desc), jnp.asarray(mask), jnp.asarray(pairs)

    # full matcher (matmul + top2 + ratio + mutual)
    fetch(match_all_pairs(d, m, pi, chunk=32)[0])          # compile
    t0 = time.perf_counter()
    fetch(match_all_pairs(d, m, pi, chunk=32)[0])
    t_full = time.perf_counter() - t0

    # similarity matmul alone, same chunking (isolates the MXU op)
    from eacham_tpu.fp import FAST

    @jax.jit
    def sim_only(d, pi):
        def step(_, pr):
            s = jnp.einsum("pkd,pld->pkl", d[pr[:, 0]], d[pr[:, 1]],
                           preferred_element_type=jnp.float32,
                           precision=FAST)
            return None, jnp.sum(s, axis=(1, 2))
        _, out = jax.lax.scan(step, None, pi.reshape(-1, 32, 2))
        return out

    fetch(sim_only(d, pi))
    t0 = time.perf_counter()
    fetch(sim_only(d, pi))
    t_sim = time.perf_counter() - t0

    flops = 2.0 * P * K * K * D
    print(f"[matcher] P={P} K={K} D={D}: full {t_full*1e3:.1f} ms "
          f"({flops/t_full/1e12:.1f} TFLOP/s, "
          f"{100*flops/t_full/PEAK_BF16:.1f}% of bf16 peak); "
          f"sim-matmul alone {t_sim*1e3:.1f} ms "
          f"({flops/t_sim/1e12:.1f} TFLOP/s, "
          f"{100*flops/t_sim/PEAK_BF16:.1f}% of bf16 peak)", flush=True)
    # bandwidth side: bytes touched = descriptors gathered per pair +
    # [K, K] sim tile (stays in VMEM for the fused path; HBM for jnp)
    bytes_min = P * (2 * K * D * 4 + K * K * 4)
    print(f"[matcher] jnp-path HBM floor {bytes_min/1e9:.2f} GB -> "
          f"{bytes_min/t_full/1e9:.0f} GB/s achieved "
          f"({100*bytes_min/t_full/PEAK_HBM:.0f}% of HBM peak)", flush=True)


def bench_local_ba():
    import jax.numpy as jnp
    from eacham_tpu.ba.core import BAConfig, BAProblem, refine_ba

    C, L, O = 16, 4096, 16384
    rng = np.random.default_rng(1)
    # synthetic but realistic window problem
    pts = rng.uniform(-2, 2, size=(L, 3)) + [0, 0, 6]
    poses = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    poses[:, :3, 3] = rng.normal(scale=0.3, size=(C, 3))
    intr = np.array([600.0, 600.0, 320.0, 240.0], np.float32)
    obs_cam = rng.integers(0, C, O).astype(np.int32)
    obs_pt = rng.integers(0, L, O).astype(np.int32)
    pc = np.einsum("oij,oj->oi", poses[obs_cam, :3, :3], pts[obs_pt]) \
        + poses[obs_cam, :3, 3]
    uv = np.stack([intr[0] * pc[:, 0] / pc[:, 2] + intr[2],
                   intr[1] * pc[:, 1] / pc[:, 2] + intr[3]], -1)
    uv += rng.normal(scale=0.5, size=uv.shape)
    prob = BAProblem(
        poses=jnp.asarray(poses), points=jnp.asarray(pts, jnp.float32),
        intr=jnp.asarray(intr),
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(uv, jnp.float32),
        obs_mask=jnp.ones(O, bool),
        cam_in_ba=jnp.ones(C, bool),
        cam_fixed=jnp.zeros(C, bool).at[0].set(True),
        pt_in_ba=jnp.ones(L, bool),
        pt_obs_count=jnp.full(L, O / L, jnp.float32),
    )
    for iters in (1, 11):
        cfg = BAConfig(max_iters=iters, tolerance=0.0, solver="dense")
        fetch(refine_ba(prob, cfg)[0])
        t0 = time.perf_counter()
        fetch(refine_ba(prob, cfg)[0])
        if iters == 1:
            t1 = time.perf_counter() - t0
        else:
            t11 = time.perf_counter() - t0
    t_iter = (t11 - t1) / 10.0

    # analytic FLOPs of one dense-Schur LM iteration (the big terms)
    n6 = 6 * C
    flops = (
        O * 600                      # residuals + analytic Jacobians
        + O * (2 * 6 * 3 * 2)        # W outer products (oki,okj->oij)
        + O * (2 * 36 + 2 * 9) * 2   # JtJ cam + point blocks
        + 2 * L * C * 6 * 3 * 3      # Yc = Wc Vinv
        + 2 * L * C * C * 6 * 6 * 3  # S_cc = Yc Wc^T  (dominant)
        + 2 * (n6 + 2) ** 2 * (n6 // 4)  # CG on the dense S (n/4 matvecs)
    )
    # minimum HBM traffic: Wc + Yc [L,C,6,3] r/w, S_cc [C,6,C,6], jacobians
    tile = 7.0  # measured physical inflation of (…,6,3) minor dims (8,128)
    bytes_min = (
        2 * L * C * 18 * 4 * tile    # Wc write + Yc write
        + 2 * L * C * 18 * 4 * tile  # both read back for S_cc
        + O * (2 * 6 + 2 * 3 + 2) * 4 * 3
        + (n6 + 2) ** 2 * 4 * (n6 // 4)
    )
    print(f"[local BA] C={C} L={L} O={O}: {t_iter*1e3:.1f} ms/LM-iter "
          f"(first-solve incl. setup {t1*1e3:.1f} ms)", flush=True)
    print(f"[local BA] analytic {flops/1e9:.2f} GFLOP/iter -> "
          f"{flops/t_iter/1e12:.3f} TFLOP/s "
          f"({100*flops/t_iter/PEAK_FP32:.2f}% of fp32 peak); "
          f"HBM floor {bytes_min/1e9:.3f} GB -> {bytes_min/t_iter/1e9:.0f} "
          f"GB/s ({100*bytes_min/t_iter/PEAK_HBM:.0f}% of HBM peak)",
          flush=True)


def _make_problem(C, L, O, seed=1):
    import jax.numpy as jnp
    from eacham_tpu.ba.core import BAProblem

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-2, 2, size=(L, 3)) + [0, 0, 6]
    poses = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    poses[:, :3, 3] = rng.normal(scale=0.3, size=(C, 3))
    intr = np.array([600.0, 600.0, 320.0, 240.0], np.float32)
    obs_cam = rng.integers(0, C, O).astype(np.int32)
    obs_pt = rng.integers(0, L, O).astype(np.int32)
    pc = np.einsum("oij,oj->oi", poses[obs_cam, :3, :3], pts[obs_pt]) \
        + poses[obs_cam, :3, 3]
    uv = np.stack([intr[0] * pc[:, 0] / pc[:, 2] + intr[2],
                   intr[1] * pc[:, 1] / pc[:, 2] + intr[3]], -1)
    uv += rng.normal(scale=0.5, size=uv.shape)
    return BAProblem(
        poses=jnp.asarray(poses), points=jnp.asarray(pts, jnp.float32),
        intr=jnp.asarray(intr),
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(uv, jnp.float32),
        obs_mask=jnp.ones(O, bool),
        cam_in_ba=jnp.ones(C, bool),
        cam_fixed=jnp.zeros(C, bool).at[0].set(True),
        pt_in_ba=jnp.ones(L, bool),
        pt_obs_count=jnp.full(L, O / L, jnp.float32),
    )


def bench_ba_solvers():
    """Per-LM-iteration wall time + achieved FLOP/s for the dense-Schur AND
    implicit-PCG global solvers at bench and stress shapes (VERDICT r3 #7).

    FLOPs come from XLA's own cost model (compiled.cost_analysis()), so
    the MFU figures account for what the compiler actually emitted — not
    just the hand-derived dominant terms.
    """
    import jax
    from eacham_tpu.ba.core import BAConfig, refine_ba

    shapes = [
        ("bench-global  (C=100, L=16k, O=49k)", 100, 16384, 49152),
        ("stress-global (C=500, L=64k, O=256k)", 500, 65536, 262144),
    ]
    for label, C, L, O in shapes:
        prob = _make_problem(C, L, O)
        for solver in ("dense", "pcg"):
            try:
                cfg1 = BAConfig(max_iters=1, tolerance=0.0, solver=solver)
                cfg11 = BAConfig(max_iters=11, tolerance=0.0, solver=solver)
                # XLA-estimated FLOPs of the whole 1-iter program
                try:
                    lowered = jax.jit(refine_ba, static_argnums=1).lower(
                        prob, cfg1)
                    cost = lowered.compile().cost_analysis()
                    xla_flops = float((cost or {}).get("flops", 0.0))
                except Exception:
                    xla_flops = 0.0
                fetch(refine_ba(prob, cfg1)[0])
                t0 = time.perf_counter()
                fetch(refine_ba(prob, cfg1)[0])
                t1 = time.perf_counter() - t0
                fetch(refine_ba(prob, cfg11)[0])
                t0 = time.perf_counter()
                fetch(refine_ba(prob, cfg11)[0])
                t11 = time.perf_counter() - t0
                t_iter = max((t11 - t1) / 10.0, 1e-9)
                tfps = xla_flops / t_iter / 1e12 if xla_flops else float("nan")
                print(f"[BA {solver:5s}] {label}: {t_iter*1e3:7.1f} ms/iter "
                      f"(1-iter wall {t1*1e3:.0f} ms); XLA-counted "
                      f"{xla_flops/1e9:.2f} GFLOP/prog -> {tfps:.3f} TFLOP/s "
                      f"({100*tfps*1e12/PEAK_FP32:.2f}% of fp32 peak)",
                      flush=True)
            except Exception as e:  # OOM / unsupported on this backend
                print(f"[BA {solver:5s}] {label}: skipped ({type(e).__name__}: "
                      f"{str(e)[:120]})", flush=True)


if __name__ == "__main__":
    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    bench_matcher()
    bench_local_ba()
    bench_ba_solvers()
