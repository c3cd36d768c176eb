"""Deep-matcher recall push (VERDICT r2 #4): threshold sweep + fine-tune.

Evaluates precision/recall of the trained LightGlue-class matcher on
held-out SuperPoint pairs across match-score thresholds, optionally
continues fine-tuning, and reports the operating point. The production
gate is the reference's 0.5 (FeatureMatcherLightglue.cpp:118); the sweep
shows what the score distribution supports.

    python scripts/tune_deep_recall.py [--steps 0] [--layers 3]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
WEIGHTS = ROOT / "weights"


def sweep(sp_params, lg_params, n_layers, thresholds, n_pairs=48,
          max_kps=64, seed=99):
    import jax.numpy as jnp
    from eacham_tpu.features.deep import lightglue as lg
    from eacham_tpu.features.deep.train import make_sp_batch

    rng = np.random.default_rng(seed)
    stats = {t: [0, 0, 0] for t in thresholds}       # tp, fp, fn
    for _ in range(n_pairs // 8):
        kp0, d0, m0, kp1, d1, m1, gt = make_sp_batch(
            sp_params, rng, batch=8, max_kps=max_kps)
        scores = None
        for t in thresholds:
            idx, valid, scores = lg.match_deep(
                lg_params, jnp.asarray(kp0), jnp.asarray(d0),
                jnp.asarray(m0), jnp.asarray(kp1), jnp.asarray(d1),
                jnp.asarray(m1), n_layers=n_layers, threshold=t)
            idx, valid = np.asarray(idx), np.asarray(valid)
            correct = (idx == gt) & (gt >= 0)
            stats[t][0] += int((valid & correct).sum())
            stats[t][1] += int((valid & ~correct).sum())
            stats[t][2] += int((~valid & (gt >= 0)).sum())
    out = {}
    for t, (tp, fp, fn) in stats.items():
        out[t] = (tp / max(tp + fp, 1), tp / max(tp + fn, 1))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=0)
    ap.add_argument("--layers", type=int, default=0,
                    help="override layer count (0 = from meta; training "
                         "with a larger count grafts new random layers)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1.5e-4)
    ap.add_argument("--kps", type=int, default=64)
    ap.add_argument("--save", action="store_true")
    args = ap.parse_args()

    import os as _os
    import jax
    if _os.environ.get("EACHAM_CPU"):
        jax.config.update("jax_platforms", "cpu")   # env alone is overridden
    import jax.numpy as jnp
    from eacham_tpu.features.deep import lightglue as lg
    from eacham_tpu.features.deep import superpoint as sp
    from eacham_tpu.features.deep.train import train_lightglue_sp
    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    sp_params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32),
        lg.load_params(WEIGHTS / "superpoint.npz", sp.init_params(key)))
    meta = WEIGHTS / "lightglue.meta"
    n_layers = int([l for l in meta.read_text().splitlines()
                    if l.startswith("n_layers")][0].split("=")[1])
    lg_params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32),
        lg.load_params(WEIGHTS / "lightglue.npz",
                       lg.init_params(key, n_layers=n_layers)))

    if args.layers > n_layers:
        # graft: copy trained layers into a deeper stack, leave the new
        # tail at init (near-identity residual), fine-tune everything
        deep = lg.init_params(jax.random.PRNGKey(1), n_layers=args.layers,
                              n_kps=args.kps)
        flat_src = dict(jax.tree_util.tree_flatten_with_path(lg_params)[0])
        flat_dst, treedef = jax.tree_util.tree_flatten_with_path(deep)
        leaves = []
        for kp, v in flat_dst:
            leaves.append(flat_src.get(kp, v))
        lg_params = jax.tree_util.tree_unflatten(treedef, leaves)
        n_layers = args.layers
        print(f"grafted to {n_layers} layers", flush=True)

    ths = [0.3, 0.4, 0.5, 0.6]
    res0 = res = sweep(sp_params, lg_params, n_layers, ths)
    for t, (p, r) in res.items():
        print(f"before: thr={t:.2f} precision={p:.3f} recall={r:.3f}",
              flush=True)

    if args.steps > 0:
        t0 = time.perf_counter()
        lg_params, losses = train_lightglue_sp(
            sp_params, steps=args.steps, batch=args.batch, lr=args.lr,
            n_layers=n_layers, params=lg_params, n_kps=args.kps)
        print(f"trained {args.steps} steps in "
              f"{time.perf_counter() - t0:.0f}s, "
              f"final loss {np.mean(losses[-20:]):.4f}", flush=True)
        res = sweep(sp_params, lg_params, n_layers, ths)
        for t, (p, r) in res.items():
            print(f"after:  thr={t:.2f} precision={p:.3f} recall={r:.3f}",
                  flush=True)
        if args.save:
            p5, r5 = res[0.5]
            p0, r0 = res0[0.5]
            f1_new = 2 * p5 * r5 / max(p5 + r5, 1e-9)
            f1_old = 2 * p0 * r0 / max(p0 + r0, 1e-9)
            if f1_new <= f1_old:
                print(f"NOT saved (F1 {f1_old:.3f} -> {f1_new:.3f})")
                return
            lg.save_params(WEIGHTS / "lightglue.npz", lg_params)
            meta.write_text(
                f"n_layers={n_layers}\nsteps=+{args.steps}\n"
                f"finetune=scripts/tune_deep_recall.py (on SuperPoint "
                f"outputs)\nprecision={p5:.3f} (held-out SuperPoint-output "
                f"pairs)\nrecall={r5:.3f}\n")
            print("saved weights/lightglue.npz + meta", flush=True)


if __name__ == "__main__":
    main()
