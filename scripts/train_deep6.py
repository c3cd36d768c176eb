"""Train the 6-layer scanned LightGlue matcher (VERDICT r4 deep-path push).

Two phases, mirroring how the r3 3-layer weights were produced but at
reference capacity (the reference's LightGlue is a deep adaptive-depth
transformer, FeatureMatcherLightglue.cpp:10-131):

  1. random-descriptor pretrain (geometry-free assignment skill)
  2. SuperPoint-output fine-tune at production keypoint counts
     (224x168 textured renders, K=128; production runs K=512 on 512x384 —
     same keypoint density)

Deep supervision at every layer makes early-exit depths usable
(match_deep_adaptive). Held-out precision/recall is evaluated at full
depth AND adaptive depth, and weights are saved to
weights/lightglue_scan.npz when the recall gate improves.

    python scripts/train_deep6.py --pretrain 4000 --finetune 3000
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
WEIGHTS = ROOT / "weights"


def evaluate_scan(sp_params, params, n_layers, n_pairs=48, max_kps=128,
                  seed=99, adaptive=False, width=224, height=168,
                  n_blobs=110):
    """Held-out precision/recall of the scan matcher on SuperPoint pairs."""
    import jax.numpy as jnp
    from eacham_tpu.features.deep import lightglue as lg
    from eacham_tpu.features.deep.train import make_sp_batch

    rng = np.random.default_rng(seed)
    tp = fp = fn = 0
    depths = []
    for _ in range(max(n_pairs // 8, 1)):
        kp0, d0, m0, kp1, d1, m1, gt = make_sp_batch(
            sp_params, rng, batch=8, width=width, height=height,
            n_blobs=n_blobs, max_kps=max_kps)
        a = (jnp.asarray(kp0), jnp.asarray(d0), jnp.asarray(m0),
             jnp.asarray(kp1), jnp.asarray(d1), jnp.asarray(m1))
        if adaptive:
            idx, valid, _, depth = lg.match_deep_adaptive(
                params, *a, n_layers=n_layers)
            depths.append(int(depth))
        else:
            idx, valid, _ = lg.match_deep_scan(params, *a, n_layers=n_layers)
        idx, valid = np.asarray(idx), np.asarray(valid)
        correct = (idx == gt) & (gt >= 0)
        tp += int((valid & correct).sum())
        fp += int((valid & ~correct).sum())
        fn += int((~valid & (gt >= 0)).sum())
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return prec, rec, (float(np.mean(depths)) if depths else n_layers)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--pretrain", type=int, default=4000)
    ap.add_argument("--finetune", type=int, default=3000)
    ap.add_argument("--kps", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr-pre", type=float, default=3e-4)
    ap.add_argument("--lr-ft", type=float, default=2e-4)
    ap.add_argument("--pool", type=int, default=400,
                    help="pre-rendered fine-tune batch pool size (cycled); "
                         "rendering dominates fine-tune wall time otherwise")
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="initialize from weights/lightglue_scan.npz "
                         "(e.g. pretrain in one invocation, fine-tune in "
                         "a later one)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from eacham_tpu.features.deep import lightglue as lg
    from eacham_tpu.features.deep import superpoint as sp
    from eacham_tpu.features.deep.train import (
        _scan_loss, make_sp_batch, train_lightglue_scan,
    )
    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    sp_params = sp.init_params(key)
    sp_params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32),
        lg.load_params(WEIGHTS / "superpoint.npz", sp_params))

    L = args.layers
    t0 = time.time()

    # ---- phase 1: random-descriptor pretrain ------------------------------
    params = None
    if args.resume and (WEIGHTS / "lightglue_scan.npz").exists():
        from eacham_tpu.features.deep.lightglue import init_params_scan
        params = init_params_scan(key, n_layers=L, n_kps=64)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32),
            lg.load_params(WEIGHTS / "lightglue_scan.npz", params))
        print("resumed from weights/lightglue_scan.npz", flush=True)
    if args.pretrain > 0:
        print(f"== pretrain {args.pretrain} steps (L={L}) ==", flush=True)
        params, _ = train_lightglue_scan(
            steps=args.pretrain, batch=args.batch, lr=args.lr_pre,
            n_layers=L, n_kps=64, log_every=200, params=params)
        print(f"pretrain done in {time.time()-t0:.0f}s", flush=True)

    # ---- phase 2: SuperPoint-output fine-tune at production K -------------
    if args.finetune > 0:
        from eacham_tpu.features.deep.lightglue import (
            LightGlueScan, init_params_scan,
        )
        rng = np.random.default_rng(1)
        if params is None:
            params = init_params_scan(key, n_layers=L, n_kps=args.kps)
        model = LightGlueScan(n_layers=L)
        warmup = max(50, args.finetune // 20)
        sched = optax.warmup_cosine_decay_schedule(
            0.0, args.lr_ft, warmup_steps=warmup,
            decay_steps=max(args.finetune, warmup + 1),
            end_value=args.lr_ft * 0.2)
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, kp0, d0, m0, kp1, d1, m1, gt):
            def loss_fn(p):
                return _scan_loss(model, p, kp0, d0, m0, kp1, d1, m1, gt)
            (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, l, aux

        # pool > 0: pre-render and cycle (fast, some reuse); pool == 0:
        # stream FRESH batches every step, alternating easy/hard configs —
        # slower per step but no epoch reuse (the r4 pool run measured
        # held-out recall 0.22 vs the streaming 3-layer run's 0.52: reuse
        # overfits the matcher to the pool's specific distractor layouts)
        cfgs = [dict(width=160, height=120, n_blobs=70,
                     max_kps=min(args.kps, 64)),
                dict(width=224, height=168, n_blobs=110, max_kps=args.kps)]
        if args.pool > 0:
            print(f"== rendering fine-tune pool ({args.pool} batches) ==",
                  flush=True)
            tp0 = time.time()
            pool = [make_sp_batch(sp_params, rng, batch=args.batch,
                                  **cfgs[1])
                    for _ in range(args.pool)]
            print(f"pool rendered in {time.time()-tp0:.0f}s", flush=True)
            order = np.arange(len(pool))
        for i in range(args.finetune):
            if args.pool > 0:
                if i % len(pool) == 0:
                    rng.shuffle(order)
                b = pool[order[i % len(pool)]]
            else:
                b = make_sp_batch(sp_params, rng, batch=args.batch,
                                  **cfgs[i % 2])
            params, opt_state, l, aux = step(
                params, opt_state, *(jnp.asarray(x) for x in b))
            if i % 200 == 0:
                print(f"[ft] step {i}: loss {float(l):.4f} "
                      f"(nll {float(aux[0]):.3f} bce {float(aux[1]):.3f})",
                      flush=True)
        print(f"finetune done at {time.time()-t0:.0f}s", flush=True)

    # ---- held-out evaluation ----------------------------------------------
    prec, rec, _ = evaluate_scan(sp_params, params, L, seed=99)
    pa, ra, depth = evaluate_scan(sp_params, params, L, seed=99,
                                  adaptive=True)
    print(json.dumps({
        "n_layers": L, "precision": round(prec, 3), "recall": round(rec, 3),
        "adaptive_precision": round(pa, 3), "adaptive_recall": round(ra, 3),
        "adaptive_mean_depth": round(depth, 2),
        "train_s": round(time.time() - t0, 0),
    }))
    if args.save:
        lg.save_params(WEIGHTS / "lightglue_scan.npz", params)
        (WEIGHTS / "lightglue_scan.meta").write_text(
            f"model=scan\nn_layers={L}\n"
            f"pretrain_steps={args.pretrain}\nfinetune_steps={args.finetune}\n"
            f"finetune_kps={args.kps}\n"
            f"precision={prec:.3f}\nrecall={rec:.3f}\n"
            f"adaptive_precision={pa:.3f}\nadaptive_recall={ra:.3f}\n"
            f"adaptive_mean_depth={depth:.2f}\n")
        print(f"saved {WEIGHTS/'lightglue_scan.npz'}")


if __name__ == "__main__":
    main()
