"""Fine-tune LightGlue on SuperPoint outputs (domain-matched training).

Round-1 weights were trained on random unit-vector descriptors — a domain
the production matcher never sees (VERDICT r1 #4). This script fine-tunes
on features from the actual SuperPoint forward pass over textured,
photometrically-augmented renders, evaluates match precision/recall before
and after, and saves to weights/lightglue.npz when improved.

    python scripts/train_deep_sp.py --steps 1500
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
WEIGHTS = ROOT / "weights"


def evaluate(sp_params, lg_params, n_layers, n_pairs=24, max_kps=64, seed=99,
             world="blob", threshold=0.15):
    """Precision/recall of thresholded matches against GT labels on fresh
    SuperPoint batches."""
    import jax.numpy as jnp
    from eacham_tpu.features.deep import lightglue as lg
    from eacham_tpu.features.deep.train import make_sp_batch

    rng = np.random.default_rng(seed)
    tp = fp = fn = 0
    for _ in range(n_pairs // 8):
        kp0, d0, m0, kp1, d1, m1, gt = make_sp_batch(
            sp_params, rng, batch=8, max_kps=max_kps, world=world)
        idx, valid, score = lg.match_deep(
            lg_params, jnp.asarray(kp0), jnp.asarray(d0), jnp.asarray(m0),
            jnp.asarray(kp1), jnp.asarray(d1), jnp.asarray(m1),
            n_layers=n_layers, threshold=threshold)
        idx, valid = np.asarray(idx), np.asarray(valid)
        correct = (idx == gt) & (gt >= 0)
        tp += int((valid & correct).sum())
        fp += int((valid & ~correct).sum())
        fn += int((~valid & (gt >= 0)).sum())
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return prec, rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--kps", type=int, default=64)
    ap.add_argument("--from-scratch", action="store_true")
    ap.add_argument("--init", default=None,
                    help="load matcher params from this .npz instead of "
                         "weights/lightglue.npz (chunked/resumable runs)")
    ap.add_argument("--world", default="blob",
                    choices=["blob", "surface", "mix"])
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--seed", type=int, default=0,
                    help="data/optimizer seed (chunked runs vary it so "
                         "chunks do not repeat the same batches)")
    ap.add_argument("--eval-only", action="store_true",
                    help="evaluate --init (or production weights) on both "
                         "domains and exit")
    ap.add_argument("--skip-eval", action="store_true",
                    help="skip the before/after precision/recall evals "
                         "(chunked runs evaluate once at the end)")
    ap.add_argument("--out", default=None,
                    help="save to this path unconditionally (skips the F1 gate)")
    ap.add_argument("--save", action="store_true",
                    help="overwrite weights/lightglue.npz when improved")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from eacham_tpu.features.deep import lightglue as lg
    from eacham_tpu.features.deep import superpoint as sp
    from eacham_tpu.features.deep.train import train_lightglue_sp
    from eacham_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    sp_params = sp.init_params(key)
    sp_params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32),
        lg.load_params(WEIGHTS / "superpoint.npz", sp_params))

    n_layers = 3
    meta = WEIGHTS / "lightglue.meta"
    if meta.exists():
        n_layers = int([l for l in meta.read_text().splitlines()
                        if l.startswith("n_layers")][0].split("=")[1])
    lg_params = None
    init_path = Path(args.init) if args.init else (WEIGHTS / "lightglue.npz")
    if not args.from_scratch and init_path.exists():
        lg_params = lg.init_params(key, n_layers=n_layers, n_kps=args.kps)
        lg_params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32),
            lg.load_params(init_path, lg_params))
        print(f"init from {init_path}", flush=True)

    if lg_params is not None and not args.skip_eval:
        p0, r0 = evaluate(sp_params, lg_params, n_layers, max_kps=args.kps)
        ps0, rs0 = evaluate(sp_params, lg_params, n_layers,
                            max_kps=args.kps, world="surface")
        print(f"before: blob precision {p0:.3f} recall {r0:.3f} | "
              f"surface precision {ps0:.3f} recall {rs0:.3f}", flush=True)
    else:
        p0 = r0 = 0.0

    if args.eval_only:
        assert lg_params is not None, "--eval-only needs weights"
        for w in ("blob", "surface"):
            pr, rc = evaluate(sp_params, lg_params, n_layers,
                              max_kps=args.kps, world=w)
            print(f"eval[{w}]: precision {pr:.3f} recall {rc:.3f}",
                  flush=True)
        return

    t0 = time.perf_counter()
    params, losses = train_lightglue_sp(
        sp_params, steps=args.steps, batch=args.batch, lr=args.lr,
        n_layers=n_layers, params=lg_params, n_kps=args.kps,
        world=args.world, seed=args.seed,
        width=args.width, height=args.height, workers=3)
    print(f"trained {args.steps} steps in {time.perf_counter() - t0:.0f}s, "
          f"final loss {np.mean(losses[-20:]):.4f}", flush=True)

    if args.out:
        lg.save_params(Path(args.out), params)
        print(f"saved {args.out}", flush=True)
    if args.skip_eval:
        print("CHUNK DONE", flush=True)
        return
    p1, r1 = evaluate(sp_params, params, n_layers, max_kps=args.kps)
    ps1, rs1 = evaluate(sp_params, params, n_layers,
                        max_kps=args.kps, world="surface")
    print(f"after:  blob precision {p1:.3f} recall {r1:.3f} | "
          f"surface precision {ps1:.3f} recall {rs1:.3f}")

    f1_0 = 2 * p0 * r0 / max(p0 + r0, 1e-9)
    f1_1 = 2 * p1 * r1 / max(p1 + r1, 1e-9)
    if args.save and f1_1 > f1_0:
        lg.save_params(WEIGHTS / "lightglue.npz", params)
        print(f"saved weights/lightglue.npz (F1 {f1_0:.3f} -> {f1_1:.3f})")
    elif args.save:
        print(f"NOT saved (F1 {f1_0:.3f} -> {f1_1:.3f})")


if __name__ == "__main__":
    main()
