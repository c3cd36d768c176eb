"""Train the deep frontend on synthetic data and save checkpoints.

Produces weights/superpoint.npz + weights/lightglue.npz (fp16) and prints
held-out matching quality. Scale `--steps` up for better weights.

    python scripts/train_deep.py --sp-steps 800 --lg-steps 3000
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# honor JAX_PLATFORMS even where sitecustomize force-registers a TPU
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def eval_lightglue(params, n_layers, rng, n_eval=20, noise=0.5,
                   outlier_frac=0.3, n_kps=64):
    import jax.numpy as jnp
    from eacham_tpu.features.deep import lightglue as lg

    tp = fp = fn = 0
    for _ in range(n_eval):
        N = n_kps
        kp0 = rng.uniform(-1, 1, (1, N, 2)).astype(np.float32)
        A = np.eye(2) + rng.normal(scale=0.05, size=(2, 2))
        kp1 = kp0 @ A.T + rng.normal(scale=0.01, size=kp0.shape)
        d = rng.normal(size=(1, N, 256)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        nscale = noise / np.sqrt(d.shape[-1])
        d0 = d + nscale * rng.normal(size=d.shape).astype(np.float32)
        d1 = d + nscale * rng.normal(size=d.shape).astype(np.float32)
        outlier = rng.random((1, N)) < outlier_frac
        dd = rng.normal(size=(1, N, 256)).astype(np.float32)
        d1 = np.where(outlier[..., None], dd, d1)
        d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
        d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
        perm = rng.permutation(N)
        kp1 = kp1[:, perm]
        d1 = d1[:, perm]
        inv = np.argsort(perm)
        gt = np.where(outlier[0], -1, inv)

        mask = jnp.ones((1, N), bool)
        idx, valid, _ = lg.match_deep(
            params, jnp.asarray(kp0.astype(np.float32)), jnp.asarray(d0), mask,
            jnp.asarray(kp1.astype(np.float32)), jnp.asarray(d1), mask,
            n_layers=n_layers)
        idx = np.asarray(idx[0])
        valid = np.asarray(valid[0])
        for i in range(N):
            if valid[i]:
                if gt[i] == idx[i]:
                    tp += 1
                else:
                    fp += 1
            elif gt[i] >= 0:
                fn += 1
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return prec, rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sp-steps", type=int, default=600)
    ap.add_argument("--lg-steps", type=int, default=2500)
    ap.add_argument("--lg-layers", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="weights")
    args = ap.parse_args()

    import jax
    from eacham_tpu.features.deep.train import train_superpoint, train_lightglue
    from eacham_tpu.features.deep.lightglue import save_params

    out = Path(args.out)
    out.mkdir(exist_ok=True)
    rng = np.random.default_rng(123)

    if args.lg_steps > 0:
        lg_params, losses = train_lightglue(
            steps=args.lg_steps, batch=args.batch, n_layers=args.lg_layers,
            log_every=200)
        prec, rec = eval_lightglue(lg_params, args.lg_layers, rng)
        print(f"[lightglue] final loss {losses[-1]:.4f}, "
              f"precision {prec:.3f}, recall {rec:.3f}")
        lg16 = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float16), lg_params)
        save_params(out / "lightglue.npz", lg16)
        (out / "lightglue.meta").write_text(
            f"n_layers={args.lg_layers}\nsteps={args.lg_steps}\n"
            f"precision={prec:.3f}\nrecall={rec:.3f}\n")

    if args.sp_steps > 0:
        sp_params, losses = train_superpoint(
            steps=args.sp_steps, batch=args.batch, log_every=100)
        print(f"[superpoint] final loss {losses[-1]:.4f}")
        sp16 = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float16), sp_params)
        save_params(out / "superpoint.npz", sp16)


if __name__ == "__main__":
    main()
