"""The shipped trained LightGlue weights must actually match.

Runs the committed checkpoint (weights/lightglue.npz, trained by
scripts/train_deep.py on synthetic correspondence sets) on held-out data:
noisy shared descriptors + 30% outliers, shuffled. Guards both the
checkpoint files and the architecture against silent drift.
"""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

WEIGHTS = Path(__file__).resolve().parent.parent / "weights"


@pytest.mark.skipif(
    not (WEIGHTS / "lightglue.npz").exists(),
    reason="no trained weights checked in",
)
def test_lightglue_checkpoint_matches():
    from eacham_tpu.features.deep import lightglue as lg

    meta = (WEIGHTS / "lightglue.meta").read_text()
    n_layers = int([l for l in meta.splitlines() if l.startswith("n_layers")][0]
                   .split("=")[1])
    like = lg.init_params(jax.random.PRNGKey(0), n_layers=n_layers)
    params = lg.load_params(WEIGHTS / "lightglue.npz", like)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), params)

    rng = np.random.default_rng(99)
    N = 64
    kp0 = rng.uniform(-1, 1, (1, N, 2)).astype(np.float32)
    kp1 = (kp0 + rng.normal(scale=0.01, size=kp0.shape)).astype(np.float32)
    d = rng.normal(size=(1, N, 256)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nscale = 0.5 / np.sqrt(256)
    d0 = d + nscale * rng.normal(size=d.shape).astype(np.float32)
    d1 = d + nscale * rng.normal(size=d.shape).astype(np.float32)
    outlier = rng.random((1, N)) < 0.3
    dd = rng.normal(size=(1, N, 256)).astype(np.float32)
    d1 = np.where(outlier[..., None], dd, d1)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    perm = rng.permutation(N)
    kp1 = kp1[:, perm]
    d1 = d1[:, perm]
    gt = np.where(outlier[0], -1, np.argsort(perm))

    mask = jnp.ones((1, N), bool)
    idx, valid, _ = lg.match_deep(
        params, jnp.asarray(kp0), jnp.asarray(d0), mask,
        jnp.asarray(kp1), jnp.asarray(d1), mask, n_layers=n_layers)
    idx = np.asarray(idx[0])
    valid = np.asarray(valid[0])
    tp = sum(1 for i in range(N) if valid[i] and gt[i] == idx[i])
    fp = sum(1 for i in range(N) if valid[i] and gt[i] != idx[i])
    fn = sum(1 for i in range(N) if not valid[i] and gt[i] >= 0)
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    assert precision > 0.9, (precision, recall)
    assert recall > 0.5, (precision, recall)
