"""Scene checkpoint / resume.

The reference has no intermediate persistence at all — its only artifact
is the final transform.json (SURVEY.md §5 "Checkpoint / resume: none").
Here the whole reconstruction state (the Scene pytree, §scene.py) is a
flat bundle of arrays, so checkpointing is one npz write; `load_scene`
restores an identical pytree and the pipeline can resume registration on
top (run the device sweep again with more frames, or re-run global BA).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from eacham_tpu.sfm.scene import Scene

_FIELDS = Scene._fields


def save_scene(path: str | Path, scene: Scene, **extra_arrays) -> None:
    """Atomic write (tmp + rename): a process killed mid-save — the
    crash-resume workflow's whole point — must never leave a truncated
    checkpoint behind."""
    path = Path(path)
    data = {f: np.asarray(getattr(scene, f)) for f in _FIELDS}
    for k, v in extra_arrays.items():
        data[f"extra_{k}"] = np.asarray(v)
    # .npz-suffixed tmp name: np.savez appends .npz to any other suffix,
    # and probing for the unsuffixed name could rename a STALE leftover
    # over the live checkpoint
    tmp = path.with_name(path.name + ".tmp.npz")
    np.savez_compressed(tmp, **data)
    tmp.replace(path)


def load_scene(path: str | Path) -> tuple[Scene, dict]:
    with np.load(path) as data:
        kw = {f: jnp.asarray(data[f]) for f in _FIELDS}
        extra = {
            k[len("extra_"):]: np.asarray(v)
            for k, v in data.items() if k.startswith("extra_")
        }
    return Scene(**kw), extra
