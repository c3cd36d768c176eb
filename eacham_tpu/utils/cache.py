"""Persistent XLA compilation cache.

The whole-reconstruction programs (device sweep, two-view batch, BA) cost
minutes of Mosaic/XLA compilation at reference scale; the cache makes
every run after the first start in seconds. Safe to call multiple times.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    # CPU executables are AOT-compiled against the exact machine-feature
    # set of the compiling process; under feature-masking sandboxes the
    # same host can produce mutually incompatible entries, and loading a
    # mismatched one SIGILLs/SEGVs (observed: nondeterministic crashes in
    # backend_compile / executable.serialize once a mixed cache existed).
    # CPU compiles are cheap anyway — the cache exists for the minutes-long
    # TPU Mosaic/XLA compiles, so only engage it off-CPU.
    if jax.default_backend() == "cpu":
        return ""

    path = Path(
        cache_dir
        or os.environ.get("EACHAM_CACHE_DIR")
        or Path.home() / ".cache" / "eacham_tpu" / "xla"
    )
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    # cache EVERYTHING including sub-0.5s compiles: the r3 warmup audit
    # (JAX_LOG_COMPILES over bench.py) measured 207 XLA compiles totalling
    # 81.5s of which ~170 were small op-by-op programs below the default
    # persistence threshold — they alone cost ~60s of every cold start on
    # the tunnel backend, where even jit(add) takes ~0.4s to compile.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return str(path)
