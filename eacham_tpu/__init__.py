"""eacham_tpu — a TPU-native incremental Structure-from-Motion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++ SfM pipeline (fatlipp/eacham): feature extraction + exhaustive matching,
two-view initialization, incremental PnP registration, multi-view
triangulation, and bundle adjustment with a shared pinhole camera — emitting
Instant-NGP-compatible `transform.json`.

Design stance (TPU-first, not a port):
  * struct-of-arrays, padded/masked state instead of pointer graphs + mutexes
  * batched, fixed-iteration RANSAC instead of adaptive LMEDS loops
  * matmul-based descriptor matching on the MXU
  * Levenberg-Marquardt bundle adjustment with an implicit Schur complement
    solved by preconditioned CG (block-Jacobi), distributable over a
    `jax.sharding.Mesh` with `psum` collectives.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import eacham_tpu` jax-import-free)."""
    if name in ("run_sfm", "resume_sfm", "SfmOptions"):
        from eacham_tpu import sfm

        return getattr(sfm, name)
    if name in ("load_config", "SfmConfig"):
        from eacham_tpu.io import config

        return getattr(config, name)
    raise AttributeError(name)
