"""Floating-point policy for TPU correctness.

On TPU, fp32 ``dot``/``conv`` default to bfloat16 MXU passes (~8 mantissa
bits). That is fine for ranking descriptor similarities but catastrophic
for the geometry stack: DLT null vectors, triangulation, SE(3) chains and
BA Jacobian products accumulate the rounding into trajectory-level drift
(measured: 100-frame bench ATE 0.40 at bf16 vs 0.045 at fp32 — same code,
same scene). The framework therefore forces full-fp32 matmul passes
globally and opts BACK into bf16 only at sites that tolerate it (the
descriptor-similarity matmul — see features/matching.py).

Imported for its side effect by every compute package's ``__init__``.
"""

import os

import jax

if os.environ.get("EACHAM_NO_FP32_POLICY", "") != "1":
    jax.config.update("jax_default_matmul_precision", "highest")

# explicit opt-out for tolerance-hot sites (DEFAULT = fastest = bf16 passes)
FAST = jax.lax.Precision.DEFAULT
