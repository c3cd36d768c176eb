import eacham_tpu.fp  # noqa: F401  (fp32-matmul policy, must precede tracing)
from eacham_tpu.ba.core import BAProblem, BAConfig, refine_ba, ba_cost
