import eacham_tpu.fp  # noqa: F401  (fp32-matmul policy, must precede tracing)
from eacham_tpu.ops.attention import attention, masked_attention
from eacham_tpu.ops.match_kernel import match_pair_fused
