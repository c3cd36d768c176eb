from eacham_tpu.ops.attention import attention, masked_attention
from eacham_tpu.ops.match_kernel import match_pair_fused
