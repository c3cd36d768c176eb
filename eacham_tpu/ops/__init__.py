from eacham_tpu.ops.attention import masked_attention
