from superdiff_tpu.ops.attention import multihead_attention
from superdiff_tpu.ops.fused_norm import fused_groupnorm_silu

__all__ = ["multihead_attention", "fused_groupnorm_silu"]
