from visuelle2_tpu.ops.pallas.additive_attention import fused_additive_attention
from visuelle2_tpu.ops.pallas.gated_fusion import fused_gated_residual
from visuelle2_tpu.ops.pallas.gated_mha import fused_gated_mha
from visuelle2_tpu.ops.pallas.gru_seq import fused_gru_sequence

__all__ = [
    "fused_additive_attention",
    "fused_gated_mha",
    "fused_gated_residual",
    "fused_gru_sequence",
]
