from multimodalbrainsurvival_tpu.ops.pallas.fused_stage import (
    fused_bottleneck_stage,
)
from multimodalbrainsurvival_tpu.ops.pallas.tanh_attention import (
    fused_gated_attention_pool,
)

__all__ = [
    "fused_bottleneck_stage",
    "fused_gated_attention_pool",
]
