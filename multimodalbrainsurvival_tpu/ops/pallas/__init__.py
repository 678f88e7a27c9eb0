from multimodalbrainsurvival_tpu.ops.pallas.dropout_matmul import (
    apply_seeded_dropout,
    dropout_matmul,
)
from multimodalbrainsurvival_tpu.ops.pallas.tanh_attention import (
    fused_gated_attention_pool,
)

__all__ = [
    "dropout_matmul",
    "apply_seeded_dropout",
    "fused_gated_attention_pool",
]
