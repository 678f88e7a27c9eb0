from multimodalbrainsurvival_tpu.ops.pallas.dropout_matmul import (
    apply_seeded_dropout,
    dropout_matmul,
)

__all__ = ["dropout_matmul", "apply_seeded_dropout"]
