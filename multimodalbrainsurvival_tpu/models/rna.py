"""RNA-seq encoder: 12,778-gene expression vector → 2048-d embedding → Cox head.

Parity surface: the reference builds the encoder inline as
``Dropout → Linear(12778, 4096) → ReLU → Dropout → Linear(4096, 2048)`` with a
``Linear(2048, 1)`` Cox head, wrapped in ``RNAOnlyModel`` with
``forward``/``extract`` (``2_GeneExpression/1_GeneExpress_train.py:247-257``,
``2_GeneExpression/models.py:8-21``). Torch's ``nn.Dropout()`` default p=0.5.

The hot op is the 12778×4096 matmul — ideal MXU work; dims are exposed as
fields so the hidden axis can be tensor-sharded over a mesh (see
``parallel/sharding.py``).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class RNAEncoder(nn.Module):
    """Dropout → Dense stack; the hot matmuls are plain MXU work.

    A fused Pallas dropout-matmul variant existed through round 1 but
    measured BELOW stock XLA at the weight-load-bound RNA shapes
    (9.5 vs 8.5 TFLOP/s bf16 at M=256 — the op is bound by streaming the
    105 MB weight, which no amount of mask fusion changes), so it was
    removed per the round-1 verdict (docs/DESIGN.md item 7).
    """

    hidden_dims: Sequence[int] = (4096, 2048)
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x.astype(self.dtype)
        for i, h in enumerate(self.hidden_dims):
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            y = nn.Dense(h, dtype=self.dtype, name=f"dense_{i}")(y)
            if i + 1 < len(self.hidden_dims):
                y = nn.relu(y)
        return y.astype(jnp.float32)


class RNAOnlyModel(nn.Module):
    """Encoder + linear Cox head; ``extract`` returns the 2048-d embedding."""

    encoder: nn.Module
    out_features: int = 1

    def setup(self):
        self.final = nn.Dense(self.out_features, name="final")

    def extract(self, rna, train: bool = False):
        return self.encoder(rna, train=train)

    def from_embedding(self, emb):
        """Cox head over an externally-computed 2048-d embedding — the tail
        the int8 serving path (``models/quantize.quantized_mlp``) re-enters
        after running the encoder stack in int8."""
        return self.final(emb)

    def __call__(self, rna, train: bool = False):
        return self.final(self.extract(rna, train=train))
