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


class FusedDropoutDense(nn.Module):
    """Dropout→Dense with the mask fused into the matmul (Pallas kernel).

    Param tree is identical to ``nn.Dense`` ({kernel, bias}, same inits), so
    instances named ``dense_<i>`` are checkpoint-compatible with the stock
    path. Eval mode is a plain matmul; train mode calls
    ``ops/pallas/dropout_matmul`` with a seed derived from the ``dropout``
    RNG stream.
    """

    features: int
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y, train: bool = False):
        import jax

        from multimodalbrainsurvival_tpu.ops.pallas import dropout_matmul

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (y.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if train and self.dropout > 0.0:
            seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, 2**31 - 1
            )
            out = dropout_matmul(
                y.astype(self.dtype), kernel.astype(self.dtype), seed,
                self.dropout,
            )
        else:
            out = y.astype(self.dtype) @ kernel.astype(self.dtype)
        return (out + bias).astype(self.dtype)


class RNAEncoder(nn.Module):
    """``use_pallas=True`` routes the training-mode dropout+matmul through the
    fused Pallas kernel (``ops/pallas/dropout_matmul.py``): the dropout mask
    is generated inside the matmul tiles instead of being materialized in
    HBM. Parameters are identical either way, so the flag can be flipped on
    an existing checkpoint.
    """

    hidden_dims: Sequence[int] = (4096, 2048)
    dropout: float = 0.5
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x.astype(self.dtype)
        for i, h in enumerate(self.hidden_dims):
            if self.use_pallas:
                y = FusedDropoutDense(
                    h, dropout=self.dropout, dtype=self.dtype,
                    name=f"dense_{i}",
                )(y, train=train)
            else:
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

    def __call__(self, rna, train: bool = False):
        return self.final(self.extract(rna, train=train))
