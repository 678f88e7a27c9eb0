"""MIL bag aggregators: identity, gated tanh attention, transformer.

Reference surface (``1_HistoPathology/models.py:13-33``):

- ``Identity``: passes features through, attention weights all ones.
- ``TanhAttention``: learned gated attention —
  ``softmax_bag(tanh(x W) · v)``, output rescaled by the bag size so the
  downstream mean-over-bag becomes an attention-weighted sum
  (``models.py:32``: ``out = x * w * bag_size``).
- ``transformer``: referenced in every driver (``2_HistoPath_train.py:467``)
  but never defined — it crashes in the reference. Here it is a real pre-LN
  transformer encoder over bag tokens.

All aggregators are mask-aware: bags are statically padded to ``bag_size``
(XLA static shapes) and ``mask`` (B, bag) marks real patches. Softmaxes mask
pads to -inf; the bag-size rescale uses the *real* patch count so padded and
unpadded bags agree exactly (verified in tests).

Every aggregator maps ``(B, bag, D) → ((B, bag, D), (B, bag) weights)``; the
MIL model then takes a masked mean over the bag axis.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

NEG_INF = -1e30


def _bag_count(mask, bag_size):
    if mask is None:
        return float(bag_size)
    return jnp.sum(mask.astype(jnp.float32), axis=1, keepdims=True)  # (B, 1)


class IdentityAggregator(nn.Module):
    """Pass-through; uniform attention over real patches."""

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        B, bag, _ = x.shape
        if mask is None:
            weights = jnp.ones((B, bag), x.dtype)
        else:
            weights = mask.astype(x.dtype)
        return x, weights


class TanhAttention(nn.Module):
    """Gated tanh attention (reference ``TanhAttention``, models.py:22-33)."""

    dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        B, bag, D = x.shape
        v = self.param("vector", nn.initializers.zeros, (self.dim,))
        h = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="linear")(x)
        logits = jnp.einsum("btd,d->bt", jnp.tanh(h).astype(jnp.float32), v)
        if mask is not None:
            logits = jnp.where(mask, logits, NEG_INF)
        weights = nn.softmax(logits, axis=1)  # (B, bag)
        if mask is not None:
            weights = weights * mask.astype(weights.dtype)
        # Rescale by the (real) bag count: downstream masked-mean over the bag
        # then equals the attention-weighted sum (reference models.py:32).
        n = _bag_count(mask, bag)
        out = x * weights[..., None] * jnp.reshape(n, (-1, 1, 1))
        return out, weights


class TransformerAggregator(nn.Module):
    """Pre-LN transformer encoder over bag tokens (working replacement for the
    reference's undefined ``TransformerEncoder``, cf. ``2_HistoPath_train.py:467``).
    """

    num_layers: int = 2
    dim: int = 2048
    num_heads: int = 8
    mlp_dim: int = 2048
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        B, bag, D = x.shape
        attn_mask = None
        if mask is not None:
            # (B, 1, q, kv): every query may attend to real keys only
            attn_mask = mask[:, None, None, :] & jnp.ones(
                (B, 1, bag, 1), bool
            )
        y = x.astype(self.dtype)
        for i in range(self.num_layers):
            z = nn.LayerNorm(dtype=self.dtype, name=f"ln1_{i}")(y)
            z = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                dtype=self.dtype,
                dropout_rate=self.dropout,
                deterministic=not train,
                name=f"attn_{i}",
            )(z, z, mask=attn_mask)
            y = y + z
            z = nn.LayerNorm(dtype=self.dtype, name=f"ln2_{i}")(y)
            z = nn.Dense(self.mlp_dim, dtype=self.dtype, name=f"mlp1_{i}")(z)
            z = nn.gelu(z)
            z = nn.Dropout(self.dropout, deterministic=not train)(z)
            z = nn.Dense(D, dtype=self.dtype, name=f"mlp2_{i}")(z)
            y = y + z
        y = y.astype(jnp.float32)
        if mask is not None:
            weights = mask.astype(jnp.float32)
            y = y * weights[..., None]
        else:
            weights = jnp.ones((B, bag), jnp.float32)
        return y, weights


def make_aggregator(
    name: str,
    dim: int = 2048,
    *,
    hdim: int = 2048,
    transformer_layers: int = 2,
    dropout: float = 0.2,
    dtype: Any = jnp.float32,
):
    """Config-string factory mirroring the reference driver switch
    (``2_HistoPath_train.py:462-468``)."""
    if name == "identity":
        return IdentityAggregator()
    if name == "attention":
        return TanhAttention(dim=dim, dtype=dtype)
    if name == "transformer":
        return TransformerAggregator(
            num_layers=transformer_layers,
            dim=dim,
            mlp_dim=hdim,
            dropout=dropout,
            dtype=dtype,
        )
    raise ValueError(f"Unknown aggregator: {name!r}")
