"""MIL aggregation models: bag of patches → embedding → Cox/classification head.

Parity surface (``1_HistoPathology/models.py:35-88``):

- ``AggregationModel``: per-patch ResNet embed → aggregator → mean over bag →
  linear head; ``extract`` returns the bag embedding, ``__call__`` returns
  ``(scores, attention_weights)``.
- ``AggregationProjectModel``: adds ``project → tanh → dropout`` between the
  bag mean and the head (``models.py:59-88``).

TPU-first differences: NHWC patch layout ``(B, bag, H, W, C)``, static padded
bags with a ``(B, bag)`` mask, masked mean (exactly equal to the reference's
plain mean when the bag is full), and a compute-dtype knob for bf16.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def masked_bag_mean(x, mask):
    """Mean over the bag axis counting only real patches. x: (B, bag, D)."""
    if mask is None:
        return jnp.mean(x, axis=1)
    m = mask.astype(x.dtype)[..., None]
    n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return jnp.sum(x * m, axis=1) / n


class AggregationModel(nn.Module):
    resnet: nn.Module
    aggregator: nn.Module
    aggregator_dim: int = 2048
    out_features: int = 1

    def setup(self):
        self.fc = nn.Dense(self.out_features, name="fc")

    def extract(self, x, mask=None, train: bool = False):
        """(B, bag, H, W, C) → ((B, D) bag embedding, (B, bag) attention)."""
        B, bag, H, W, C = x.shape
        feats = self.resnet.extract(x.reshape(B * bag, H, W, C), train=train)
        return self.extract_from_feats(feats.reshape(B, bag, -1), mask=mask,
                                       train=train)

    def extract_from_feats(self, feats, mask=None, train: bool = False):
        """Post-ResNet tail of ``extract``: (B, bag, D) per-patch features →
        bag embedding. Split out so alternate patch encoders (the int8
        serving path, ``models/quantize.py``) can reuse the aggregator."""
        feats, attention = self.aggregator(feats, mask=mask, train=train)
        return masked_bag_mean(feats, mask), attention

    def from_feats(self, feats, mask=None, train: bool = False):
        """Post-ResNet tail of ``__call__`` (scores from per-patch feats)."""
        feats, attention = self.extract_from_feats(feats, mask=mask,
                                                   train=train)
        return self.fc(feats), attention

    def extract_from_trunk(self, fmap, mask=None, train: bool = False,
                           from_stage: int = 3):
        """``extract`` continued from a (B, bag, h, w, c) mid-network feature
        map (the int8 frozen trunk's output — ``quantize_trunk: "int8"``
        training mode): trainable ResNet stages + pool, then the aggregator
        tail."""
        B, bag = fmap.shape[:2]
        feats = self.resnet.extract_tail(
            fmap.reshape((B * bag,) + fmap.shape[2:]),
            train=train, from_stage=from_stage,
        )
        return self.extract_from_feats(feats.reshape(B, bag, -1), mask=mask,
                                       train=train)

    def from_trunk(self, fmap, mask=None, train: bool = False,
                   from_stage: int = 3):
        feats, attention = self.extract_from_trunk(
            fmap, mask=mask, train=train, from_stage=from_stage
        )
        return self.fc(feats), attention

    def __call__(self, x, mask=None, train: bool = False):
        feats, attention = self.extract(x, mask=mask, train=train)
        return self.fc(feats), attention


class AggregationProjectModel(nn.Module):
    resnet: nn.Module
    aggregator: nn.Module
    aggregator_dim: int = 2048
    out_features: int = 1
    hdim: int = 200
    dropout: float = 0.3

    def setup(self):
        self.project = nn.Dense(self.hdim, name="project")
        self.drop = nn.Dropout(self.dropout)
        self.fc = nn.Dense(self.out_features, name="fc")

    def extract(self, x, mask=None, train: bool = False):
        B, bag, H, W, C = x.shape
        feats = self.resnet.extract(x.reshape(B * bag, H, W, C), train=train)
        return self.extract_from_feats(feats.reshape(B, bag, -1), mask=mask,
                                       train=train)

    def extract_from_feats(self, feats, mask=None, train: bool = False):
        feats, attention = self.aggregator(feats, mask=mask, train=train)
        feats = masked_bag_mean(feats, mask)
        feats = jnp.tanh(self.project(feats))
        feats = self.drop(feats, deterministic=not train)
        return feats, attention

    def from_feats(self, feats, mask=None, train: bool = False):
        feats, attention = self.extract_from_feats(feats, mask=mask,
                                                   train=train)
        return self.fc(feats), attention

    def extract_from_trunk(self, fmap, mask=None, train: bool = False,
                           from_stage: int = 3):
        B, bag = fmap.shape[:2]
        feats = self.resnet.extract_tail(
            fmap.reshape((B * bag,) + fmap.shape[2:]),
            train=train, from_stage=from_stage,
        )
        return self.extract_from_feats(feats.reshape(B, bag, -1), mask=mask,
                                       train=train)

    def from_trunk(self, fmap, mask=None, train: bool = False,
                   from_stage: int = 3):
        feats, attention = self.extract_from_trunk(
            fmap, mask=mask, train=train, from_stage=from_stage
        )
        return self.fc(feats), attention

    def __call__(self, x, mask=None, train: bool = False):
        feats, attention = self.extract(x, mask=mask, train=train)
        return self.fc(feats), attention
