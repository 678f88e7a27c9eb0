"""Fusion models: early (feature-concat MLP) and joint (end-to-end bimodal).

Parity surfaces:

- ``EarlyFusionMLP``: ``Dropout → 4096→2048 → ReLU → Dropout → 2048→200 →
  ReLU → Dropout → 200→1`` over the concatenated per-case feature vector
  (``3_EarlyFusion/2_EarlyFusion_train.py:242-251``).
- ``BagHistopathologyRNAModel``: ResNet bag features mean-pooled to 2048-d ⊕
  RNA encoder 2048-d → concat 4096 → ``Dropout(0.8) → Linear(4096, 1)``
  (``5_JointFusion/models.py:87-104``; head built at
  ``1_JointFusion_train.py:321-323``). Gradients flow into both encoders.
- ``PatchHistopathologyRNAModel``: per-patch variant
  (``5_JointFusion/models.py:106-117``; its reference dataset is broken —
  ``5_JointFusion/datasets.py:182`` — ours works).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from multimodalbrainsurvival_tpu.models.mil import masked_bag_mean


class EarlyFusionMLP(nn.Module):
    hidden_dims: Sequence[int] = (2048, 200)
    out_features: int = 1
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x.astype(self.dtype)
        for i, h in enumerate(self.hidden_dims):
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            y = nn.Dense(h, dtype=self.dtype, name=f"dense_{i}")(y)
            y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.out_features, name="head")(y.astype(jnp.float32))
        return y


class BagHistopathologyRNAModel(nn.Module):
    """Joint fusion: patch bag + RNA vector → Cox score. End-to-end trainable."""

    resnet: nn.Module
    rna_encoder: nn.Module
    head_dropout: float = 0.8
    out_features: int = 1

    def setup(self):
        self.final_drop = nn.Dropout(self.head_dropout)
        self.final = nn.Dense(self.out_features, name="final")

    def extract(self, patch_bag, rna, mask=None, train: bool = False):
        """Returns the concatenated (B, 4096) bimodal embedding."""
        B, bag, H, W, C = patch_bag.shape
        img = self.resnet.extract(
            patch_bag.reshape(B * bag, H, W, C), train=train
        ).reshape(B, bag, -1)
        img = masked_bag_mean(img, mask)
        rna_feats = self.rna_encoder(rna, train=train)
        return jnp.concatenate([img, rna_feats], axis=1)

    def extract_from_feats(self, feats, rna, mask=None, train: bool = False):
        """Post-ResNet tail of ``extract``: (B, bag, D) per-patch features →
        (B, 4096) bimodal embedding. Split out so alternate patch encoders
        (the int8 serving path, ``models/quantize.py``) reuse the fusion."""
        img = masked_bag_mean(feats, mask)
        rna_feats = self.rna_encoder(rna, train=train)
        return jnp.concatenate([img, rna_feats], axis=1)

    def from_feats(self, feats, rna, mask=None, train: bool = False):
        """Post-ResNet tail of ``__call__`` (scores from per-patch feats)."""
        fused = self.extract_from_feats(feats, rna, mask=mask, train=train)
        fused = self.final_drop(fused, deterministic=not train)
        return self.final(fused)

    def extract_from_all_feats(self, feats, rna_feats, mask=None):
        """Fusion tail when BOTH encoders ran externally (the fully-int8
        serving path: int8 ResNet per-patch feats + int8 RNA embedding,
        ``models/quantize.py``): pool, concat — no encoder invocation."""
        img = masked_bag_mean(feats, mask)
        return jnp.concatenate([img, rna_feats], axis=1)

    def from_all_feats(self, feats, rna_feats, mask=None,
                       train: bool = False):
        fused = self.extract_from_all_feats(feats, rna_feats, mask=mask)
        fused = self.final_drop(fused, deterministic=not train)
        return self.final(fused)

    def extract_from_trunk(self, fmap, rna, mask=None, train: bool = False,
                           from_stage: int = 3):
        """``extract`` continued from a (B, bag, h, w, c) mid-ResNet feature
        map (the int8 frozen trunk's output — ``quantize_trunk: "int8"``
        training mode): trainable ResNet stages + pool via
        ``ResNet.extract_tail``, then the fusion tail."""
        B, bag = fmap.shape[:2]
        feats = self.resnet.extract_tail(
            fmap.reshape((B * bag,) + fmap.shape[2:]),
            train=train, from_stage=from_stage,
        )
        return self.extract_from_feats(feats.reshape(B, bag, -1), rna,
                                       mask=mask, train=train)

    def from_trunk(self, fmap, rna, mask=None, train: bool = False,
                   from_stage: int = 3):
        fused = self.extract_from_trunk(fmap, rna, mask=mask, train=train,
                                        from_stage=from_stage)
        fused = self.final_drop(fused, deterministic=not train)
        return self.final(fused)

    def __call__(self, patch_bag, rna, mask=None, train: bool = False):
        fused = self.extract(patch_bag, rna, mask=mask, train=train)
        fused = self.final_drop(fused, deterministic=not train)
        return self.final(fused)


class PatchHistopathologyRNAModel(nn.Module):
    """Per-patch joint fusion: one patch + RNA vector → score."""

    resnet: nn.Module
    rna_encoder: nn.Module
    head_dropout: float = 0.8
    out_features: int = 1

    def setup(self):
        self.final_drop = nn.Dropout(self.head_dropout)
        self.final = nn.Dense(self.out_features, name="final")

    def __call__(self, patch, rna, train: bool = False):
        img = self.resnet.extract(patch, train=train)
        rna_feats = self.rna_encoder(rna, train=train)
        fused = jnp.concatenate([img, rna_feats], axis=1)
        fused = self.final_drop(fused, deterministic=not train)
        return self.final(fused)
