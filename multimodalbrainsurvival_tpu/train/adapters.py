"""Model adapters: one uniform interface between batches and models.

The reference duplicates its train/eval loops per pipeline because each model
takes different inputs (``patch_bag`` vs ``rna_data`` vs ``feature_data`` vs
both — SURVEY.md §2.3). Here a single generic loop (``train/loop.py``) drives
any model through an adapter that knows (a) which batch keys are device
arrays, (b) how to apply the model in train/eval mode, and (c) how to extract
embeddings. Patch adapters also run the on-device augmentation pipeline
(``ops/image.py``) inside the jitted step.

Adapter contract::

    init(rng, arrays)                      -> variables
    apply(variables, arrays, train, rng)   -> (outputs (B, C), new_batch_stats | None)
    extract(variables, arrays)             -> features (B, D)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax

from multimodalbrainsurvival_tpu.ops.image import preprocess_patches


def _join_variables(params, batch_stats):
    v = {"params": params}
    if batch_stats is not None:
        v["batch_stats"] = batch_stats
    return v


@dataclass
class TableAdapter:
    """Feature-vector models (RNA MLP, early-fusion MLP)."""

    model: Any
    input_key: str = "data"
    sample_mask_key: str = "mask"
    array_keys: tuple = ()
    id_keys: tuple = ("case",)
    loader_kwargs: dict = field(default_factory=dict)

    def __post_init__(self):
        if not self.array_keys:  # derive only when not caller-supplied
            self.array_keys = (self.input_key, self.sample_mask_key)

    def init(self, rng, arrays):
        # jit for the same reason as _PatchAdapterBase.init (one compiled
        # init program instead of eager per-op dispatch)
        return jax.jit(
            lambda r, x: self.model.init(r, x, train=False)
        )(rng, arrays[self.input_key])

    def apply(self, variables, arrays, *, train: bool, rng=None):
        out = self.model.apply(
            variables,
            arrays[self.input_key],
            train=train,
            rngs={"dropout": rng} if train else None,
        )
        return out, None

    def extract(self, variables, arrays):
        return self.model.apply(
            variables, arrays[self.input_key], train=False, method="extract"
        )


@dataclass
class QuantizedTableAdapter(TableAdapter):
    """int8 (W8A8) serving variant of ``TableAdapter`` for the RNA MLP.

    The encoder stack (12,778→4096→2048 — weight-load-bound at serving
    batches, docs/DESIGN.md item 7) runs through
    ``models/quantize.quantized_mlp`` (int8 weights + calibrated int8
    activations); the tiny Cox head reuses the float model via
    ``from_embedding``. Opt-in (``quantize: "int8"`` in the RNA serving
    configs) and eval-only, like ``QuantizedMILAdapter``. ``variables``
    carries the int8 tree alongside the float params
    (``{"params": ..., "qtree": ...}``)."""

    def _embedding(self, variables, arrays):
        from multimodalbrainsurvival_tpu.models.quantize import quantized_mlp

        return quantized_mlp(variables["qtree"], arrays[self.input_key])

    def apply(self, variables, arrays, *, train: bool, rng=None):
        if train:
            raise ValueError("the int8 serving adapter is eval-only")
        out = self.model.apply(
            {"params": variables["params"]},
            self._embedding(variables, arrays),
            method="from_embedding",
        )
        return out, None

    def extract(self, variables, arrays):
        return self._embedding(variables, arrays)


@dataclass
class _PatchAdapterBase:
    """Shared machinery for patch-bag adapters: on-device augmentation,
    train/eval rng routing, and mutable-BN application."""

    model: Any
    augment: bool = True
    sample_mask_key: str = "sample_mask"
    array_keys: tuple = ("patch_bag", "bag_mask", "sample_mask")
    id_keys: tuple = ("WSI", "case")
    loader_kwargs: dict = field(default_factory=dict)

    def _preprocess(self, arrays, train, rng):
        do_aug = train and self.augment
        return preprocess_patches(
            arrays["patch_bag"], train=do_aug, key=rng if do_aug else None,
            dtype=self._preprocess_dtype(),
        )

    def _preprocess_dtype(self):
        # the whole augmentation chain runs in the model's compute dtype —
        # in a bf16 model the f32 jitter chain was ~1.7 ms/step of pure VPU
        # work the conv immediately rounded away (docs/DESIGN.md item 22);
        # f32 models (the default, and every parity test) are bitwise
        # unchanged
        import jax.numpy as jnp

        resnet = getattr(self.model, "resnet", None)
        return getattr(resnet, "dtype", jnp.float32)

    def _model_inputs(self, x, arrays) -> tuple:
        return (x,)

    def init(self, rng, arrays):
        # under jit: eager flax init dispatches every init op separately,
        # which costs minutes of per-op compile + round-trip on a
        # remote-attached chip (measured ~2 min for ResNet-50 through the
        # axon tunnel); one compiled program initializes in seconds
        def _init(rng, arrays):
            x = self._preprocess(arrays, False, None)
            return self.model.init(
                rng, *self._model_inputs(x, arrays), mask=arrays["bag_mask"],
                train=False,
            )

        return jax.jit(_init)(rng, arrays)

    def apply(self, variables, arrays, *, train: bool, rng=None):
        if train and rng is not None:
            rng_img, rng_drop = jax.random.split(rng)
        else:
            rng_img = rng_drop = rng
        x = self._preprocess(arrays, train, rng_img)
        inputs = self._model_inputs(x, arrays)
        batch_stats = variables.get("batch_stats")
        if train:
            # BN-free models (e.g. fold_bn) still train with train=True
            # (dropout active) — just without a mutable batch_stats collection
            out, updates = self.model.apply(
                _join_variables(variables["params"], batch_stats),
                *inputs,
                mask=arrays["bag_mask"],
                train=True,
                mutable=["batch_stats"] if batch_stats is not None else [],
                rngs={"dropout": rng_drop},
            )
            return self._unwrap(out), updates.get("batch_stats")
        out = self.model.apply(
            variables, *inputs, mask=arrays["bag_mask"], train=False
        )
        return self._unwrap(out), None

    def extract(self, variables, arrays):
        x = self._preprocess(arrays, False, None)
        out = self.model.apply(
            variables, *self._model_inputs(x, arrays),
            mask=arrays["bag_mask"], train=False, method="extract",
        )
        return self._unwrap(out)

    @staticmethod
    def _unwrap(out):
        # MIL models return (value, attention_weights); joint models a value
        return out[0] if isinstance(out, tuple) else out


@dataclass
class MILAdapter(_PatchAdapterBase):
    """Patch-bag models (AggregationModel / AggregationProjectModel)."""


@dataclass
class QuantizedMILAdapter(MILAdapter):
    """int8 (W8A8) serving variant of ``MILAdapter.extract``.

    The per-patch ResNet runs through ``models/quantize.quantized_extract``
    (int8 weights + calibrated int8 activations); the aggregator tail reuses
    the float model via ``extract_from_feats`` so aggregator/projection
    params stay exactly the trained ones. Opt-in (``quantize: "int8"`` in
    the serving configs) and eval-only — training and the default serving
    path remain float.

    ``variables`` carries the int8 tree alongside the float params
    (``{"params": ..., "qtree": ...}``) so the quantized weights are a real
    jit argument (no baked-in constants) and the CLI's mesh replication
    covers them like any other leaf.
    """

    arch: str = "resnet50"

    def _preprocess_dtype(self):
        # the int8 scales were calibrated on f32-preprocessed pixels
        # (quantize_mil_resnet); keep serving preprocessing identical to it
        import jax.numpy as jnp

        return jnp.float32

    def _patch_feats(self, qtree, arrays):
        from multimodalbrainsurvival_tpu.models.quantize import (
            quantized_extract,
        )

        x = self._preprocess(arrays, False, None)
        B, bag = x.shape[:2]
        feats = quantized_extract(
            qtree, x.reshape((B * bag,) + x.shape[2:]), arch=self.arch
        )
        return feats.reshape(B, bag, -1)

    def apply(self, variables, arrays, *, train: bool, rng=None):
        if train:
            raise ValueError("the int8 serving adapter is eval-only")
        feats = self._patch_feats(variables["qtree"], arrays)
        out = self.model.apply(
            {"params": variables["params"]},
            *self._model_inputs(feats, arrays),
            mask=arrays["bag_mask"], train=False, method="from_feats",
        )
        return self._unwrap(out), None

    def extract(self, variables, arrays):
        feats = self._patch_feats(variables["qtree"], arrays)
        out = self.model.apply(
            {"params": variables["params"]},
            *self._model_inputs(feats, arrays),
            mask=arrays["bag_mask"], train=False, method="extract_from_feats",
        )
        return self._unwrap(out)


def _merge_batch_stats(old, new):
    """Overlay the batch-stats entries a tail-only apply actually updated
    onto the full collection, so frozen-trunk stats survive in the train
    state/checkpoint unchanged (flax's mutable return only covers visited
    modules)."""
    if old is None or new is None:
        return new
    from flax import traverse_util

    flat = traverse_util.flatten_dict(old)
    flat.update(traverse_util.flatten_dict(new))
    return traverse_util.unflatten_dict(flat)


@dataclass
class QuantTrunkMILAdapter(MILAdapter):
    """int8 frozen-trunk TRAINING adapter (``quantize_trunk: "int8"``).

    Under the reference freeze ladder (``2_HistoPath_train.py:544-551``) the
    stages below ``n_layers_to_train`` run forward-only every step — exactly
    the work profile the W8A8 serving path executes ~1.5× faster than bf16
    (docs/DESIGN.md items 18-20). This adapter runs that frozen prefix
    through ``models/quantize.quantized_trunk`` (one-shot fold + calibrate +
    quantize at training start — valid because the prefix's params never
    change) and the trainable stages + aggregator + head through the float
    model (``from_trunk``), with dropout/BN/gradients exactly as in the
    float step. Deviations (opt-in, like ``quantize: "int8"`` serving):
    int8 rounding in the frozen features, and frozen-stage BN running stats
    no longer update (the reference quirk updates them under freeze).

    ``qtree`` rides as a closure constant of the jitted step — it is
    immutable for the whole run, so there is nothing to thread through the
    train state; the checkpoint layout stays identical to a float run's
    (full float params incl. the frozen trunk).
    """

    arch: str = "resnet50"
    trunk_stages: int = 3
    qtree: Any = None

    def _preprocess_dtype(self):
        # trunk scales were calibrated on f32-preprocessed pixels
        # (quantize_trunk_for_training) — match them every step
        import jax.numpy as jnp

        return jnp.float32

    def _trunk_feats(self, arrays, train, rng_img):
        from multimodalbrainsurvival_tpu.models.quantize import (
            quantized_trunk,
        )

        x = self._preprocess(arrays, train, rng_img)
        B, bag = x.shape[:2]
        fmap = quantized_trunk(
            self.qtree, x.reshape((B * bag,) + x.shape[2:]),
            stages=self.trunk_stages, arch=self.arch,
            dtype=self.model.resnet.dtype,
        )
        return fmap.reshape((B, bag) + fmap.shape[1:])

    def apply(self, variables, arrays, *, train: bool, rng=None):
        if train and rng is not None:
            rng_img, rng_drop = jax.random.split(rng)
        else:
            rng_img = rng_drop = rng
        fmap = self._trunk_feats(arrays, train, rng_img)
        inputs = self._model_inputs(fmap, arrays)
        batch_stats = variables.get("batch_stats")
        if train:
            out, updates = self.model.apply(
                _join_variables(variables["params"], batch_stats),
                *inputs,
                mask=arrays["bag_mask"],
                train=True,
                from_stage=self.trunk_stages,
                mutable=["batch_stats"] if batch_stats is not None else [],
                rngs={"dropout": rng_drop},
                method="from_trunk",
            )
            new_stats = _merge_batch_stats(
                batch_stats, updates.get("batch_stats")
            )
            return self._unwrap(out), new_stats
        out = self.model.apply(
            variables, *inputs, mask=arrays["bag_mask"], train=False,
            from_stage=self.trunk_stages, method="from_trunk",
        )
        return self._unwrap(out), None

    def extract(self, variables, arrays):
        fmap = self._trunk_feats(arrays, False, None)
        out = self.model.apply(
            variables, *self._model_inputs(fmap, arrays),
            mask=arrays["bag_mask"], train=False,
            from_stage=self.trunk_stages, method="extract_from_trunk",
        )
        return self._unwrap(out)


@dataclass
class JointAdapter(_PatchAdapterBase):
    """Bimodal patch-bag + RNA models (BagHistopathologyRNAModel)."""

    array_keys: tuple = ("patch_bag", "bag_mask", "sample_mask", "rna_data")

    def _model_inputs(self, x, arrays) -> tuple:
        return (x, arrays["rna_data"])


@dataclass
class QuantTrunkJointAdapter(QuantTrunkMILAdapter):
    """int8 frozen-trunk TRAINING adapter for the joint bimodal model
    (``quantize_trunk: "int8"`` in the joint train CLI): the frozen ResNet
    prefix runs W8A8, the trainable ResNet stages + RNA encoder + fusion
    head stay float (``BagHistopathologyRNAModel.from_trunk``). Same
    contract as the MIL variant — exact zero gradients below the seam,
    unchanged float checkpoint layout."""

    array_keys: tuple = ("patch_bag", "bag_mask", "sample_mask", "rna_data")

    def _model_inputs(self, x, arrays) -> tuple:
        return (x, arrays["rna_data"])


@dataclass
class QuantizedJointAdapter(QuantizedMILAdapter):
    """int8 (W8A8) serving variant of the joint bimodal model: quantized
    per-patch ResNet + quantized RNA encoder (when ``variables`` carries a
    ``qtree_rna`` — ``models/quantize.quantize_rna_encoder``), float fusion
    tail. Without ``qtree_rna`` the RNA encoder runs float via
    ``BagHistopathologyRNAModel.{from_feats,extract_from_feats}``."""

    array_keys: tuple = ("patch_bag", "bag_mask", "sample_mask", "rna_data")

    def _model_inputs(self, x, arrays) -> tuple:
        return (x, arrays["rna_data"])

    def _rna_feats(self, qtree_rna, arrays):
        from multimodalbrainsurvival_tpu.models.quantize import quantized_mlp

        return quantized_mlp(qtree_rna, arrays["rna_data"])

    def apply(self, variables, arrays, *, train: bool, rng=None):
        if "qtree_rna" not in variables:
            return super().apply(variables, arrays, train=train, rng=rng)
        if train:
            raise ValueError("the int8 serving adapter is eval-only")
        feats = self._patch_feats(variables["qtree"], arrays)
        out = self.model.apply(
            {"params": variables["params"]},
            feats, self._rna_feats(variables["qtree_rna"], arrays),
            mask=arrays["bag_mask"], method="from_all_feats",
        )
        return self._unwrap(out), None

    def extract(self, variables, arrays):
        if "qtree_rna" not in variables:
            return super().extract(variables, arrays)
        feats = self._patch_feats(variables["qtree"], arrays)
        out = self.model.apply(
            {"params": variables["params"]},
            feats, self._rna_feats(variables["qtree_rna"], arrays),
            mask=arrays["bag_mask"], method="extract_from_all_feats",
        )
        return self._unwrap(out)
