"""Serving artifacts: compile once, serve anywhere (``jax.export``).

The reference deploys by shipping a ``.pt`` state_dict plus the Python model
code that rebuilds it (``3_HistoPath_savescore.py:228-349``). Here the whole
serving computation is exported as ONE self-contained StableHLO artifact
with the weights baked in, for every model family:

- ``mil_serving`` — uint8 patches → on-device normalize → (optionally
  BN-folded / int8-quantized) ResNet → MIL aggregator → embedding, scores
  and per-patch attention,
- ``table_serving`` — RNA MLP (scores + 2048-d embedding) and the
  early-fusion MLP (scores),
- ``joint_serving`` — bimodal patch bag ⊕ RNA through the trained fusion
  head (embedding + scores, float or int8 ResNet).

Properties:

- **no model code at serving time**: the artifact is loadable by any JAX
  process (``load_artifact``) without this package's model classes,
- **shape-polymorphic**: batch and bag are symbolic dims, so one artifact
  serves every batch/bag size,
- **multi-platform**: lowered for TPU and CPU in the same artifact,
- **versioned**: StableHLO's compatibility guarantees apply (the artifact
  outlives jaxlib upgrades, unlike a pickled jaxpr or a compile cache).

``cli/export_model.py`` drives this from the same JSON configs as the other
serving CLIs (``model_path`` + ``fold_bn`` / ``quantize`` keys).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any

ARTIFACT_FILE = "serving.jaxexport"
META_FILE = "meta.json"


def _write_artifact(out_dir: str, exported, meta: dict,
                    extra_meta: dict | None) -> dict:
    """Shared export tail: serialize the program, write the blob and
    ``meta.json`` (common keys filled here, kind-specific ones from
    ``meta``), return the final metadata dict."""
    import jax

    blob = exported.serialize()
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT_FILE), "wb") as f:
        f.write(blob)
    meta = {
        "artifact": ARTIFACT_FILE,
        **meta,
        "jax_version": jax.__version__,
        "size_bytes": len(blob),
    }
    meta.update(extra_meta or {})
    with open(os.path.join(out_dir, META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def _mil_serving_fn(model, variables: dict, arch: str):
    """(patch_bag uint8 (B,bag,H,W,C), bag_mask (B,bag) f32) →
    {embedding (B,D), scores (B,out), attention (B,bag)} with the weights
    closed over (baked into the exported program as constants).

    Per-patch features are computed ONCE through the ResNet submodule (float
    or int8 per ``variables["qtree"]``), then the aggregator tail runs
    ``extract_from_feats`` / ``from_feats`` — the same split the serving
    adapters use (``train/adapters.py``).
    """
    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches

    qtree = variables.get("qtree")
    tail_vars = {"params": variables["params"]}
    rn_vars = {"params": variables["params"]["resnet"]}
    if "batch_stats" in variables:
        tail_vars["batch_stats"] = variables["batch_stats"]
        rn_vars["batch_stats"] = variables["batch_stats"]["resnet"]
    dtype = model.resnet.dtype

    def fn(patch_bag, bag_mask):
        # int8 path preprocesses in f32 exactly like QuantizedMILAdapter
        x = preprocess_patches(
            patch_bag, train=False,
            dtype=jnp.float32 if qtree is not None else dtype,
        )
        B, bag = x.shape[:2]
        flat = x.reshape((B * bag,) + x.shape[2:])
        if qtree is not None:
            from multimodalbrainsurvival_tpu.models.quantize import (
                quantized_extract,
            )

            feats = quantized_extract(qtree, flat, arch=arch)
        else:
            feats = model.resnet.apply(rn_vars, flat, train=False,
                                       method="extract")
        feats = feats.reshape(B, bag, -1)
        emb, attention = model.apply(
            tail_vars, feats, mask=bag_mask, train=False,
            method="extract_from_feats",
        )
        scores, _ = model.apply(
            tail_vars, feats, mask=bag_mask, train=False, method="from_feats"
        )
        return {
            "embedding": emb.astype(jnp.float32),
            "scores": scores.astype(jnp.float32),
            "attention": attention.astype(jnp.float32),
        }

    return fn


def export_mil_artifact(
    model,
    variables: dict,
    out_dir: str,
    *,
    img_size: int,
    in_channels: int = 3,
    arch: str = "resnet50",
    platforms: tuple[str, ...] = ("cpu", "tpu"),
    extra_meta: dict | None = None,
) -> dict:
    """Export a MIL serving artifact to ``out_dir`` and return its metadata."""
    import jax
    from jax import export as jax_export
    import jax.numpy as jnp

    fn = _mil_serving_fn(model, variables, arch)
    b, g = jax_export.symbolic_shape("b, g")
    exported = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(
        jax.ShapeDtypeStruct((b, g, img_size, img_size, in_channels),
                             jnp.uint8),
        jax.ShapeDtypeStruct((b, g), jnp.float32),
    )
    return _write_artifact(out_dir, exported, {
        "kind": "mil_serving",
        "arch": arch,
        "img_size": img_size,
        "in_channels": in_channels,
        "quantize": "int8" if variables.get("qtree") is not None else "",
        "platforms": list(platforms),
        "calling_convention": {
            "args": [
                f"patch_bag uint8 (b, g, {img_size}, {img_size}, "
                f"{in_channels})",
                "bag_mask float32 (b, g) — 1.0 real patch, 0.0 pad",
            ],
            "returns": "dict(embedding (b, D) f32, scores (b, C) f32, "
                       "attention (b, g) f32)",
        },
    }, extra_meta)


def _table_serving_fn(model, variables: dict):
    """(data (B, F) f32) → {scores (B, out)[, embedding (B, D)]} with the
    weights closed over. Covers the RNA MLP (``RNAOnlyModel`` — has an
    ``extract`` embedding path) and the early-fusion MLP (``EarlyFusionMLP``
    — scores only, like the reference's ``3_EarlyFusion_savescore.py``).
    With ``variables["qtree"]`` the encoder stack runs int8 (W8A8,
    ``models/quantize.quantized_mlp``) and the float Cox head re-enters via
    ``from_embedding`` — mirroring ``QuantizedTableAdapter``.
    """
    import jax.numpy as jnp

    qtree = variables.get("qtree")
    fvars = {"params": variables["params"]}
    has_extract = callable(getattr(type(model), "extract", None))

    def fn(data):
        if qtree is not None:
            from multimodalbrainsurvival_tpu.models.quantize import (
                quantized_mlp,
            )

            emb = quantized_mlp(qtree, data)
            return {
                "scores": model.apply(
                    fvars, emb, method="from_embedding"
                ).astype(jnp.float32),
                "embedding": emb.astype(jnp.float32),
            }
        out = {
            "scores": model.apply(fvars, data, train=False).astype(
                jnp.float32
            )
        }
        if has_extract:
            out["embedding"] = model.apply(
                fvars, data, train=False, method="extract"
            ).astype(jnp.float32)
        return out

    return fn


def export_table_artifact(
    model,
    variables: dict,
    out_dir: str,
    *,
    in_features: int,
    kind: str = "table_serving",
    platforms: tuple[str, ...] = ("cpu", "tpu"),
    extra_meta: dict | None = None,
) -> dict:
    """Export a feature-vector serving artifact (RNA / early-fusion MLP)."""
    import jax
    from jax import export as jax_export
    import jax.numpy as jnp

    fn = _table_serving_fn(model, variables)
    (b,) = jax_export.symbolic_shape("b")
    exported = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(
        jax.ShapeDtypeStruct((b, in_features), jnp.float32)
    )
    quantized = variables.get("qtree") is not None
    returns = "dict(scores (b, C) f32"
    if quantized or callable(getattr(type(model), "extract", None)):
        returns += ", embedding (b, D) f32"
    returns += ")"
    return _write_artifact(out_dir, exported, {
        "kind": kind,
        "in_features": in_features,
        "quantize": "int8" if quantized else "",
        "platforms": list(platforms),
        "calling_convention": {
            "args": [f"data float32 (b, {in_features})"],
            "returns": returns,
        },
    }, extra_meta)


def _joint_serving_fn(model, variables: dict, arch: str):
    """(patch_bag uint8 (B,bag,H,W,C), bag_mask (B,bag) f32,
    rna_data (B,R) f32) → {embedding (B,4096), scores (B,out)} for the
    bimodal ``BagHistopathologyRNAModel`` (float or int8 per
    ``variables["qtree"]``, mirroring ``QuantizedJointAdapter``)."""
    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches

    qtree = variables.get("qtree")
    qtree_rna = variables.get("qtree_rna")
    tail_vars = {"params": variables["params"]}
    rn_vars = {"params": variables["params"]["resnet"]}
    if "batch_stats" in variables:
        tail_vars["batch_stats"] = variables["batch_stats"]
        rn_vars["batch_stats"] = variables["batch_stats"]["resnet"]
    dtype = model.resnet.dtype

    def fn(patch_bag, bag_mask, rna_data):
        x = preprocess_patches(
            patch_bag, train=False,
            dtype=jnp.float32 if qtree is not None else dtype,
        )
        B, bag = x.shape[:2]
        flat = x.reshape((B * bag,) + x.shape[2:])
        if qtree is not None:
            from multimodalbrainsurvival_tpu.models.quantize import (
                quantized_extract,
            )

            feats = quantized_extract(qtree, flat, arch=arch)
        else:
            feats = model.resnet.apply(rn_vars, flat, train=False,
                                       method="extract")
        feats = feats.reshape(B, bag, -1)
        if qtree_rna is not None:
            # fully-int8 encoders: RNA stack via quantized_mlp, fusion tail
            # float via from_all_feats — mirrors QuantizedJointAdapter
            from multimodalbrainsurvival_tpu.models.quantize import (
                quantized_mlp,
            )

            rna_feats = quantized_mlp(qtree_rna, rna_data)
            emb = model.apply(
                tail_vars, feats, rna_feats, mask=bag_mask,
                method="extract_from_all_feats",
            )
            scores = model.apply(
                tail_vars, feats, rna_feats, mask=bag_mask,
                method="from_all_feats",
            )
        else:
            emb = model.apply(
                tail_vars, feats, rna_data, mask=bag_mask, train=False,
                method="extract_from_feats",
            )
            scores = model.apply(
                tail_vars, feats, rna_data, mask=bag_mask, train=False,
                method="from_feats",
            )
        return {
            "embedding": emb.astype(jnp.float32),
            "scores": scores.astype(jnp.float32),
        }

    return fn


def export_joint_artifact(
    model,
    variables: dict,
    out_dir: str,
    *,
    img_size: int,
    rna_features: int,
    in_channels: int = 3,
    arch: str = "resnet50",
    platforms: tuple[str, ...] = ("cpu", "tpu"),
    extra_meta: dict | None = None,
) -> dict:
    """Export a bimodal (patch bag ⊕ RNA) serving artifact."""
    import jax
    from jax import export as jax_export
    import jax.numpy as jnp

    fn = _joint_serving_fn(model, variables, arch)
    b, g = jax_export.symbolic_shape("b, g")
    exported = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(
        jax.ShapeDtypeStruct((b, g, img_size, img_size, in_channels),
                             jnp.uint8),
        jax.ShapeDtypeStruct((b, g), jnp.float32),
        jax.ShapeDtypeStruct((b, rna_features), jnp.float32),
    )
    return _write_artifact(out_dir, exported, {
        "kind": "joint_serving",
        "arch": arch,
        "img_size": img_size,
        "in_channels": in_channels,
        "rna_features": rna_features,
        "quantize": "int8" if variables.get("qtree") is not None else "",
        "platforms": list(platforms),
        "calling_convention": {
            "args": [
                f"patch_bag uint8 (b, g, {img_size}, {img_size}, "
                f"{in_channels})",
                "bag_mask float32 (b, g) — 1.0 real patch, 0.0 pad",
                f"rna_data float32 (b, {rna_features})",
            ],
            "returns": "dict(embedding (b, D) f32, scores (b, C) f32)",
        },
    }, extra_meta)


@dataclass
class ExportedServing:
    """A deserialized serving artifact: ``call(*args)`` per the artifact's
    ``meta["calling_convention"]`` — ``(patch_bag, bag_mask)`` for
    ``mil_serving``, ``(data,)`` for ``table_serving``, and
    ``(patch_bag, bag_mask, rna_data)`` for ``joint_serving``.

    Carries no dependency on this package's model classes — only jax.
    """

    exported: Any
    meta: dict

    def call(self, *args):
        return self.exported.call(*args)


def load_artifact(path: str) -> ExportedServing:
    """Load an artifact directory written by ``export_mil_artifact``."""
    from jax import export as jax_export

    with open(os.path.join(path, META_FILE)) as f:
        meta = json.load(f)
    with open(os.path.join(path, meta["artifact"]), "rb") as f:
        exported = jax_export.deserialize(f.read())
    return ExportedServing(exported=exported, meta=meta)
