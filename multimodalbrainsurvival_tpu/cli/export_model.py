"""Export a self-contained serving artifact (``jax.export`` / StableHLO).

TPU-native deployment addition (no reference counterpart — the reference
ships ``.pt`` state_dicts plus the model code that rebuilds them,
``3_HistoPath_savescore.py:228-349``): bakes the trained model —
preprocessing, (optionally BN-folded / int8) encoders, aggregator/fusion,
head — into one shape-polymorphic multi-platform artifact under
``export_path``, loadable by any JAX process via
``multimodalbrainsurvival_tpu.serving.load_artifact`` with zero model code.

Config keys used: ``model_path`` (checkpoint to export), ``export_path``
(output dir), ``export_kind`` (``"mil"`` default / ``"rna"`` /
``"feature"`` / ``"joint"`` — one per reference pipeline), plus the usual
model keys (``model_name``, ``aggregator``, ``fold_bn``, ``quantize``,
``compute_dtype``, ``img_size``). int8 export calibrates activation scales
on a real training batch, so the data keys must point at the cohort exactly
as for the serving CLIs; table exports read one batch to fix the feature
width (12,778 genes / 4096 fused features).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from multimodalbrainsurvival_tpu.cli._common import (
    load_config,
    make_parser,
    quantize_mode,
    quantize_rna_serving,
    quantize_serving,
    restore_maybe_folded,
)
from multimodalbrainsurvival_tpu.serving import (
    export_joint_artifact,
    export_mil_artifact,
    export_table_artifact,
)


def _synthetic_probe(config, with_rna: int = 0) -> dict:
    """Init-shape probe when no calibration data is needed (float export)."""
    s = config.img_size
    probe = {
        "patch_bag": np.zeros((1, 1, s, s, 3), np.uint8),
        "bag_mask": np.ones((1, 1), np.float32),
        "sample_mask": np.ones((1,), bool),
    }
    if with_rna:
        probe["rna_data"] = np.zeros((1, with_rna), np.float32)
    return probe


def _export_mil(config, args, out_dir):
    from multimodalbrainsurvival_tpu.cli.histo_train import (
        build_datasets,
        build_mil_model,
    )
    from multimodalbrainsurvival_tpu.train.adapters import MILAdapter

    quant = quantize_mode(config)
    fold = bool(config.get("fold_bn", False)) or bool(quant)
    model = build_mil_model(config, fold_bn=fold)
    adapter = MILAdapter(model=model)

    if quant:
        # int8 needs real pixels to calibrate the activation scales on
        probe = next(build_datasets(config, bool(args.quick))["train"]
                     .batches(config.batch_size))
    else:
        probe = _synthetic_probe(config)

    init_adapter = (
        MILAdapter(model=build_mil_model(config)) if fold else adapter
    )
    variables = restore_maybe_folded(config, adapter, init_adapter,
                                     probe, args.seed)
    if quant:
        variables, adapter = quantize_serving(config, model, adapter,
                                              variables, probe)
    return export_mil_artifact(
        model,
        jax.tree.map(jnp.asarray, variables),
        out_dir,
        img_size=config.img_size,
        arch=config.model_name,
        extra_meta={
            "model_path": str(config.get("model_path", "")),
            "aggregator": str(config.aggregator),
            "fold_bn": fold,
        },
    )


def _export_joint(config, args, out_dir):
    from multimodalbrainsurvival_tpu.cli.joint_train import (
        build_joint_datasets,
        build_joint_model,
    )
    from multimodalbrainsurvival_tpu.train.adapters import JointAdapter

    quant = quantize_mode(config)
    fold = bool(config.get("fold_bn", False)) or bool(quant)
    model = build_joint_model(config, fold_bn=fold)
    adapter = JointAdapter(model=model)

    # the RNA width comes from the cohort CSV (genes.txt order), so the
    # joint export always reads one batch
    probe = next(build_joint_datasets(config, bool(args.quick))["train"]
                 .batches(config.batch_size))
    init_adapter = (
        JointAdapter(model=build_joint_model(config)) if fold else adapter
    )
    variables = restore_maybe_folded(config, adapter, init_adapter,
                                     probe, args.seed)
    if quant:
        variables, adapter = quantize_serving(config, model, adapter,
                                              variables, probe)
    return export_joint_artifact(
        model,
        jax.tree.map(jnp.asarray, variables),
        out_dir,
        img_size=config.img_size,
        rna_features=int(np.asarray(probe["rna_data"]).shape[1]),
        arch=config.model_name,
        extra_meta={
            "model_path": str(config.get("model_path", "")),
            "fold_bn": fold,
        },
    )


def _export_table(config, args, out_dir, kind: str):
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    if kind == "rna":
        from multimodalbrainsurvival_tpu.cli.rna_train import build_rna_model
        from multimodalbrainsurvival_tpu.data import RNATableDataset as DS

        model = build_rna_model(config)
    else:
        from multimodalbrainsurvival_tpu.cli.feature_train import (
            build_feature_model,
        )
        from multimodalbrainsurvival_tpu.data import FeatureTableDataset as DS

        model = build_feature_model(config)

    probe = next(DS(config["train_csv_path"]).batches(config.batch_size))
    adapter = TableAdapter(model=model)
    variables = adapter.init(
        jax.random.PRNGKey(args.seed),
        {k: jnp.asarray(probe[k]) for k in adapter.array_keys},
    )
    variables = Checkpointer().restore(config["model_path"], variables)
    if kind == "rna" and quantize_mode(config):
        # int8 encoder (dynamic per-row activation scales — calibration-free)
        variables, _ = quantize_rna_serving(config, model, adapter,
                                            variables, probe)
    return export_table_artifact(
        model,
        jax.tree.map(jnp.asarray, variables),
        out_dir,
        in_features=int(np.asarray(probe["data"]).shape[1]),
        kind=f"{kind}_serving",
        extra_meta={"model_path": str(config.get("model_path", ""))},
    )


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    config, _, _, _ = load_config(args)
    out_dir = config.get("export_path") or ""
    if not out_dir:
        raise SystemExit("export_model requires an 'export_path' config key")
    kind = str(config.get("export_kind", "mil") or "mil").lower()

    if kind == "mil":
        meta = _export_mil(config, args, out_dir)
    elif kind == "joint":
        meta = _export_joint(config, args, out_dir)
    elif kind in ("rna", "feature"):
        if kind == "feature" and quantize_mode(config):
            raise SystemExit("quantize=int8 applies to the ResNet and RNA "
                             "serving paths, not export_kind='feature' "
                             "(the early-fusion MLP is ~18 MB — not "
                             "weight-load-bound)")
        meta = _export_table(config, args, out_dir, kind)
    else:
        raise SystemExit(f"unknown export_kind: {kind!r} "
                         "(expected mil / rna / feature / joint)")
    print(f"exported {meta['kind']} artifact "
          f"({meta['size_bytes'] / 1e6:.1f} MB, platforms "
          f"{'+'.join(meta['platforms'])}, quantize={meta['quantize'] or 'no'}) "
          f"to {out_dir}")


if __name__ == "__main__":
    main()
