"""Export a self-contained serving artifact (``jax.export`` / StableHLO).

TPU-native deployment addition (no reference counterpart — the reference
ships ``.pt`` state_dicts plus the model code that rebuilds them,
``3_HistoPath_savescore.py:228-349``): bakes the trained MIL model —
preprocessing, (optionally BN-folded / int8) ResNet, aggregator, head —
into one shape-polymorphic multi-platform artifact under ``export_path``,
loadable by any JAX process via
``multimodalbrainsurvival_tpu.serving.load_artifact`` with zero model code.

Config keys used: ``model_path`` (checkpoint to export), ``export_path``
(output dir), plus the usual model keys (``model_name``, ``aggregator``,
``fold_bn``, ``quantize``, ``compute_dtype``, ``img_size``). int8 export
calibrates activation scales on a real training batch, so the data keys
must point at the cohort exactly as for the serving CLIs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from multimodalbrainsurvival_tpu.cli._common import (
    load_config,
    make_parser,
    quantize_mode,
    quantize_serving,
    restore_maybe_folded,
)
from multimodalbrainsurvival_tpu.cli.histo_train import (
    build_datasets,
    build_mil_model,
)
from multimodalbrainsurvival_tpu.serving import export_mil_artifact
from multimodalbrainsurvival_tpu.train.adapters import MILAdapter


def _synthetic_probe(config) -> dict:
    """Init-shape probe when no calibration data is needed (float export)."""
    s = config.img_size
    return {
        "patch_bag": np.zeros((1, 1, s, s, 3), np.uint8),
        "bag_mask": np.ones((1, 1), np.float32),
        "sample_mask": np.ones((1,), bool),
    }


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    config, _, _, _ = load_config(args)
    out_dir = config.get("export_path") or ""
    if not out_dir:
        raise SystemExit("export_model requires an 'export_path' config key")

    quant = quantize_mode(config)
    fold = bool(config.get("fold_bn", False)) or bool(quant)
    model = build_mil_model(config, fold_bn=fold)
    adapter = MILAdapter(model=model)

    if quant:
        # int8 needs real pixels to calibrate the activation scales on
        datasets = build_datasets(config, bool(args.quick))
        probe = next(datasets["train"].batches(config.batch_size))
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

    meta = export_mil_artifact(
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
    print(f"exported {meta['kind']} artifact "
          f"({meta['size_bytes'] / 1e6:.1f} MB, platforms "
          f"{'+'.join(meta['platforms'])}, quantize={meta['quantize'] or 'no'}) "
          f"to {out_dir}")


if __name__ == "__main__":
    main()
