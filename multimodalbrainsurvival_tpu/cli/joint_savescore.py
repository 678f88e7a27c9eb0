"""Joint fusion risk-score export CLI.

Parity with ``5_JointFusion/2_JointFusion_savescore.py``: loads
``model_path``, evaluates each split, writes
``<output_path>/<model_file>_joint_<split>[_<flag>]_df.csv`` (``:219-223``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from multimodalbrainsurvival_tpu.cli._common import (
    load_config,
    make_parser,
    quantize_mode,
    quantize_serving,
    restore_maybe_folded,
    savescore_name,
)
from multimodalbrainsurvival_tpu.cli.joint_train import (
    build_joint_datasets,
    build_joint_model,
)
from multimodalbrainsurvival_tpu.train import TrainSettings, evaluate
from multimodalbrainsurvival_tpu.train.adapters import JointAdapter


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    config, flag, _, _ = load_config(args)
    output_path = config.get("output_path", "")
    os.makedirs(output_path or ".", exist_ok=True)

    datasets = build_joint_datasets(config, bool(args.quick))
    quant = quantize_mode(config)  # "int8" → W8A8 ResNet serving
    fold = bool(config.get("fold_bn", False)) or bool(quant)
    model = build_joint_model(config, fold_bn=fold)
    adapter = JointAdapter(
        model=model,
        loader_kwargs={"num_threads": int(config.get("num_workers", 8)) or 1},
    )
    settings = TrainSettings(
        task=config.task,
        num_classes=config.num_classes,
        batch_size=config.batch_size,
    )
    probe = next(datasets["train"].batches(settings.batch_size,
                                           **adapter.loader_kwargs))
    init_adapter = (
        JointAdapter(model=build_joint_model(config)) if fold else adapter
    )
    variables = restore_maybe_folded(config, adapter, init_adapter,
                                     probe, args.seed)
    if quant:
        variables, adapter = quantize_serving(config, model, adapter,
                                              variables, probe)

    prefix = os.path.basename(str(config["model_path"]).rstrip("/")) + "_joint"
    for split, ds in datasets.items():
        print(f"Evaluation for dataset : {split}")
        # savescore writes the CASE-level frame (2_JointFusion_savescore.py:96),
        # unlike the train driver's WSI-level output frames
        _, frame, _ = evaluate(adapter, variables, ds, settings,
                               split=split, frame_level="case")
        out = os.path.join(output_path, savescore_name(prefix, split, flag))
        frame.to_csv(out)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
