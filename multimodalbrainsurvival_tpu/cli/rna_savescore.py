"""RNA pipeline risk-score export CLI.

Parity with ``2_GeneExpression/2_GeneExpress_savescore.py``: loads the model
from ``model_path``, evaluates each split, and writes per-case score frames
``<output_path>/rna_<split>[_<flag>]_df.csv`` (``:180-190``).
"""

from __future__ import annotations

import os

import jax

from multimodalbrainsurvival_tpu.cli._common import (
    load_config,
    make_parser,
    quantize_mode,
    quantize_rna_serving,
    savescore_name,
)
from multimodalbrainsurvival_tpu.cli.rna_train import build_rna_model
from multimodalbrainsurvival_tpu.data import RNATableDataset
from multimodalbrainsurvival_tpu.train import TrainSettings, evaluate
from multimodalbrainsurvival_tpu.train.adapters import TableAdapter
from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    config, flag, _, _ = load_config(args)
    output_path = config.get("output_path", "")
    os.makedirs(output_path or ".", exist_ok=True)

    model = build_rna_model(config)
    adapter = TableAdapter(model=model)
    settings = TrainSettings(task="survival_prediction",
                             batch_size=config.batch_size)

    datasets = {
        "train": RNATableDataset(config["train_csv_path"]),
        "val": RNATableDataset(config["val_csv_path"]),
        "test": RNATableDataset(config["test_csv_path"]),
    }
    probe = next(datasets["train"].batches(settings.batch_size))
    variables = adapter.init(
        jax.random.PRNGKey(args.seed),
        {k: jax.numpy.asarray(probe[k]) for k in adapter.array_keys},
    )
    ckpt = Checkpointer()
    variables = ckpt.restore(config["model_path"], variables)
    if quantize_mode(config):  # "int8" → W8A8 encoder serving
        variables, adapter = quantize_rna_serving(config, model, adapter,
                                                  variables, probe)

    for split, ds in datasets.items():
        print(f"Evaluation for dataset : {split}")
        _, frame, _ = evaluate(adapter, variables, ds, settings, split=split)
        out = os.path.join(output_path, savescore_name("rna", split, flag))
        frame.to_csv(out)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
