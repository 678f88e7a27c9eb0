"""Early-fusion risk-score export CLI.

Parity with ``3_EarlyFusion/3_EarlyFusion_savescore.py``: loads ``model_path``,
evaluates each split, writes
``<output_path>/<model_name>_feature_<split>[_<flag>]_df.csv`` (``:137-185``).
"""

from __future__ import annotations

import os

import jax

from multimodalbrainsurvival_tpu.cli._common import (
    load_config,
    make_parser,
    savescore_name,
)
from multimodalbrainsurvival_tpu.cli.feature_train import build_feature_model
from multimodalbrainsurvival_tpu.data import FeatureTableDataset
from multimodalbrainsurvival_tpu.train import TrainSettings, evaluate
from multimodalbrainsurvival_tpu.train.adapters import TableAdapter
from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    config, flag, _, _ = load_config(args)
    output_path = config.get("output_path", "")
    os.makedirs(output_path or ".", exist_ok=True)

    model = build_feature_model()
    adapter = TableAdapter(model=model)
    settings = TrainSettings(task="survival_prediction",
                             batch_size=config.batch_size)
    datasets = {
        "train": FeatureTableDataset(config["train_csv_path"]),
        "val": FeatureTableDataset(config["val_csv_path"]),
        "test": FeatureTableDataset(config["test_csv_path"]),
    }
    probe = next(datasets["train"].batches(settings.batch_size))
    variables = adapter.init(
        jax.random.PRNGKey(args.seed),
        {k: jax.numpy.asarray(probe[k]) for k in adapter.array_keys},
    )
    variables = Checkpointer().restore(config["model_path"], variables)

    prefix = os.path.basename(str(config["model_path"]).rstrip("/")) + "_feature"
    for split, ds in datasets.items():
        print(f"Evaluation for dataset : {split}")
        _, frame, _ = evaluate(adapter, variables, ds, settings, split=split)
        out = os.path.join(output_path, savescore_name(prefix, split, flag))
        frame.to_csv(out)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
