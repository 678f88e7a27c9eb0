"""RNA pipeline feature-embedding export CLI.

Parity with ``2_GeneExpression/3_GeneExpress_extractfeatures.py``: runs the
encoder's 2048-d ``extract`` path, aggregates per-case means (``:73-81``),
and writes ``rna_cases_<split>.csv`` + ``rna_features_<split>.csv``
(``:136-149``; features via ``np.savetxt`` with comma delimiter).
"""

from __future__ import annotations

import os

import jax
import numpy as np
import pandas as pd

from multimodalbrainsurvival_tpu.cli._common import (
    extract_features_frames,
    load_config,
    make_parser,
    quantize_mode,
    quantize_rna_serving,
)
from multimodalbrainsurvival_tpu.cli.rna_train import build_rna_model
from multimodalbrainsurvival_tpu.data import RNATableDataset
from multimodalbrainsurvival_tpu.train.adapters import TableAdapter
from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer


def extract_split(adapter, variables, dataset, batch_size):
    extract = getattr(adapter, "_extract_jit", None)
    if extract is None:
        extract = jax.jit(adapter.extract)
        adapter._extract_jit = extract
    feats, cases = [], []
    for batch in dataset.batches(batch_size, shuffle=False,
                                 **adapter.loader_kwargs):
        arrays = {k: jax.numpy.asarray(batch[k]) for k in adapter.array_keys}
        out = np.asarray(extract(variables, arrays))
        mask = np.asarray(batch[adapter.sample_mask_key])
        feats.append(out[mask])
        cases.extend([c for c, m in zip(batch["case"], mask) if m])
    return extract_features_frames(cases, np.concatenate(feats, axis=0))


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    config, flag, _, _ = load_config(args)
    output_path = config.get("output_path", "")
    os.makedirs(output_path or ".", exist_ok=True)

    model = build_rna_model(config)
    adapter = TableAdapter(model=model)
    datasets = {
        "train": RNATableDataset(config["train_csv_path"]),
        "val": RNATableDataset(config["val_csv_path"]),
        "test": RNATableDataset(config["test_csv_path"]),
    }
    probe = next(datasets["train"].batches(config.batch_size))
    variables = adapter.init(
        jax.random.PRNGKey(args.seed),
        {k: jax.numpy.asarray(probe[k]) for k in adapter.array_keys},
    )
    variables = Checkpointer().restore(config["model_path"], variables)
    if quantize_mode(config):  # "int8" → W8A8 encoder serving
        variables, adapter = quantize_rna_serving(config, model, adapter,
                                                  variables, probe)

    for split, ds in datasets.items():
        print(f"extracting features for dataset : {split}")
        cases, feats = extract_split(adapter, variables, ds, config.batch_size)
        suffix = f"_{flag}" if "cv" in flag else ""
        pd.DataFrame(cases).to_csv(
            os.path.join(output_path, f"rna_cases_{split}{suffix}.csv")
        )
        np.savetxt(
            os.path.join(output_path, f"rna_features_{split}{suffix}.csv"),
            feats, delimiter=",",
        )


if __name__ == "__main__":
    main()
