"""Histopathology feature-embedding export CLI — the throughput north star.

Parity with ``1_HistoPathology/4_HistoPath_extractfeatures.py``: runs the
post-aggregator bag embedding (``model.extract``), per-case mean (``:80-88``),
writes ``pathology_cases_<split>.csv`` + ``pathology_features_<split>.csv``
(``:181-192``). This is the ResNet-inference hot path the benchmark measures
(patches/sec/chip); the MIL extract runs in the model's compute dtype
(``compute_dtype: bfloat16`` on TPU).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from multimodalbrainsurvival_tpu.cli._common import (
    extract_features_frames,
    load_config,
    make_device_put,
    make_parser,
    quantize_mode,
    quantize_serving,
    restore_maybe_folded,
)
from multimodalbrainsurvival_tpu.cli.histo_train import build_datasets, build_mil_model
from multimodalbrainsurvival_tpu.train.adapters import MILAdapter


def extract_split(adapter, variables, dataset, batch_size, device_put_fn=None):
    """Streaming extract with lag-1 result fetch: host decode (producer
    thread), device compute (async dispatch) and D2H transfer of the previous
    batch all overlap.

    ``device_put_fn`` (from ``mesh: {"dp": N}`` in the config) shards every
    batch across a device mesh so the ResNet inference fans out over chips —
    the multi-chip serving path (parity of the sharded output with
    single-device extract is tested on the virtual mesh)."""
    extract = getattr(adapter, "_extract_jit", None)
    if extract is None:
        extract = jax.jit(adapter.extract)
        adapter._extract_jit = extract
    feats, cases, wsis = [], [], []
    pending = None

    def drain(p):
        out, mask, batch_cases, batch_wsis = p
        out = np.asarray(out)[mask]
        feats.append(out)
        cases.extend([c for c, m in zip(batch_cases, mask) if m])
        wsis.extend([w for w, m in zip(batch_wsis, mask) if m])

    for batch in dataset.batches(batch_size, shuffle=False,
                                 **adapter.loader_kwargs):
        arrays = {k: jnp.asarray(batch[k]) for k in adapter.array_keys}
        if device_put_fn is not None:
            arrays = device_put_fn(arrays)
        out = extract(variables, arrays)  # async dispatch
        if pending is not None:
            drain(pending)
        pending = (out, np.asarray(batch[adapter.sample_mask_key]),
                   batch["case"], batch["WSI"])
    if pending is not None:
        drain(pending)
    return cases, wsis, np.concatenate(feats, axis=0)


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    config, flag, _, _ = load_config(args)
    output_path = config.get("output_path", "")
    os.makedirs(output_path or ".", exist_ok=True)

    datasets = build_datasets(config, bool(args.quick))
    quant = quantize_mode(config)  # "int8" → W8A8 ResNet serving
    # fold_bn: serve with every BatchNorm folded into the conv weights —
    # measured +20% extract throughput on v5e (models/folding.py)
    fold = bool(config.get("fold_bn", False)) or bool(quant)
    model = build_mil_model(config, fold_bn=fold)
    adapter = MILAdapter(
        model=model,
        loader_kwargs={"num_threads": int(config.get("num_workers", 8)) or 1},
    )

    probe = next(datasets["train"].batches(config.batch_size,
                                           **adapter.loader_kwargs))
    # checkpoints are stored unfolded: init/restore with the stock model's
    # tree, then fold the restored variables for the serving model
    init_adapter = (
        MILAdapter(model=build_mil_model(config)) if fold else adapter
    )
    variables = restore_maybe_folded(config, adapter, init_adapter,
                                     probe, args.seed)
    if quant:
        variables, adapter = quantize_serving(config, model, adapter,
                                              variables, probe)

    device_put_fn = make_device_put(config)  # mesh: {"dp": N} → sharded serve
    if device_put_fn is not None:
        # restored variables are committed to one device; replicate them over
        # the mesh so they can meet the dp-sharded batches inside jit
        from multimodalbrainsurvival_tpu.parallel.sharding import (
            replicated_shardings,
        )

        variables = jax.device_put(
            variables, replicated_shardings(variables, device_put_fn.mesh)
        )
    suffix = f"_{flag}" if "cv" in flag else ""
    for split, ds in datasets.items():
        print(f"extracting features for dataset : {split}")
        cases, _, feats = extract_split(adapter, variables, ds,
                                        config.batch_size,
                                        device_put_fn=device_put_fn)
        uc, uf = extract_features_frames(cases, feats)
        pd.DataFrame(uc).to_csv(
            os.path.join(output_path, f"pathology_cases_{split}{suffix}.csv")
        )
        np.savetxt(
            os.path.join(output_path, f"pathology_features_{split}{suffix}.csv"),
            uf, delimiter=",",
        )


if __name__ == "__main__":
    main()
