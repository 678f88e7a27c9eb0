"""Streaming bimodal (WSI + RNA) slide scoring CLI (beyond-reference).

The reference's joint pipeline needs tiled patch directories on disk before
`5_JointFusion/2_JointFusion_savescore.py` can score a cohort. This CLI
scores straight from the slide files: per slide, tissue tiles stream from
the file (lazy native TIFF reads, the tiler's exact selection —
``data/tiler.iter_tissue_patches``) through the per-patch ResNet (bf16
folded or int8 W8A8), then ONE slide-spanning bag is fused with the row's
RNA vector through the trained joint head
(``BagHistopathologyRNAModel.from_feats``,
cf. ``5_JointFusion/models.py:35-56``) — no intermediate artifacts.

Input: ``slide_csv_path`` — a joint-style cohort CSV (``joint_example.csv``
schema: ``case``, ``wsi_file_name``, 12,778 ``rna_*`` columns, optionally
``survival_months``/``vital_status``); slide paths resolve under
``slide_path`` (``wsi_file_name`` may be extension-less, like the reference
joint dataset uses it — ``.svs``/``.png``/... is probed).

Output (under ``output_path``): ``joint_slide_scores<suffix>.csv`` with
slide, case, n_patches, score (+ the survival columns when present, so
downstream CI analysis has everything in one frame). When survival labels
are present the case-level C-index is also printed, matching the reference
savescore's console contract (``2_JointFusion_savescore.py:239-247``).

Model/serving knobs are the joint config's (``model_name``, ``num_classes``,
``dropout``, ``model_path``) plus ``fold_bn`` / ``quantize: "int8"`` /
``mesh: {"dp": N}``; tiling knobs mirror the tiler CLI (``img_size``,
``max_patches_per_slide``, ``dezoom_factor``, ``background_threshold``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from multimodalbrainsurvival_tpu.cli._common import (
    load_config,
    make_device_put,
    make_parser,
    quantize_mode,
    restore_maybe_folded,
)
from multimodalbrainsurvival_tpu.cli.joint_train import build_joint_model
from multimodalbrainsurvival_tpu.cli.slide_extractfeatures import (
    _calibrate_int8,
    _tail_variables,
    check_mesh_batch,
    make_patch_extract,
    pad_slide_bag,
    resolve_slides,
    stream_slide_features,
    tile_config,
)
from multimodalbrainsurvival_tpu.data.tiler import open_slide
from multimodalbrainsurvival_tpu.train.adapters import JointAdapter


def make_joint_tail(model):
    """Jitted fusion tail: per-patch feats (N, D) + RNA (G,) → score (C,),
    over one slide-spanning bag (``pad_slide_bag`` bucketing)."""
    def _tail(v, f, m, rna):
        return model.apply(v, f, rna, mask=m, train=False,
                           method="from_feats")

    tail = jax.jit(_tail)

    def run(variables, feats_np, rna_np):
        feats, mask = pad_slide_bag(feats_np)
        scores = tail(_tail_variables(variables), jnp.asarray(feats),
                      jnp.asarray(mask),
                      jnp.asarray(rna_np[None], jnp.float32))
        return np.asarray(scores)[0]

    return run


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    config, flag, _, _ = load_config(args)
    output_path = config.get("output_path", "")
    os.makedirs(output_path or ".", exist_ok=True)

    df = pd.read_csv(config["slide_csv_path"])
    if args.quick:
        df = df.iloc[:2]
    rna_cols = [c for c in df.columns if c.startswith("rna_")]
    if not rna_cols:
        raise ValueError(f"{config['slide_csv_path']}: no rna_* columns")
    # one slide-resolution implementation for both streaming CLIs; rows stay
    # aligned with df (resolve_slides applies the same --quick pre-slice)
    slides = resolve_slides(config, limit=2 if args.quick else None)

    cfg = tile_config(config)
    batch_size = int(config.batch_size)
    quant = quantize_mode(config)
    fold = bool(config.get("fold_bn", False)) or bool(quant)
    model = build_joint_model(config, fold_bn=fold)
    adapter = JointAdapter(model=model)
    P = cfg.patch_size
    probe = {
        "patch_bag": np.zeros((1, 1, P, P, 3), np.uint8),
        "bag_mask": np.ones((1, 1), bool),
        "sample_mask": np.ones((1,), bool),
        "rna_data": np.zeros((1, len(rna_cols)), np.float32),
    }
    init_adapter = (
        JointAdapter(model=build_joint_model(config)) if fold else adapter
    )
    variables = restore_maybe_folded(config, adapter, init_adapter, probe,
                                     args.seed)
    masks: dict[str, np.ndarray] = {}
    if quant:
        variables, masks[slides[0][0]] = _calibrate_int8(
            config, variables, slides, cfg, batch_size
        )

    device_put_fn = make_device_put(config)
    check_mesh_batch(device_put_fn, batch_size)
    if device_put_fn is not None:
        from multimodalbrainsurvival_tpu.parallel.sharding import (
            replicated_shardings,
        )

        variables = jax.device_put(
            variables, replicated_shardings(variables, device_put_fn.mesh)
        )

    patch_extract = make_patch_extract(config, model, variables)
    joint_tail = make_joint_tail(model)

    rna_all = df[rna_cols].to_numpy(np.float32)
    rows = []
    for (path, sid, case), (_, csv_row), rna in zip(slides, df.iterrows(),
                                                    rna_all):
        slide = open_slide(path)
        feats, _ = stream_slide_features(
            patch_extract, variables, slide, cfg, batch_size,
            device_put_fn=device_put_fn, mask=masks.get(path),
        )
        if feats.shape[0] == 0:
            print(f"{sid}: no tissue tiles — skipped")
            continue
        scores = joint_tail(variables, feats, rna)
        row = {"slide": sid, "case": case, "n_patches": feats.shape[0]}
        if scores.shape[-1] == 1:
            row["score"] = float(scores[0])
        else:
            for k in range(scores.shape[-1]):
                row[f"score_{k}"] = float(scores[k])
        for label in ("survival_months", "vital_status"):
            if label in csv_row:
                row[label] = csv_row[label]
        rows.append(row)
        print(f"{sid}: {feats.shape[0]} patches, score "
              f"{row.get('score', scores.tolist())}")

    if not rows:
        raise SystemExit("no slide produced any tissue tiles")
    frame = pd.DataFrame(rows)
    suffix = f"_{flag}" if "cv" in flag else ""
    frame.to_csv(
        os.path.join(output_path, f"joint_slide_scores{suffix}.csv"),
        index=False,
    )
    if "survival_months" in frame and "vital_status" in frame and \
            "score" in frame:
        # the one CI implementation every driver uses (per-case mean score,
        # reference sign convention) — ops/metrics.py
        from multimodalbrainsurvival_tpu.ops.metrics import survival_ci

        ci, _ = survival_ci(
            frame["score"].to_numpy(), list(frame["case"]),
            frame["survival_months"].to_numpy(),
            frame["vital_status"].to_numpy(),
        )
        print(f"case-level CI: {ci:.4f}")


if __name__ == "__main__":
    main()
