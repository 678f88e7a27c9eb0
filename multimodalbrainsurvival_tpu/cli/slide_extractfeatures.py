"""Streaming WSI → features/scores serving CLI (beyond-reference capability).

The reference needs two stages and an intermediate artifact tree to score a
new slide: ``1_HistoPathology/1_WSI2Patches.py`` (tile every slide to PNG
patches on disk) followed by ``4_HistoPath_extractfeatures.py`` /
``3_HistoPath_savescore.py`` over the patch directories. This CLI fuses
them: tissue tiles stream straight from the slide file (lazy native TIFF
region reads — constant memory at any slide size) into the TPU patch
encoder, with host tiling of batch k+1 overlapped with device compute of
batch k (double-buffered, lag-1 result fetch) and no patch ever written to
disk. Tile selection/order is EXACTLY the tiler's
(``data/tiler.iter_tissue_patches`` — the same code path ``wsi2patches``
writes to disk, reference rule ``1_WSI2Patches.py:105-121``).

Per slide it computes

- per-patch ResNet embeddings — the folded-BN bf16 path, or int8 W8A8 with
  ``quantize: "int8"`` — batched ``batch_size`` patches per dispatch;
- ONE slide-spanning bag through the aggregator tail
  (``extract_from_feats`` / ``from_feats``), so any aggregator (identity /
  attention / transformer) sees the slide's full patch set at once;
- the slide-level survival score from the trained head.

Outputs (under ``output_path``):

- ``slide_scores<suffix>.csv``: slide, case, n_patches, score columns;
- ``pathology_cases_slides<suffix>.csv`` +
  ``pathology_features_slides<suffix>.csv``: per-case mean embedding pair in
  ``4_HistoPath_extractfeatures.py:181-192``'s exact format, so downstream
  Concat2Features / EarlyFusion consume it unchanged;
- with ``save_patch_features: true``, per-slide ``<slide>_features.npy``
  (N, D) and ``<slide>_patches.csv`` (id, x, y, attention — the per-patch
  aggregator attention weight, i.e. which tiles drive the slide score) for
  patch-level analysis and attention heatmaps.

Slide list: ``slide_csv_path`` (cohort CSV with a ``wsi_file_name`` column
and optionally ``case``; relative paths resolve under ``slide_path``) or a
``slides`` list of paths in the config. Tiling knobs mirror the tiler CLI:
``img_size`` (patch size), ``max_patches_per_slide``, ``dezoom_factor``,
``background_threshold``.
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
    restore_maybe_folded,
)
from multimodalbrainsurvival_tpu.cli.histo_train import build_mil_model
from multimodalbrainsurvival_tpu.data.tiler import (
    SLIDE_EXTS as _SLIDE_EXTS,
    TileConfig,
    compute_tissue_mask,
    iter_tissue_patches,
    open_slide,
    slide_id_for,
)
from multimodalbrainsurvival_tpu.ops.image import preprocess_patches
from multimodalbrainsurvival_tpu.train.adapters import MILAdapter


def resolve_slide_path(root: str, name: str) -> str:
    """Find the slide file for a cohort-CSV ``wsi_file_name`` value.

    Cohort CSVs name slides loosely: the reference histo CSVs carry
    ``<id>.svs`` regardless of the actual container, the joint CSVs carry
    extension-less ids (``5_JointFusion/datasets.py:42-51`` uses the value
    verbatim as a directory). Probe the verbatim name, then the name +
    common slide extensions, then the stem + extensions."""
    base = name if os.path.isabs(name) else os.path.join(root, name)
    if os.path.isfile(base):
        return base
    stem = os.path.splitext(base)[0]
    for cand in [base + e for e in _SLIDE_EXTS] + \
                [stem + e for e in _SLIDE_EXTS]:
        if os.path.isfile(cand):
            return cand
    raise FileNotFoundError(f"no slide file for {name!r} under {root!r}")


def resolve_slides(config, limit: int | None = None) -> list[tuple[str, str, str]]:
    """(path, slide_id, case) triples from ``slide_csv_path`` or ``slides``.

    ``limit`` slices BEFORE resolving, so a ``--quick`` smoke run never
    fails on a missing slide it would not score."""
    root = config.get("slide_path", "")
    out = []
    if config.get("slide_csv_path"):
        df = pd.read_csv(config["slide_csv_path"])
        if "wsi_file_name" not in df.columns:
            raise ValueError(
                f"{config['slide_csv_path']}: need a wsi_file_name column"
            )
        if limit is not None:
            df = df.iloc[:limit]
        for _, row in df.iterrows():
            name = str(row["wsi_file_name"])
            sid = slide_id_for(name)
            case = str(row["case"]) if "case" in df.columns else sid
            out.append((resolve_slide_path(root, name), sid, case))
    elif config.get("slides"):
        names = list(config["slides"])
        if limit is not None:
            names = names[:limit]
        for name in names:
            sid = slide_id_for(name)
            out.append((resolve_slide_path(root, name), sid, sid))
    else:
        raise ValueError("config needs slide_csv_path or slides")
    return out


def tile_config(config) -> TileConfig:
    return TileConfig(
        patch_size=int(config.img_size),
        max_patches_per_slide=int(config.get("max_patches_per_slide", 2000)),
        dezoom_factor=float(config.get("dezoom_factor", 1.0)),
        background_threshold=float(config.get("background_threshold", 0.2)),
    )


def make_patch_extract(config, model, variables):
    """Jitted ``(variables, (B, P, P, 3) uint8) → (B, D) f32`` per-patch
    embedding: deterministic eval preprocessing + the bare ResNet (the
    aggregator deliberately does NOT run here — it runs once per slide over
    the full patch set, in ``slide_tail``)."""
    if "qtree" in variables:
        from multimodalbrainsurvival_tpu.models.quantize import (
            quantized_extract,
        )

        arch = config.model_name

        def fn(v, x_u8):
            x = preprocess_patches(x_u8, train=False)
            return quantized_extract(v["qtree"], x, arch=arch)

    else:
        resnet = model.resnet
        has_stats = bool(variables.get("batch_stats"))

        def fn(v, x_u8):
            # eval chain in the model's compute dtype (DESIGN item 22);
            # the int8 branch above stays f32 to match its calibration
            x = preprocess_patches(x_u8, train=False, dtype=resnet.dtype)
            rv = {"params": v["params"]["resnet"]}
            if has_stats:
                rv["batch_stats"] = v["batch_stats"]["resnet"]
            out = resnet.apply(rv, x, train=False, method="extract")
            return out.astype(jnp.float32)

    return jax.jit(fn)


def _tail_variables(variables):
    v = {"params": variables["params"]}
    if variables.get("batch_stats"):
        v["batch_stats"] = variables["batch_stats"]
    return v


def pad_slide_bag(feats_np: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N, D) per-patch feats → one slide-spanning bag padded to a 128
    bucket: ((1, Nb, D) f32, (1, Nb) bool mask). Bucketing bounds the number
    of distinct tail compiles to max_patches_per_slide / 128."""
    n, d = feats_np.shape
    nb = -(-n // 128) * 128
    feats = np.zeros((1, nb, d), np.float32)
    feats[0, :n] = feats_np
    mask = np.zeros((1, nb), bool)
    mask[0, :n] = True
    return feats, mask


def make_slide_tail(model):
    """Jitted aggregator tail over one slide-spanning bag: per-patch feats
    (N, D) → (slide embedding (D,), scores (C,), per-patch attention (N,))."""
    def _tail(v, f, m):
        emb, att = model.apply(v, f, mask=m, train=False,
                               method="extract_from_feats")
        scores, _ = model.apply(v, f, mask=m, train=False,
                                method="from_feats")
        return emb, scores, att

    tail = jax.jit(_tail)

    def run(variables, feats_np):
        n = feats_np.shape[0]
        feats, mask = pad_slide_bag(feats_np)
        emb, scores, att = tail(_tail_variables(variables),
                                jnp.asarray(feats), jnp.asarray(mask))
        return (np.asarray(emb)[0], np.asarray(scores)[0],
                np.asarray(att, np.float32)[0, :n])

    return run


def check_mesh_batch(device_put_fn, batch_size: int) -> None:
    """Validate batch divisibility at startup: the streaming batches shard
    over the mesh's dp axis (``PartitionSpec("dp")``), and an indivisible
    batch would fail with an opaque XLA sharding error mid-slide (the
    device-cache loader raises the same way — ``data/device_cache.py``)."""
    if device_put_fn is None:
        return
    dp = device_put_fn.mesh.shape.get("dp", 1)
    if batch_size % dp:
        raise ValueError(
            f"streaming serve under mesh: batch_size {batch_size} must be "
            f"divisible by dp={dp} (batches shard over the batch axis)"
        )


def stream_slide_features(
    patch_extract, variables, slide, cfg: TileConfig, batch_size: int,
    device_put_fn=None, mask=None,
) -> tuple[np.ndarray, list[tuple[int, int]]]:
    """Stream one slide's tissue tiles through the patch encoder.

    Double-buffered lag-1 pipeline: while the device computes batch k, the
    host reads/filters the tiles of batch k+1; the D2H fetch of batch k
    happens after batch k+1 is dispatched. Returns ``((N, D) f32 per-patch
    features, [(x, y)] level-0 tile locations)``, in tiler order."""
    # `put` transfers the HOST buffer straight into the dp-sharded layout in
    # ONE H2D (staging through the default device first would double the
    # per-batch transfer on the hot path)
    put = jnp.asarray
    if device_put_fn is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(device_put_fn.mesh, PartitionSpec("dp"))
        put = lambda a: jax.device_put(a, sharding)  # noqa: E731

    P = cfg.patch_size
    bufs = [np.zeros((batch_size, P, P, 3), np.uint8) for _ in range(2)]
    which, count = 0, 0
    locs: list[tuple[int, int]] = []
    feats: list[np.ndarray] = []
    pending = None

    def flush():
        nonlocal which, count, pending
        if count == 0:
            return
        arr = put(bufs[which])
        out = patch_extract(variables, arr)  # async dispatch
        if pending is not None:
            prev, n_prev = pending
            feats.append(np.asarray(prev)[:n_prev])
        pending = (out, count)
        which, count = 1 - which, 0

    for _, x, y, patch in iter_tissue_patches(slide, cfg, mask=mask):
        bufs[which][count] = patch
        locs.append((int(x), int(y)))
        count += 1
        if count == batch_size:
            flush()
    flush()  # final partial batch (padded rows sliced off at fetch)
    if pending is not None:
        prev, n_prev = pending
        feats.append(np.asarray(prev)[:n_prev])
    if not feats:
        d = 0
        return np.zeros((0, d), np.float32), locs
    return np.concatenate(feats, axis=0), locs


def _calibrate_int8(config, variables, slides, cfg, batch_size):
    """int8 activation-scale calibration on REAL tiles of the first slide
    (the serving input distribution), not a synthetic probe.

    Returns ``(variables, tissue_mask)`` — the first slide's mask, so the
    scoring loop (which re-reads the same slide) skips the thumbnail decode
    + dilate/erode it already paid for here."""
    from multimodalbrainsurvival_tpu.models.quantize import quantize_mil_resnet

    n_cal = min(batch_size, 64)
    calib = []
    slide = open_slide(slides[0][0])
    mask = compute_tissue_mask(slide, cfg)
    for _, _, _, patch in iter_tissue_patches(slide, cfg, mask=mask):
        calib.append(patch)
        if len(calib) >= n_cal:
            break
    if not calib:
        raise ValueError(f"no tissue tiles in {slides[0][0]} to calibrate on")
    qtree = quantize_mil_resnet(variables, [np.stack(calib)],
                                arch=config.model_name)
    variables = dict(variables)
    variables["qtree"] = jax.device_put(qtree)
    print(f"int8: calibrated on {len(calib)} tiles of {slides[0][1]}")
    return variables, mask


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    config, flag, _, _ = load_config(args)
    output_path = config.get("output_path", "")
    os.makedirs(output_path or ".", exist_ok=True)

    slides = resolve_slides(config, limit=2 if args.quick else None)
    cfg = tile_config(config)
    batch_size = int(config.batch_size)

    quant = quantize_mode(config)
    fold = bool(config.get("fold_bn", False)) or bool(quant)
    model = build_mil_model(config, fold_bn=fold)
    adapter = MILAdapter(model=model)
    P = cfg.patch_size
    probe = {
        "patch_bag": np.zeros((1, 1, P, P, 3), np.uint8),
        "bag_mask": np.ones((1, 1), bool),
        "sample_mask": np.ones((1,), bool),
    }
    init_adapter = (
        MILAdapter(model=build_mil_model(config)) if fold else adapter
    )
    variables = restore_maybe_folded(config, adapter, init_adapter, probe,
                                     args.seed)
    masks: dict[str, np.ndarray] = {}
    if quant:
        variables, masks[slides[0][0]] = _calibrate_int8(
            config, variables, slides, cfg, batch_size
        )

    device_put_fn = make_device_put(config)  # mesh: {"dp": N} → sharded serve
    check_mesh_batch(device_put_fn, batch_size)
    if device_put_fn is not None:
        from multimodalbrainsurvival_tpu.parallel.sharding import (
            replicated_shardings,
        )

        variables = jax.device_put(
            variables, replicated_shardings(variables, device_put_fn.mesh)
        )

    patch_extract = make_patch_extract(config, model, variables)
    slide_tail = make_slide_tail(model)

    patch_dir = os.path.join(output_path or ".", "patch_features")
    if config.get("save_patch_features"):
        os.makedirs(patch_dir, exist_ok=True)

    rows, case_list, emb_list = [], [], []
    for path, sid, case in slides:
        slide = open_slide(path)
        feats, locs = stream_slide_features(
            patch_extract, variables, slide, cfg, batch_size,
            device_put_fn=device_put_fn, mask=masks.get(path),
        )
        if feats.shape[0] == 0:
            print(f"{sid}: no tissue tiles — skipped")
            continue
        emb, scores, attention = slide_tail(variables, feats)
        row = {"slide": sid, "case": case, "n_patches": feats.shape[0]}
        if scores.shape[-1] == 1:
            row["score"] = float(scores[0])
        else:
            for k in range(scores.shape[-1]):
                row[f"score_{k}"] = float(scores[k])
        rows.append(row)
        case_list.append(case)
        emb_list.append(emb)
        if config.get("save_patch_features"):
            np.save(os.path.join(patch_dir, f"{sid}_features.npy"), feats)
            # per-patch aggregator attention: the interpretability signal
            # (which tiles drive the slide score) the reference computes but
            # never exports (1_HistoPathology/models.py:55-57)
            frame = pd.DataFrame(locs, columns=["x", "y"])
            frame["attention"] = attention
            frame.rename_axis("id").to_csv(
                os.path.join(patch_dir, f"{sid}_patches.csv")
            )
        print(f"{sid}: {feats.shape[0]} patches, score "
              f"{row.get('score', scores.tolist())}")

    if not rows:
        raise SystemExit("no slide produced any tissue tiles")
    suffix = f"_{flag}" if "cv" in flag else ""
    pd.DataFrame(rows).to_csv(
        os.path.join(output_path, f"slide_scores{suffix}.csv"), index=False
    )
    uc, uf = extract_features_frames(case_list, np.stack(emb_list))
    pd.DataFrame(uc).to_csv(
        os.path.join(output_path, f"pathology_cases_slides{suffix}.csv")
    )
    np.savetxt(
        os.path.join(output_path, f"pathology_features_slides{suffix}.csv"),
        uf, delimiter=",",
    )


if __name__ == "__main__":
    main()
