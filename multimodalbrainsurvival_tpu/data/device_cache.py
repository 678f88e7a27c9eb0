"""Device-resident patch cache: decode once, gather bags on-device.

Motivation (docs/DESIGN.md item 11): the training loop ships
``batch × bag × 224² × 3`` uint8 per step — 19.3 MB at the reference default
config — which binds the real loop to host→device bandwidth (measured
~180 bags/s through this container's ~28 MB/s tunnel vs 4,997 bags/s for
the compiled step). The reference default caps patches per slide at 100
(``config_ffpe_train.json:24-25``), so whole cohorts fit in HBM:

    783 WSIs × 100 patches × 224²×3 uint8  ≈ 11 GB   (v5e: 16 GB)

``DeviceCachedPatchBags`` wraps any ``PatchBagDataset``-family dataset:
every patch is decoded ONCE (same threaded/native decode path), uploaded
ONCE as a flat ``(N, H, W, 3)`` uint8 device array, and each training step
receives its bags via an on-device gather driven by a few KB of int32
indices — per-epoch traffic drops from bytes-of-dataset to
bytes-of-indices. Bag semantics (per-slide patch lists, bag chunking,
remainder handling, per-epoch in-slide ``shuffle()`` —
``1_HistoPathology/models.py:258-295``) are inherited from the wrapped
dataset's own index, so batches are content-identical to the base loader
(tested in ``tests/test_device_cache.py``).

Opt-in via ``cache_patches_on_device: true`` in the histo/joint train
configs. Falls back to the base dataset (with a warning) when the cohort
exceeds ``max_bytes``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def cache_bytes(base) -> int:
    n = sum(e["n_images"] for e in base.data.values())
    return n * base.img_size * base.img_size * 3


def cache_fits(base, max_bytes: int) -> bool:
    return cache_bytes(base) <= max_bytes


def maybe_cache_on_device(base, enabled: bool, *, max_bytes: int = 12 << 30):
    """Config-driven constructor: wrap ``base`` when enabled and it fits."""
    if not enabled:
        return base
    if not cache_fits(base, max_bytes):
        total = sum(e["n_images"] for e in base.data.values())
        print(
            f"cache_patches_on_device: cohort too large for HBM cache "
            f"({total} patches x {base.img_size}^2x3 > {max_bytes} bytes); "
            f"falling back to the host loader"
        )
        return base
    return DeviceCachedPatchBags(base)


def maybe_cache_datasets(datasets: dict, enabled: bool,
                         *, max_bytes: int = 12 << 30) -> dict:
    """Wrap a {split: dataset} dict with ONE shared HBM budget.

    All splits share the chip's memory, so the fit check must be on the
    aggregate, not per split. If everything fits, every split is cached
    (eval ships pixels once per epoch too); if only the train split fits,
    cache just that (it dominates per-epoch traffic); otherwise fall back
    to the host loader entirely, with a message either way.
    """
    if not enabled:
        return datasets
    total = sum(cache_bytes(ds) for ds in datasets.values())
    if total <= max_bytes:
        return {k: DeviceCachedPatchBags(v) for k, v in datasets.items()}
    train = datasets.get("train")
    if train is not None and cache_fits(train, max_bytes):
        print(
            "cache_patches_on_device: all splits together exceed the HBM "
            f"budget ({total} > {max_bytes} bytes); caching only 'train'"
        )
        return {
            k: DeviceCachedPatchBags(v) if k == "train" else v
            for k, v in datasets.items()
        }
    print(
        f"cache_patches_on_device: cohort too large for HBM cache "
        f"({total} > {max_bytes} bytes); falling back to the host loader"
    )
    return datasets


class DeviceCachedPatchBags:
    def __init__(self, base):
        import jax

        self.base = base
        self.bag_size = base.bag_size
        self.img_size = base.img_size
        self._rng = np.random.default_rng(0)

        # decode every (capped) patch ONCE, through the base's own decode
        # paths, in each slide's current patch-list order; flat row i of a
        # slide corresponds to position i of that list at wrap time
        from multimodalbrainsurvival_tpu.data.patches import _decode_bag

        rows = []
        self.ids: dict[str, np.ndarray] = {}
        start = 0
        for wsi, entry in base.data.items():
            n = entry["n_images"]
            items_all = entry["images"]
            if entry.get("packed_path"):
                import cv2

                shard = np.load(entry["packed_path"], mmap_mode="r")
                got = np.asarray(shard[np.asarray(items_all, np.intp)])
                if got.shape[1] != base.img_size:
                    resized = np.zeros(
                        (n, base.img_size, base.img_size, 3), np.uint8
                    )
                    for j, r in enumerate(got):
                        resized[j] = cv2.resize(
                            r, (base.img_size, base.img_size),
                            interpolation=cv2.INTER_LINEAR,
                        )
                    got = resized
                rows.append(got)
            else:
                buf = np.zeros((n, base.img_size, base.img_size, 3), np.uint8)
                _decode_bag(list(items_all), buf, base.img_size, base.use_native)
                rows.append(buf)
            self.ids[wsi] = np.arange(start, start + n, dtype=np.int32)
            start += n
        flat = np.concatenate(rows, axis=0) if rows else np.zeros(
            (1, base.img_size, base.img_size, 3), np.uint8
        )
        self._cache = jax.device_put(flat)
        # padded bag slots / padded sample rows keep index 0 — zero them via
        # the mask so batches match the host loader's zero-filled padding
        # exactly (train-mode BN statistics see every patch, masked or not)
        self._gather = jax.jit(
            lambda cache, idx, mask: cache[idx]
            * mask[..., None, None, None].astype(cache.dtype)
        )

    def shuffle(self):
        """Per-epoch in-slide permutation (reference ``models.py:269-272``)."""
        for wsi in self.ids:
            self._rng.shuffle(self.ids[wsi])

    def __len__(self) -> int:
        return len(self.base.index)

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int | None = None,
        skip_batches: int = 0,
        **_: object,  # loader kwargs (num_threads/prefetch) are host-only
    ) -> Iterator[dict]:
        base = self.base
        order = np.arange(len(base.index))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)

        for s in range(skip_batches * batch_size, len(order), batch_size):
            sel = order[s : s + batch_size]
            b = len(sel)
            idx = np.zeros((batch_size, self.bag_size), np.int32)
            bag_mask = np.zeros((batch_size, self.bag_size), bool)
            sample_mask = np.zeros((batch_size,), bool)
            batch: dict = {
                "bag_mask": bag_mask, "sample_mask": sample_mask,
                "WSI": [""] * batch_size, "case": [""] * batch_size,
            }
            scalars: dict = {}
            rna = None
            for i, item_idx in enumerate(sel):
                wsi, off = base.index[item_idx]
                entry = base.data[wsi]
                ids = self.ids[wsi][off : off + self.bag_size]
                idx[i, : len(ids)] = ids
                bag_mask[i, : len(ids)] = True
                sample_mask[i] = True
                labels = base._labels(entry)
                batch["WSI"][i] = labels.pop("WSI")
                batch["case"][i] = labels.pop("case")
                for k, v in labels.items():
                    if k not in scalars:
                        scalars[k] = np.zeros(
                            (batch_size,), np.asarray(v).dtype
                        )
                    scalars[k][i] = v
                if "rna_data" in entry:
                    if rna is None:
                        rna = np.zeros(
                            (batch_size, len(entry["rna_data"])), np.float32
                        )
                    rna[i] = entry["rna_data"]
            batch.update(scalars)
            if rna is not None:
                batch["rna_data"] = rna
            # the only per-step H2D is this int32 index array + mask (KBs);
            # the gather runs on device against the resident cache
            batch["patch_bag"] = self._gather(self._cache, idx, bag_mask)
            yield batch
