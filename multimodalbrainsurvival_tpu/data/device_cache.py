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

        # one flat permutation array; self.ids[wsi] are contiguous VIEWS into
        # it (shuffle() permutes them in place), so batch assembly can gather
        # from _ids_flat with vectorized indexing
        n_total = sum(e["n_images"] for e in base.data.values())
        self._ids_flat = np.arange(n_total, dtype=np.int32)
        self.ids: dict[str, np.ndarray] = {}
        # Cache stored 3-D (rows, row_len/128, 128): the gather's cost is
        # purely a layout question. As a 4-D (N,H,W,3) table XLA relayouts
        # the ENTIRE cohort inside the gather program (3.0 ms/step
        # whole-cache u8 copy); as 2-D flat rows the tiled layout forces a
        # slow data-movement fusion (1.9 ms/step, ~20 GB/s); with each row a
        # tile-aligned (k, 128) plane the same gather runs at 641 GB/s =
        # 0.06 ms — near the HBM roofline (measured; docs/DESIGN.md item 15;
        # a pallas DMA row-gather kernel was built and measured 15% SLOWER,
        # so XLA keeps the job). Rows zero-pad up to a 128 multiple (pad
        # sliced off after the per-batch gather); slides decode straight
        # into the one padded host buffer so peak host memory is the cohort
        # plus a single slide, not 2-3 cohort copies.
        row = base.img_size * base.img_size * 3
        self._row_pad = (-row) % 128
        flat = np.zeros((max(n_total, 1), row + self._row_pad), np.uint8)
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
            else:
                got = np.zeros((n, base.img_size, base.img_size, 3), np.uint8)
                _decode_bag(list(items_all), got, base.img_size, base.use_native)
            flat[start : start + n, :row] = got.reshape(n, -1)
            del got
            self.ids[wsi] = self._ids_flat[start : start + n]
            start += n
        self._cache = jax.device_put(
            flat.reshape(flat.shape[0], (row + self._row_pad) // 128, 128)
        )

        # Precomputed per-item tables so ``batches()`` is a few numpy gathers
        # instead of a Python loop over the batch (measured: that loop held
        # in-loop training ~45% under the compiled step's rate on one core).
        # Per-slide labels never change across epochs; only ``self.ids``
        # (the in-slide permutation) does.
        wsi_keys = list(base.data.keys())
        slot_of = {w: i for i, w in enumerate(wsi_keys)}
        self._wsi_names = [base.data[w]["WSI"] for w in wsi_keys]
        self._case_names = [
            str(base.data[w].get("case", base.data[w]["WSI"]))
            for w in wsi_keys
        ]
        label_dicts = [base._labels(base.data[w]) for w in wsi_keys]
        self._scalar_keys = [
            k for k in (label_dicts[0] if label_dicts else {})
            if k not in ("WSI", "case")
        ]
        self._scalars = {
            k: np.asarray([d[k] for d in label_dicts])
            for k in self._scalar_keys
        }
        if any("rna_data" in e for e in base.data.values()):
            self._rna = np.asarray(
                [np.asarray(base.data[w]["rna_data"], np.float32)
                 for w in wsi_keys]
            )
        else:
            self._rna = None
        self._item_slot = np.asarray(
            [slot_of[w] for w, _ in base.index], np.int32
        )
        self._item_off = np.asarray([off for _, off in base.index], np.int32)
        self._item_len = np.minimum(
            self.bag_size,
            np.asarray(
                [base.data[w]["n_images"] for w, _ in base.index], np.int32
            ) - self._item_off,
        )
        self._wsi_base = np.asarray(
            np.cumsum([0] + [base.data[w]["n_images"] for w in wsi_keys[:-1]]),
            np.int64,
        )

        # Device-resident copies of every per-item/per-slide table, so each
        # step's batch is assembled ON DEVICE from a single (batch_size,)
        # int32 `sel` upload — one small H2D + one dispatch per step. The
        # earlier shape (host-built masks/scalars, one H2D per array) paid a
        # tunnel round-trip per ARRAY per step; every array the train step
        # consumes (pixels, masks, survival scalars, rna) now never exists on
        # the host after wrap time. Padded bag slots / padded sample rows are
        # zeroed via the masks so batches match the host loader's zero-filled
        # padding exactly (train-mode BN statistics see every patch, masked
        # or not); padded rows' scalar labels are zeroed by sample_mask.
        self._dev_tables = {
            "item_slot": jax.device_put(self._item_slot),
            "item_off": jax.device_put(self._item_off),
            "item_len": jax.device_put(self._item_len),
            "wsi_base": jax.device_put(self._wsi_base.astype(np.int32)),
            "scalars": {
                k: jax.device_put(v) for k, v in self._scalars.items()
            },
            "rna": None if self._rna is None else jax.device_put(self._rna),
        }
        self._dev_ids = jax.device_put(self._ids_flat)
        self._ids_dirty = False
        n_rows = max(len(self._ids_flat), 1)

        import jax.numpy as jnp

        def _assemble(cache, ids_flat, tables, sel, b):
            lane = jnp.arange(self.bag_size, dtype=jnp.int32)[None, :]
            sample_mask = jnp.arange(sel.shape[0], dtype=jnp.int32) < b
            slots = tables["item_slot"][sel]
            valid = (lane < tables["item_len"][sel][:, None]) & sample_mask[
                :, None
            ]
            gidx = jnp.clip(
                tables["wsi_base"][slots][:, None]
                + tables["item_off"][sel][:, None]
                + lane,
                0,
                n_rows - 1,
            )
            idx = jnp.where(valid, ids_flat[gidx], 0)
            bag = cache[idx] * valid[..., None, None].astype(cache.dtype)
            row = self.img_size * self.img_size * 3
            bag = bag.reshape(idx.shape + (-1,))[..., :row]
            out = {
                "patch_bag": bag.reshape(
                    idx.shape + (self.img_size, self.img_size, 3)
                ),
                "bag_mask": valid,
                "sample_mask": sample_mask,
            }
            for k, col in tables["scalars"].items():
                out[k] = jnp.where(sample_mask, col[slots], 0)
            if tables["rna"] is not None:
                out["rna_data"] = (
                    tables["rna"][slots] * sample_mask[:, None]
                )
            return out

        self._assemble = jax.jit(_assemble)

    def shuffle(self):
        """Per-epoch in-slide permutation (reference ``models.py:269-272``).

        ``self.ids[wsi]`` are views into ``_ids_flat``, so shuffling them
        permutes the flat array; the device copy refreshes lazily (one
        KB-scale upload per epoch, not per step).
        """
        for wsi in self.ids:
            self._rng.shuffle(self.ids[wsi])
        self._ids_dirty = True

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
        import jax

        base = self.base
        order = np.arange(len(base.index))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        if self._ids_dirty:
            self._dev_ids = jax.device_put(self._ids_flat)
            self._ids_dirty = False

        for s in range(skip_batches * batch_size, len(order), batch_size):
            sel = order[s : s + batch_size]
            b = len(sel)
            slots = self._item_slot[sel]
            sel_padded = np.zeros((batch_size,), np.int32)
            sel_padded[:b] = sel
            # ONE small H2D (`sel_padded`) + one dispatch; every array the
            # train step consumes comes back as a device-resident output
            batch: dict = self._assemble(
                self._cache, self._dev_ids, self._dev_tables, sel_padded,
                np.int32(b),
            )
            batch["WSI"] = [self._wsi_names[j] for j in slots] + [""] * (
                batch_size - b
            )
            batch["case"] = [self._case_names[j] for j in slots] + [""] * (
                batch_size - b
            )
            # host-side mirrors for consumers that must not sync on device
            # values (the train loop's logged-loss weight, eval's id masking)
            host_mask = np.zeros((batch_size,), bool)
            host_mask[:b] = True
            batch["host_sample_mask"] = host_mask
            for k in self._scalar_keys:
                col = np.zeros((batch_size,), self._scalars[k].dtype)
                col[:b] = self._scalars[k][slots]
                batch["host_" + k] = col
            yield batch
