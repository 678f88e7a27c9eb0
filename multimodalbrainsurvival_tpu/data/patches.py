"""Patch-bag datasets + a threaded host input pipeline.

Reference surface (``1_HistoPathology/models.py:234-295`` ``PatchBagDataset``;
``5_JointFusion/datasets.py:62-126`` ``PatchBagRNADataset``):

- a CSV row per case with ``wsi_file_name``; the per-slide patch directory
  ``<data_path>/<WSI>/`` holds ``<WSI>_patch_<i>.png`` and ``loc.txt`` whose
  line count minus 2 header lines is the patch count (``models.py:258``);
- patch count capped at ``max_patches_total``; patches are chunked into bags
  of ``bag_size``; the remainder is dropped (``models.py:266-267``);
- ``shuffle()`` re-permutes each slide's patch list between epochs
  (``models.py:269-272``).

TPU-first: the host pipeline only *decodes* (cv2, C++ turbo path) into pinned
uint8 batches on a thread pool with double-buffered prefetch; all float
conversion, augmentation and normalization run batched on device
(``ops/image.py``). Batches are statically shaped — the trailing partial batch
is padded and masked (``sample_mask``) instead of torch's ragged final batch,
and an optional non-parity mode keeps the bag remainder with a ``bag_mask``.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np
import pandas as pd

import cv2


def _read_patch(path: str, img_size: int) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_COLOR)  # BGR uint8
    if img is None:
        raise FileNotFoundError(path)
    if img.shape[0] != img_size or img.shape[1] != img_size:
        img = cv2.resize(img, (img_size, img_size), interpolation=cv2.INTER_LINEAR)
    return img[:, :, ::-1]  # RGB


def _decode_bag(paths: list[str], bag: np.ndarray, img_size: int,
                use_native: bool) -> None:
    """Decode ``paths`` into ``bag[:len(paths)]`` (bag_size, H, W, 3) uint8.

    Uses the C++ thread-pool loader (``utils/native.py``) when available;
    any per-file failure is retried through cv2 so exotic PNG variants and
    genuinely missing files keep their reference behavior (raise)."""
    if use_native and paths:
        from multimodalbrainsurvival_tpu.utils import native

        view = bag[: len(paths)]  # leading slice: stays C-contiguous
        codes = native.decode_patch_batch(paths, view, num_threads=1)
        for j in np.nonzero(codes)[0]:
            bag[j] = _read_patch(paths[j], img_size)
    else:
        for j, p in enumerate(paths):
            bag[j] = _read_patch(p, img_size)


class PatchBagDataset:
    """Index of (WSI, bag-offset) chunks over per-slide patch directories."""

    def __init__(
        self,
        patch_data_path: str,
        csv_path: str,
        img_size: int = 224,
        bag_size: int = 40,
        max_patches_total: int = 1000,
        *,
        keep_remainder: bool = False,
        seed: int = 0,
        decoder: str = "auto",
        prefer_packed: bool = True,
    ):
        self.patch_data_path = patch_data_path
        self.img_size = img_size
        self.bag_size = bag_size
        self.max_patches_total = max_patches_total
        self.keep_remainder = keep_remainder
        self._rng = np.random.default_rng(seed)
        if decoder == "auto":
            from multimodalbrainsurvival_tpu.utils import native

            self.use_native = native.available()
        else:
            self.use_native = decoder == "native"

        self.data: dict[str, dict] = {}
        self.index: list[tuple[str, int]] = []

        df = pd.read_csv(csv_path)
        df.columns = [c.lstrip("﻿") for c in df.columns]
        for _, row in df.iterrows():
            row = row.to_dict()
            wsi = str(row["wsi_file_name"]).split(".")[0]
            loc = os.path.join(patch_data_path, wsi, "loc.txt")
            with open(loc) as f:
                n_patches = sum(1 for _ in f) - 2
            n_patches = min(n_patches, max_patches_total)
            # packed shard (patches.npy from the tiler/pack_patches): bags
            # become index lists into a zero-decode uint8 mmap
            packed = os.path.join(patch_data_path, wsi, "patches.npy")
            if prefer_packed and os.path.isfile(packed) and os.path.getmtime(
                packed
            ) >= os.path.getmtime(loc):
                images: list = list(range(n_patches))
            else:
                packed = None
                images = [
                    os.path.join(patch_data_path, wsi, f"{wsi}_patch_{i}.png")
                    for i in range(n_patches)
                ]
            entry = {k.lower(): v for k, v in row.items()}
            entry.update(
                {
                    "WSI": wsi,
                    "images": images,
                    "n_images": len(images),
                    "packed_path": packed,
                }
            )
            self.data[wsi] = entry
            n_bags = len(images) // bag_size
            for k in range(n_bags):
                self.index.append((wsi, bag_size * k))
            if keep_remainder and len(images) % bag_size:
                self.index.append((wsi, bag_size * n_bags))

    def shuffle(self):
        """Per-epoch re-permutation of each slide's patch list
        (reference ``models.py:269-272``)."""
        for entry in self.data.values():
            self._rng.shuffle(entry["images"])

    def __len__(self) -> int:
        return len(self.index)

    def _load_bag(self, item_idx: int) -> dict:
        wsi, off = self.index[item_idx]
        entry = self.data[wsi]
        items = entry["images"][off : off + self.bag_size]
        bag = np.zeros(
            (self.bag_size, self.img_size, self.img_size, 3), np.uint8
        )
        if entry.get("packed_path"):
            shard = self._shard_mmap(entry)
            rows = np.asarray(shard[np.asarray(items, np.intp)])
            if rows.shape[1] != self.img_size:
                for j, r in enumerate(rows):
                    bag[j] = cv2.resize(
                        r, (self.img_size, self.img_size),
                        interpolation=cv2.INTER_LINEAR,
                    )
            else:
                bag[: len(items)] = rows
        else:
            _decode_bag(items, bag, self.img_size, self.use_native)
        bag_mask = np.zeros((self.bag_size,), bool)
        bag_mask[: len(items)] = True
        return {"patch_bag": bag, "bag_mask": bag_mask, **self._labels(entry)}

    @staticmethod
    def _labels(entry: dict) -> dict:
        out = {"WSI": entry["WSI"], "case": str(entry.get("case", entry["WSI"]))}
        for k in ("survival_months", "vital_status"):
            if k in entry:
                out[k] = np.float32(entry[k])
        for k in ("survival_bin", "label", "grade_binary"):
            if k in entry:
                out[k] = np.int32(entry[k])
        return out

    def _assemble(
        self, items: list[dict], batch_size: int, *, patch_bag=None
    ) -> dict:
        """Pack per-item dicts into one statically shaped batch. When the
        native batch assembler already wrote the pixels (``patch_bag``
        given, items carry ``patch_bag=None``), only metadata is packed."""
        batch: dict = {
            "patch_bag": patch_bag
            if patch_bag is not None
            else np.zeros(
                (batch_size, self.bag_size, self.img_size, self.img_size, 3),
                np.uint8,
            ),
            "bag_mask": np.zeros((batch_size, self.bag_size), bool),
            "sample_mask": np.zeros((batch_size,), bool),
            "WSI": [""] * batch_size,
            "case": [""] * batch_size,
        }
        scalar_keys = [
            k
            for k in items[0]
            if k not in ("patch_bag", "bag_mask", "WSI", "case")
        ]
        for k in scalar_keys:
            batch[k] = np.zeros((batch_size,), np.asarray(items[0][k]).dtype)
        for i, it in enumerate(items):
            if it["patch_bag"] is not None:
                batch["patch_bag"][i] = it["patch_bag"]
            batch["bag_mask"][i] = it["bag_mask"]
            batch["sample_mask"][i] = True
            batch["WSI"][i] = it["WSI"]
            batch["case"][i] = it["case"]
            for k in scalar_keys:
                batch[k][i] = it[k]
        return batch

    def _bag_meta(self, item_idx: int) -> dict:
        """Everything ``_load_bag`` returns except the decoded pixels —
        the native batch assembler writes those directly into the batch
        buffer (``_load_batch``). Subclasses adding per-item arrays
        (rna_data) extend this like they extend ``_load_bag``."""
        wsi, off = self.index[item_idx]
        entry = self.data[wsi]
        n = len(entry["images"][off : off + self.bag_size])
        bag_mask = np.zeros((self.bag_size,), bool)
        bag_mask[:n] = True
        return {"patch_bag": None, "bag_mask": bag_mask, **self._labels(entry)}

    def _shard_mmap(self, entry: dict) -> np.ndarray:
        shard = entry.get("_mmap")
        if shard is None:
            shard = np.load(entry["packed_path"], mmap_mode="r")
            entry["_mmap"] = shard
        return shard

    def _load_batch(
        self, idx: np.ndarray, batch_size: int, num_threads: int
    ) -> dict:
        """Assemble a whole batch in ONE native call (utils/native.py):
        packed-shard rows are memcpy'd and PNGs decoded by the C++ thread
        pool straight into the final batch buffer — no per-bag
        intermediates, no per-item Python copies, GIL released. Output is
        byte-identical to the per-bag path (tested)."""
        from multimodalbrainsurvival_tpu.utils import native

        bag, hw = self.bag_size, self.img_size
        buf = np.zeros((batch_size, bag, hw, hw, 3), np.uint8)
        flat = buf.reshape(-1, hw, hw, 3)
        n_slots = batch_size * bag
        paths: list = [None] * n_slots
        srcs = np.zeros(n_slots, np.uintp)
        src_h = np.zeros(n_slots, np.int32)
        src_w = np.zeros(n_slots, np.int32)
        shard_rows: dict[int, tuple] = {}  # slot -> (shard, row) for retries
        for i, item_idx in enumerate(idx):
            wsi, off = self.index[item_idx]
            entry = self.data[wsi]
            items = entry["images"][off : off + bag]
            if entry.get("packed_path"):
                shard = self._shard_mmap(entry)
                hs, ws = shard.shape[1], shard.shape[2]
                base = shard.ctypes.data
                stride = shard.strides[0]
                for j, row in enumerate(items):
                    slot = i * bag + j
                    srcs[slot] = base + int(row) * stride
                    src_h[slot], src_w[slot] = hs, ws
                    shard_rows[slot] = (shard, int(row))
            else:
                for j, p in enumerate(items):
                    paths[i * bag + j] = p
        codes = native.assemble_patch_batch(
            paths, srcs, src_h, src_w, flat, num_threads=num_threads
        )
        for slot in np.nonzero(codes)[0]:
            if codes[slot] == 200:  # shard row needs a resize (cv2, as ever)
                shard, row = shard_rows[slot]
                flat[slot] = cv2.resize(
                    np.asarray(shard[row]), (hw, hw),
                    interpolation=cv2.INTER_LINEAR,
                )
            else:  # exotic PNG / missing file: same cv2 fallback as _load_bag
                flat[slot] = _read_patch(paths[slot], hw)
        items_meta = [self._bag_meta(k) for k in idx]
        return self._assemble(items_meta, batch_size, patch_bag=buf)

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int | None = None,
        num_threads: int = 8,
        prefetch: int = 2,
        skip_batches: int = 0,
    ) -> Iterator[dict]:
        """Threaded decode + double-buffered prefetch of uint8 bag batches.

        ``skip_batches`` drops the first k batches of the (deterministic)
        epoch order at the index level — zero decode cost — so a run resumed
        from a mid-epoch preemption checkpoint restarts exactly where the
        interrupted epoch left off (train/loop.py).
        """
        order = np.arange(len(self.index))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)

        def batch_indices():
            for start in range(skip_batches * batch_size, len(order), batch_size):
                yield order[start : start + batch_size]

        q: queue.Queue = queue.Queue(maxsize=prefetch)
        sentinel = object()
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that gives up when the consumer is gone, so an
            # abandoned generator (e.g. a probe `next(ds.batches(...))`)
            # doesn't leak the producer thread + prefetched GB-scale batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # exceptions are forwarded to the consumer instead of hanging it
            try:
                if self.use_native:
                    # whole-batch native assembly: one GIL-free C++ call per
                    # batch (memcpy packed rows / decode PNGs straight into
                    # the batch buffer) — see _load_batch
                    for idx in batch_indices():
                        if stop.is_set():
                            return
                        if not _put(
                            self._load_batch(idx, batch_size, num_threads)
                        ):
                            return
                else:
                    with ThreadPoolExecutor(max_workers=num_threads) as pool:
                        for idx in batch_indices():
                            if stop.is_set():
                                return
                            items = list(pool.map(self._load_bag, idx))
                            if not _put(self._assemble(items, batch_size)):
                                return
                _put(sentinel)
            except BaseException as e:  # noqa: BLE001
                _put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            while not q.empty():  # unblock a producer stuck on a full queue
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5)


class PatchRNADataset(PatchBagDataset):
    """Per-patch joint dataset: ONE item per patch + the case's RNA vector.

    The reference's version is unusable (``patch_folder`` undefined at
    ``5_JointFusion/datasets.py:182`` — SURVEY.md §2.4); this is the working
    equivalent, feeding ``PatchHistopathologyRNAModel``. Implemented as a
    bag_size=1 index so the whole loader stack is shared; batches expose
    ``patch`` (B, H, W, 3) alongside ``rna_data``.
    """

    def __init__(self, patch_data_path: str, csv_path: str, **kw):
        kw.pop("bag_size", None)
        super().__init__(patch_data_path, csv_path, bag_size=1,
                         keep_remainder=True, **kw)
        df = pd.read_csv(csv_path)
        df.columns = [c.lstrip("﻿") for c in df.columns]
        rna_cols = [c for c in df.columns if "rna_" in c]
        if not rna_cols:
            raise ValueError(f"No 'rna_' columns in {csv_path}")
        rna = df[rna_cols].to_numpy(np.float32)
        for i, (_, row) in enumerate(df.iterrows()):
            wsi = str(row["wsi_file_name"]).split(".")[0]
            self.data[wsi]["rna_data"] = rna[i]
        self.rna_dim = rna.shape[1]

    def _load_bag(self, item_idx: int) -> dict:
        out = super()._load_bag(item_idx)
        wsi, _ = self.index[item_idx]
        out["rna_data"] = self.data[wsi]["rna_data"]
        return out

    def _bag_meta(self, item_idx: int) -> dict:
        out = super()._bag_meta(item_idx)
        wsi, _ = self.index[item_idx]
        out["rna_data"] = self.data[wsi]["rna_data"]
        return out

    def _assemble(
        self, items: list[dict], batch_size: int, *, patch_bag=None
    ) -> dict:
        rna = np.zeros((batch_size, self.rna_dim), np.float32)
        for i, it in enumerate(items):
            rna[i] = it.pop("rna_data")
        batch = super()._assemble(items, batch_size, patch_bag=patch_bag)
        batch["rna_data"] = rna
        batch["patch"] = batch["patch_bag"][:, 0]
        return batch


class PatchBagRNADataset(PatchBagDataset):
    """Bag index + per-case RNA vector (``5_JointFusion/datasets.py:62-126``)."""

    def __init__(self, patch_data_path: str, csv_path: str, **kw):
        super().__init__(patch_data_path, csv_path, **kw)
        df = pd.read_csv(csv_path)
        df.columns = [c.lstrip("﻿") for c in df.columns]
        rna_cols = [c for c in df.columns if "rna_" in c]
        if not rna_cols:
            raise ValueError(f"No 'rna_' columns in {csv_path}")
        rna = df[rna_cols].to_numpy(np.float32)
        for i, (_, row) in enumerate(df.iterrows()):
            wsi = str(row["wsi_file_name"]).split(".")[0]
            self.data[wsi]["rna_data"] = rna[i]
        self.rna_dim = rna.shape[1]

    def _load_bag(self, item_idx: int) -> dict:
        out = super()._load_bag(item_idx)
        wsi, _ = self.index[item_idx]
        out["rna_data"] = self.data[wsi]["rna_data"]
        return out

    def _bag_meta(self, item_idx: int) -> dict:
        out = super()._bag_meta(item_idx)
        wsi, _ = self.index[item_idx]
        out["rna_data"] = self.data[wsi]["rna_data"]
        return out

    def _assemble(
        self, items: list[dict], batch_size: int, *, patch_bag=None
    ) -> dict:
        rna = np.zeros((batch_size, self.rna_dim), np.float32)
        for i, it in enumerate(items):
            rna[i] = it.pop("rna_data")
        batch = super()._assemble(items, batch_size, patch_bag=patch_bag)
        batch["rna_data"] = rna
        return batch
