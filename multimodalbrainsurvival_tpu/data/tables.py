"""Tabular (CSV) datasets: RNA expression, fused features.

Reference surface:

- ``RNADataset`` (``2_GeneExpression/datasets.py:11-52``): every column whose
  name contains the substring ``'rna_'`` becomes the 12,778-d float input
  vector; remaining columns ride along as labels/ids.
- ``featureDataset`` (``3_EarlyFusion/datasets.py:11-50``): same keyed on
  ``'feature_'`` (4096-d fused vector).

TPU-first: instead of per-row dict items through a worker pool, the whole CSV
is materialized once into a contiguous ``(N, D)`` float32 matrix and batches
are produced as statically-shaped padded slices with a validity mask — ready
for ``device_put`` into a sharded batch. Shuffling matches the reference's
per-epoch ``RandomSampler`` statistically (numpy permutation of row indices).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

LABEL_FLOAT_KEYS = ("survival_months", "vital_status")
LABEL_INT_KEYS = ("survival_bin", "label", "grade_binary")


class TableDataset:
    """CSV → contiguous feature matrix + label arrays + id lists."""

    def __init__(self, csv_path: str, feature_substring: str):
        df = pd.read_csv(csv_path)
        # strip a UTF-8 BOM if present (the reference ExampleData CSVs have one)
        df.columns = [c.lstrip("﻿") for c in df.columns]
        feat_cols = [c for c in df.columns if feature_substring in c]
        if not feat_cols:
            raise ValueError(
                f"No '{feature_substring}' columns found in {csv_path}"
            )
        self.feature_columns = feat_cols
        self.features = df[feat_cols].to_numpy(np.float32)
        self.labels_float: dict[str, np.ndarray] = {}
        self.labels_int: dict[str, np.ndarray] = {}
        for k in LABEL_FLOAT_KEYS:
            if k in df.columns:
                self.labels_float[k] = df[k].to_numpy(np.float32)
        for k in LABEL_INT_KEYS:
            if k in df.columns:
                self.labels_int[k] = df[k].to_numpy(np.int32)
        self.case = [str(c) for c in df["case"]] if "case" in df.columns else [
            str(i) for i in range(len(df))
        ]
        extra = [c for c in df.columns if c not in feat_cols]
        self.meta = df[extra]

    def __len__(self) -> int:
        return len(self.features)

    @property
    def feature_dim(self) -> int:
        return self.features.shape[1]

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int | None = None,
        pad: bool = True,
        skip_batches: int = 0,
    ) -> Iterator[dict]:
        """Yield dicts of statically shaped numpy batches.

        Keys: ``data`` (B, D) f32, ``mask`` (B,) bool, every label array
        present in the CSV, and ``case`` (list of ids, padded with "").
        ``skip_batches`` drops the first k batches of the (deterministic)
        epoch order without assembling them — mid-epoch resume after a
        preemption checkpoint (train/loop.py).
        """
        n = len(self)
        order = np.arange(n)
        if shuffle:
            rng = np.random.default_rng(seed)
            rng.shuffle(order)
        for start in range(skip_batches * batch_size, n, batch_size):
            idx = order[start : start + batch_size]
            b = len(idx)
            out: dict = {}
            pad_to = batch_size if pad else b
            data = np.zeros((pad_to, self.feature_dim), np.float32)
            data[:b] = self.features[idx]
            mask = np.zeros((pad_to,), bool)
            mask[:b] = True
            out["data"] = data
            out["mask"] = mask
            for k, arr in {**self.labels_float, **self.labels_int}.items():
                buf = np.zeros((pad_to,), arr.dtype)
                buf[:b] = arr[idx]
                out[k] = buf
            out["case"] = [self.case[i] for i in idx] + [""] * (pad_to - b)
            yield out


class RNATableDataset(TableDataset):
    """Parity with ``RNADataset``: features are the ``'rna_'`` columns."""

    def __init__(self, csv_path: str):
        super().__init__(csv_path, "rna_")


class FeatureTableDataset(TableDataset):
    """Parity with ``featureDataset``: features are the ``'feature_'`` columns."""

    def __init__(self, csv_path: str):
        super().__init__(csv_path, "feature_")
