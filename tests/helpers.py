"""Shared synthetic-fixture builders (CSV schemas mirror ExampleData/*.csv)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import cv2


def make_patch_dir(
    root: str, wsi: str, n_patches: int, img_size: int = 32, seed: int = 0
) -> None:
    """Create <root>/<wsi>/ with PNG patches + loc.txt per the tiler contract."""
    d = os.path.join(root, wsi)
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    with open(os.path.join(d, "loc.txt"), "w") as loc:
        loc.write(f"slide_id {wsi}\n")
        loc.write("id x y patch_level patch_size_read patch_size_output\n")
        for i in range(n_patches):
            img = rng.integers(0, 255, size=(img_size, img_size, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(d, f"{wsi}_patch_{i}.png"), img[:, :, ::-1])
            loc.write(f"{i} {i * img_size} 0 0 {img_size} {img_size}\n")


def make_survival_csv(
    path: str,
    cases: list[str],
    *,
    wsi_names: list[str] | None = None,
    n_rna: int = 0,
    n_feature: int = 0,
    seed: int = 0,
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n = len(cases)
    df = pd.DataFrame(
        {
            "case": cases,
            "survival_months": rng.uniform(1, 120, n).round(4),
            "vital_status": rng.integers(0, 2, n),
        }
    )
    if wsi_names is not None:
        df["wsi_file_name"] = wsi_names
    # build wide blocks in one concat: per-column insertion fragments the
    # frame and is quadratic at the RNA pipeline's 12,778 columns
    wide = {f"rna_{i}": rng.normal(size=n).astype(np.float32)
            for i in range(n_rna)}
    wide.update({f"feature_{i}": rng.normal(size=n).astype(np.float32)
                 for i in range(n_feature)})
    if wide:
        df = pd.concat([df, pd.DataFrame(wide)], axis=1)
    df.to_csv(path, index=False)
    return df
