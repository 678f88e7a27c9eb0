"""The attention-heatmap renderer (cli/attention_heatmap.py).

The reference computes TanhAttention weights (1_HistoPathology/
models.py:55-57) but never exports or draws them; slide_extractfeatures
exports them and this tool renders them. Pins: coordinate→pixel mapping
(with and without a slide background), viridis magnitude ordering (hot
patch brighter in G than cold), robust normalization, patch-size grid
inference, and the CLI end-to-end to a readable PNG.
"""

import os

import numpy as np
import pandas as pd
import pytest

import cv2

from multimodalbrainsurvival_tpu.cli.attention_heatmap import (
    infer_patch_size,
    main,
    render_heatmap,
)


def _frame():
    # 2x2 tile grid, stride 224; one hot tile at (224, 224)
    rows = [
        {"x": 0, "y": 0, "attention": 0.01},
        {"x": 224, "y": 0, "attention": 0.02},
        {"x": 0, "y": 224, "attention": 0.03},
        {"x": 224, "y": 224, "attention": 0.94},
    ]
    return pd.DataFrame(rows)


def test_infer_patch_size_from_grid():
    f = _frame()
    assert infer_patch_size(f["x"].to_numpy(), f["y"].to_numpy()) == 224
    one = pd.DataFrame([{"x": 5, "y": 7, "attention": 1.0}])
    assert infer_patch_size(one["x"].to_numpy(), one["y"].to_numpy()) == 224


def test_render_heatmap_white_canvas_orders_magnitude():
    img = render_heatmap(_frame(), target=128, alpha=1.0)
    # canvas covers the tiles' bounding box (448x448 level-0 → 128 px)
    assert img.shape == (128, 128, 3)
    hot = img[96, 96].astype(int)   # center of the (224,224) tile
    cold = img[32, 32].astype(int)  # center of the (0,0) tile
    # viridis: high end is yellow (G bright), low end dark purple
    assert hot[1] > cold[1] + 50
    assert not np.array_equal(hot, [255, 255, 255])


def test_render_heatmap_over_thumbnail_maps_coordinates():
    # slide is 448x448 level-0; thumbnail arrives at 64x64
    thumb = np.zeros((64, 64, 3), np.uint8)
    img = render_heatmap(
        _frame(), thumb=thumb, slide_dims=(448, 448), target=64, alpha=1.0
    )
    assert img.shape == (64, 64, 3)
    # the hot tile covers the lower-right quadrant of the thumbnail
    assert img[48, 48, 1] > img[16, 16, 1] + 50
    with pytest.raises(ValueError, match="slide_dims"):
        render_heatmap(_frame(), thumb=thumb)


def test_cli_writes_png(tmp_path):
    csv = tmp_path / "S1_patches.csv"
    _frame().rename_axis("id").to_csv(csv)
    out = tmp_path / "S1_attention.png"
    main(["--patches_csv", str(csv), "--output", str(out), "--target", "96"])
    img = cv2.imread(str(out))
    assert img is not None and img.shape == (96, 96, 3)

    # with a slide background: tiles land on the thumbnail's pixels
    slide_png = tmp_path / "S1.png"
    cv2.imwrite(str(slide_png), np.full((448, 448, 3), 40, np.uint8))
    main([
        "--patches_csv", str(csv), "--slide", str(slide_png),
        "--output", str(tmp_path / "bg.png"), "--target", "64",
    ])
    img2 = cv2.imread(str(tmp_path / "bg.png"))
    assert img2 is not None
    assert img2.shape[0] <= 64 and img2.shape[1] <= 64
    # default output path lands next to the csv
    main(["--patches_csv", str(csv), "--target", "32"])
    assert os.path.isfile(tmp_path / "S1_attention.png")
