"""Render per-patch aggregator attention as a slide-overlay heatmap PNG.

Closes the interpretability loop the reference leaves open: its
``TanhAttention`` computes per-patch weights (``1_HistoPathology/
models.py:55-57``) but no reference script ever exports or visualizes
them. ``slide_extractfeatures`` (with ``save_patch_features``) writes
``<slide>_patches.csv`` — ``id, x, y, attention`` at level-0 coordinates —
and this tool turns that frame into the picture a pathologist actually
looks at: which tissue drives the slide's survival score.

    python -m multimodalbrainsurvival_tpu.cli.attention_heatmap \
        --patches_csv out/patches/S1_patches.csv \
        [--slide wsi/S1.svs] [--output out/S1_attention.png] \
        [--patch_size 224] [--target 1024] [--alpha 0.6]

With ``--slide`` the heatmap is alpha-blended over the slide thumbnail
(read through the same lazy readers the tiler uses — the lowest pyramid
level, no full-resolution decode); without it the overlay is drawn on a
white canvas of the tiles' bounding box. Attention is normalized robustly
(1st-99th percentile) and mapped through viridis — a perceptually-uniform,
colorblind-safe sequential map (magnitude = one ordered ramp; never a
rainbow). Patches with higher attention render hotter; the background
stays visible under ``alpha``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

import cv2


def infer_patch_size(xs: np.ndarray, ys: np.ndarray) -> int:
    """Level-0 tile footprint from the coordinate grid: the smallest
    positive step along either axis (tiles are laid on a stride grid)."""
    steps = []
    for v in (np.unique(xs), np.unique(ys)):
        if len(v) > 1:
            steps.append(int(np.diff(v).min()))
    return min(steps) if steps else 224


def render_heatmap(
    frame: pd.DataFrame,
    patch_size: int | None = None,
    thumb: np.ndarray | None = None,
    slide_dims: tuple[int, int] | None = None,
    target: int = 1024,
    alpha: float = 0.6,
) -> np.ndarray:
    """(x, y, attention) rows → RGB uint8 heatmap.

    ``thumb``: optional RGB background (any resolution); ``slide_dims``:
    the level-0 (width, height) the coordinates live in — required with
    ``thumb`` so tiles land on the right thumbnail pixels. Without a
    background the canvas is the tiles' bounding box on white.
    """
    xs = frame["x"].to_numpy(np.int64)
    ys = frame["y"].to_numpy(np.int64)
    att = frame["attention"].to_numpy(np.float64)
    if patch_size is None:
        patch_size = infer_patch_size(xs, ys)

    # robust [0, 1] normalization: attention is a softmax over thousands of
    # patches — a min/max stretch would let one outlier flatten the rest
    lo, hi = np.percentile(att, [1.0, 99.0])
    norm = np.clip((att - lo) / max(hi - lo, 1e-12), 0.0, 1.0)

    if thumb is not None:
        if slide_dims is None:
            raise ValueError("slide_dims is required with a thumbnail")
        w0, h0 = slide_dims
        th, tw = thumb.shape[:2]
        scale = min(target / max(tw, th), 1.0)
        canvas = cv2.resize(
            thumb, (max(int(tw * scale), 1), max(int(th * scale), 1)),
            interpolation=cv2.INTER_AREA,
        )
        fx = canvas.shape[1] / w0
        fy = canvas.shape[0] / h0
    else:
        w0 = int(xs.max()) + patch_size
        h0 = int(ys.max()) + patch_size
        f = target / max(w0, h0)
        canvas = np.full(
            (max(int(h0 * f), 1), max(int(w0 * f), 1), 3), 255, np.uint8
        )
        fx = fy = f

    # viridis via cv2's LUT: index 0..255 by normalized attention
    lut = cv2.applyColorMap(
        np.arange(256, dtype=np.uint8).reshape(1, 256), cv2.COLORMAP_VIRIDIS
    )[0][:, ::-1]  # BGR → RGB
    out = canvas.astype(np.float32)
    order = np.argsort(norm)  # draw hottest last so it is never occluded
    for i in order:
        x0 = int(round(xs[i] * fx))
        y0 = int(round(ys[i] * fy))
        x1 = max(int(round((xs[i] + patch_size) * fx)), x0 + 1)
        y1 = max(int(round((ys[i] + patch_size) * fy)), y0 + 1)
        color = lut[int(round(norm[i] * 255))].astype(np.float32)
        out[y0:y1, x0:x1] = (1 - alpha) * out[y0:y1, x0:x1] + alpha * color
    return out.astype(np.uint8)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--patches_csv", required=True, nargs="+",
                   help="<slide>_patches.csv file(s) from "
                        "slide_extractfeatures (save_patch_features)")
    p.add_argument("--slide", default=None, nargs="*",
                   help="matching slide file(s) for the thumbnail "
                        "background (same order as --patches_csv)")
    p.add_argument("--output", default=None,
                   help="output PNG (single input) or directory")
    p.add_argument("--patch_size", type=int, default=None,
                   help="level-0 tile footprint; inferred from the "
                        "coordinate grid when omitted")
    p.add_argument("--target", type=int, default=1024,
                   help="max output dimension in pixels")
    p.add_argument("--alpha", type=float, default=0.6)
    a = p.parse_args(argv)

    slides = a.slide or []
    if slides and len(slides) != len(a.patches_csv):
        raise SystemExit("--slide count must match --patches_csv")
    multi = len(a.patches_csv) > 1
    outdir = None
    if a.output and (multi or os.path.isdir(a.output)):
        outdir = a.output
        os.makedirs(outdir, exist_ok=True)

    for i, csv_path in enumerate(a.patches_csv):
        frame = pd.read_csv(csv_path)
        thumb = dims = None
        if slides:
            from multimodalbrainsurvival_tpu.data.tiler import (
                _region_rgb,
                open_slide,
            )

            slide = open_slide(slides[i])
            lowest = len(slide.level_dimensions) - 1
            thumb = _region_rgb(
                slide, (0, 0), lowest, slide.level_dimensions[lowest]
            )
            dims = slide.level_dimensions[0]
        img = render_heatmap(
            frame, patch_size=a.patch_size, thumb=thumb, slide_dims=dims,
            target=a.target, alpha=a.alpha,
        )
        stem = os.path.basename(csv_path).replace("_patches.csv", "")
        if outdir:
            out = os.path.join(outdir, f"{stem}_attention.png")
        else:
            out = a.output or os.path.join(
                os.path.dirname(csv_path) or ".", f"{stem}_attention.png"
            )
        # cv2.imwrite returns False instead of raising (e.g. missing parent
        # directory of a single-file --output) — fail loudly, not exit 0
        if not cv2.imwrite(out, img[:, :, ::-1]):
            raise SystemExit(f"failed to write {out}")
        print(f"{out}: {img.shape[1]}x{img.shape[0]} "
              f"({len(frame)} patches)")


if __name__ == "__main__":
    main()
