"""WSI tiling CLI.

Parity with ``1_HistoPathology/1_WSI2Patches.py:147-182``: same flags, same
artifacts (per-slide patch PNGs + loc.txt + mask.npy), per-slide process
fan-out. Accepts ``.svs`` (via OpenSlide when available) and plain images.
"""

from __future__ import annotations

import argparse
import glob
import os

from multimodalbrainsurvival_tpu.data.tiler import TileConfig, tile_slides


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wsi_path", type=str, required=True,
                   help="directory of whole-slide images")
    p.add_argument("--patch_path", type=str, required=True)
    p.add_argument("--mask_path", type=str, required=True)
    p.add_argument("--patch_size", type=int, default=224)
    p.add_argument("--max_patches_per_slide", type=int, default=2000)
    p.add_argument("--num_process", type=int, default=10)
    p.add_argument("--dezoom_factor", type=float, default=1.0)
    p.add_argument("--ext", type=str, default="svs",
                   help="slide file extension to glob (svs, png, tif, ...)")
    p.add_argument("--pack", type=int, default=0,
                   help="also write zero-decode patches.npy shards")
    a = p.parse_args(argv)

    slides = sorted(glob.glob(os.path.join(a.wsi_path, f"*.{a.ext}")))
    if not slides:
        raise SystemExit(f"no *.{a.ext} slides under {a.wsi_path}")
    os.makedirs(a.patch_path, exist_ok=True)
    os.makedirs(a.mask_path, exist_ok=True)
    cfg = TileConfig(
        patch_size=a.patch_size,
        max_patches_per_slide=a.max_patches_per_slide,
        dezoom_factor=a.dezoom_factor,
        pack=bool(a.pack),
    )
    counts = tile_slides(slides, a.patch_path, a.mask_path, cfg,
                         num_processes=a.num_process)
    for s, n in zip(slides, counts):
        print(f"{os.path.basename(s)}: {n} patches")


if __name__ == "__main__":
    main()
