"""Repack per-slide PNG patch directories into zero-decode shards.

Writes ``<slide>/patches.npy`` — a packed (N, P, P, 3) uint8 array the
loaders mmap directly, eliminating per-patch PNG decode from the serving
path (the host-side bottleneck for extractfeatures at scale; SURVEY.md §7).
Additive: the reference PNG/loc.txt artifacts are untouched and remain the
source of truth. Idempotent per slide.
"""

from __future__ import annotations

import argparse
import glob
import os

from multimodalbrainsurvival_tpu.data.tiler import pack_patch_dir


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--patch_path", type=str, required=True,
                   help="root directory of per-slide patch dirs")
    a = p.parse_args(argv)
    dirs = sorted(
        d for d in glob.glob(os.path.join(a.patch_path, "*"))
        if os.path.isfile(os.path.join(d, "loc.txt"))
    )
    if not dirs:
        raise SystemExit(f"no patch dirs with loc.txt under {a.patch_path}")
    total = 0
    for d in dirs:
        n = pack_patch_dir(d)
        total += n
        print(f"{os.path.basename(d)}: packed {n} patches")
    print(f"packed {total} patches across {len(dirs)} slides")


if __name__ == "__main__":
    main()
