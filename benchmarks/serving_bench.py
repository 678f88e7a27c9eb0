"""End-to-end extractfeatures serving benchmark: tiles on disk → features.

Measures the REAL serving path of ``cli/histo_extractfeatures`` (host decode
→ device preprocessing → bf16 ResNet-50 extract → D2H), comparing the PNG
decode path (native C++ loader) against packed ``patches.npy`` shards.

The pure-device ceiling is ``bench.py``'s number; this measures how close the
full pipeline gets (host-bound on few-core machines — this container has ONE
CPU core, so the gap here is the host's, not the TPU's).

Usage: python benchmarks/serving_bench.py [--n_slides 4] [--patches 64]
"""

from __future__ import annotations

import os as _os, sys as _sys
# the venv's editable install can vanish mid-session (see
# .claude/skills/verify/SKILL.md); standalone scripts import the repo
# checkout defensively
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import os
import shutil
import time

import numpy as np


def build_cohort(root: str, n_slides: int, patches_per_slide: int, size: int):
    import cv2
    import pandas as pd

    from multimodalbrainsurvival_tpu.data.tiler import pack_patch_dir

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for s in range(n_slides):
        wsi = f"BENCH-{s:02d}"
        d = os.path.join(root, "patches", wsi)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "loc.txt"), "w") as loc:
            loc.write(f"slide_id {wsi}\nid x y patch_level ps ps\n")
            for i in range(patches_per_slide):
                # H&E-like texture (realistic PNG entropy)
                img = rng.integers(120, 230, size=(size, size, 3), dtype=np.uint8)
                cv2.imwrite(os.path.join(d, f"{wsi}_patch_{i}.png"),
                            img[:, :, ::-1])
                loc.write(f"{i} {i} 0 0 {size} {size}\n")
        pack_patch_dir(d)
        rows.append({"case": f"case{s}", "survival_months": 10.0 + s,
                     "vital_status": 1, "wsi_file_name": f"{wsi}.svs"})
    pd.DataFrame(rows).to_csv(os.path.join(root, "cohort.csv"), index=False)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n_slides", type=int, default=4)
    p.add_argument("--patches", type=int, default=64)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--bag_size", type=int, default=4)
    p.add_argument("--root", default="/tmp/serving_bench")
    p.add_argument("--keep", action="store_true")
    a = p.parse_args(argv)

    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.data import PatchBagDataset
    from multimodalbrainsurvival_tpu.models import (
        AggregationModel,
        make_aggregator,
        resnet50,
    )
    from multimodalbrainsurvival_tpu.train.adapters import MILAdapter
    from multimodalbrainsurvival_tpu.cli.histo_extractfeatures import (
        extract_split,
    )

    if not os.path.isdir(os.path.join(a.root, "patches")):
        build_cohort(a.root, a.n_slides, a.patches, a.size)

    model = AggregationModel(
        resnet=resnet50(dtype=jnp.bfloat16),
        aggregator=make_aggregator("identity"),
        aggregator_dim=2048,
    )
    import jax

    adapter = MILAdapter(model=model, loader_kwargs={"num_threads": 8})
    total = a.n_slides * a.patches

    results = {}
    for mode, prefer_packed in (("png", False), ("packed", True)):
        ds = PatchBagDataset(
            os.path.join(a.root, "patches"),
            os.path.join(a.root, "cohort.csv"),
            img_size=a.size, bag_size=a.bag_size,
            max_patches_total=a.patches, prefer_packed=prefer_packed,
        )
        probe = next(ds.batches(a.batch_size, num_threads=8))
        variables = adapter.init(
            jax.random.PRNGKey(0),
            {k: jnp.asarray(probe[k]) for k in adapter.array_keys},
        )
        # warm (compile)
        extract_split(adapter, variables, ds, a.batch_size)
        t0 = time.perf_counter()
        cases, _, feats = extract_split(adapter, variables, ds, a.batch_size)
        dt = time.perf_counter() - t0
        rate = total / dt
        results[mode] = rate
        print(f"{mode}: {rate:.0f} patches/s end-to-end "
              f"({len(feats)} bags, {len(set(cases))} cases)")
    print(f"packed/png speedup: {results['packed'] / results['png']:.2f}x")
    if not a.keep:
        shutil.rmtree(a.root, ignore_errors=True)


if __name__ == "__main__":
    main()
