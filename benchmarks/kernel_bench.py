"""Pallas fused bottleneck stage vs stock XLA on the folded serving path.

Benchmarks ``models/serving.py::fused_folded_extract`` (stride-1 bottleneck
chains VMEM-resident via ``ops/pallas/fused_stage.py``) against the stock
``fold_bn=True`` ResNet-50 extract, per fused-stage configuration.

Round-2 measurement on v5e-1 (bf16, batch 256, exact-match outputs):

    stock XLA        11,138 patches/s
    fused layer1      9,065
    fused layer2      9,905
    fused layer1+2    8,106

i.e. the kernel is numerically exact but LOSES: XLA's per-conv path sits at
the HBM roofline, and the bandwidth the fusion saves is repaid in sub-128
channel-dim MXU work and im2col staging (docs/DESIGN.md). Kept opt-in as
the recorded evidence for that roofline argument.

Usage: python benchmarks/kernel_bench.py [--batch 256]
"""

from __future__ import annotations

import os as _os, sys as _sys
# the venv's editable install can vanish mid-session (see
# .claude/skills/verify/SKILL.md); standalone scripts import the repo
# checkout defensively
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import time
from functools import partial

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.models import resnet50
    from multimodalbrainsurvival_tpu.models.folding import fold_resnet_variables
    from multimodalbrainsurvival_tpu.models.serving import fused_folded_extract
    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches

    stock = resnet50(dtype=jnp.bfloat16)
    v = fold_resnet_variables(
        stock.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
            train=False,
        )
    )
    model = resnet50(dtype=jnp.bfloat16, fold_bn=True)
    rng = np.random.default_rng(0)

    # correctness first: the kernel path must match the stock path on-chip
    xs = jnp.asarray(rng.integers(0, 255, size=(8, 224, 224, 3), dtype=np.uint8))
    h = preprocess_patches(xs, train=False, dtype=jnp.bfloat16)
    ref = model.apply(v, h, train=False, method="extract")
    got = fused_folded_extract(v, h)
    err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"on-chip rel err vs stock: {err:.2e}")

    def bench(fn, tag):
        x = jax.device_put(
            rng.integers(0, 255, size=(a.batch, 224, 224, 3), dtype=np.uint8)
        )

        @partial(jax.jit, static_argnames=("n",))
        def run(v, x, n):
            def body(i, acc):
                hh = preprocess_patches(
                    x ^ i.astype(jnp.uint8), train=False, dtype=jnp.bfloat16
                )
                return acc + fn(v, hh)[0, 0]

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(run(v, x, a.iters))
        t0 = time.perf_counter()
        float(run(v, x, a.iters))
        dt = time.perf_counter() - t0
        print(f"{tag}: {a.batch * a.iters / dt:.0f} patches/s")

    bench(lambda v, h: model.apply(v, h, train=False, method="extract"),
          "stock XLA (folded)")
    for stages in (("layer1",), ("layer2",), ("layer1", "layer2")):
        bench(partial(fused_folded_extract, fused_stages=stages),
              f"fused {'+'.join(stages)}")


if __name__ == "__main__":
    main()
