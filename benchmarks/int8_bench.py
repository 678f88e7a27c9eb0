"""int8 (W8A8) vs bf16 serving throughput on the real chip.

Measures the ResNet-50 per-patch extract path (the bench.py headline) in
three variants at each batch size:

- ``bf16``   — the folded bf16 model (the current serving default);
- ``int8``   — ``models/quantize.quantized_extract`` (int8 weights +
  calibrated int8 activations, int32 MXU accumulation);
- agreement — per-sample cosine between the two embeddings on the same
  uint8 input (the accuracy cost of the speed).

Motivation: the round-3 roofline audit (docs/DESIGN.md item 16) pinned the
bf16 path at 77-86% of the v5e HBM bandwidth bound with ~52 MB of activation
traffic per patch. int8 halves the activation stream and the v5e MXU runs
int8 at 2x bf16 TOPs, so this is the one remaining lever that moves the
ceiling rather than chasing the last ~20% under it.

Usage: python benchmarks/int8_bench.py [--batches 256,512] [--iters 10]
Writes one human-readable line per (variant, batch); record the outcome in
docs/DESIGN.md whichever way it goes.
"""

from __future__ import annotations

import os as _os, sys as _sys
# the venv's editable install can vanish mid-session (see
# .claude/skills/verify/SKILL.md); standalone scripts import the repo
# checkout defensively
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batches", default="256,512")
    p.add_argument("--iters", type=int, default=10)
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.models import resnet50
    from multimodalbrainsurvival_tpu.models.folding import fold_resnet_variables
    from multimodalbrainsurvival_tpu.models.quantize import (
        float_extract_amax,
        merge_amax,
        quantize_resnet,
        quantized_extract,
    )
    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches

    print(f"devices: {jax.devices()}")
    stock = resnet50(dtype=jnp.bfloat16)
    variables = fold_resnet_variables(
        stock.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
            train=False,
        )
    )
    model = resnet50(dtype=jnp.bfloat16, fold_bn=True)
    rng = np.random.default_rng(0)

    # calibrate on one small preprocessed batch (scale ranges only)
    x_cal = rng.integers(0, 255, size=(32, 224, 224, 3), dtype=np.uint8)
    f32v = {"params": jax.tree.map(
        lambda t: jnp.asarray(t, jnp.float32), variables["params"])}
    amax = jax.device_get(jax.jit(
        lambda v, u: float_extract_amax(
            v, preprocess_patches(u, train=False, dtype=jnp.float32))[1]
    )(f32v, x_cal))
    qtree = jax.device_put(quantize_resnet(f32v, merge_amax([amax])))

    @jax.jit
    def extract_bf16(v, u):
        h = preprocess_patches(u, train=False, dtype=jnp.bfloat16)
        return model.apply(v, h, train=False, method="extract")

    @jax.jit
    def extract_int8(q, u):
        h = preprocess_patches(u, train=False, dtype=jnp.float32)
        return quantized_extract(q, h)

    def bench(fn, args, batch):
        jax.block_until_ready(fn(*args))  # compile
        jax.block_until_ready(fn(*args))  # warm
        t0 = time.perf_counter()
        for _ in range(a.iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / a.iters
        return batch / dt, np.asarray(out, np.float32)

    for batch in (int(b) for b in a.batches.split(",")):
        u = jax.device_put(
            rng.integers(0, 255, size=(batch, 224, 224, 3), dtype=np.uint8)
        )
        pps_f, emb_f = bench(extract_bf16, (variables, u), batch)
        pps_q, emb_q = bench(extract_int8, (qtree, u), batch)
        num = np.sum(emb_f * emb_q, axis=-1)
        den = np.linalg.norm(emb_f, axis=-1) * np.linalg.norm(emb_q, axis=-1)
        cos = num / np.maximum(den, 1e-30)
        print(
            f"batch {batch:5d}: bf16 {pps_f:8.0f} patches/s | "
            f"int8 {pps_q:8.0f} patches/s ({pps_q / pps_f:.2f}x) | "
            f"cosine min/mean {cos.min():.4f}/{cos.mean():.4f}"
        )


if __name__ == "__main__":
    main()
