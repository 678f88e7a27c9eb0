"""Op-level device-time attribution of the int8 (W8A8) serving program.

DESIGN item 20 left the int8 path at ~18.8k patches/s — ~59% of its own
26 MB/patch bandwidth bound — attributing the residual to "the
int8-conv/VPU-epilogue mix" without an op-level breakdown. This harness
produces that breakdown (round-5 verdict Next #1): compiled-HLO
cost_analysis (bytes + flops) plus a jax.profiler trace attributed per
conv-shape group / fusion, exactly the methodology of
``benchmarks/profile_serving.py`` (DESIGN item 14: read ONLY the
"XLA Ops" device line).

Usage: python benchmarks/profile_int8.py [--batch 512] [--iters 8]
       [--split] (key unmatched ops by full fusion name)
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import argparse
import os
import tempfile
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--split", action="store_true")
    p.add_argument("--trace-dir", default=None)
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodalbrainsurvival_tpu.models import resnet50
    from multimodalbrainsurvival_tpu.models.folding import (
        fold_resnet_variables,
    )
    from multimodalbrainsurvival_tpu.models.quantize import (
        float_extract_amax,
        merge_amax,
        quantize_resnet,
        quantized_extract,
    )
    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches
    from profile_serving import attribute_trace

    stock = resnet50(dtype=jnp.bfloat16)
    variables = fold_resnet_variables(
        stock.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
            train=False,
        )
    )
    rng = np.random.default_rng(0)
    f32v = {"params": jax.tree.map(
        lambda t: jnp.asarray(t, jnp.float32), variables["params"])}
    x_cal = rng.integers(0, 255, size=(32, 224, 224, 3), dtype=np.uint8)
    amax = jax.device_get(jax.jit(
        lambda v, u: float_extract_amax(
            v, preprocess_patches(u, train=False, dtype=jnp.float32))[1]
    )(f32v, x_cal))
    qtree = jax.device_put(quantize_resnet(f32v, merge_amax([amax])))

    @jax.jit
    def extract(q, u8):
        x = preprocess_patches(u8, train=False, dtype=jnp.float32)
        return quantized_extract(q, x)

    x = jax.device_put(
        rng.integers(0, 255, size=(a.batch, 224, 224, 3), dtype=np.uint8)
    )
    compiled = extract.lower(qtree, x).compile()
    hlo = compiled.as_text()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    print(f"cost_analysis: {ca.get('bytes accessed', 0) / a.batch / 1e6:.2f} "
          f"MB/patch, {ca.get('flops', 0) / a.batch / 1e9:.2f} GFLOP/patch")

    jax.block_until_ready(extract(qtree, x))
    t0 = time.perf_counter()
    jax.block_until_ready(extract(qtree, x))
    wall = time.perf_counter() - t0
    print(f"int8 extract b{a.batch}: {wall * 1e3:.2f} ms wall "
          f"({a.batch / wall:.0f} patches/s single-dispatch)")

    trace_dir = a.trace_dir or tempfile.mkdtemp(prefix="int8_trace_")
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    for _ in range(a.iters):
        out = extract(qtree, x)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    by_sig = attribute_trace(trace_dir, hlo, split_unmatched=a.split)
    print("\nper-group device ms/iter (conv output shape, or [op]):")
    total = 0.0
    for sig, ms in sorted(by_sig.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ms / a.iters:8.3f}  {sig}")
    total = sum(by_sig.values())
    print(f"\ndevice total: {total / a.iters:.2f} ms/iter "
          f"({a.batch * a.iters / total * 1e3:.0f} patches/s device)")


if __name__ == "__main__":
    main()
