"""Exported-artifact serving vs in-process serving, same chip, same shapes.

The serving artifact (`serving.export_mil_artifact`) is the deployment
story: one StableHLO blob, weights baked in, zero model code at load time.
This benchmark proves the packaging costs nothing at run time — the
artifact's `.call` and the in-process jitted extract path run the same
computation at the same throughput on the flagship serving config
(BN-folded bf16 ResNet-50 + attention aggregator, 224² patches).

Method mirrors bench.py exactly: all iterations run inside ONE jitted
`fori_loop`, chained through an accumulator with the input perturbed per
iteration so nothing can be hoisted/CSE'd/deduped (eager same-input loops
measured 100-350× too fast on the tunneled runtime — the dead identical
dispatches never really execute). `jax.export`ed computations are traceable,
so the artifact runs under the SAME harness via `exported.call` inside the
loop body. Reports patches/s for both paths and the ratio.

Usage: python benchmarks/artifact_bench.py [--batch 512] [--iters 20]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import tempfile
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=512,
                   help="patches per call (bags of 1, like extractfeatures)")
    p.add_argument("--iters", type=int, default=20)
    a = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.models import (
        AggregationModel, make_aggregator, resnet50,
    )
    from multimodalbrainsurvival_tpu.models.folding import fold_resnet_variables
    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches
    from multimodalbrainsurvival_tpu.serving import (
        export_mil_artifact, load_artifact,
    )

    def build(fold):
        return AggregationModel(
            resnet=resnet50(dtype=jnp.bfloat16, fold_bn=fold),
            aggregator=make_aggregator("attention", dim=2048,
                                       dtype=jnp.bfloat16),
            aggregator_dim=2048,
        )

    stock = build(False)
    variables = stock.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 224, 224, 3), jnp.bfloat16),
        train=False,
    )
    folded = fold_resnet_variables(variables)
    model = build(True)

    B = a.batch
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (B, 1, 224, 224, 3), dtype=np.uint8)))
    mask = jax.device_put(jnp.ones((B, 1), jnp.float32))

    from functools import partial

    # --- in-process path (what histo_extractfeatures serves through)
    def extract(v, xx, m):
        h = preprocess_patches(xx, train=False, dtype=jnp.bfloat16)
        emb, attn = model.apply(v, h, mask=m, train=False, method="extract")
        return emb.astype(jnp.float32)

    def timed_loop(fn):
        """bench.py's harness: n chained, input-perturbed iterations in one
        jitted call."""

        @partial(jax.jit, static_argnames=("n",))
        def run_n(xx, m, n):
            def body(i, acc):
                xi = xx ^ i.astype(jnp.uint8)
                return acc + fn(xi, m)[0, 0]

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(run_n(x, mask, a.iters))  # compile + warm
        t0 = time.perf_counter()
        float(run_n(x, mask, a.iters))
        return B * a.iters / (time.perf_counter() - t0)

    emb0 = jax.jit(extract)(folded, x, mask)
    inproc = timed_loop(lambda xx, m: extract(folded, xx, m))

    # --- exported artifact (load-from-disk, zero model code)
    with tempfile.TemporaryDirectory() as d:
        export_mil_artifact(model, folded, d, img_size=224, arch="resnet50")
        art = load_artifact(d)
        got = art.call(x, mask)
        np.testing.assert_allclose(
            np.asarray(got["embedding"]), np.asarray(emb0),
            rtol=2e-2, atol=2e-2,  # bf16 program, f32 outputs
        )
        artifact = timed_loop(
            lambda xx, m: art.exported.call(xx, m)["embedding"])

    print(f"batch {B}, {a.iters} iters:")
    print(f"  in-process extract : {inproc:10.1f} patches/s")
    print(f"  exported artifact  : {artifact:10.1f} patches/s")
    print(f"  artifact / in-proc : {artifact / inproc:10.3f}")


if __name__ == "__main__":
    main()
