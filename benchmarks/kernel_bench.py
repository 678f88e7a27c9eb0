"""Pallas fused dropout-matmul vs stock XLA on the RNA encoder shapes.

Compares three implementations of ``dropout(x) @ W`` at the RNA pipeline's
hot shape (batch × 12778 → 4096):

1. XLA baseline: ``jax.random.bernoulli`` mask materialized, masked x in HBM,
   then ``jnp.dot`` (what ``nn.Dropout + nn.Dense`` lowers to),
2. our Pallas kernel (mask generated inside the matmul tiles),
3. no-dropout pure matmul (the speed-of-light reference for the op).

Usage: python benchmarks/kernel_bench.py [--batch 256]
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--k", type=int, default=12778)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.ops.pallas import dropout_matmul

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if a.dtype == "bfloat16" else jnp.float32
    x = jnp.asarray(rng.normal(size=(a.batch, a.k)).astype(np.float32)).astype(dt)
    w = jnp.asarray(rng.normal(size=(a.k, a.n)).astype(np.float32)).astype(dt)
    flops = 2 * a.batch * a.k * a.n

    @partial(jax.jit, static_argnames=("n",))
    def xla_ref(x, w, key, n):
        def body(i, acc):
            k = jax.random.fold_in(key, i)
            mask = jax.random.bernoulli(k, 0.5, x.shape)
            xd = jnp.where(mask, x * 2.0, 0.0)
            return acc + (xd @ w)[0, 0]

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @partial(jax.jit, static_argnames=("n",))
    def pallas_fused(x, w, n):
        def body(i, acc):
            return acc + dropout_matmul(x, w, i, 0.5)[0, 0]

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @partial(jax.jit, static_argnames=("n",))
    def pure(x, w, n):
        def body(i, acc):
            return acc + ((x + i * 0.0) @ w)[0, 0]

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    for tag, fn, args in (
        ("xla dropout+matmul", xla_ref, (x, w, jax.random.PRNGKey(0), a.iters)),
        ("pallas fused", pallas_fused, (x, w, a.iters)),
        ("pure matmul", pure, (x, w, a.iters)),
    ):
        float(fn(*args))  # compile
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args))
            dt = time.perf_counter() - t0
            best = max(best, a.iters / dt)
        print(
            f"{tag}: {best * flops / 1e12:.1f} TFLOP/s "
            f"({1e3 / best:.2f} ms/iter)",
            flush=True,
        )


if __name__ == "__main__":
    main()
