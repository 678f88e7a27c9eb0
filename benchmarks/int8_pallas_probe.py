"""Pallas fused int8-matmul+requant kernel probe — a RECORDED NEGATIVE.

Round-5 verdict Next #1 asked for a Pallas/Mosaic attempt at the int8
serving ceiling. This harness holds that attempt (docs/DESIGN.md item 30):
a tiled int8 x int8 -> s32 matmul whose requant epilogue
(scale·acc + bias -> relu -> round -> clip -> int8) runs on the VMEM tile
before store, auto-pipelined over the M (and optionally N) grid.

Measured on v5e-1:

- ISOLATED (``--isolated``, chained in-jit loop per shape): the kernel
  BEATS XLA's conv emitter on every 1×1-conv shape of the int8 ResNet-50,
  by 15-35% (e.g. 1.22 vs 1.85 ms at M=401k/K=128/N=512; 0.97 vs 1.36 at
  M=25k/K=512/N=2048).
- IN-PROGRAM (``--inprogram``, the kernel patched into
  ``models/quantize._qconv_q`` for eligible convs): **3-4× SLOWER** than
  the stock program (90-115 vs 28.6 ms at batch 512). XLA's fused convs
  pick exotic tiled layouts (e.g. ``{3,0,2,1:T(8,128)}``) that
  ``pallas_call`` inputs cannot accept, so every kernel boundary inserts a
  full-tensor relayout copy — which costs more than the kernel saves.

The discrepancy is DESIGN item 21's lesson in both directions at once: an
isolated-op probe is not the program. The shipped int8 path instead uses
the XLA-level levers that survive in-program (1×1-as-dot, precombined
epilogue, bf16 stem — ``models/quantize.py``). Numerics: the kernel's
output is cosine-0.999992 against the XLA path (same int32 accumulation,
float-epilogue rounding differs by dot-order only).

Usage: python benchmarks/int8_pallas_probe.py [--isolated] [--inprogram]
           [--batch 512]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time
from functools import partial

import numpy as np


def _kern(a_ref, w_ref, s_ref, b_ref, o_ref, *, relu):
    import jax.numpy as jnp

    acc = jnp.dot(a_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s_ref[:] + b_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[:] = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def qmm_requant(a, w, s2, b2, relu, tn_cap=2048):
    """int8 (M,K) @ (K,N) -> int8 (M,N) with the requant epilogue fused on
    the VMEM tile; grid over M (and N when N > tn_cap)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    M, K = a.shape
    N = w.shape[1]
    tm = 512 if M % 512 == 0 else 256
    tn = min(N, tn_cap)
    grid = (N // tn, M // tm) if tn < N else (M // tm,)
    if tn < N:
        specs = [pl.BlockSpec((tm, K), lambda j, i: (i, 0)),
                 pl.BlockSpec((K, tn), lambda j, i: (0, j)),
                 pl.BlockSpec((1, tn), lambda j, i: (0, j)),
                 pl.BlockSpec((1, tn), lambda j, i: (0, j))]
        out = pl.BlockSpec((tm, tn), lambda j, i: (i, j))
    else:
        specs = [pl.BlockSpec((tm, K), lambda i: (i, 0)),
                 pl.BlockSpec((K, N), lambda i: (0, 0)),
                 pl.BlockSpec((1, N), lambda i: (0, 0)),
                 pl.BlockSpec((1, N), lambda i: (0, 0))]
        out = pl.BlockSpec((tm, N), lambda i: (i, 0))
    return pl.pallas_call(
        partial(_kern, relu=relu),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int8),
        grid=grid, in_specs=specs, out_specs=out,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * len(grid)),
    )(a, w, s2.reshape(1, N), b2.reshape(1, N))


def run_isolated(batch):
    import jax
    import jax.numpy as jnp
    from jax import lax

    shapes = [(batch * 56 * 56, 64, 256), (batch * 28 * 28, 128, 512),
              (batch * 14 * 14, 256, 1024), (batch * 7 * 7, 512, 2048),
              (batch * 14 * 14, 1024, 512)]
    rng = np.random.default_rng(0)

    def bench(fn, a, rest, iters=30):
        @partial(jax.jit, static_argnames=("n",))
        def loop(a, rest, n):
            def body(i, acc):
                ai = a ^ i.astype(jnp.int8)
                return acc + fn(ai, *rest)[0, 0].astype(jnp.float32)
            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(np.asarray(loop(a, rest, iters)))
        t0 = time.perf_counter()
        float(np.asarray(loop(a, rest, iters)))
        return (time.perf_counter() - t0) / iters * 1e3

    for (M, K, N) in shapes:
        a = jax.device_put(rng.integers(-127, 128, (M, K)).astype(np.int8))
        w = jax.device_put(rng.integers(-127, 128, (K, N)).astype(np.int8))
        s = jax.device_put((rng.uniform(0.5, 2, N) / 1e3).astype(np.float32))
        b = jax.device_put(rng.uniform(-1, 1, N).astype(np.float32))

        def xla_conv(ai, wi, si, bi):
            y = lax.conv_general_dilated(
                ai.reshape(1, M // 128, 128, K), wi.reshape(1, 1, K, N),
                (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = jnp.maximum(y.astype(jnp.float32) * si + bi, 0.0)
            return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8
                                                            ).reshape(M, N)

        ms_xla = bench(xla_conv, a, (w, s, b))
        ms_pl = bench(lambda ai, wi, si, bi:
                      qmm_requant(ai, wi, si, bi, True), a, (w, s, b))
        ideal = (M * K + K * N + M * N) / 1e9 / 819 * 1e3
        print(f"M{M} K{K} N{N}: xla {ms_xla:.2f} ms, pallas {ms_pl:.2f} ms "
              f"(bandwidth ideal {ideal:.2f})", flush=True)


def run_inprogram(batch):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from multimodalbrainsurvival_tpu.models import resnet50
    from multimodalbrainsurvival_tpu.models.folding import (
        fold_resnet_variables,
    )
    from multimodalbrainsurvival_tpu.models import quantize as Q
    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches

    stock = resnet50(dtype=jnp.bfloat16)
    variables = fold_resnet_variables(stock.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
        train=False))
    rng = np.random.default_rng(0)
    f32v = {"params": jax.tree.map(lambda t: jnp.asarray(t, jnp.float32),
                                   variables["params"])}
    x_cal = rng.integers(0, 255, size=(32, 224, 224, 3), dtype=np.uint8)
    amax = jax.device_get(jax.jit(lambda v, u: Q.float_extract_amax(
        v, preprocess_patches(u, train=False, dtype=jnp.float32))[1]
    )(f32v, x_cal))
    qtree = jax.device_put(Q.quantize_resnet(f32v, Q.merge_amax([amax])))
    x = jax.device_put(
        rng.integers(0, 255, size=(batch, 224, 224, 3), dtype=np.uint8))

    orig = Q._qconv_q

    def qconv_pallas(x_q, s_in, cp, s_out, *, stride=1, padding="SAME",
                     relu=True):
        k = cp["k"]
        kh, kw, kin, kout = k.shape
        M = x_q.shape[0] * x_q.shape[1] * x_q.shape[2]
        if (kh == 1 and kw == 1 and stride == 1 and kout % 128 == 0
                and kin % 64 == 0 and M % 256 == 0):
            y = qmm_requant(x_q.reshape(M, kin), k.reshape(kin, kout),
                            (s_in * cp["ws"]) / s_out, cp["b"] / s_out, relu)
            return y.reshape(x_q.shape[:3] + (kout,))
        return orig(x_q, s_in, cp, s_out, stride=stride, padding=padding,
                    relu=relu)

    def bench(tag, iters=10):
        @partial(jax.jit, static_argnames=("n",))
        def extract_n(q, u8, n):
            def body(i, acc):
                xi = u8 ^ i.astype(jnp.uint8)
                xx = preprocess_patches(xi, train=False, dtype=jnp.float32)
                return acc + Q.quantized_extract(q, xx)[0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(np.asarray(extract_n(qtree, x, iters)))
        t0 = time.perf_counter()
        float(np.asarray(extract_n(qtree, x, iters)))
        dt = time.perf_counter() - t0
        print(f"{tag}: {batch * iters / dt:.0f} patches/s "
              f"({dt / iters * 1e3:.2f} ms/iter)", flush=True)

    bench("stock")
    Q._qconv_q = qconv_pallas
    try:
        bench("pallas-1x1")
    finally:
        Q._qconv_q = orig


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--isolated", action="store_true")
    p.add_argument("--inprogram", action="store_true")
    a = p.parse_args(argv)
    if not (a.isolated or a.inprogram):
        a.isolated = a.inprogram = True
    if a.isolated:
        run_isolated(a.batch)
    if a.inprogram:
        run_inprogram(a.batch)


if __name__ == "__main__":
    main()
