"""Phase decomposition + roofline audit of the MIL TRAIN step (r3 verdict #1).

DESIGN item 16 audited the SERVING path against the v5e roofline; this does
the same for training. Three jitted programs isolate the phases the full
step composes:

  fwd    — loss forward only (augmentation + bf16 ResNet fwd with mutable BN
           stats + Cox), what ``evaluate`` would pay at train-mode numerics
  grad   — jax.value_and_grad of the same (fwd + backward, no optimizer)
  full   — the production step (grad + torch-Adam update), identical to
           ``benchmarks/profile_train.py``'s

Each phase reports measured ms, XLA ``cost_analysis`` FLOPs + HBM bytes,
the roofline bound max(flops/peak, bytes/bw), and measured/bound. The
differences (grad − fwd = backward, full − grad = optimizer) attribute the
step without trace-parsing; run ``profile_train.py`` for per-op shapes.

Reference hot loop being rebuilt: ``2_HistoPath_train.py:308-364``.

Usage: python benchmarks/train_roofline.py [--batch 128] [--bag 1]
           [--n_layers_to_train 6] [--iters 10]
           [--peak-tflops 197] [--hbm-gbs 819]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def build_phases(a):
    import jax
    import jax.numpy as jnp
    import optax

    from multimodalbrainsurvival_tpu.models import (
        AggregationModel, make_aggregator, resnet50,
    )
    from multimodalbrainsurvival_tpu.ops import cox_partial_likelihood_loss
    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches
    from multimodalbrainsurvival_tpu.train.optim import (
        build_grouped_optimizer,
        mil_freeze_ladder,
        torch_adam,
    )

    model = AggregationModel(
        resnet=resnet50(dtype=jnp.bfloat16),
        aggregator=make_aggregator("attention", dim=2048, dtype=jnp.bfloat16),
        aggregator_dim=2048,
    )
    rng = np.random.default_rng(0)
    B, bag = a.batch, a.bag
    x = jax.device_put(
        rng.integers(0, 255, size=(B, bag, 224, 224, 3), dtype=np.uint8)
    )
    t = jnp.asarray(rng.uniform(1, 100, B).astype(np.float32))
    e = jnp.ones((B,), jnp.float32)
    mask = jnp.ones((B, bag), bool)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 224, 224, 3), jnp.bfloat16),
        train=False,
    )
    tx, labels = build_grouped_optimizer(
        variables["params"],
        [("train", mil_freeze_ladder(a.n_layers_to_train),
          torch_adam(5e-4, 1e-5))],
    )
    opt_state = tx.init(variables["params"])

    def tie_off(p):
        return jax.tree.map(
            lambda leaf, lab: jax.lax.stop_gradient(leaf)
            if lab == "_frozen" else leaf, p, labels,
        )

    def loss_fn(p, batch_stats, k1, k2):
        p = tie_off(p)
        h = preprocess_patches(x, train=True, key=k1, dtype=jnp.bfloat16)
        (out, _), upd = model.apply(
            {"params": p, "batch_stats": batch_stats}, h, mask=mask,
            train=True, mutable=["batch_stats"], rngs={"dropout": k2},
        )
        return cox_partial_likelihood_loss(out[:, 0], t, e), upd["batch_stats"]

    def fwd(params, batch_stats, key):
        k1, k2 = jax.random.split(key)
        return loss_fn(params, batch_stats, k1, k2)

    def grad(params, batch_stats, key):
        k1, k2 = jax.random.split(key)
        return jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, k1, k2
        )

    def full(params, batch_stats, opt_state, key):
        key, sub = jax.random.split(key)
        k1, k2 = jax.random.split(sub)
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, k1, k2)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, key

    key = jax.device_put(jax.random.PRNGKey(1))
    return {
        "fwd": (jax.jit(fwd),
                (variables["params"], variables["batch_stats"], key)),
        "grad": (jax.jit(grad),
                 (variables["params"], variables["batch_stats"], key)),
        "full": (jax.jit(full),
                 (variables["params"], variables["batch_stats"], opt_state,
                  key)),
    }


def measure(fn, args, iters):
    import jax

    compiled = fn.lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    out = jax.block_until_ready(compiled(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    flops = float(cost.get("flops", 0.0))
    bytes_ = float(cost.get("bytes accessed", 0.0))
    return ms, flops, bytes_


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--bag", type=int, default=1)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--n_layers_to_train", type=int, default=6)
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="bf16 peak of the chip (v5e spec: 197)")
    p.add_argument("--hbm-gbs", type=float, default=819.0,
                   help="HBM bandwidth (v5e spec: 819 GB/s)")
    a = p.parse_args(argv)

    phases = build_phases(a)
    rows = {}
    for name in ("fwd", "grad", "full"):
        fn, args = phases[name]
        ms, flops, bytes_ = measure(fn, args, a.iters)
        bound_flops = flops / (a.peak_tflops * 1e12) * 1e3
        bound_bytes = bytes_ / (a.hbm_gbs * 1e9) * 1e3
        bound = max(bound_flops, bound_bytes)
        rows[name] = (ms, flops, bytes_, bound_flops, bound_bytes, bound)

    print(f"\ntrain phase roofline  b{a.batch}/bag{a.bag}"
          f"/freeze{a.n_layers_to_train}  (peak {a.peak_tflops} TFLOP/s bf16,"
          f" HBM {a.hbm_gbs} GB/s)")
    print(f"{'phase':10} {'ms':>8} {'TFLOP':>7} {'GB':>7} "
          f"{'ms@MXU':>7} {'ms@HBM':>7} {'bound':>7} {'meas/bound':>10}")
    for name, (ms, fl, by, bf, bb, bo) in rows.items():
        print(f"{name:10} {ms:8.2f} {fl / 1e12:7.3f} {by / 1e9:7.2f} "
              f"{bf:7.2f} {bb:7.2f} {bo:7.2f} {ms / bo:10.2f}")

    fwd_ms = rows["fwd"][0]
    grad_ms = rows["grad"][0]
    full_ms = rows["full"][0]
    print(f"\nderived: backward = {grad_ms - fwd_ms:.2f} ms "
          f"({(grad_ms - fwd_ms) / fwd_ms:.2f}x fwd), "
          f"optimizer+aliasing = {full_ms - grad_ms:.2f} ms")
    bags = a.batch / full_ms * 1e3
    print(f"full step: {full_ms:.2f} ms = {bags:.0f} bags/s")


if __name__ == "__main__":
    main()
