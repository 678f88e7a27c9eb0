"""Training-step throughput: the reference's own ``bags/s`` metric.

Measures the full flagship MIL training step — on-device augmentation,
bf16 ResNet-50 forward+backward with mutable BN stats, Cox loss with its
batch-global risk set, torch-semantics Adam update — as one jitted program
dispatched per step with a device-carried PRNG key (exactly how
``train/loop.py`` drives it: every input is device-resident, each step is
one async enqueue, block only at the end).

``--method fori`` instead iterates inside one jitted ``lax.fori_loop``.
Measured on v5e-1 this is ~20% SLOWER than per-step dispatch (25.9 vs
21.7 ms/step at b128/bag1/freeze-2): XLA cannot pipeline/double-buffer
across sequential loop iterations the way the hardware queue pipelines
back-to-back executions, so in-jit looping is the wrong measurement AND
the wrong production schedule (same finding as the ``steps_per_dispatch``
scan — docs/DESIGN.md item 11). Trace attribution of queued steps puts the
device-bound figure at 17.4 ms/step = 7,351 bags/s
(``benchmarks/profile_serving.attribute_trace``); per-step wall on this
tunneled chip pays ~4 ms/step of dispatch RTT on top.

``--n_layers_to_train`` applies the reference's freeze ladder
(default 2 = [fc, layer4] + aggregator, ``config_ffpe_train.json``): frozen
params are stop_gradient'd exactly as in ``train/loop.py``, so — like
torch's requires_grad=False — no backward runs below the trained layers.
Pass 6 to train (and backprop through) the whole network.

The reference prints ``bags/s`` from its CUDA training loop
(``2_HistoPath_train.py:350,360-364``); no number ships in the repo, so this
is our measured figure for the same quantity.

Usage: python benchmarks/train_bench.py [--batch 32] [--bag 4]
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
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--bag", type=int, default=4)
    p.add_argument("--iters", type=int, default=24)
    p.add_argument("--n_layers_to_train", type=int, default=2)
    p.add_argument("--method", choices=("dispatch", "fori"),
                   default="dispatch")
    p.add_argument("--remat", action="store_true",
                   help="per-block activation checkpointing (remat: true)")
    p.add_argument("--freeze_bn", action="store_true",
                   help="FrozenBatchNorm fine-tuning (freeze_bn: true) — "
                        "running-stat normalization in train mode, no stat "
                        "updates (docs/DESIGN.md item 26)")
    p.add_argument("--memory", action="store_true",
                   help="AOT-compile the step and print memory_analysis "
                        "instead of executing (works even for OOM shapes)")
    a = p.parse_args(argv)

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
        resnet=resnet50(dtype=jnp.bfloat16, remat_blocks=a.remat,
                        freeze_bn=a.freeze_bn),
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

    def one_step(params, batch_stats, opt_state, key):
        key, sub = jax.random.split(key)
        k1, k2 = jax.random.split(sub)

        def loss_fn(p):
            p = tie_off(p)
            h = preprocess_patches(x, train=True, key=k1, dtype=jnp.bfloat16)
            (out, _), upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, h, mask=mask,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": k2},
            )
            # freeze_bn mutates nothing — fall back to the input stats
            return cox_partial_likelihood_loss(out[:, 0], t, e), upd.get(
                "batch_stats", batch_stats
            )

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, key

    step = jax.jit(one_step)

    if a.memory:
        # AOT: lower + compile only — memory_analysis is available without
        # running (and without the allocation that an OOM shape would fail)
        compiled = step.lower(
            variables["params"], variables["batch_stats"], opt_state,
            jax.random.PRNGKey(0),
        ).compile()
        m = compiled.memory_analysis()
        gib = 1 << 30
        print(
            f"batch={B} bag={bag} n_layers={a.n_layers_to_train} "
            f"remat={a.remat}:\n"
            f"  temp   {m.temp_size_in_bytes / gib:.2f} GiB\n"
            f"  args   {m.argument_size_in_bytes / gib:.2f} GiB\n"
            f"  output {m.output_size_in_bytes / gib:.2f} GiB\n"
            f"  total  {(m.temp_size_in_bytes + m.argument_size_in_bytes) / gib:.2f} GiB"
        )
        return

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(0, 1, 2))
    def train_n(params, batch_stats, opt_state, key, n):
        def body(i, carry):
            return one_step(*carry[:3], jax.random.fold_in(key, i))[:3]

        return jax.lax.fori_loop(
            0, n, body, (params, batch_stats, opt_state)
        )

    params, batch_stats = variables["params"], variables["batch_stats"]

    def run(n0):
        nonlocal_state = [params, batch_stats, opt_state]
        if a.method == "fori":
            nonlocal_state[:] = jax.block_until_ready(train_n(
                *nonlocal_state, jax.random.PRNGKey(n0), a.iters
            ))
        else:
            key = jax.device_put(jax.random.PRNGKey(n0))
            for _ in range(a.iters):
                p, bs, o, key = step(*nonlocal_state, key)
                nonlocal_state[:] = [p, bs, o]
            jax.block_until_ready(nonlocal_state[0])
        return nonlocal_state

    params, batch_stats, opt_state = run(1)  # compile + warm
    t0 = time.perf_counter()
    params, batch_stats, opt_state = run(2)
    dt = time.perf_counter() - t0
    bags_s = B * a.iters / dt
    print(
        f"train step: {bags_s:.1f} bags/s  "
        f"({bags_s * bag:.0f} patches/s incl. fwd+bwd+update, bag={bag})"
    )


if __name__ == "__main__":
    main()
