"""Training-step throughput: the reference's own ``bags/s`` metric.

Measures the full flagship MIL training step — on-device augmentation,
bf16 ResNet-50 forward+backward with mutable BN stats, Cox loss with its
batch-global risk set, torch-semantics Adam update — as one jitted program,
iterated inside jit (anti-CSE) so host dispatch is excluded.

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

import argparse
import time
from functools import partial

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--bag", type=int, default=4)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--n_layers_to_train", type=int, default=2)
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

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(0, 1, 2))
    def train_n(params, batch_stats, opt_state, x, key, n):
        def body(i, carry):
            params, batch_stats, opt_state = carry
            k1, k2 = jax.random.split(jax.random.fold_in(key, i))

            def loss_fn(p):
                p = tie_off(p)
                h = preprocess_patches(
                    x ^ i.astype(jnp.uint8), train=True, key=k1,
                    dtype=jnp.bfloat16,
                )
                (out, _), upd = model.apply(
                    {"params": p, "batch_stats": batch_stats}, h, mask=mask,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": k2},
                )
                return cox_partial_likelihood_loss(out[:, 0], t, e), upd[
                    "batch_stats"
                ]

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, new_opt

        return jax.lax.fori_loop(
            0, n, body, (params, batch_stats, opt_state)
        )

    params, batch_stats = variables["params"], variables["batch_stats"]
    params, batch_stats, opt_state = jax.block_until_ready(
        train_n(params, batch_stats, opt_state, x, jax.random.PRNGKey(1),
                a.iters)
    )
    t0 = time.perf_counter()
    params, batch_stats, opt_state = jax.block_until_ready(
        train_n(params, batch_stats, opt_state, x, jax.random.PRNGKey(2),
                a.iters)
    )
    dt = time.perf_counter() - t0
    bags_s = B * a.iters / dt
    print(
        f"train step: {bags_s:.1f} bags/s  "
        f"({bags_s * bag:.0f} patches/s incl. fwd+bwd+update, bag={bag})"
    )


if __name__ == "__main__":
    main()
