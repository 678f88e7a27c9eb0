"""Memory audit: per-block remat vs plain backward on the MIL train step.

AOT-compiles the full flagship training step (augmentation + bf16 ResNet-50
fwd/bwd with mutable BN + Cox loss + torch-Adam update) at several
(batch, bag, n_layers_to_train) shapes, with and without ``remat_blocks``,
and prints each compiled program's ``memory_analysis()`` — no execution, so
shapes that would OOM still report their (un-fittable) requirement.

One process claims the chip once and sweeps every config.

Usage: python benchmarks/remat_audit.py [--time]
  --time  also executes 12 steps per fitting config to measure the remat
          recompute cost (bags/s).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


CONFIGS = (
    # (batch, bag, n_layers_to_train) — flagship full fine-tune, then
    # full-slide bags at increasing scale
    (128, 1, 6),
    (1, 512, 6),
    (1, 2048, 6),
    (1, 4096, 6),
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--time", action="store_true")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--max_bag", type=int, default=0,
                   help="skip configs with bag larger than this (0 = all)")
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

    gib = 1 << 30
    hbm = jax.devices()[0].memory_stats()
    limit = (hbm or {}).get("bytes_limit", 0) / gib
    if not limit:
        # the axon-tunneled runtime reports no memory_stats; v5e is 16 GiB
        limit = 16.0
    print(f"device: {jax.devices()[0].device_kind}, HBM limit {limit:.1f} GiB")

    for B, bag, n_layers in CONFIGS:
        if a.max_bag and bag > a.max_bag:
            continue
        for remat in (False, True):
            model = AggregationModel(
                resnet=resnet50(dtype=jnp.bfloat16, remat_blocks=remat),
                aggregator=make_aggregator("attention", dim=2048,
                                           dtype=jnp.bfloat16),
                aggregator_dim=2048,
            )
            variables = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 1, 224, 224, 3), jnp.bfloat16), train=False,
            )
            tx, labels = build_grouped_optimizer(
                variables["params"],
                [("train", mil_freeze_ladder(n_layers), torch_adam(5e-4, 1e-5))],
            )
            opt_state = tx.init(variables["params"])
            rng = np.random.default_rng(0)
            # the batch rides as jit ARGUMENTS, not closure constants —
            # baked-in multi-hundred-MB uint8 constants blow the remote
            # compile tunnel's request limit (HTTP 413) and would distort
            # temp-memory accounting
            batch = dict(
                x=rng.integers(0, 255, size=(B, bag, 224, 224, 3),
                               dtype=np.uint8),
                t=rng.uniform(1, 100, B).astype(np.float32),
                e=np.ones((B,), np.float32),
                mask=np.ones((B, bag), bool),
            )

            def tie_off(p):
                return jax.tree.map(
                    lambda leaf, lab: jax.lax.stop_gradient(leaf)
                    if lab == "_frozen" else leaf, p, labels,
                )

            def one_step(params, batch_stats, opt_state, key, batch):
                key, sub = jax.random.split(key)
                k1, k2 = jax.random.split(sub)

                def loss_fn(p):
                    p = tie_off(p)
                    h = preprocess_patches(batch["x"], train=True, key=k1,
                                           dtype=jnp.bfloat16)
                    (out, _), upd = model.apply(
                        {"params": p, "batch_stats": batch_stats}, h,
                        mask=batch["mask"], train=True,
                        mutable=["batch_stats"],
                        rngs={"dropout": k2},
                    )
                    return (cox_partial_likelihood_loss(
                                out[:, 0], batch["t"], batch["e"]),
                            upd["batch_stats"])

                (loss, new_stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, new_opt = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), new_stats,
                        new_opt, key)

            step = jax.jit(one_step)
            batch_shapes = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), batch)
            try:
                compiled = step.lower(
                    variables["params"], variables["batch_stats"], opt_state,
                    jax.random.PRNGKey(0), batch_shapes,
                ).compile()
            except Exception as err:  # TPU compile-time HBM OOM
                first = str(err).splitlines()[0] if str(err) else repr(err)
                print(f"B={B:<4d} bag={bag:<5d} layers={n_layers} "
                      f"remat={int(remat)}: DOES NOT COMPILE "
                      f"({first[:140]})", flush=True)
                continue
            m = compiled.memory_analysis()
            total = (m.temp_size_in_bytes + m.argument_size_in_bytes) / gib
            fits = total < limit if np.isfinite(limit) else None
            line = (f"B={B:<4d} bag={bag:<5d} layers={n_layers} "
                    f"remat={int(remat)}: temp {m.temp_size_in_bytes / gib:6.2f} GiB  "
                    f"total {total:6.2f} GiB  fits={fits}")
            if a.time and fits:
                state = [jax.device_put(variables["params"]),
                         jax.device_put(variables["batch_stats"]),
                         jax.device_put(opt_state),
                         jax.device_put(jax.random.PRNGKey(1))]
                dev_batch = jax.device_put(
                    jax.tree.map(jnp.asarray, batch))
                state[:] = step(*state, dev_batch)  # warm (reuses AOT cache)
                jax.block_until_ready(state[0])
                t0 = time.perf_counter()
                for _ in range(a.iters):
                    state[:] = step(*state, dev_batch)
                jax.block_until_ready(state[0])
                dt = time.perf_counter() - t0
                line += (f"  {B * a.iters / dt:8.1f} bags/s "
                         f"({B * bag * a.iters / dt:9.1f} patches/s)")
            print(line, flush=True)


if __name__ == "__main__":
    main()
