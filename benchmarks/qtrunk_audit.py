"""On-chip audit: int8 frozen-trunk training (``quantize_trunk: "int8"``)
vs the float freeze-ladder step.

Builds the flagship MIL fine-tune step (augmentation + bf16 ResNet-50 with
mutable BN in the trainable tail + Cox loss + torch-Adam on the ladder
groups) at transfer-learning shapes, once with the stock float adapter and
once with ``QuantTrunkMILAdapter`` (frozen prefix through
``models/quantize.quantized_trunk``), and times both. Also prints each
compiled program's ``memory_analysis()`` — the int8 trunk stores no float
activations below the seam, so training HBM drops too.

Work profile context (docs/DESIGN.md items 18-20, 24): under the reference
freeze ladder (``2_HistoPath_train.py:544-551``) the frozen prefix runs
forward-only every step; at n_layers_to_train<=2 that prefix is most of the
network's FLOPs, which is exactly where W8A8 pays.

Usage: python benchmarks/qtrunk_audit.py [--iters 12]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np

CONFIGS = (
    # (batch, bag, n_layers_to_train): the reference's transfer-learning
    # defaults train 1-2 ladder groups on bagged patches
    (16, 64, 1),
    (16, 64, 2),
    (1, 512, 2),
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=12)
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from multimodalbrainsurvival_tpu.models import (
        AggregationModel, make_aggregator, resnet50,
    )
    from multimodalbrainsurvival_tpu.models.quantize import (
        quantize_trunk_for_training,
    )
    from multimodalbrainsurvival_tpu.ops import cox_partial_likelihood_loss
    from multimodalbrainsurvival_tpu.train.adapters import (
        MILAdapter,
        QuantTrunkMILAdapter,
    )
    from multimodalbrainsurvival_tpu.train.optim import (
        build_grouped_optimizer,
        mil_freeze_ladder,
        torch_adam,
    )

    gib = 1 << 30
    print(f"device: {jax.devices()[0].device_kind}")

    model = AggregationModel(
        resnet=resnet50(dtype=jnp.bfloat16),
        aggregator=make_aggregator("attention", dim=2048, dtype=jnp.bfloat16),
        aggregator_dim=2048,
    )

    for B, bag, n_layers in CONFIGS:
        rng = np.random.default_rng(0)
        batch = dict(
            patch_bag=rng.integers(0, 255, size=(B, bag, 224, 224, 3),
                                   dtype=np.uint8),
            bag_mask=np.ones((B, bag), np.float32),
            t=rng.uniform(1, 100, B).astype(np.float32),
            e=np.ones((B,), np.float32),
        )
        arrays0 = {"patch_bag": jnp.asarray(batch["patch_bag"][:1, :1]),
                   "bag_mask": jnp.asarray(batch["bag_mask"][:1, :1])}
        stock = MILAdapter(model=model, augment=True)
        variables = stock.init(jax.random.PRNGKey(0), arrays0)
        tx, labels = build_grouped_optimizer(
            variables["params"],
            [("train", mil_freeze_ladder(n_layers), torch_adam(5e-4, 1e-5))],
        )
        opt_state = tx.init(variables["params"])
        trunk_stages = 5 - n_layers
        qtree = quantize_trunk_for_training(
            variables, [batch["patch_bag"][: max(1, 4 // max(B // 4, 1))]],
            augment=True, seed=0,
        )
        qadapter = QuantTrunkMILAdapter(
            model=model, augment=True, trunk_stages=trunk_stages,
            qtree=jax.device_put(qtree),
        )

        def tie_off(p):
            return jax.tree.map(
                lambda leaf, lab: jax.lax.stop_gradient(leaf)
                if lab == "_frozen" else leaf, p, labels,
            )

        results = {}
        for tag, adapter in (("float", stock), ("int8-trunk", qadapter)):
            def one_step(params, batch_stats, opt_state, key, batch,
                         adapter=adapter):
                key, sub = jax.random.split(key)

                def loss_fn(p):
                    out, new_stats = adapter.apply(
                        {"params": tie_off(p), "batch_stats": batch_stats},
                        {"patch_bag": batch["patch_bag"],
                         "bag_mask": batch["bag_mask"]},
                        train=True, rng=sub,
                    )
                    return (cox_partial_likelihood_loss(
                                out[:, 0], batch["t"], batch["e"]),
                            new_stats)

                (loss, new_stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, new_opt = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), new_stats,
                        new_opt, key)

            step = jax.jit(one_step)
            batch_shapes = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch)
            compiled = step.lower(
                variables["params"], variables["batch_stats"], opt_state,
                jax.random.PRNGKey(0), batch_shapes,
            ).compile()
            m = compiled.memory_analysis()
            state = [jax.device_put(variables["params"]),
                     jax.device_put(variables["batch_stats"]),
                     jax.device_put(opt_state),
                     jax.device_put(jax.random.PRNGKey(1))]
            dev_batch = jax.device_put(jax.tree.map(jnp.asarray, batch))
            state[:] = step(*state, dev_batch)  # warm (reuses AOT cache)
            jax.block_until_ready(state[0])
            t0 = time.perf_counter()
            for _ in range(a.iters):
                state[:] = step(*state, dev_batch)
            jax.block_until_ready(state[0])
            dt = time.perf_counter() - t0
            pps = B * bag * a.iters / dt
            results[tag] = pps
            print(f"B={B:<3d} bag={bag:<4d} layers={n_layers} {tag:>10s}: "
                  f"temp {m.temp_size_in_bytes / gib:5.2f} GiB  "
                  f"{B * a.iters / dt:7.1f} bags/s "
                  f"({pps:9.1f} patches/s)", flush=True)
        print(f"B={B:<3d} bag={bag:<4d} layers={n_layers} speedup: "
              f"{results['int8-trunk'] / results['float']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
