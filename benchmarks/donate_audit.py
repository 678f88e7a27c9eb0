"""Memory/time audit: train-step buffer donation
(``TrainSettings.donate_state``).

AOT-compiles the PRODUCTION training step (``train.loop.build_train_step``)
with donation on and off at the flagship MIL shapes and the RNA encoder
shape, and prints each compiled program's ``memory_analysis()`` side by
side. Donation lets XLA alias the updated params / batch_stats / opt_state
onto the incoming buffers, so the expected win is ~one full copy of
(params + Adam moments): ~0.3 GiB for the ResNet-50 full fine-tune, ~0.6 GiB
for the 12,778->4096->2048 RNA encoder (f32 params + 2x f32 Adam state).
``--time`` also measures steady-state step time (donation is primarily a
memory lever; time should be ~neutral).

Usage: python benchmarks/donate_audit.py [--time] [--iters N]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--time", action="store_true")
    p.add_argument("--iters", type=int, default=12)
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodalbrainsurvival_tpu.models import (
        AggregationModel, RNAEncoder, RNAOnlyModel, make_aggregator, resnet50,
    )
    from multimodalbrainsurvival_tpu.train.adapters import MILAdapter, TableAdapter
    from multimodalbrainsurvival_tpu.train.loop import (
        TrainSettings, build_train_step, make_loss_fn,
    )
    from multimodalbrainsurvival_tpu.train.optim import (
        build_grouped_optimizer, mil_freeze_ladder, torch_adam,
    )

    gib = 1 << 30
    print(f"device: {jax.devices()[0].device_kind}")

    def audit(name, adapter, variables, tx, labels, arrays, batch_size):
        opt_state = tx.init(variables["params"])
        rows = {}
        for donate in (False, True):
            settings = TrainSettings(
                task="survival_prediction", batch_size=batch_size,
                param_labels=labels, donate_state=donate,
            )
            loss_fn, _ = make_loss_fn(settings)

            def tie_off(prm):
                if labels is None:
                    return prm
                return jax.tree.map(
                    lambda leaf, lab: jax.lax.stop_gradient(leaf)
                    if lab == "_frozen" else leaf, prm, labels,
                )

            def forward_loss(prm, stats, arr, step_rng):
                v = {"params": tie_off(prm)}
                if stats is not None:
                    v["batch_stats"] = stats
                out, new_stats = adapter.apply(v, arr, train=True,
                                               rng=step_rng)
                return loss_fn(out, arr,
                               arr[adapter.sample_mask_key]), new_stats

            step = build_train_step(settings, tx, forward_loss)
            shapes = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), arrays)
            compiled = step.lower(
                variables["params"], variables.get("batch_stats"), opt_state,
                shapes, jax.random.PRNGKey(0),
            ).compile()
            m = compiled.memory_analysis()
            alias = getattr(m, "alias_size_in_bytes", 0)
            # live peak the runtime must reserve beyond the (aliased)
            # arguments: temp + outputs that are not aliased onto inputs
            extra = m.temp_size_in_bytes + m.output_size_in_bytes - alias
            rows[donate] = (m, extra)
            line = (f"{name:<28s} donate={int(donate)}: "
                    f"temp {m.temp_size_in_bytes / gib:6.2f} GiB  "
                    f"out {m.output_size_in_bytes / gib:6.2f} GiB  "
                    f"aliased {alias / gib:6.2f} GiB  "
                    f"temp+out-alias {extra / gib:6.2f} GiB")
            if a.time:
                state = [jax.device_put(variables["params"]),
                         jax.device_put(variables.get("batch_stats")),
                         jax.device_put(opt_state)]
                dev_arrays = jax.device_put(jax.tree.map(jnp.asarray, arrays))
                key = jax.device_put(jax.random.PRNGKey(1))
                out = step(*state, dev_arrays, key)
                state[:], key = out[:3], out[4]
                jax.block_until_ready(state[0])
                t0 = time.perf_counter()
                for _ in range(a.iters):
                    out = step(*state, dev_arrays, key)
                    state[:], key = out[:3], out[4]
                jax.block_until_ready(state[0])
                dt = time.perf_counter() - t0
                line += f"  {dt / a.iters * 1e3:7.2f} ms/step"
            print(line, flush=True)
        saved = rows[False][1] - rows[True][1]
        print(f"{name:<28s} donation saves {saved / gib:.2f} GiB of live "
              f"step memory", flush=True)

    rng = np.random.default_rng(0)

    # flagship MIL full fine-tune (B=128, bag=1, all 6 ladder rungs)
    model = AggregationModel(
        resnet=resnet50(dtype=jnp.bfloat16),
        aggregator=make_aggregator("attention", dim=2048, dtype=jnp.bfloat16),
        aggregator_dim=2048,
    )
    adapter = MILAdapter(model=model)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, 224, 224, 3), jnp.bfloat16), train=False,
    )
    tx, labels = build_grouped_optimizer(
        variables["params"],
        [("train", mil_freeze_ladder(6), torch_adam(5e-4, 1e-5))],
    )
    B = 128
    mil_arrays = dict(
        patch_bag=rng.integers(0, 255, size=(B, 1, 224, 224, 3),
                               dtype=np.uint8),
        bag_mask=np.ones((B, 1), bool),
        sample_mask=np.ones((B,), bool),
        survival_months=rng.uniform(1, 100, B).astype(np.float32),
        vital_status=np.ones((B,), np.float32),
    )
    audit("mil-resnet50 B=128 full-ft", adapter, variables, tx, labels,
          mil_arrays, B)

    # RNA encoder (12,778 -> 4096 -> 2048 + Cox head), reference batch 256
    rna_model = RNAOnlyModel(encoder=RNAEncoder())
    rna_adapter = TableAdapter(model=rna_model)
    B = 256
    rna_arrays = dict(
        data=rng.normal(size=(B, 12778)).astype(np.float32),
        mask=np.ones((B,), bool),
        survival_months=rng.uniform(1, 100, B).astype(np.float32),
        vital_status=np.ones((B,), np.float32),
    )
    rna_vars = rna_adapter.init(jax.random.PRNGKey(0), rna_arrays)
    rna_tx = torch_adam(5e-4, 1e-5)
    audit("rna-mlp B=256", rna_adapter, rna_vars, rna_tx, None,
          rna_arrays, B)


if __name__ == "__main__":
    main()
