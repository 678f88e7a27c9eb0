"""Memory/time audit: gradient accumulation (``accumulate_steps``) on the
MIL train step.

AOT-compiles the PRODUCTION training step (``train.loop.build_train_step`` —
the exact step every train CLI drives, including the lax.scan microbatch
path) at the flagship full-fine-tune shape and a mid-size bag shape, for
accumulate_steps k ∈ {1, 2, 4, 8}, and prints each compiled program's
``memory_analysis()``. No execution unless ``--time``, so shapes that would
OOM still report their (un-fittable) requirement.

Expected physics: activations dominate train-step temp memory (the roofline
audit, docs/DESIGN.md item 26), and the scan holds ONE microbatch's
activations live, so temp should fall ≈k× toward the weight/optimizer
floor while FLOPs stay constant (smaller per-microbatch matmuls + scan
sequentialization cost some step time — measured with ``--time``).

Usage: python benchmarks/accum_audit.py [--time] [--iters N] [--skip-bags]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


CONFIGS = (
    # (batch, bag, n_layers_to_train, accumulate_steps)
    (128, 1, 6, 1),
    (128, 1, 6, 2),
    (128, 1, 6, 4),
    (128, 1, 6, 8),
    # mid-size bags: 32 bags x 64 patches = 2048 patches/step
    (32, 64, 6, 1),
    (32, 64, 6, 2),
    (32, 64, 6, 4),
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--time", action="store_true")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--skip-bags", action="store_true",
                   help="only the flagship (bag=1) rows")
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.models import (
        AggregationModel, make_aggregator, resnet50,
    )
    from multimodalbrainsurvival_tpu.train.adapters import MILAdapter
    from multimodalbrainsurvival_tpu.train.loop import (
        TrainSettings, build_train_step, make_loss_fn,
    )
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

    for B, bag, n_layers, k in CONFIGS:
        if a.skip_bags and bag > 1:
            continue
        model = AggregationModel(
            resnet=resnet50(dtype=jnp.bfloat16),
            aggregator=make_aggregator("attention", dim=2048,
                                       dtype=jnp.bfloat16),
            aggregator_dim=2048,
        )
        adapter = MILAdapter(model=model)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 1, 224, 224, 3), jnp.bfloat16), train=False,
        )
        tx, labels = build_grouped_optimizer(
            variables["params"],
            [("train", mil_freeze_ladder(n_layers), torch_adam(5e-4, 1e-5))],
        )
        opt_state = tx.init(variables["params"])
        settings = TrainSettings(
            task="survival_prediction", batch_size=B, accumulate_steps=k,
            param_labels=labels,
        )
        loss_fn, loss_keys = make_loss_fn(settings)

        def tie_off(p):
            return jax.tree.map(
                lambda leaf, lab: jax.lax.stop_gradient(leaf)
                if lab == "_frozen" else leaf, p, labels,
            )

        def forward_loss(params, batch_stats, arrays, step_rng):
            v = {"params": tie_off(params)}
            if batch_stats is not None:
                v["batch_stats"] = batch_stats
            out, new_stats = adapter.apply(v, arrays, train=True,
                                           rng=step_rng)
            loss = loss_fn(out, arrays, arrays[adapter.sample_mask_key])
            return loss, new_stats

        step = build_train_step(settings, tx, forward_loss)

        rng = np.random.default_rng(0)
        # jit ARGUMENTS, not closure constants (remat_audit.py rationale:
        # baked-in multi-hundred-MB uint8 constants blow the remote compile
        # tunnel's request limit and distort temp accounting)
        arrays = dict(
            patch_bag=rng.integers(0, 255, size=(B, bag, 224, 224, 3),
                                   dtype=np.uint8),
            bag_mask=np.ones((B, bag), bool),
            sample_mask=np.ones((B,), bool),
            survival_months=rng.uniform(1, 100, B).astype(np.float32),
            vital_status=np.ones((B,), np.float32),
        )
        shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), arrays)
        try:
            compiled = step.lower(
                variables["params"], variables["batch_stats"], opt_state,
                shapes, jax.random.PRNGKey(0),
            ).compile()
        except Exception as err:  # TPU compile-time HBM OOM
            first = str(err).splitlines()[0] if str(err) else repr(err)
            print(f"B={B:<4d} bag={bag:<5d} accum={k}: DOES NOT COMPILE "
                  f"({first[:140]})", flush=True)
            continue
        m = compiled.memory_analysis()
        total = (m.temp_size_in_bytes + m.argument_size_in_bytes) / gib
        fits = total < limit
        line = (f"B={B:<4d} bag={bag:<5d} accum={k}: "
                f"temp {m.temp_size_in_bytes / gib:6.2f} GiB  "
                f"total {total:6.2f} GiB  fits={fits}")
        if a.time and fits:
            state = [jax.device_put(variables["params"]),
                     jax.device_put(variables["batch_stats"]),
                     jax.device_put(opt_state)]
            dev_arrays = jax.device_put(jax.tree.map(jnp.asarray, arrays))
            key = jax.device_put(jax.random.PRNGKey(1))
            out = step(*state, dev_arrays, key)  # warm (reuses AOT cache)
            state[:], key = out[:3], out[4]
            jax.block_until_ready(state[0])
            t0 = time.perf_counter()
            for _ in range(a.iters):
                out = step(*state, dev_arrays, key)
                state[:], key = out[:3], out[4]
            jax.block_until_ready(state[0])
            dt = time.perf_counter() - t0
            line += (f"  {dt / a.iters * 1e3:7.2f} ms/step "
                     f"({B * a.iters / dt:8.1f} bags/s)")
        print(line, flush=True)


if __name__ == "__main__":
    main()
