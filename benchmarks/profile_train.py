"""Per-op device-time attribution of the flagship MIL TRAIN step.

Same methodology as ``profile_serving.py`` (trace only the "XLA Ops" device
thread line, map fusions back to the convolution shapes inside them via the
compiled HLO), applied to the full training step that ``train/loop.py``
dispatches: on-device augmentation, bf16 ResNet-50 forward with mutable BN
stats, Cox loss, backward over the trained layers, torch-semantics Adam.

The reference trains with a freeze ladder (``n_layers_to_train``,
``2_HistoPath_train.py:544-551``); profile BOTH the flagship freeze-2
config and the full fine-tune (6) so the backward's cost structure is
attributed, not guessed.

Usage: python benchmarks/profile_train.py [--batch 128] [--bag 1]
           [--n_layers_to_train 2] [--iters 8]
"""

from __future__ import annotations

import os as _os, sys as _sys
# the venv's editable install can vanish mid-session (see
# .claude/skills/verify/SKILL.md); standalone scripts import the repo
# checkout defensively
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import os
import tempfile
import time
from functools import partial

import numpy as np

from profile_serving import attribute_trace  # noqa: E402


def build_step(a):
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
            return cox_partial_likelihood_loss(out[:, 0], t, e), upd[
                "batch_stats"
            ]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, key

    step = jax.jit(one_step)
    state = [variables["params"], variables["batch_stats"], opt_state,
             jax.device_put(jax.random.PRNGKey(1))]
    return step, state


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--bag", type=int, default=1)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--n_layers_to_train", type=int, default=2)
    p.add_argument("--trace-dir", default=None)
    p.add_argument("--split-unmatched", action="store_true",
                   help="key non-conv ops by full HLO op name (opens up "
                        "the [fusion] bucket)")
    a = p.parse_args(argv)

    import jax

    step, state = build_step(a)
    hlo = step.lower(*state).compile().as_text()
    state[:] = jax.block_until_ready(step(*state))  # compile+warm

    t0 = time.perf_counter()
    for _ in range(a.iters):
        state[:] = step(*state)
    jax.block_until_ready(state[0])
    wall = (time.perf_counter() - t0) / a.iters * 1e3
    print(f"train step b{a.batch}/bag{a.bag}/freeze{a.n_layers_to_train}: "
          f"{wall:.2f} ms wall/step ({a.batch / wall * 1e3:.0f} bags/s "
          f"host-driven)")

    trace_dir = a.trace_dir or tempfile.mkdtemp(prefix="train_trace_")
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    for _ in range(a.iters):
        state[:] = step(*state)
    jax.block_until_ready(state[0])
    jax.profiler.stop_trace()

    by_sig = attribute_trace(trace_dir, hlo,
                             split_unmatched=a.split_unmatched)
    print("\nper-group device ms/step (conv output shape, or [op]):")
    total = sum(by_sig.values())
    for sig, ms in sorted(by_sig.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms / a.iters:8.3f}  {sig}")
    print(f"\ndevice total: {total / a.iters:.2f} ms/step "
          f"= {a.batch * a.iters / total * 1e3:.0f} bags/s device-bound")


if __name__ == "__main__":
    main()


# Measured results are recorded in docs/DESIGN.md (training attribution
# item) — run on the real chip, suite idle, after any change to the step.
