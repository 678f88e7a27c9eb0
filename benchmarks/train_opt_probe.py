"""A/B probes of the r3-verdict-named training-step levers, on the real chip.

``train_roofline.py`` decomposes the step (fwd / backward / optimizer);
this measures candidate optimizations and attribution variants of the FULL
step, identical numerics unless marked [attr] (attribution-only — not a
legal optimization, it isolates a cost):

  baseline       the production step (== profile_train.py's)
  donate         donate params/batch_stats/opt_state buffers to the jit
                 (aliasing: in-place updates instead of fresh allocations)
  fused_adam     hand-fused torch-semantics Adam tree-update (one
                 jax.tree.map of a single expression, no optax chain) +
                 donation — probes whether optax's chained update leaves
                 fusion on the table
  noaug   [attr] eval preprocessing in the train step (isolates the
                 augmentation chain's cost)
  evalbn  [attr] train=False BN (running stats, no batch-stat computation
                 or updates — isolates BN statistics cost; dropout off too)

Usage: python benchmarks/train_opt_probe.py [--batch 128] [--bag 1]
           [--n_layers_to_train 6] [--iters 10]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def build(a):
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

    def make_model(**kw):
        return AggregationModel(
            resnet=resnet50(dtype=jnp.bfloat16, **kw),
            aggregator=make_aggregator("attention", dim=2048,
                                       dtype=jnp.bfloat16),
            aggregator_dim=2048,
        )

    model = make_model()
    fbn_model = make_model(freeze_bn=True)
    # round-5 backward probes (exact numerics): the roofline (DESIGN item
    # 26) showed the backward is BANDWIDTH-bound (~2x forward traffic vs a
    # 5.3 ms compute bound) — remat TRADES that traffic for cheap MXU
    # recompute, so on a bandwidth-bound backward it can be a speed lever,
    # not just a memory one. Selective forms remat only the fat
    # early-stage activations.
    remat_all_model = make_model(remat_blocks=True)
    remat_s1_model = make_model(remat_blocks=[1])
    remat_s12_model = make_model(remat_blocks=[1, 2])
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

    def make_loss(aug: bool, train_bn: bool, m=None):
        m = m if m is not None else model

        def loss_fn(p, batch_stats, k1, k2):
            p = tie_off(p)
            h = preprocess_patches(x, train=aug, key=k1 if aug else None,
                                   dtype=jnp.bfloat16)
            if train_bn:
                (out, _), upd = m.apply(
                    {"params": p, "batch_stats": batch_stats}, h, mask=mask,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": k2},
                )
                # freeze_bn mutates nothing -> flax may omit the collection
                new_stats = upd.get("batch_stats", batch_stats)
            else:
                out, _ = m.apply(
                    {"params": p, "batch_stats": batch_stats}, h, mask=mask,
                    train=False,
                )
                new_stats = batch_stats
            return cox_partial_likelihood_loss(out[:, 0], t, e), new_stats

        return loss_fn

    def optax_step(loss_fn):
        def step(params, batch_stats, opt_state, key):
            key, sub = jax.random.split(key)
            k1, k2 = jax.random.split(sub)
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats, k1, k2)
            updates, new_opt = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_stats,
                    new_opt, key)

        return step

    # hand-fused torch-Adam: one tree.map producing (p, m, v) together —
    # matches torch_adam's semantics (bias correction on the step scalar,
    # decoupled=False L2-in-grad weight decay, eps inside sqrt denominator
    # placement exactly as torch.optim.Adam)
    lr0, wd, b1, b2, eps = 5e-4, 1e-5, 0.9, 0.999, 1e-8

    def fused_adam_step(loss_fn):
        def step(params, mu, nu, count, batch_stats, key):
            key, sub = jax.random.split(key)
            k1, k2 = jax.random.split(sub)
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, batch_stats, k1, k2)
            c = count + 1
            bc1 = 1.0 - b1 ** c.astype(jnp.float32)
            bc2 = 1.0 - b2 ** c.astype(jnp.float32)
            step_lr = lr0 * jnp.sqrt(bc2) / bc1

            def upd(p, g, m, v):
                g = g + wd * p
                m2 = b1 * m + (1 - b1) * g
                v2 = b2 * v + (1 - b2) * g * g
                p2 = p - step_lr * m2 / (jnp.sqrt(v2) + eps)
                return p2, m2, v2

            out = jax.tree.map(upd, params, grads, mu, nu)
            p2 = jax.tree.map(lambda o: o[0], out,
                              is_leaf=lambda o: isinstance(o, tuple))
            m2 = jax.tree.map(lambda o: o[1], out,
                              is_leaf=lambda o: isinstance(o, tuple))
            v2 = jax.tree.map(lambda o: o[2], out,
                              is_leaf=lambda o: isinstance(o, tuple))
            return p2, m2, v2, c, new_stats, key

        return step

    import jax.numpy as _jnp
    key = jax.device_put(jax.random.PRNGKey(1))
    train_loss = make_loss(aug=True, train_bn=True)
    variants = {
        "baseline": (jax.jit(optax_step(train_loss)),
                     (variables["params"], variables["batch_stats"],
                      opt_state, key)),
        "donate": (jax.jit(optax_step(train_loss),
                           donate_argnums=(0, 1, 2)),
                   (variables["params"], variables["batch_stats"],
                    opt_state, key)),
        "fused_adam": (jax.jit(fused_adam_step(train_loss),
                               donate_argnums=(0, 1, 2, 4)),
                       (variables["params"],
                        jax.tree.map(_jnp.zeros_like, variables["params"]),
                        jax.tree.map(_jnp.zeros_like, variables["params"]),
                        _jnp.zeros((), _jnp.int32),
                        variables["batch_stats"], key)),
        # the SHIPPED opt-in: freeze_bn=True model, train=True (dropout on,
        # BN on running stats) — the production `freeze_bn: true` step
        "freezebn": (jax.jit(optax_step(
            make_loss(aug=True, train_bn=True, m=fbn_model))),
            (variables["params"], variables["batch_stats"], opt_state, key)),
        "noaug": (jax.jit(optax_step(make_loss(aug=False, train_bn=True))),
                  (variables["params"], variables["batch_stats"],
                   opt_state, key)),
        "evalbn": (jax.jit(optax_step(make_loss(aug=True, train_bn=False))),
                   (variables["params"], variables["batch_stats"],
                    opt_state, key)),
        # exact-numerics remat variants (grads bitwise-equal, pinned in
        # tests/test_models.py): does trading saved-activation traffic for
        # recompute win on the bandwidth-bound backward?
        "remat_all": (jax.jit(optax_step(
            make_loss(aug=True, train_bn=True, m=remat_all_model))),
            (variables["params"], variables["batch_stats"], opt_state, key)),
        "remat_s1": (jax.jit(optax_step(
            make_loss(aug=True, train_bn=True, m=remat_s1_model))),
            (variables["params"], variables["batch_stats"], opt_state, key)),
        "remat_s12": (jax.jit(optax_step(
            make_loss(aug=True, train_bn=True, m=remat_s12_model))),
            (variables["params"], variables["batch_stats"], opt_state, key)),
    }

    # XLA scheduling/fusion flag variants of the BASELINE step (exact
    # numerics — compiler options only; round-5 verdict Next #4c)
    base_step = optax_step(train_loss)
    base_args = (variables["params"], variables["batch_stats"], opt_state,
                 key)
    for tag, opts in (
        ("xla_vmem64", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
        ("xla_nolhs", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
        ("xla_fcost", {"xla_tpu_enable_experimental_fusion_cost_model":
                       "true"}),
    ):
        def make_compiled(opts=opts):
            compiled = {}

            def run(*args2):
                if "f" not in compiled:
                    compiled["f"] = (
                        jax.jit(base_step)
                        .lower(*args2)
                        .compile(compiler_options=opts)
                    )
                return compiled["f"](*args2)

            return run

        variants[tag] = (make_compiled(), base_args)
    return variants


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--bag", type=int, default=1)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--n_layers_to_train", type=int, default=6)
    p.add_argument("--only", default="",
                   help="comma-separated variant names to run")
    a = p.parse_args(argv)

    import jax

    variants = build(a)
    if a.only:
        keep = set(a.only.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}
    base_ms = None
    print(f"\ntrain-step probes  b{a.batch}/bag{a.bag}"
          f"/freeze{a.n_layers_to_train}")
    for name, (fn, args) in variants.items():
        # fresh copies when donating (donated buffers die after first call)
        args = jax.tree.map(
            lambda l: jax.device_put(np.asarray(l)) if hasattr(l, "shape")
            else l, args)
        out = jax.block_until_ready(fn(*args))
        # steady-state loop re-feeding outputs keeps donation legal
        t0 = time.perf_counter()
        for _ in range(a.iters):
            out = fn(*out)  # every variant's outputs are its inputs, in order
        jax.block_until_ready(out[0])
        ms = (time.perf_counter() - t0) / a.iters * 1e3
        if base_ms is None:
            base_ms = ms
        tag = " [attr]" if name in ("noaug", "evalbn") else ""
        print(f"{name:12} {ms:8.2f} ms/step  {a.batch / ms * 1e3:6.0f} bags/s"
              f"  ({ms / base_ms * 100:5.1f}% of baseline){tag}")


if __name__ == "__main__":
    main()
