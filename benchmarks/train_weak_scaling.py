"""Weak-scaling harness for dp=n TRAINING (r3 verdict #8).

``weak_scaling.py`` keeps the multi-chip SERVING claim one command from
proof; this does the same for the training step. The day an n-chip slice is
attached,

    python benchmarks/train_weak_scaling.py --assert-efficiency 0.9

runs the full MIL training step — on-device augmentation, bf16 ResNet
forward+backward with mutable BN stats, the Cox loss whose risk set is
GLOBAL across the dp axis (one logsumexp over the sharded batch — the only
cross-device communication besides the gradient psum), torch-semantics
Adam — at dp=1 and dp=n with the per-chip batch held fixed, and asserts
throughput ≥ 0.9·n× the single-chip rate.

Until then it validates the two ways this container allows (same contract
as ``weak_scaling.py``):
- ``--platform cpu --devices 8`` — virtual 8-device CPU mesh: proves the
  dp-sharded train program (grad psum + cross-device risk set) compiles and
  executes; efficiency is meaningless on one host core, so the assertion
  is skipped unless requested.
- on the single real chip it degenerates to dp=1, exercising the exact
  measurement harness.

Usage: python benchmarks/train_weak_scaling.py [--per-chip-batch 32]
           [--model resnet50] [--n_layers_to_train 6] [--iters 8]
"""

from __future__ import annotations

import os as _os, sys as _sys
# the venv's editable install can vanish mid-session (see
# .claude/skills/verify/SKILL.md); standalone scripts import the repo
# checkout defensively
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import sys
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--platform", choices=("tpu", "cpu"), default="tpu",
                   help="cpu = virtual-device validation mode")
    p.add_argument("--devices", type=int, default=0,
                   help="virtual device count for --platform cpu (default 8)")
    p.add_argument("--per-chip-batch", type=int, default=32)
    p.add_argument("--bag", type=int, default=1)
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--model", default="resnet50")
    p.add_argument("--n_layers_to_train", type=int, default=6)
    p.add_argument("--assert-efficiency", type=float, default=0.0,
                   help="fail (exit 1) if dp=n efficiency drops below this")
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform == "cpu":
        n = args.devices or 8
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from multimodalbrainsurvival_tpu.cli._common import enable_compile_cache
    from multimodalbrainsurvival_tpu.models import (
        AggregationModel, make_aggregator,
    )
    from multimodalbrainsurvival_tpu.models.resnet import RESNET_CONSTRUCTORS
    from multimodalbrainsurvival_tpu.ops import cox_partial_likelihood_loss
    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches
    from multimodalbrainsurvival_tpu.parallel import batch_device_put, make_mesh
    from multimodalbrainsurvival_tpu.parallel.sharding import (
        replicated_shardings,
    )
    from multimodalbrainsurvival_tpu.train.optim import (
        build_grouped_optimizer,
        mil_freeze_ladder,
        torch_adam,
    )

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
    )

    resnet = RESNET_CONSTRUCTORS[args.model](dtype=jnp.bfloat16)
    model = AggregationModel(
        resnet=resnet,
        aggregator=make_aggregator("attention", dim=resnet.feature_dim,
                                   dtype=jnp.bfloat16),
        aggregator_dim=resnet.feature_dim,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, args.img, args.img, 3), jnp.bfloat16), train=False,
    )
    tx, labels = build_grouped_optimizer(
        variables["params"],
        [("train", mil_freeze_ladder(args.n_layers_to_train),
          torch_adam(5e-4, 1e-5))],
    )

    def tie_off(p):
        return jax.tree.map(
            lambda leaf, lab: jax.lax.stop_gradient(leaf)
            if lab == "_frozen" else leaf, p, labels,
        )

    def step_fn(params, batch_stats, opt_state, b, key):
        key, sub = jax.random.split(key)
        k1, k2 = jax.random.split(sub)

        def loss_fn(p):
            p = tie_off(p)
            h = preprocess_patches(b["patch_bag"], train=True, key=k1,
                                   dtype=jnp.bfloat16)
            (out, _), upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, h,
                mask=b["bag_mask"], train=True, mutable=["batch_stats"],
                rngs={"dropout": k2},
            )
            # the risk set spans the WHOLE dp-sharded batch: under GSPMD the
            # logcumsumexp induces the cross-device collective (test pin:
            # tests/test_cox.py global-risk-set equality)
            return cox_partial_likelihood_loss(
                out[:, 0], b["survival_months"], b["vital_status"]
            ), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, key

    step = jax.jit(step_fn)
    rng = np.random.default_rng(0)

    def measure(dp: int) -> float:
        mesh = make_mesh(dp=dp, mp=1, devices=jax.devices()[:dp])
        put = batch_device_put(mesh)
        B = args.per_chip_batch * dp  # weak scaling: fixed per-chip work
        batch = put({
            "patch_bag": rng.integers(
                0, 255, size=(B, args.bag, args.img, args.img, 3),
                dtype=np.uint8),
            "bag_mask": np.ones((B, args.bag), bool),
            "survival_months": rng.uniform(1, 100, B).astype(np.float32),
            "vital_status": np.ones((B,), np.float32),
        })
        rsh = replicated_shardings(
            (variables["params"], variables["batch_stats"]), mesh)
        params, batch_stats = jax.device_put(
            (variables["params"], variables["batch_stats"]), rsh)
        opt_state = jax.device_put(
            tx.init(params), replicated_shardings(tx.init(params), mesh))
        key = jax.device_put(jax.random.PRNGKey(1))
        with mesh:
            state = [params, batch_stats, opt_state, key]
            state = list(jax.block_until_ready(
                step(state[0], state[1], state[2], batch, state[3])
            ))  # compile + warm
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state = list(step(state[0], state[1], state[2], batch,
                                  state[3]))
            jax.block_until_ready(state[0])
        dt = time.perf_counter() - t0
        return B * args.iters / dt

    n = len(jax.devices())
    r1 = measure(1)
    rn = measure(n) if n > 1 else r1
    eff = rn / (n * r1)
    out = {
        "metric": "train_step_weak_scaling",
        "devices": n,
        "platform": jax.devices()[0].platform,
        "per_chip_batch": args.per_chip_batch,
        "n_layers_to_train": args.n_layers_to_train,
        "rate_dp1": round(r1, 1),
        "rate_dpn": round(rn, 1),
        "unit": "bags/sec",
        "efficiency": round(eff, 3),
    }
    print(json.dumps(out))
    if args.assert_efficiency and eff < args.assert_efficiency:
        print(f"FAIL: efficiency {eff:.3f} < {args.assert_efficiency}",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
