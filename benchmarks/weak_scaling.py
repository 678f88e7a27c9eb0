"""Weak-scaling harness for dp=n extractfeatures (VERDICT r2 next-round #9).

The one hardware-blocked claim in this repo is measured multi-chip scaling
(this container exposes a single real TPU chip). This script keeps that
claim one command away from proof: the day an n-chip slice is attached,

    python benchmarks/weak_scaling.py --assert-efficiency 0.9

runs the serving path (uint8 patches → on-device normalize → bf16 folded-BN
ResNet-50 ``extract``) at dp=1 and dp=n with the per-chip batch held fixed
(weak scaling), and asserts throughput ≥ 0.9·n× the single-chip rate.

Until then it is validated in the two ways this container allows:
- ``--platform cpu --devices 8`` — a virtual 8-device CPU mesh (the same
  fake backend the test suite uses) proves the dp-sharded program compiles,
  executes, and scales the *work* (tests/test_parallel.py runs this path);
- on the single real chip it degenerates to dp=1, exercising the exact
  measurement harness.

The extraction program is dp-only (no cross-device communication in the
forward pass — samples are independent), so the expected efficiency is
~1.0; anything under 0.9 indicates an input/dispatch bottleneck, not a
collective cost.
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
    p.add_argument("--per-chip-batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--model", default="resnet50")
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
    from functools import partial

    from multimodalbrainsurvival_tpu.cli._common import enable_compile_cache
    from multimodalbrainsurvival_tpu.models.folding import fold_resnet_variables
    from multimodalbrainsurvival_tpu.models.resnet import RESNET_CONSTRUCTORS
    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches
    from multimodalbrainsurvival_tpu.parallel import batch_device_put, make_mesh

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
    )

    stock = RESNET_CONSTRUCTORS[args.model](dtype=jnp.bfloat16)
    variables = fold_resnet_variables(
        stock.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, args.img, args.img, 3), jnp.bfloat16),
                   train=False)
    )
    model = RESNET_CONSTRUCTORS[args.model](dtype=jnp.bfloat16, fold_bn=True)

    @partial(jax.jit, static_argnames=("n",))
    def extract_n(v, patches_u8, n):
        def body(i, acc):
            xi = patches_u8 ^ i.astype(jnp.uint8)
            x = preprocess_patches(xi, train=False, dtype=jnp.bfloat16)
            feats = model.apply(v, x, train=False, method="extract")
            return acc + feats[0, 0]

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    rng = np.random.default_rng(0)

    def measure(dp: int) -> float:
        mesh = make_mesh(dp=dp, mp=1, devices=jax.devices()[:dp])
        put = batch_device_put(mesh)
        batch = args.per_chip_batch * dp  # weak scaling: fixed per-chip work
        x = put({"patch_bag": rng.integers(
            0, 255, size=(batch, args.img, args.img, 3), dtype=np.uint8
        )})["patch_bag"]
        v = jax.device_put(
            variables,
            jax.tree.map(
                lambda _: jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()),
                variables),
        )
        float(extract_n(v, x, args.iters))  # compile + warm
        t0 = time.perf_counter()
        float(extract_n(v, x, args.iters))
        dt = time.perf_counter() - t0
        return batch * args.iters / dt

    n = len(jax.devices())
    r1 = measure(1)
    rn = measure(n) if n > 1 else r1
    eff = rn / (n * r1)
    out = {
        "metric": "extractfeatures_weak_scaling",
        "devices": n,
        "platform": jax.devices()[0].platform,
        "per_chip_batch": args.per_chip_batch,
        "rate_dp1": round(r1, 1),
        "rate_dpn": round(rn, 1),
        "unit": "patches/sec",
        "efficiency": round(eff, 3),
    }
    print(json.dumps(out))
    if args.assert_efficiency and eff < args.assert_efficiency:
        print(f"FAIL: efficiency {eff:.3f} < {args.assert_efficiency}",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
