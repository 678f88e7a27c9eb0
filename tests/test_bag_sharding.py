"""Bag-sharded MIL training on the virtual mesh (the CP-analog, end to end)."""

import numpy as np
import jax
import jax.numpy as jnp


def test_bag_sharded_mil_training_step():
    """mesh {"dp": 2, "mp": 4} with shard_bag: the patch tensor spans devices
    along the bag axis; one full train step runs and the eval forward matches
    the unsharded forward."""
    import optax

    from multimodalbrainsurvival_tpu.models import (
        AggregationModel, make_aggregator, resnet18,
    )
    from multimodalbrainsurvival_tpu.ops import cox_partial_likelihood_loss
    from multimodalbrainsurvival_tpu.parallel import batch_device_put, make_mesh

    mesh = make_mesh(dp=2, mp=4)
    model = AggregationModel(
        resnet=resnet18(),
        aggregator=make_aggregator("attention", dim=512),
        aggregator_dim=512,
    )
    rng = np.random.default_rng(0)
    B, bag, hw = 4, 8, 32  # bag 8 shards over mp=4
    x = jnp.asarray(rng.normal(size=(B, bag, hw, hw, 3)).astype(np.float32))
    bag_mask = jnp.ones((B, bag), bool)
    t = jnp.asarray(rng.uniform(1, 100, B).astype(np.float32))
    e = jnp.ones((B,))

    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)

    # unsharded eval forward as reference
    out_ref, _ = model.apply(variables, x, mask=bag_mask, train=False)

    put = batch_device_put(mesh, shard_bag=True)
    arrays = put({"patch_bag": x, "bag_mask": bag_mask,
                  "survival_months": t, "vital_status": e})
    shard_shapes = {s.data.shape for s in arrays["patch_bag"].addressable_shards}
    assert shard_shapes == {(2, 2, hw, hw, 3)}  # (B/dp, bag/mp, ...)

    out_sh, _ = jax.jit(
        lambda v, xx, m: model.apply(v, xx, mask=m, train=False)
    )(variables, arrays["patch_bag"], arrays["bag_mask"])
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_sh),
                               rtol=1e-4, atol=1e-5)

    # one full sharded train step (grads + BN stats + adam)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, a, key):
        def loss_fn(p):
            (out, _), upd = model.apply(
                {"params": p, "batch_stats": batch_stats},
                a["patch_bag"], mask=a["bag_mask"], train=True,
                mutable=["batch_stats"], rngs={"dropout": key},
            )
            return cox_partial_likelihood_loss(
                out[:, 0], a["survival_months"], a["vital_status"]
            ), upd["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt2, loss

    params, stats, opt_state, loss = step(
        variables["params"], variables["batch_stats"], opt_state, arrays,
        jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(loss))
