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


def test_full_slide_bag_config_end_to_end(tmp_path):
    """The CP-analog at its motivating scale (VERDICT r2 #7): a reference-
    schema config with ``train_bag_size`` in the THOUSANDS — one bag is an
    entire slide's patch set — trains end-to-end through the histo CLI with
    the bag axis mp-sharded (`shard_bag`) and the pixels living ONLY in the
    mesh-sharded device cache. Per-device tensors are (B/dp, bag/mp, ...):
    no single chip ever holds a full slide's patches.

    Patches are 8x8 so the 2 x 2048-patch cohort stays tractable on the
    1-core CI box; the sharding math is size-independent.
    """
    import json

    import pandas as pd

    from tests.helpers import make_patch_dir, make_survival_csv

    from multimodalbrainsurvival_tpu.cli import histo_train
    from multimodalbrainsurvival_tpu.data.device_cache import (
        DeviceCachedPatchBags,
    )

    root = tmp_path / "patches"
    bag = 2048
    for i, w in enumerate(["BIG0", "BIG1"]):
        make_patch_dir(str(root), w, bag, img_size=8, seed=i)
    for i, w in enumerate(["S0", "S1"]):  # small eval slides
        make_patch_dir(str(root), w, 8, img_size=8, seed=10 + i)
    make_survival_csv(str(tmp_path / "train.csv"), ["c0", "c1"],
                      wsi_names=["BIG0.svs", "BIG1.svs"], seed=3)
    make_survival_csv(str(tmp_path / "eval.csv"), ["c2", "c3"],
                      wsi_names=["S0.svs", "S1.svs"], seed=4)

    cfg = {
        "model_name": "resnet18", "num_classes": 1, "batch_size": 2,
        "use_cuda": False, "data_path": str(root),
        "train_csv_path": str(tmp_path / "train.csv"),
        "val_csv_path": str(tmp_path / "eval.csv"),
        "test_csv_path": str(tmp_path / "eval.csv"),
        "num_workers": 1, "num_epochs": 1, "img_size": 8,
        "lr": 5e-4, "weight_decay": 0.0, "pretrained": False,
        "train_bag_size": bag, "val_bag_size": 8,
        "aggregator": "attention", "aggregator_hdim": 512,
        "task": "survival_prediction", "n_layers_to_train": 6,
        "flag": "fullslide",
        "max_patch_per_wsi_train": bag, "max_patch_per_wsi_val": 8,
        "checkpoint_path": str(tmp_path / "out") + "/",
        "summary_path": str(tmp_path / "out/summary") + "/",
        "model_path": "", "restore_path": "",
        "cache_patches_on_device": True,
        "mesh": {"dp": 2, "mp": 4, "shard_bag": True},
        # the full-slide memory recipe is remat × bag sharding (one chip
        # holds bag/mp block inputs only); prove the composition compiles
        # and trains through the CLI
        "remat": True,
    }
    p = tmp_path / "cfg_fullslide.json"
    p.write_text(json.dumps(cfg))

    seen = {}
    orig = DeviceCachedPatchBags.batches

    def spy(self, *a, **k):
        for b in orig(self, *a, **k):
            if self.bag_size == bag:
                shapes = {s.data.shape
                          for s in b["patch_bag"].addressable_shards}
                seen["shard_shape"] = shapes
            yield b

    DeviceCachedPatchBags.batches = spy
    try:
        histo_train.main(["--config", str(p)])
    finally:
        DeviceCachedPatchBags.batches = orig

    # every device held (B/dp=1, bag/mp=512) of the full-slide bag
    assert seen["shard_shape"] == {(1, bag // 4, 8, 8, 3)}
    frame = pd.read_csv(tmp_path / "out/outputs/fullslide/val_output_last.csv")
    assert len(frame) > 0 and np.isfinite(frame["score"]).all()
