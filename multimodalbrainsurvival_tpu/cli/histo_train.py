"""Histopathology MIL training CLI — the flagship pipeline.

Parity with ``1_HistoPathology/2_HistoPath_train.py``: config-driven MIL
ResNet Cox/NLL/classification training with the freeze ladder
(``:544-551``), per-epoch in-slide patch shuffling, best/last checkpoints and
final CSV outputs. Configs like ``ExampleConfigs/config_ffpe_train.json``
load verbatim; ``--quick 1`` caps patches per WSI at 20 (``:495-497``).

TPU-native: patches stream to the device as uint8 and the full torchvision
augmentation stack runs batched inside the jitted train step; compute dtype
is selectable via the ``compute_dtype`` config key (bf16 on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multimodalbrainsurvival_tpu.cli._common import (
    early_stop_kwargs,
    experiment_dirs,
    load_config,
    make_device_put,
    make_parser,
    make_writer,
    maybe_restore,
    observability_kwargs,
    quantize_trunk_training,
    run_train,
    tune_optimizer,
)
from multimodalbrainsurvival_tpu.data import PatchBagDataset
from multimodalbrainsurvival_tpu.models import AggregationModel, make_aggregator
from multimodalbrainsurvival_tpu.models.resnet import RESNET_CONSTRUCTORS
from multimodalbrainsurvival_tpu.train import TrainSettings, train_model
from multimodalbrainsurvival_tpu.train.adapters import MILAdapter
from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer
from multimodalbrainsurvival_tpu.train.optim import (
    build_grouped_optimizer,
    mil_freeze_ladder,
    torch_adam,
)


def build_mil_model(config, fold_bn: bool = False) -> AggregationModel:
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    resnet = RESNET_CONSTRUCTORS[config.model_name](
        dtype=dtype, fold_bn=fold_bn,
        # remat: true (TPU-native extension) — per-block activation
        # checkpointing so full-slide bags fine-tune deep stacks in HBM
        # bool = all stages; a list of 1-based stage numbers ([1, 2])
        # remats only those stages (models/resnet.py remat_blocks)
        remat_blocks=config.get("remat", False),
        # freeze_bn: true (TPU-native extension) — FrozenBatchNorm
        # fine-tuning: running-stat normalization in train mode, ~1.2x
        # full-fine-tune step speedup (docs/DESIGN.md item 26)
        freeze_bn=bool(config.get("freeze_bn", False)),
    )
    aggregator = make_aggregator(
        config.aggregator,
        dim=resnet.feature_dim,
        hdim=config.aggregator_hdim,
        transformer_layers=int(config.get("transformer_layers", 2)),
        dtype=dtype,
    )
    return AggregationModel(
        resnet=resnet,
        aggregator=aggregator,
        aggregator_dim=config.aggregator_hdim,
        out_features=config.num_classes,
    )


def load_pretrained(variables, config):
    """ImageNet warm start from a torch checkpoint file (``pretrained_path``),
    the reference's model_zoo equivalent (``resnet.py:366-376``)."""
    path = config.get("pretrained_path", "")
    if config.get("pretrained") and path:
        from multimodalbrainsurvival_tpu.models.convert import (
            load_torch_state_dict,
            torch_resnet_to_flax,
        )

        converted = torch_resnet_to_flax(load_torch_state_dict(path))
        # the MIL extract path never calls the ResNet's 1000-class head, so
        # flax has no params for it — don't graft one in
        converted["params"].pop("fc", None)
        variables["params"]["resnet"].update(
            jax.tree.map(jnp.asarray, converted["params"])
        )
        variables["batch_stats"]["resnet"].update(
            jax.tree.map(jnp.asarray, converted["batch_stats"])
        )
        print(f"Loaded pretrained ResNet weights from {path}")
    elif config.get("pretrained"):
        print(
            "pretrained=true but no 'pretrained_path' given; using random init "
            "(no network access for model-zoo downloads)"
        )
    return variables


def build_datasets(config, quick: bool, device_put_fn=None):
    max_train = config.get("max_patch_per_wsi_train", 1000)
    max_val = config.get("max_patch_per_wsi_val", 1000)
    if quick:
        max_train = max_val = 20  # 2_HistoPath_train.py:495-497
    common = dict(
        patch_data_path=config["data_path"],
        img_size=config.img_size,
        keep_remainder=bool(config.get("keep_bag_remainder", False)),
    )
    datasets = {
        "train": PatchBagDataset(
            csv_path=config["train_csv_path"],
            bag_size=config.get("train_bag_size", 1),
            max_patches_total=max_train,
            **common,
        ),
        "val": PatchBagDataset(
            csv_path=config["val_csv_path"],
            bag_size=config.get("val_bag_size", 1),
            max_patches_total=max_val,
            **common,
        ),
        "test": PatchBagDataset(
            csv_path=config["test_csv_path"],
            bag_size=config.get("val_bag_size", 1),
            max_patches_total=max_val,
            **common,
        ),
    }
    # cache_patches_on_device: decode once, hold all patches in HBM, feed
    # steps by int32 index gather — removes the per-step H2D of pixel data
    # (docs/DESIGN.md item 11); content-identical batches (tested). Under a
    # `mesh` config the cache rows are block-sharded over every device, so
    # the budget is n_devices x per-chip HBM and batches land pre-sharded.
    from multimodalbrainsurvival_tpu.data.device_cache import maybe_cache_datasets

    return maybe_cache_datasets(
        datasets, bool(config.get("cache_patches_on_device", False)),
        max_bytes=int(config.get("cache_max_bytes_per_device", 12 << 30)),
        mesh=getattr(device_put_fn, "mesh", None),
        shard_bag=getattr(device_put_fn, "shard_bag", False),
    )


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    config, flag, checkpoint_path, summary_path = load_config(args)
    save_dir, output_dir = experiment_dirs(checkpoint_path, flag)

    device_put_fn = make_device_put(config)
    datasets = build_datasets(config, bool(args.quick), device_put_fn)
    print("loaded datasets")

    model = build_mil_model(config)
    adapter = MILAdapter(
        model=model,
        loader_kwargs={"num_threads": int(config.get("num_workers", 8)) or 1},
        # `augment: false` (TPU-native extension) turns off the train-time
        # flips + color jitter (the reference hardcodes them,
        # 2_HistoPath_train.py:474-481) — e.g. for deterministic golden runs
        augment=bool(config.get("augment", True)),
    )
    settings = TrainSettings(
        num_epochs=config.num_epochs,
        task=config.task,
        num_classes=config.num_classes,
        target_label=config.target_label,
        batch_size=config.batch_size,
        save_dir=save_dir,
        output_dir=output_dir,
        seed=args.seed,
        log_interval=config.log_interval,
        reference_parity=config.reference_parity,
        resume=bool(config.get("resume", False)),
        emergency_checkpoint=bool(config.get("emergency_checkpoint", True)),
        # multi-host preemption-consensus cadence (TrainSettings doc)
        preempt_sync_every=int(config.get("preempt_sync_every", 8)),
        # gradient accumulation (TPU-native extension; TrainSettings doc)
        accumulate_steps=int(config.get("accumulate_steps", 1)),
        device_put_fn=device_put_fn,
        # histo-only reference quirk: no best checkpoint at epoch 0
        # (2_HistoPath_train.py:378 `and epoch > 0`)
        best_from_epoch=1,
        **early_stop_kwargs(config),
        **observability_kwargs(config, save_dir),
    )
    writer = make_writer(args.log, summary_path, flag, config)

    rng = jax.random.PRNGKey(args.seed)
    probe = next(
        datasets["train"].batches(settings.batch_size, **adapter.loader_kwargs)
    )
    variables = adapter.init(
        rng, {k: jnp.asarray(probe[k]) for k in adapter.array_keys}
    )
    variables = load_pretrained(variables, config)
    variables = maybe_restore(
        variables, config, Checkpointer(), keys=("restore_path", "model_path")
    )

    # int8 frozen-trunk training (TPU-native extension, opt-in): the freeze
    # ladder's forward-only prefix runs W8A8 (models/quantize.py), the
    # trainable tail stays float — docs/DESIGN.md item 24
    adapter = quantize_trunk_training(
        config, adapter, variables, datasets, probe, settings,
        device_put_fn, args.seed,
    )

    ladder = mil_freeze_ladder(config.n_layers_to_train)
    tx, labels = build_grouped_optimizer(
        variables["params"],
        [("train", ladder, torch_adam(float(config["lr"]), config.weight_decay))],
    )
    tx = tune_optimizer(
        tx, config, len(datasets["train"]),
        num_epochs=settings.num_epochs, batch_size=settings.batch_size,
    )
    # frozen layers skip backward entirely (torch requires_grad=False parity)
    settings.param_labels = labels

    run_train(train_model, adapter, datasets, tx, settings, variables=variables,
                writer=writer, rng=rng)
    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()
