"""Joint fusion training CLI — end-to-end bimodal Cox training.

Parity with ``5_JointFusion/1_JointFusion_train.py``: ResNet bag encoder ⊕
RNA MLP → Dropout(0.8) → Linear(4096, 1), three Adam param groups
``lr_histo`` / ``lr_rna`` / ``lr_mlp`` (``:413-416``) with the ResNet freeze
ladder applied *inside* the histo group (``:386-401`` — note the joint ladder
starts at ``resnet.fc``, the ResNet's own classifier head, unlike the
HistoPath ladder which starts at the MIL head). RNA and fusion head are
always trainable. Config: ``config_joint_train.json`` verbatim.
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
from multimodalbrainsurvival_tpu.cli.histo_train import load_pretrained
from multimodalbrainsurvival_tpu.data import PatchBagRNADataset
from multimodalbrainsurvival_tpu.models import BagHistopathologyRNAModel, RNAEncoder
from multimodalbrainsurvival_tpu.models.resnet import RESNET_CONSTRUCTORS
from multimodalbrainsurvival_tpu.train import TrainSettings, train_model
from multimodalbrainsurvival_tpu.train.adapters import JointAdapter
from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer
from multimodalbrainsurvival_tpu.train.optim import (
    build_grouped_optimizer,
    path_prefix_match,
    torch_adam,
)

JOINT_LADDER = ("resnet/fc", "resnet/layer4", "resnet/layer3",
                "resnet/layer2", "resnet/layer1", "resnet/conv1")


def build_joint_model(config, fold_bn: bool = False) -> BagHistopathologyRNAModel:
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    resnet = RESNET_CONSTRUCTORS[config.model_name](
        dtype=dtype, fold_bn=fold_bn,
        # bool = all stages; a list of 1-based stage numbers ([1, 2])
        # remats only those stages (models/resnet.py remat_blocks)
        remat_blocks=config.get("remat", False),
        # freeze_bn: true (TPU-native extension) — FrozenBatchNorm
        # fine-tuning: running-stat normalization in train mode, ~1.2x
        # full-fine-tune step speedup (docs/DESIGN.md item 26)
        freeze_bn=bool(config.get("freeze_bn", False)),
    )
    # `dropout` (TPU-native extension) overrides BOTH hardcoded reference
    # rates — the RNA encoder's 0.5 and the fusion head's 0.8
    # (1_JointFusion_train.py:314-323) — e.g. 0 for deterministic golden runs
    p = config.get("dropout", None)
    return BagHistopathologyRNAModel(
        resnet=resnet,
        rna_encoder=RNAEncoder(
            hidden_dims=(4096, 2048), dtype=dtype,
            dropout=0.5 if p is None else float(p),
        ),
        head_dropout=0.8 if p is None else float(p),
        out_features=config.num_classes,
    )


def build_joint_optimizer(params, config):
    wd = config.weight_decay
    histo_specs = JOINT_LADDER[: max(0, config.n_layers_to_train)]
    groups = [
        ("histo", path_prefix_match(*histo_specs),
         torch_adam(float(config["lr_histo"]), wd)),
        ("rna", path_prefix_match("rna_encoder"),
         torch_adam(float(config["lr_rna"]), wd)),
        ("mlp", path_prefix_match("final"),
         torch_adam(float(config["lr_mlp"]), wd)),
    ]
    return build_grouped_optimizer(params, groups)


def build_joint_datasets(config, quick: bool, device_put_fn=None):
    max_train = config.get("max_patch_per_wsi_train", 1000)
    max_val = config.get("max_patch_per_wsi_val", 1000)
    if quick:
        max_train = max_val = 20  # 1_JointFusion_train.py:357-359
    common = dict(
        patch_data_path=config["data_path"],
        img_size=config.img_size,
        keep_remainder=bool(config.get("keep_bag_remainder", False)),
    )
    datasets = {
        "train": PatchBagRNADataset(
            csv_path=config["train_csv_path"],
            bag_size=config.get("train_bag_size", 1),
            max_patches_total=max_train, **common,
        ),
        "val": PatchBagRNADataset(
            csv_path=config["val_csv_path"],
            bag_size=config.get("val_bag_size", 1),
            max_patches_total=max_val, **common,
        ),
        "test": PatchBagRNADataset(
            csv_path=config["test_csv_path"],
            bag_size=config.get("val_bag_size", 1),
            max_patches_total=max_val, **common,
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
    datasets = build_joint_datasets(config, bool(args.quick), device_put_fn)
    print("loaded datasets")

    model = build_joint_model(config)
    adapter = JointAdapter(
        model=model,
        loader_kwargs={"num_threads": int(config.get("num_workers", 8)) or 1},
        # `augment: false` turns off the train-time flips + color jitter
        # (deterministic runs; same knob as the histo CLI)
        augment=bool(config.get("augment", True)),
    )
    settings = TrainSettings(
        num_epochs=config.num_epochs,
        task=config.task,
        num_classes=config.num_classes,
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
        **early_stop_kwargs(config),
        **observability_kwargs(config, save_dir),
    )
    writer = make_writer(args.log, summary_path, flag, config)

    rng = jax.random.PRNGKey(args.seed)
    probe = next(datasets["train"].batches(settings.batch_size,
                                           **adapter.loader_kwargs))
    variables = adapter.init(
        rng, {k: jnp.asarray(probe[k]) for k in adapter.array_keys}
    )
    variables = load_pretrained(variables, config)
    # unimodal warm starts (reference histo_restore_path / rna_restore_path)
    ckpt = Checkpointer()
    variables = maybe_restore(variables, config, ckpt,
                              keys=("restore_path", "model_path"))

    # int8 frozen-trunk training (opt-in): the joint ladder's frozen ResNet
    # prefix runs W8A8, the trainable stages + RNA encoder + fusion head
    # stay float (QuantTrunkJointAdapter) — docs/DESIGN.md item 24
    adapter = quantize_trunk_training(
        config, adapter, variables, datasets, probe, settings,
        device_put_fn, args.seed,
    )

    tx, labels = build_joint_optimizer(variables["params"], config)
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
