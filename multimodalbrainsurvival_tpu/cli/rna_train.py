"""RNA pipeline training CLI.

Parity with ``2_GeneExpression/1_GeneExpress_train.py``: Cox training of the
12778→4096→2048 MLP encoder + linear head, two Adam param groups
(``lr_rna`` for the encoder, ``lr_mlp`` for the head, ``:303-305``), configs
like ``ExampleConfigs/config_rna_train.json`` accepted verbatim.

Usage: ``python -m multimodalbrainsurvival_tpu.cli.rna_train --config cfg.json``
"""

from __future__ import annotations

import jax

from multimodalbrainsurvival_tpu.cli._common import (
    early_stop_kwargs,
    experiment_dirs,
    load_config,
    make_device_put,
    make_parser,
    make_writer,
    maybe_restore,
    observability_kwargs,
    run_train,
    tune_optimizer,
)
from multimodalbrainsurvival_tpu.data import RNATableDataset
from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
from multimodalbrainsurvival_tpu.train import TrainSettings, train_model
from multimodalbrainsurvival_tpu.train.adapters import TableAdapter
from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer
from multimodalbrainsurvival_tpu.train.optim import (
    build_grouped_optimizer,
    path_prefix_match,
    torch_adam,
)


def build_rna_model(config=None) -> RNAOnlyModel:
    # reference schema: 12778 -> 4096 -> 2048 fixed; `dropout` is a TPU-native
    # extension (reference hardcodes nn.Dropout() p=0.5,
    # 1_GeneExpress_train.py:247-257) used e.g. by the deterministic
    # cross-stack golden runs (tests/test_golden_crossstack.py)
    p = 0.5 if config is None else float(config.get("dropout", 0.5))
    return RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(4096, 2048), dropout=p))


def build_rna_optimizer(params, config):
    groups = [
        ("rna", path_prefix_match("encoder"),
         torch_adam(float(config["lr_rna"]), config.weight_decay)),
        ("mlp", path_prefix_match("final"),
         torch_adam(float(config["lr_mlp"]), config.weight_decay)),
    ]
    tx, _ = build_grouped_optimizer(params, groups)
    return tx


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    config, flag, checkpoint_path, summary_path = load_config(args)
    save_dir, output_dir = experiment_dirs(checkpoint_path, flag)

    datasets = {
        "train": RNATableDataset(config["train_csv_path"]),
        "val": RNATableDataset(config["val_csv_path"]),
        "test": RNATableDataset(config["test_csv_path"]),
    }
    print("loaded datasets")

    model = build_rna_model(config)
    adapter = TableAdapter(model=model)
    settings = TrainSettings(
        num_epochs=1 if args.quick else config.num_epochs,
        task="survival_prediction",
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
        device_put_fn=make_device_put(config),
        # parity: the reference weights the LOGGED running loss by the batch
        # event count (1_GeneExpress_train.py:166-171); logging only
        running_loss_weight="events" if config.reference_parity else "samples",
        **early_stop_kwargs(config),
        **observability_kwargs(config, save_dir),
    )
    writer = make_writer(args.log, summary_path, flag, config)

    rng = jax.random.PRNGKey(args.seed)
    probe = next(datasets["train"].batches(settings.batch_size))
    variables = adapter.init(rng, {k: jax.numpy.asarray(probe[k])
                                   for k in adapter.array_keys})
    variables = maybe_restore(variables, config, Checkpointer(),
                              keys=("restore_path",))
    tx = tune_optimizer(
        build_rna_optimizer(variables["params"], config),
        config, len(datasets["train"]),
        num_epochs=settings.num_epochs, batch_size=settings.batch_size,
    )

    run_train(train_model, adapter, datasets, tx, settings, variables=variables,
                writer=writer, rng=rng)
    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()
