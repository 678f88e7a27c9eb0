"""Early-fusion training CLI.

Parity with ``3_EarlyFusion/2_EarlyFusion_train.py``: Cox training of the
``4096→2048→200→1`` MLP over concatenated features, single Adam group with
``lr`` (``config_feature_train.json``).
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
from multimodalbrainsurvival_tpu.data import FeatureTableDataset
from multimodalbrainsurvival_tpu.models import EarlyFusionMLP
from multimodalbrainsurvival_tpu.train import TrainSettings, torch_adam, train_model
from multimodalbrainsurvival_tpu.train.adapters import TableAdapter
from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer


def build_feature_model(config=None) -> EarlyFusionMLP:
    # `dropout` is a TPU-native extension (reference hardcodes nn.Dropout()
    # p=0.5, 2_EarlyFusion_train.py:242-251) used e.g. by the deterministic
    # cross-stack golden runs (tests/test_golden_crossstack.py)
    p = 0.5 if config is None else float(config.get("dropout", 0.5))
    return EarlyFusionMLP(hidden_dims=(2048, 200), dropout=p)


def main(argv=None):
    args = make_parser(__doc__).parse_args(argv)
    config, flag, checkpoint_path, summary_path = load_config(args)
    save_dir, output_dir = experiment_dirs(checkpoint_path, flag)

    datasets = {
        "train": FeatureTableDataset(config["train_csv_path"]),
        "val": FeatureTableDataset(config["val_csv_path"]),
        "test": FeatureTableDataset(config["test_csv_path"]),
    }
    model = build_feature_model(config)
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
        # parity: EarlyFusion's printed trace starts with an epoch(-1) eval
        # (2_EarlyFusion_train.py:311-312) and weights the logged running
        # loss by the event count (:161-166); logging only
        pre_training_eval=config.reference_parity,
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
        torch_adam(float(config["lr"]), config.weight_decay),
        config, len(datasets["train"]),
        num_epochs=settings.num_epochs, batch_size=settings.batch_size,
    )

    run_train(train_model, adapter, datasets, tx, settings, variables=variables,
                writer=writer, rng=rng)
    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()
