"""Train infra: torch-Adam parity, freeze ladder, checkpoints, CLI e2e."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.helpers import make_survival_csv

from multimodalbrainsurvival_tpu.train.optim import (
    build_grouped_optimizer,
    mil_freeze_ladder,
    path_prefix_match,
    torch_adam,
)


def test_torch_adam_parity():
    """optax chain must match torch.optim.Adam(weight_decay=...) trajectories."""
    import torch

    # note: avoid grad == -wd*param (exact cancellation makes Adam amplify
    # sub-ulp fp32 ordering differences between torch and optax)
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.5, 0.1, -0.45], np.float32)

    wt = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.Adam([wt], lr=0.01, weight_decay=0.1)
    for _ in range(5):
        wt.grad = torch.tensor(g)
        opt.step()

    tx = torch_adam(0.01, weight_decay=0.1)
    wj = jnp.array(w0)
    state = tx.init(wj)
    for _ in range(5):
        updates, state = tx.update(jnp.array(g), state, wj)
        wj = wj + updates
    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(), rtol=1e-5)


def test_freeze_ladder_labels():
    params = {
        "fc": {"kernel": jnp.ones((2, 1))},
        "aggregator": {"vector": jnp.ones((4,))},
        "resnet": {
            "conv1": {"kernel": jnp.ones((1, 1, 3, 4))},
            "bn1": {"scale": jnp.ones(4)},
            "layer1_0": {"conv1": {"kernel": jnp.ones((1, 1, 4, 4))}},
            "layer4_1": {"conv2": {"kernel": jnp.ones((1, 1, 4, 4))}},
            "fc": {"kernel": jnp.ones((4, 10))},
        },
    }
    match = mil_freeze_ladder(2)  # fc + layer4 (+ aggregator)
    tx, labels = build_grouped_optimizer(
        params, [("train", match, torch_adam(0.1))]
    )
    assert labels["fc"]["kernel"] == "train"
    assert labels["aggregator"]["vector"] == "train"
    assert labels["resnet"]["layer4_1"]["conv2"]["kernel"] == "train"
    assert labels["resnet"]["layer1_0"]["conv1"]["kernel"] == "_frozen"
    assert labels["resnet"]["conv1"]["kernel"] == "_frozen"
    assert labels["resnet"]["bn1"]["scale"] == "_frozen"
    # resnet's own 1000-class fc must NOT match the head's "fc" spec
    assert labels["resnet"]["fc"]["kernel"] == "_frozen"

    # frozen params receive zero updates
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.asarray(updates["resnet"]["conv1"]["kernel"]) == 0)
    assert np.any(np.asarray(updates["fc"]["kernel"]) != 0)


def test_grouped_lrs_differ():
    params = {"encoder": {"k": jnp.ones(3)}, "final": {"k": jnp.ones(3)}}
    tx, _ = build_grouped_optimizer(
        params,
        [
            ("rna", path_prefix_match("encoder"), torch_adam(1e-2)),
            ("mlp", path_prefix_match("final"), torch_adam(1e-4)),
        ],
    )
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    assert abs(float(updates["encoder"]["k"][0])) > abs(
        float(updates["final"]["k"][0])
    ) * 50


def test_checkpoint_roundtrip(tmp_path):
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.int32(7),
    }
    ck = Checkpointer()
    path = str(tmp_path / "ckpt")
    ck.save(path, state)  # async: returns before the disk commit
    ck.wait()
    assert Checkpointer.exists(path)
    restored = ck.restore(path, state)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    assert int(restored["step"]) == 7

    # restore() settles any in-flight save of its path first: an immediate
    # overwrite + restore must observe the NEW state without an explicit wait
    ck.save(path, jax.tree.map(lambda x: x + 1, state))
    r2 = ck.restore(path, state)
    assert int(r2["step"]) == 8


@pytest.fixture
def rna_experiment(tmp_path):
    """Tiny RNA experiment: CSVs + reference-schema config."""
    for split, n in [("train", 24), ("val", 12), ("test", 12)]:
        make_survival_csv(
            str(tmp_path / f"rna_{split}.csv"),
            [f"{split}{i}" for i in range(n)],
            n_rna=16,
            seed=hash(split) % 1000,
        )
    cfg = {
        "batch_size": 8,
        "use_cuda": False,
        "train_csv_path": str(tmp_path / "rna_train.csv"),
        "val_csv_path": str(tmp_path / "rna_val.csv"),
        "test_csv_path": str(tmp_path / "rna_test.csv"),
        "num_workers": 1,
        "num_epochs": 2,
        "lr_rna": 1e-4,
        "lr_mlp": 1e-4,
        "weight_decay": 1e-5,
        "flag": "rna_model",
        "checkpoint_path": str(tmp_path / "out") + "/",
        "summary_path": str(tmp_path / "out/summary") + "/",
        "restore_path": "",
        "model_path": "",
    }
    cfg_path = tmp_path / "config_rna_train.json"
    cfg_path.write_text(json.dumps(cfg))
    return tmp_path, cfg, cfg_path


def test_rna_cli_end_to_end(rna_experiment):
    """train → savescore → extractfeatures through the real CLI mains."""
    tmp_path, cfg, cfg_path = rna_experiment
    from multimodalbrainsurvival_tpu.cli import (
        rna_extractfeatures,
        rna_savescore,
        rna_train,
    )

    rna_train.main(["--config", str(cfg_path)])
    save_dir = tmp_path / "out/models/rna_model"
    assert (save_dir / "model_last").is_dir()
    assert (save_dir / "model_dict_best").is_dir()
    out_dir = tmp_path / "out/outputs/rna_model"
    for split in ("train", "val", "test"):
        for tag in ("last", "best"):
            f = out_dir / f"{split}_output_{tag}.csv"
            assert f.is_file()
            header = f.read_text().splitlines()[0]
            assert header == "id,score,survival_months,vital_status"

    cfg2 = dict(cfg)
    cfg2["model_path"] = str(save_dir / "model_last")
    cfg2["output_path"] = str(tmp_path / "scores") + "/"
    p2 = tmp_path / "cfg_savescore.json"
    p2.write_text(json.dumps(cfg2))
    rna_savescore.main(["--config", str(p2)])
    assert (tmp_path / "scores/rna_val_df.csv").is_file()

    cfg3 = dict(cfg2)
    cfg3["output_path"] = str(tmp_path / "feats") + "/"
    p3 = tmp_path / "cfg_extract.json"
    p3.write_text(json.dumps(cfg3))
    rna_extractfeatures.main(["--config", str(p3)])
    feats = np.loadtxt(tmp_path / "feats/rna_features_val.csv", delimiter=",")
    assert feats.shape == (12, 2048)


def test_quick_flag_limits_epochs(rna_experiment):
    tmp_path, cfg, cfg_path = rna_experiment
    from multimodalbrainsurvival_tpu.cli import rna_train

    rna_train.main(["--config", str(cfg_path), "--quick", "1"])
    # quick run: only model_last guaranteed (best requires epoch > 0)
    assert (tmp_path / "out/models/rna_model/model_last").is_dir()


# ---------------------------------------------------------------------------
# Printed-trace parity (VERDICT r1 item 7): the running-loss lines must follow
# the reference's formula — a WINDOWED average over the batches since the last
# log (2_HistoPath_train.py:346-358), weighted by the batch EVENT count for
# the GeneExpress/EarlyFusion drivers (1_GeneExpress_train.py:166-171) — and
# EarlyFusion logs a full eval as epoch -1 before training
# (2_EarlyFusion_train.py:311-312).
# ---------------------------------------------------------------------------

import re


def _trace_run(tmp_path, capsys, *, log_interval, weight, pre_eval, tag):
    from multimodalbrainsurvival_tpu.data.tables import RNATableDataset
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter
    from multimodalbrainsurvival_tpu.train.loop import TrainSettings, train_model

    csv = tmp_path / f"trace_{tag}.csv"
    make_survival_csv(str(csv), [f"c{i}" for i in range(32)], n_rna=8, seed=3)
    ds = RNATableDataset(str(csv))
    adapter = TableAdapter(
        model=RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(8, 4), dropout=0.0))
    )
    settings = TrainSettings(
        num_epochs=1, batch_size=8, log_interval=log_interval, seed=7,
        running_loss_weight=weight, pre_training_eval=pre_eval,
        eval_splits_during_training=("val",) if pre_eval else (),
    )
    train_model(adapter, {"train": ds, "val": ds}, torch_adam(1e-3), settings)
    out = capsys.readouterr().out
    losses = [
        float(m.group(2))
        for m in re.finditer(
            r"train \| epoch 0 \| step (\d+) \| loss\s+([-\d.]+)", out
        )
    ]
    return ds, losses, out


def test_printed_running_loss_is_windowed_event_weighted(tmp_path, capsys):
    # per-step losses: log_interval=1 makes each printed line the raw batch
    # loss (window of one), independent of the weighting mode
    ds, per_step, _ = _trace_run(
        tmp_path, capsys, log_interval=1, weight="events", pre_eval=False,
        tag="a",
    )
    assert len(per_step) == 4  # 32 samples / batch 8

    # identical run (same seed ⇒ same batches/losses) logged every 2 steps
    # must print the reference's event-weighted windowed averages
    _, windowed, _ = _trace_run(
        tmp_path, capsys, log_interval=2, weight="events", pre_eval=False,
        tag="a",
    )
    events = [
        float((np.asarray(b["vital_status"], np.float64) * b["mask"]).sum())
        for b in ds.batches(8, shuffle=True, seed=7)
    ]
    expected = [
        (per_step[0] * events[0] + per_step[1] * events[1])
        / (events[0] + events[1]),
        (per_step[2] * events[2] + per_step[3] * events[3])
        / (events[2] + events[3]),
    ]
    assert len(windowed) == 2
    np.testing.assert_allclose(windowed, expected, atol=2e-3)

    # sample weighting (HistoPath/Joint mode) is a plain mean of the window
    _, sampled, _ = _trace_run(
        tmp_path, capsys, log_interval=2, weight="samples", pre_eval=False,
        tag="a",
    )
    expected_s = [
        (per_step[0] + per_step[1]) / 2, (per_step[2] + per_step[3]) / 2,
    ]
    np.testing.assert_allclose(sampled, expected_s, atol=2e-3)


def test_pre_training_eval_logs_epoch_minus_one(tmp_path, capsys):
    _, _, out = _trace_run(
        tmp_path, capsys, log_interval=2, weight="events", pre_eval=True,
        tag="b",
    )
    assert "epoch -1" in out
    # the epoch -1 eval precedes the first training epoch
    assert out.index("epoch -1") < out.index("Epoch 0")


def test_frozen_param_labels_do_not_change_training(tmp_path, capsys):
    """param_labels stop_gradients frozen leaves so XLA skips their backward
    (torch requires_grad=False parity, 2_HistoPath_train.py:544-551). The
    optimization must be a pure no-op numerically: identical params after
    training with and without it."""
    from multimodalbrainsurvival_tpu.data.tables import RNATableDataset
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter
    from multimodalbrainsurvival_tpu.train.loop import TrainSettings, train_model

    csv = tmp_path / "f.csv"
    make_survival_csv(str(csv), [f"c{i}" for i in range(16)], n_rna=8, seed=5)
    ds = RNATableDataset(str(csv))

    def run(with_labels):
        adapter = TableAdapter(
            model=RNAOnlyModel(
                encoder=RNAEncoder(hidden_dims=(8, 4), dropout=0.0)
            )
        )
        # freeze the encoder, train only the head — like the MIL ladder
        tx, labels = build_grouped_optimizer(
            _probe_params(adapter, ds),
            [("head", path_prefix_match("final"), torch_adam(1e-2))],
        )
        settings = TrainSettings(
            num_epochs=2, batch_size=8, log_interval=100, seed=3,
            eval_splits_during_training=(),
            param_labels=labels if with_labels else None,
        )
        variables, _, _ = train_model(
            adapter, {"train": ds, "val": ds}, tx, settings
        )
        return variables["params"]

    def _probe_params(adapter, ds):
        probe = next(ds.batches(8))
        v = adapter.init(
            jax.random.PRNGKey(3),
            {k: jnp.asarray(probe[k]) for k in adapter.array_keys},
        )
        return v["params"]

    p_fast, p_ref = run(True), run(False)
    capsys.readouterr()
    flat_fast = jax.tree_util.tree_leaves_with_path(p_fast)
    flat_ref = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(p_ref)}
    for k, v in flat_fast:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat_ref[jax.tree_util.keystr(k)]),
            err_msg=str(k),
        )



def test_events_weighting_tolerates_missing_vital_status(tmp_path, capsys):
    """running_loss_weight='events' on a task/CSV without vital_status must
    fall back to sample weighting instead of crashing (the rna/feature CLIs
    set it whenever reference_parity is on, regardless of task)."""
    import pandas as pd

    from multimodalbrainsurvival_tpu.data.tables import RNATableDataset
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter
    from multimodalbrainsurvival_tpu.train.loop import TrainSettings, train_model

    rng_np = np.random.default_rng(0)
    df = pd.DataFrame({"case": [f"c{i}" for i in range(16)],
                       "label": rng_np.integers(0, 2, 16)})
    for g in range(8):
        df[f"rna_{g}"] = rng_np.normal(size=16).astype(np.float32)
    csv = tmp_path / "cls.csv"
    df.to_csv(csv, index=False)
    ds = RNATableDataset(str(csv))
    adapter = TableAdapter(
        model=RNAOnlyModel(
            encoder=RNAEncoder(hidden_dims=(8, 4), dropout=0.0),
            out_features=2,
        )
    )
    settings = TrainSettings(
        num_epochs=1, batch_size=8, log_interval=1, seed=1,
        task="classification", num_classes=2, target_label="label",
        running_loss_weight="events", eval_splits_during_training=(),
    )
    train_model(adapter, {"train": ds, "val": ds}, torch_adam(1e-3), settings)
    assert "train | epoch 0" in capsys.readouterr().out


def test_unknown_config_keys_are_reported(tmp_path, capsys):
    """Typo'd / since-removed config keys (e.g. steps_per_dispatch) must be
    announced by load_config, never silently ignored; known keys stay
    silent (reference configs load verbatim — tests/test_exampledata.py)."""
    import argparse
    import json

    from multimodalbrainsurvival_tpu.cli._common import load_config

    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "flag": "x", "checkpoint_path": str(tmp_path),
        "steps_per_dispatch": 8, "something_mistyped": 1,
    }))
    args = argparse.Namespace(config=str(cfg), seed=0)
    load_config(args)
    out = capsys.readouterr().out
    assert "steps_per_dispatch" in out and "something_mistyped" in out

    cfg.write_text(json.dumps({"flag": "x", "checkpoint_path": str(tmp_path)}))
    load_config(args)
    assert "ignoring" not in capsys.readouterr().out


def test_adapter_init_is_jitted_and_matches_eager_structure():
    """adapters.init runs under jit (one compiled program — DESIGN item 15);
    the variable tree must match an eager init's structure with values equal
    to float tolerance (fusion may differ at ulp level)."""
    import jax
    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.models import (
        AggregationModel, make_aggregator, resnet18,
    )
    from multimodalbrainsurvival_tpu.train.adapters import MILAdapter

    adapter = MILAdapter(model=AggregationModel(
        resnet=resnet18(), aggregator=make_aggregator("identity", dim=512),
        aggregator_dim=512,
    ))
    arrays = {
        "patch_bag": jnp.zeros((2, 2, 32, 32, 3), jnp.uint8),
        "bag_mask": jnp.ones((2, 2), bool),
        "sample_mask": jnp.ones((2,), bool),
    }
    v_jit = adapter.init(jax.random.PRNGKey(0), arrays)

    x = adapter._preprocess(arrays, False, None)
    v_eager = adapter.model.init(
        jax.random.PRNGKey(0), *adapter._model_inputs(x, arrays),
        mask=arrays["bag_mask"], train=False,
    )
    assert jax.tree.structure(v_jit) == jax.tree.structure(v_eager)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(v_jit),
        jax.tree_util.tree_leaves_with_path(v_eager),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(ka),
        )


def test_evaluate_empty_split_returns_nan(tmp_path, capsys):
    """evaluate() on a dataset that yields zero batches must return cleanly
    (nan loss, no metrics) for every task instead of crashing."""
    import jax

    from multimodalbrainsurvival_tpu.data.tables import RNATableDataset
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter
    from multimodalbrainsurvival_tpu.train.loop import TrainSettings, evaluate

    csv = tmp_path / "one.csv"
    make_survival_csv(str(csv), ["c0"], n_rna=4, seed=0)
    ds = RNATableDataset(str(csv))

    class Empty:
        def __len__(self):
            return 0

        def batches(self, *a, **kw):
            return iter(())

    adapter = TableAdapter(
        model=RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(4, 2), dropout=0.0))
    )
    probe = next(ds.batches(1))
    variables = adapter.init(
        jax.random.PRNGKey(0),
        {k: jnp.asarray(probe[k]) for k in adapter.array_keys},
    )
    for task, extra in [
        ("survival_prediction", {}),
        ("classification", {"num_classes": 2, "target_label": "label"}),
    ]:
        settings = TrainSettings(task=task, batch_size=2, **extra)
        loss, frame, metrics = evaluate(
            adapter, variables, Empty(), settings, split="val", epoch=0
        )
        assert np.isnan(loss) and frame is None
        assert np.isnan(metrics["loss"])
    assert "empty split" in capsys.readouterr().out


def test_compile_cache_dir_config_key(tmp_path):
    """compile_cache_dir points jax's persistent compile cache at the given
    directory (created if missing); absent key leaves the config untouched."""
    import argparse
    import json

    import jax

    from multimodalbrainsurvival_tpu.cli._common import load_config

    d = tmp_path / "xla_cache"
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "flag": "x", "checkpoint_path": str(tmp_path),
        "compile_cache_dir": str(d),
    }))
    prev = jax.config.jax_compilation_cache_dir
    try:
        load_config(argparse.Namespace(config=str(cfg), seed=0))
        assert jax.config.jax_compilation_cache_dir == str(d)
        assert d.is_dir()

        # absent key: config value untouched
        jax.config.update("jax_compilation_cache_dir", prev)
        cfg.write_text(json.dumps({
            "flag": "x", "checkpoint_path": str(tmp_path),
        }))
        load_config(argparse.Namespace(config=str(cfg), seed=0))
        assert jax.config.jax_compilation_cache_dir == prev
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_eval_nan_guard_raises(tmp_path):
    """A non-finite eval loss must raise (train/loop.py evaluate), not fold
    silently into val_loss and corrupt best-checkpoint selection."""
    from multimodalbrainsurvival_tpu.data import RNATableDataset
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter
    from multimodalbrainsurvival_tpu.train.loop import TrainSettings, evaluate

    make_survival_csv(str(tmp_path / "rna.csv"),
                      [f"c{i}" for i in range(8)], n_rna=4, seed=2)
    ds = RNATableDataset(str(tmp_path / "rna.csv"))
    adapter = TableAdapter(
        model=RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(4, 2), dropout=0.0))
    )
    probe = next(ds.batches(2))
    variables = adapter.init(
        jax.random.PRNGKey(0),
        {k: jnp.asarray(probe[k]) for k in adapter.array_keys},
    )
    poisoned = jax.tree.map(lambda p: p * jnp.nan, variables)
    settings = TrainSettings(batch_size=4)
    with pytest.raises(FloatingPointError, match="non-finite eval loss"):
        evaluate(adapter, poisoned, ds, settings, split="val", epoch=0)
    # the guard is optional (check_numerics=False -> reference-style silence)
    settings = TrainSettings(batch_size=4, check_numerics=False)
    loss, _, _ = evaluate(adapter, poisoned, ds, settings, split="val", epoch=0)
    assert np.isnan(loss)


def test_run_train_preemption_exits_143():
    """A preempted CLI run must NOT exit 0 — schedulers keyed on exit codes
    would treat the incomplete run as done and never rerun it."""
    from multimodalbrainsurvival_tpu.cli._common import (
        PREEMPTED_EXIT_CODE,
        run_train,
    )
    from multimodalbrainsurvival_tpu.train import TrainingPreempted

    def boom():
        raise TrainingPreempted(0, 1, "/nowhere/train_state.preempt")

    with pytest.raises(SystemExit) as exc:
        run_train(boom)
    assert exc.value.code == PREEMPTED_EXIT_CODE == 143

    assert run_train(lambda: "ok") == "ok"
