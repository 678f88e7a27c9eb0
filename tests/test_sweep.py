"""Hyperparameter sweep orchestrator (`cli/sweep.py`).

The reference's model selection is hand-edited configs run one at a time
(its per-module LR knobs, e.g. `config_joint_train.json`); these tests pin
the grid expansion, the per-combo flag/artifact layout, ranking by the VAL
(never test) C-index, and the winner's re-runnable merged config.
"""

import json

import numpy as np
import pandas as pd
import pytest

from multimodalbrainsurvival_tpu.cli import sweep
from tests.helpers import make_survival_csv


def _learnable_survival_csv(path, n, *, n_feature=8, seed=0):
    """Synthetic cohort where survival IS predictable from the features
    (risk = feature_0 + 0.5*feature_1): sweeps can meaningfully rank an LR
    that learns against LRs that cannot."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, n_feature)).astype(np.float32)
    risk = x[:, 0] + 0.5 * x[:, 1]
    months = rng.exponential(60.0 / np.exp(risk)).clip(1, 500).round(4)
    df = pd.DataFrame({"case": [f"c{seed}_{i}" for i in range(n)],
                       "survival_months": months,
                       "vital_status": rng.integers(0, 2, n)})
    for j in range(n_feature):
        df[f"feature_{j}"] = x[:, j]
    df.to_csv(path, index=False)


def _base_cfg(tmp_path, **extra):
    ckpt = str(tmp_path / "out") + "/"
    cfg = {
        "batch_size": 4, "use_cuda": False,
        "train_csv_path": str(tmp_path / "train.csv"),
        "val_csv_path": str(tmp_path / "val.csv"),
        "test_csv_path": str(tmp_path / "test.csv"),
        "num_workers": 1, "num_epochs": 2, "lr": 1e-4,
        "weight_decay": 0.0, "flag": "sw",
        "checkpoint_path": ckpt, "summary_path": ckpt + "summary/",
        "restore_path": "", "model_path": "",
    }
    cfg.update(extra)
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_parse_grid_rejects_empty_value_list():
    """An empty value list would expand to ZERO combos and die later with
    an opaque KeyError — rejected up front (round-4 advisor finding)."""
    with pytest.raises(SystemExit, match="empty value list"):
        sweep.parse_grid('{"lr": []}')


def test_parse_grid_rejects_unknown_key():
    """A typo'd grid key would train N identical models and select a winner
    from noise — rejected against config.KNOWN_KEYS (advisor finding)."""
    with pytest.raises(SystemExit, match="not recognized"):
        sweep.parse_grid('{"lr_rnaa": [1e-4, 1e-5]}')


def test_config_sweep_grid_is_validated_too(tmp_path):
    """The config-side `sweep_grid` goes through the same validation as
    --grid."""
    cfg = _base_cfg(tmp_path, sweep_grid={"dropoutt": [0.1]})
    with pytest.raises(SystemExit, match="not recognized"):
        sweep.main(["--config", cfg, "--task", "feature"])
    cfg = _base_cfg(tmp_path, sweep_grid={"dropout": []})
    with pytest.raises(SystemExit, match="empty value list"):
        sweep.main(["--config", cfg, "--task", "feature"])


def test_subsample_deterministic_and_named():
    combos = sweep.combinations({"lr": [1, 2, 3, 4], "dropout": [0.1, 0.2]})
    sub = sweep.subsample(combos, 3, seed=7)
    assert len(sub) == 3
    assert sub == sweep.subsample(combos, 3, seed=7)  # seeded-deterministic
    assert all(c in combos for c in sub)
    # original cartesian order is preserved
    idx = [combos.index(c) for c in sub]
    assert idx == sorted(idx)
    # no-op cases
    assert sweep.subsample(combos, 0, seed=7) is combos
    assert sweep.subsample(combos, 99, seed=7) is combos


def test_halving_rungs_shapes():
    # 6 combos, 8 epochs, eta=2: 1 -> 2 -> 4 -> 8
    assert sweep.halving_rungs(6, 8, 2) == [1, 2, 4, 8]
    # collapses duplicate tiny targets, always ends at num_epochs
    assert sweep.halving_rungs(4, 2, 2) == [1, 2]
    assert sweep.halving_rungs(1, 5, 2) == [5]
    assert sweep.halving_rungs(9, 9, 3) == [1, 3, 9]


def test_max_trials_trains_subset_only(tmp_path, capsys):
    _learnable_survival_csv(str(tmp_path / "train.csv"), 12, seed=1)
    _learnable_survival_csv(str(tmp_path / "val.csv"), 8, seed=2)
    _learnable_survival_csv(str(tmp_path / "test.csv"), 8, seed=3)
    cfg = _base_cfg(tmp_path, num_epochs=1)
    sweep.main(["--config", cfg, "--task", "feature",
                "--grid", '{"lr": [1e-3, 1e-4, 1e-5, 1e-6]}',
                "--max_trials", "2"])
    out = capsys.readouterr().out
    assert "sampling 2/4 combinations" in out  # dropped combos are named
    summary = pd.read_csv(tmp_path / "out/sweep_summary.csv")
    assert len(summary) == 2


def test_halving_returns_full_grid_winner_under_half_the_epochs(tmp_path,
                                                                capsys):
    """Successive halving finds the same winner as the exhaustive grid
    while training < 50% of its epoch-units (round-4 verdict Next #6).
    One LR in the grid can actually learn the (learnable) cohort; halving
    must carry it through every rung. Resume-exactness (test_preemption)
    guarantees a combo continued across rungs equals the same combo
    trained straight through."""
    _learnable_survival_csv(str(tmp_path / "train.csv"), 16, seed=1)
    _learnable_survival_csv(str(tmp_path / "val.csv"), 12, seed=2)
    _learnable_survival_csv(str(tmp_path / "test.csv"), 12, seed=3)
    grid = ('{"lr": [3e-2, 1e-7, 3e-8, 1e-8, 3e-9, 1e-9]}')

    # exhaustive grid: 6 combos x 8 epochs = 48 epoch-units
    full_cfg = _base_cfg(tmp_path, num_epochs=8,
                         checkpoint_path=str(tmp_path / "full") + "/")
    sweep.main(["--config", full_cfg, "--task", "feature", "--grid", grid])
    full_best = json.loads(
        (tmp_path / "full/sweep_best_config.json").read_text())
    full_summary = pd.read_csv(tmp_path / "full/sweep_summary.csv")
    assert int(full_summary["epochs_trained"].sum()) == 48

    half_cfg = _base_cfg(tmp_path, num_epochs=8,
                         checkpoint_path=str(tmp_path / "half") + "/")
    sweep.main(["--config", half_cfg, "--task", "feature", "--grid", grid,
                "--halving", "2"])
    out = capsys.readouterr().out
    assert "cumulative epoch targets [1, 2, 4, 8]" in out
    half_best = json.loads(
        (tmp_path / "half/sweep_best_config.json").read_text())
    half_summary = pd.read_csv(tmp_path / "half/sweep_summary.csv")

    # same winner, under half the training
    assert half_best["lr"] == full_best["lr"] == 3e-2
    trained = int(half_summary["epochs_trained"].sum())
    assert trained < 0.5 * 48, trained
    # only the one survivor reached the full budget; cut combos keep their
    # partial budgets + last-rung CI in the summary (no silent truncation)
    assert (half_summary["epochs_trained"] == 8).sum() == 1
    assert half_summary["val_CI"].notna().all()


def test_sweeping_num_epochs_flows_through(tmp_path):
    """Code-review regression: a grid over num_epochs must actually train
    each combo with ITS value — the halving-era run_combo briefly clobbered
    it with the base config's num_epochs, training identical models."""
    _learnable_survival_csv(str(tmp_path / "train.csv"), 10, seed=1)
    _learnable_survival_csv(str(tmp_path / "val.csv"), 6, seed=2)
    _learnable_survival_csv(str(tmp_path / "test.csv"), 6, seed=3)
    cfg = _base_cfg(tmp_path, num_epochs=1)
    sweep.main(["--config", cfg, "--task", "feature",
                "--grid", '{"num_epochs": [1, 2]}'])
    for c, want in ((1, 1), (2, 2)):
        child = json.loads(
            (tmp_path / "out/sweep" / f"config_hp{c}.json").read_text())
        assert child["num_epochs"] == want
    summary = pd.read_csv(tmp_path / "out/sweep_summary.csv")
    assert sorted(summary["epochs_trained"]) == [1, 2]


def test_halving_rejects_num_epochs_grid_and_classification(tmp_path):
    """--halving controls the epoch budget itself (a num_epochs grid is
    contradictory) and needs a survival val CI to rank (classification
    produces none) — both rejected BEFORE any training."""
    cfg = _base_cfg(tmp_path)
    with pytest.raises(SystemExit, match="num_epochs"):
        sweep.main(["--config", cfg, "--task", "feature",
                    "--grid", '{"num_epochs": [1, 2]}', "--halving", "2"])
    cfg = _base_cfg(tmp_path, task="classification")
    with pytest.raises(SystemExit, match="classification"):
        sweep.main(["--config", cfg, "--task", "feature",
                    "--grid", '{"lr": [1e-3, 1e-4]}', "--halving", "2"])


def test_parse_grid_inline_file_and_scalars(tmp_path):
    assert sweep.parse_grid('{"lr": [1, 2], "dropout": 0.5}') == {
        "lr": [1, 2], "dropout": [0.5]}
    p = tmp_path / "grid.json"
    p.write_text('{"lr": [3]}')
    assert sweep.parse_grid(str(p)) == {"lr": [3]}
    with pytest.raises(SystemExit):
        sweep.parse_grid("")
    with pytest.raises(SystemExit):
        sweep.parse_grid("not json")
    with pytest.raises(SystemExit):
        sweep.parse_grid("[1, 2]")


def test_combinations_sorted_cartesian():
    combos = sweep.combinations({"b": [1, 2], "a": ["x"]})
    assert combos == [{"a": "x", "b": 1}, {"a": "x", "b": 2}]


def test_sweep_feature_end_to_end(tmp_path, capsys):
    cases = [f"c{i}" for i in range(10)]
    make_survival_csv(str(tmp_path / "train.csv"), cases, n_feature=16,
                      seed=3)
    make_survival_csv(str(tmp_path / "val.csv"),
                      [f"v{i}" for i in range(5)], n_feature=16, seed=4)
    make_survival_csv(str(tmp_path / "test.csv"),
                      [f"t{i}" for i in range(5)], n_feature=16, seed=5)
    ckpt = str(tmp_path / "out") + "/"
    cfg = {
        "batch_size": 5, "use_cuda": False,
        "train_csv_path": str(tmp_path / "train.csv"),
        "val_csv_path": str(tmp_path / "val.csv"),
        "test_csv_path": str(tmp_path / "test.csv"),
        "num_workers": 1, "num_epochs": 2, "lr": 1e-4,
        "weight_decay": 1e-5, "flag": "sw",
        "checkpoint_path": ckpt, "summary_path": ckpt + "summary/",
        "restore_path": "", "model_path": "",
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    sweep.main(["--config", str(p), "--task", "feature",
                "--grid", '{"lr": [1e-4, 1e-5], "dropout": [0.3]}'])
    out = capsys.readouterr().out

    summary = pd.read_csv(tmp_path / "out/sweep_summary.csv")
    assert len(summary) == 2
    assert set(summary["flag"]) == {"sw_hp1", "sw_hp2"}
    assert {"lr", "dropout", "val_CI", "test_CI"} <= set(summary.columns)
    assert np.isfinite(summary["val_CI"]).all()
    # ranked by val CI, descending
    assert list(summary["val_CI"]) == sorted(summary["val_CI"],
                                             reverse=True)
    # per-combo artifacts in the standard per-flag layout
    for c in (1, 2):
        assert (tmp_path / "out/models" / f"sw_hp{c}").is_dir()
        assert (tmp_path / "out/outputs" / f"sw_hp{c}"
                / "val_output_best.csv").is_file()
        child = json.loads(
            (tmp_path / "out/sweep" / f"config_hp{c}.json").read_text())
        assert child["flag"] == f"sw_hp{c}"
        assert child["dropout"] == 0.3
    assert "sweep best (by val CI):" in out

    # the winner's merged config re-runs under the ORIGINAL flag with the
    # winning knobs baked in
    best = json.loads((tmp_path / "out/sweep_best_config.json").read_text())
    assert best["flag"] == "sw"
    assert best["dropout"] == 0.3
    top = summary.iloc[0]
    assert best["lr"] == top["lr"]


def test_sweep_config_grid_overrides_args(tmp_path, capsys):
    """`sweep_grid` in the config wins over --grid, config-over-args like
    the reference's flag handling; scalars promote to one-point axes."""
    cases = [f"c{i}" for i in range(8)]
    for split, seed in (("train", 1), ("val", 2), ("test", 3)):
        make_survival_csv(str(tmp_path / f"{split}.csv"),
                          [f"{split[0]}{i}" for i in range(8 if split == 'train' else 4)],
                          n_feature=8, seed=seed)
    ckpt = str(tmp_path / "out") + "/"
    cfg = {
        "batch_size": 4, "use_cuda": False,
        "train_csv_path": str(tmp_path / "train.csv"),
        "val_csv_path": str(tmp_path / "val.csv"),
        "test_csv_path": str(tmp_path / "test.csv"),
        "num_workers": 1, "num_epochs": 1, "lr": 1e-4,
        "weight_decay": 1e-5, "flag": "sg",
        "checkpoint_path": ckpt, "summary_path": ckpt + "summary/",
        "restore_path": "", "model_path": "",
        "sweep_grid": {"lr": 1e-3},
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    sweep.main(["--config", str(p), "--task", "feature",
                "--grid", '{"lr": [1, 2, 3]}'])
    summary = pd.read_csv(tmp_path / "out/sweep_summary.csv")
    assert len(summary) == 1  # the config's one-point grid, not --grid's 3
    assert summary.iloc[0]["lr"] == 1e-3
    # sweep_grid must not leak into the per-combo train config
    child = json.loads(
        (tmp_path / "out/sweep/config_hp1.json").read_text())
    assert "sweep_grid" not in child
