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
