"""K-fold CV orchestrator (cli/cv_run.py).

The reference's CV workflow is manual (K hand-written configs whose flag
contains 'cv'); the orchestrator automates the split → train → savescore →
summarize loop. These tests pin the split's safety properties (case-level,
stratified, deterministic) and the end-to-end artifact contract on the
cheapest pipeline (EarlyFusion).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pytest

from tests.helpers import make_survival_csv


def test_assign_folds_case_level_stratified_deterministic():
    from multimodalbrainsurvival_tpu.cli.cv_run import assign_folds

    # multi-row cases + a mix of events and censored
    rows = []
    for i in range(12):
        for r in range(1 + i % 2):  # half the cases have 2 rows
            rows.append({"case": f"c{i}", "survival_months": 10.0 + i,
                         "vital_status": i % 3 == 0, "x": r})
    df = pd.DataFrame(rows)
    df["vital_status"] = df["vital_status"].astype(int)

    f1 = assign_folds(df, 3, seed=7)
    f2 = assign_folds(df, 3, seed=7)
    assert f1 == f2  # deterministic under the same seed
    assert set(f1) == {f"c{i}" for i in range(12)}
    assert set(f1.values()) == {0, 1, 2}
    # stratified: the 4 event cases spread so no fold is event-free
    events = {c for c in f1 if int(c[1:]) % 3 == 0}
    for k in range(3):
        assert any(f1[c] == k for c in events), f"fold {k} has no events"
    # balanced within 1 per stratum per fold
    counts = np.bincount(list(f1.values()), minlength=3)
    assert counts.max() - counts.min() <= 2

    with pytest.raises(ValueError, match="cannot fill"):
        assign_folds(df.iloc[:2], 3, seed=0)
    with pytest.raises(ValueError, match="'case' column"):
        assign_folds(pd.DataFrame({"x": [1]}), 2, seed=0)


def test_cv_run_feature_end_to_end(tmp_path, capsys):
    from multimodalbrainsurvival_tpu.cli import cv_run

    cases = [f"c{i}" for i in range(14)]
    cohort = make_survival_csv(str(tmp_path / "cohort.csv"), cases,
                               n_feature=24, seed=3)
    make_survival_csv(str(tmp_path / "test.csv"),
                      [f"t{i}" for i in range(6)], n_feature=24, seed=9)
    ckpt = str(tmp_path / "out") + "/"
    cfg = {
        "batch_size": 4, "use_cuda": False,
        "cv_csv_path": str(tmp_path / "cohort.csv"),
        "test_csv_path": str(tmp_path / "test.csv"),
        "num_workers": 1, "num_epochs": 2, "lr": 1e-4,
        "weight_decay": 1e-5, "flag": "ef",
        "checkpoint_path": ckpt,
        "summary_path": ckpt + "summary/",
        "restore_path": "", "model_path": "",
    }
    p = tmp_path / "cv_cfg.json"
    p.write_text(json.dumps(cfg))
    cv_run.main(["--config", str(p), "--task", "feature", "--folds", "2"])

    # fold splits: case-level partition — every case in exactly one val.csv
    val_cases = []
    for k in (1, 2):
        fold = tmp_path / "out/cv" / f"fold{k}"
        tr = pd.read_csv(fold / "train.csv")
        va = pd.read_csv(fold / "val.csv")
        assert not set(tr["case"]) & set(va["case"])
        assert set(tr["case"]) | set(va["case"]) == set(cases)
        val_cases.extend(va["case"])
        # derived config: flag carries the _cv naming the savescore keys on
        child = json.loads((fold / "config_train.json").read_text())
        assert child["flag"] == f"ef_cv{k}"
        assert "cv_csv_path" not in child
        # fold checkpoints under the shared checkpoint_path, per-flag
        assert (tmp_path / "out/models" / f"ef_cv{k}" / "model_dict_best"
                ).is_dir()
        # savescore frames use the reference's cv file naming
        frames = glob.glob(str(tmp_path / "out/outputs" / f"ef_cv{k}"
                               / f"*val_ef_cv{k}_df.csv"))
        assert frames, os.listdir(tmp_path / "out/outputs" / f"ef_cv{k}")
    assert sorted(val_cases) == sorted(cases)

    summary = pd.read_csv(tmp_path / "out/cv_summary.csv")
    assert len(summary) == 2
    assert list(summary["flag"]) == ["ef_cv1", "ef_cv2"]
    for col in ("val_CI", "test_CI"):
        assert col in summary.columns
        assert np.isfinite(summary[col]).all()
        assert (summary[col] > 0).all() and (summary[col] < 1).all()
    out = capsys.readouterr().out
    assert "CV val CI:" in out and "over 2/2 folds" in out

    # the test split is the SAME fixed frame for both folds
    n_test_rows = {
        len(pd.read_csv(f)) for f in
        glob.glob(str(tmp_path / "out/outputs/ef_cv*" / "*test_*_df.csv"))
    }
    assert n_test_rows == {6}
