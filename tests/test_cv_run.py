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

    # out-of-fold frame: the fold val frames partition the cohort — every
    # case appears exactly once, scored by the model that never saw it
    assert "CV out-of-fold val CI:" in out
    oof = pd.read_csv(tmp_path / "out/cv_oof_val_df.csv")
    assert sorted(oof["id"]) == sorted(cases)
    assert not oof["id"].duplicated().any()
    fold_vals = pd.concat([
        pd.read_csv(sorted(glob.glob(str(
            tmp_path / "out/outputs" / f"ef_cv{k}" / f"*val_ef_cv{k}_df.csv"
        )))[0]) for k in (1, 2)], ignore_index=True)
    merged_oof = oof.merge(fold_vals, on="id", suffixes=("", "_fold"))
    np.testing.assert_allclose(merged_oof["score"],
                               merged_oof["score_fold"], rtol=1e-12)

    # fold-ensemble deployment: per-case mean of the fold models' test
    # scores, written in the savescore frame schema, CI printed
    assert "CV ensemble test CI:" in out
    ens = pd.read_csv(tmp_path / "out/cv_ensemble_test_df.csv")
    assert list(ens.columns) == ["id", "score", "survival_months",
                                 "vital_status"]
    folds = [pd.read_csv(sorted(glob.glob(
        str(tmp_path / "out/outputs" / f"ef_cv{k}" / "*test_*_df.csv")))[0])
        for k in (1, 2)]
    merged = folds[0].merge(folds[1], on="id", suffixes=("_1", "_2"))
    want = merged.set_index("id")[["score_1", "score_2"]].mean(axis=1)
    got = ens.set_index("id")["score"]
    assert sorted(ens["id"]) == sorted(merged["id"])
    np.testing.assert_allclose(got[want.index], want, rtol=1e-12)


def test_ensemble_frames_inner_join_and_mean():
    from multimodalbrainsurvival_tpu.cli.cv_run import ensemble_frames

    f1 = pd.DataFrame({"id": ["a", "b", "c"], "score": [1.0, 2.0, 3.0],
                       "survival_months": [10, 20, 30],
                       "vital_status": [1, 0, 1]})
    f2 = pd.DataFrame({"id": ["b", "a"], "score": [4.0, 5.0],
                       "survival_months": [20, 10],
                       "vital_status": [0, 1]})
    ens = ensemble_frames([f1, f2])
    # inner join: 'c' never got a vote from fold 2 → dropped
    assert sorted(ens["id"]) == ["a", "b"]
    by_id = ens.set_index("id")
    assert by_id.loc["a", "score"] == 3.0  # (1+5)/2
    assert by_id.loc["b", "score"] == 3.0  # (2+4)/2
    # labels ride along from the first frame
    assert by_id.loc["a", "survival_months"] == 10
    assert by_id.loc["b", "vital_status"] == 0


def _make_cv_cohort(tmp_path, n_cases=8, n_rna=16):
    """One cohort CSV with BOTH patch dirs and RNA columns, so the histo and
    rna pipelines cross-validate the same cases (the paper's protocol)."""
    from tests.helpers import make_patch_dir

    root = tmp_path / "patches"
    wsis = [f"W{i}" for i in range(n_cases)]
    for i, w in enumerate(wsis):
        make_patch_dir(str(root), w, 6, img_size=32, seed=20 + i)
    cohort = make_survival_csv(
        str(tmp_path / "cohort.csv"),
        [f"c{i}" for i in range(n_cases)],
        wsi_names=[f"{w}.svs" for w in wsis],
        n_rna=n_rna, seed=5,
    )
    # all-events cohort: every fold of every downstream CV (cv_run's and
    # coxnet's inner folds) has events on both sides at this tiny scale
    cohort["vital_status"] = 1
    cohort.to_csv(str(tmp_path / "cohort.csv"), index=False)
    return root, str(tmp_path / "cohort.csv"), cohort


def _base_cfg(ckpt, cohort_csv):
    return {
        # 2 epochs: the histo driver's parity quirk only tracks the best
        # model from epoch 1 on (2_HistoPath_train.py:378-381), so a 1-epoch
        # fold would never write the model_dict_best cv_run's savescore loads
        "num_classes": 1, "batch_size": 4, "use_cuda": False,
        "cv_csv_path": cohort_csv, "num_workers": 1, "num_epochs": 2,
        "weight_decay": 1e-5, "task": "survival_prediction",
        "checkpoint_path": ckpt, "summary_path": ckpt + "summary/",
        "model_path": "", "restore_path": "",
    }


def test_cv_run_histo_rna_merge_late_fusion_protocol(tmp_path):
    """The paper's actual CV protocol end-to-end (r3 verdict #4): cv_run
    drives the HISTO pipeline (patch bags — real I/O, the `_cv{k}` naming
    3_HistoPath_savescore.py:344-349 keys on) and the RNA pipeline over the
    SAME cohort/seed (identical case-level folds), then each fold's
    unmodified score frames flow through merge_scores → late_fusion."""
    from multimodalbrainsurvival_tpu.cli import cv_run, late_fusion
    from multimodalbrainsurvival_tpu.cli.merge_scores import merge_scores

    root, cohort_csv, cohort = _make_cv_cohort(tmp_path)
    hckpt = str(tmp_path / "hout") + "/"
    hcfg = dict(
        _base_cfg(hckpt, cohort_csv),
        model_name="resnet18", data_path=str(root), img_size=32,
        lr=5e-4, pretrained=False, n_layers_to_train=2,
        aggregator="identity", aggregator_hdim=512,
        train_bag_size=2, val_bag_size=2,
        max_patch_per_wsi_train=4, max_patch_per_wsi_val=4,
        flag="ffpe",
    )
    hp = tmp_path / "cv_histo.json"
    hp.write_text(json.dumps(hcfg))
    cv_run.main(["--config", str(hp), "--task", "histo", "--folds", "2",
                 "--quick", "1"])

    rckpt = str(tmp_path / "rout") + "/"
    rcfg = dict(_base_cfg(rckpt, cohort_csv),
                lr_rna=1e-4, lr_mlp=1e-3, dropout=0.0, flag="rna")
    rp = tmp_path / "cv_rna.json"
    rp.write_text(json.dumps(rcfg))
    cv_run.main(["--config", str(rp), "--task", "rna", "--folds", "2"])

    # identical case-level folds across the two pipelines (same cohort+seed)
    for k in (1, 2):
        hv = pd.read_csv(tmp_path / "hout/cv" / f"fold{k}" / "val.csv")
        rv = pd.read_csv(tmp_path / "rout/cv" / f"fold{k}" / "val.csv")
        assert set(hv["case"]) == set(rv["case"])

    # each fold's frames — the EXACT filenames the savescore CLIs wrote,
    # reference `_cv` naming — chain unmodified into merge → late fusion
    combined = {}
    for k in (1, 2):
        path_frame = (tmp_path / "hout/outputs" / f"ffpe_cv{k}"
                      / f"model_dict_best_pathology_val_ffpe_cv{k}_df.csv")
        rna_frame = (tmp_path / "rout/outputs" / f"rna_cv{k}"
                     / f"rna_val_rna_cv{k}_df.csv")
        assert path_frame.is_file(), os.listdir(path_frame.parent)
        assert rna_frame.is_file(), os.listdir(rna_frame.parent)
        out = str(tmp_path / f"combined_cv{k}.csv")
        merged = merge_scores(str(path_frame), str(rna_frame), out)
        assert {"case", "path_score", "rna_score",
                "survival_months", "vital_status"} <= set(merged.columns)
        # inner join on case keeps the whole fold (same cohort both sides)
        assert set(merged["case"]) == set(
            pd.read_csv(tmp_path / "hout/cv" / f"fold{k}" / "val.csv")["case"]
        )
        combined[k] = out

    late_dir = str(tmp_path / "late")
    late_fusion.main(["--train_csv", combined[1], "--val_csv", combined[2],
                      "--output_dir", late_dir])
    for name in ("train", "val"):
        frame = pd.read_csv(os.path.join(late_dir, f"model_late_{name}.csv"))
        assert "score" in frame.columns
        assert np.isfinite(frame["score"]).all()

    # cv summary for the histo run carries per-fold val CIs
    summary = pd.read_csv(tmp_path / "hout/cv_summary.csv")
    assert list(summary["flag"]) == ["ffpe_cv1", "ffpe_cv2"]
    assert "val_CI" in summary.columns


def test_cv_run_joint_end_to_end(tmp_path):
    """cv_run drives the JOINT bimodal pipeline per fold (patch bags + RNA
    through BagHistopathologyRNAModel) with the `_cv{k}` artifact layout."""
    from multimodalbrainsurvival_tpu.cli import cv_run

    root, cohort_csv, _ = _make_cv_cohort(tmp_path)
    ckpt = str(tmp_path / "jout") + "/"
    cfg = dict(
        _base_cfg(ckpt, cohort_csv),
        model_name="resnet18", data_path=str(root), img_size=32,
        lr_rna=1e-6, lr_histo=5e-5, lr_mlp=1e-3, pretrained=False,
        n_layers_to_train=2, aggregator="identity", aggregator_hdim=512,
        train_bag_size=2, val_bag_size=2,
        max_patch_per_wsi_train=4, max_patch_per_wsi_val=4,
        histo_restore_path="", rna_restore_path="",
        flag="jm",
    )
    p = tmp_path / "cv_joint.json"
    p.write_text(json.dumps(cfg))
    cv_run.main(["--config", str(p), "--task", "joint", "--folds", "2",
                 "--quick", "1"])

    for k in (1, 2):
        assert (tmp_path / "jout/models" / f"jm_cv{k}" / "model_dict_best"
                ).is_dir()
        frame_path = (tmp_path / "jout/outputs" / f"jm_cv{k}"
                      / f"model_dict_best_joint_val_jm_cv{k}_df.csv")
        assert frame_path.is_file(), os.listdir(frame_path.parent)
        frame = pd.read_csv(frame_path)
        assert {"score", "survival_months", "vital_status"} <= set(
            frame.columns
        )
        assert np.isfinite(frame["score"]).all()
    summary = pd.read_csv(tmp_path / "jout/cv_summary.csv")
    assert list(summary["flag"]) == ["jm_cv1", "jm_cv2"]
    assert "val_CI" in summary.columns
