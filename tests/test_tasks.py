"""survival_bin and classification tasks end-to-end through the histo CLI."""

import json

import numpy as np
import pandas as pd
import pytest

from tests.helpers import make_patch_dir


@pytest.fixture
def histo_cohort(tmp_path):
    root = tmp_path / "patches"
    rng = np.random.default_rng(0)
    rows = []
    for i in range(6):
        wsi = f"W{i}"
        make_patch_dir(str(root), wsi, 4, img_size=32, seed=i)
        rows.append(
            {
                "case": f"c{i}",
                "survival_months": float(rng.uniform(5, 100)),
                "vital_status": int(rng.integers(0, 2)),
                "survival_bin": int(rng.integers(0, 4)),
                "label": i % 2,
                "wsi_file_name": f"{wsi}.svs",
            }
        )
    df = pd.DataFrame(rows)
    for split in ("train", "val", "test"):
        df.to_csv(tmp_path / f"ffpe_{split}.csv", index=False)
    cfg = {
        "model_name": "resnet18",
        "num_classes": 4,
        "batch_size": 3,
        "use_cuda": False,
        "data_path": str(root),
        "train_csv_path": str(tmp_path / "ffpe_train.csv"),
        "val_csv_path": str(tmp_path / "ffpe_val.csv"),
        "test_csv_path": str(tmp_path / "ffpe_test.csv"),
        "num_workers": 2,
        "num_epochs": 1,
        "img_size": 32,
        "lr": 1e-4,
        "weight_decay": 0.0,
        "pretrained": False,
        "train_bag_size": 2,
        "val_bag_size": 2,
        "aggregator": "identity",
        "aggregator_hdim": 512,
        "n_layers_to_train": 6,
        "max_patch_per_wsi_train": 4,
        "max_patch_per_wsi_val": 4,
        "checkpoint_path": str(tmp_path / "out") + "/",
        "summary_path": str(tmp_path / "out/summary") + "/",
        "model_path": "",
        "restore_path": "",
    }
    return tmp_path, cfg


def test_survival_bin_task_e2e(histo_cohort):
    from multimodalbrainsurvival_tpu.cli import histo_train

    tmp_path, cfg = histo_cohort
    cfg.update({"task": "survival_bin", "flag": "bin_model"})
    p = tmp_path / "cfg_bin.json"
    p.write_text(json.dumps(cfg))
    histo_train.main(["--config", str(p)])
    out = tmp_path / "out/outputs/bin_model/val_output_last.csv"
    frame = pd.read_csv(out)
    # nllsurv frame: per-id risk scores (negative sums of survival)
    assert {"id", "score", "survival_months", "vital_status"} <= set(frame.columns)
    assert (frame["score"] <= 0).all()


def test_classification_task_e2e(histo_cohort):
    from multimodalbrainsurvival_tpu.cli import histo_train

    tmp_path, cfg = histo_cohort
    cfg.update(
        {
            "task": "classification",
            "num_classes": 2,
            "target_label": "label",
            "flag": "clf_model",
        }
    )
    p = tmp_path / "cfg_clf.json"
    p.write_text(json.dumps(cfg))
    histo_train.main(["--config", str(p)])
    out = tmp_path / "out/outputs/clf_model/val_output_last.csv"
    frame = pd.read_csv(out)
    assert {"id", "label", "score_0", "score_1"} <= set(frame.columns)
    np.testing.assert_allclose(
        frame[["score_0", "score_1"]].sum(axis=1), 1.0, rtol=1e-5
    )
