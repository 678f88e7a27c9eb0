"""The reference's own ExampleData CSVs load through our datasets verbatim."""

import os

import numpy as np
import pytest

EX = "/root/reference/ExampleData"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EX), reason="reference ExampleData not mounted"
)


def test_rna_example_csv():
    from multimodalbrainsurvival_tpu.data import RNATableDataset

    ds = RNATableDataset(os.path.join(EX, "rna_example.csv"))
    assert ds.feature_dim == 12778  # the full gene vector
    assert len(ds) > 0
    b = next(ds.batches(8))
    assert b["data"].shape[1] == 12778
    assert "survival_months" in b and "vital_status" in b
    # grade_binary rides along as an int label
    assert "grade_binary" in b


def test_early_example_csv():
    from multimodalbrainsurvival_tpu.data import FeatureTableDataset

    ds = FeatureTableDataset(os.path.join(EX, "early_example.csv"))
    assert ds.feature_dim == 4096  # 2048 RNA ⊕ 2048 pathology
    b = next(ds.batches(4))
    assert np.isfinite(b["data"][b["mask"]]).all()


def test_ffpe_example_csv_schema():
    import pandas as pd

    df = pd.read_csv(os.path.join(EX, "ffpe_example.csv"))
    df.columns = [c.lstrip("﻿") for c in df.columns]
    assert {"case", "survival_months", "vital_status", "wsi_file_name"} <= set(
        df.columns
    )


def test_late_example_csv_through_coxnet():
    """late_example.csv drives the late-fusion fit directly."""
    from multimodalbrainsurvival_tpu.cli.late_fusion import run_late_fusion

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        res = run_late_fusion(
            os.path.join(EX, "late_example.csv"),
            os.path.join(EX, "late_example.csv"),
            d,
        )
        assert os.path.isfile(os.path.join(d, "model_late_train.csv"))
        assert np.isfinite(res["fit"].beta).all()


def test_joint_example_csv_rna_columns():
    import pandas as pd

    df = pd.read_csv(os.path.join(EX, "joint_example.csv"))
    df.columns = [c.lstrip("﻿") for c in df.columns]
    rna_cols = [c for c in df.columns if "rna_" in c]
    assert len(rna_cols) == 12778
    assert "wsi_file_name" in df.columns


def test_rna_pipeline_trains_on_verbatim_example_csv(tmp_path):
    """Full-width golden e2e: the real 12,778->4096->2048 model trains on
    the reference's own rna_example.csv through the actual CLI (train one
    epoch, write the reference artifacts, finite scores)."""
    import json

    import pandas as pd

    from multimodalbrainsurvival_tpu.cli import rna_train

    cfg = {
        "batch_size": 8, "use_cuda": False,
        "train_csv_path": os.path.join(EX, "rna_example.csv"),
        "val_csv_path": os.path.join(EX, "rna_example.csv"),
        "test_csv_path": os.path.join(EX, "rna_example.csv"),
        "num_workers": 1, "num_epochs": 1,
        "lr_rna": 1e-5, "lr_mlp": 1e-5, "weight_decay": 1e-5,
        "flag": "rna_golden",
        "checkpoint_path": str(tmp_path / "out") + "/",
        "summary_path": str(tmp_path / "out/summary") + "/",
        "restore_path": "", "model_path": "",
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    rna_train.main(["--config", str(p), "--quick", "1"])
    frame = pd.read_csv(
        tmp_path / "out/outputs/rna_golden/val_output_last.csv"
    )
    assert len(frame) == 22  # the example cohort (rna_example.csv rows)
    assert np.isfinite(frame["score"]).all()
