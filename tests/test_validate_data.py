"""Pre-flight data validation CLI (`cli/validate_data.py`).

The reference validates nothing (SURVEY.md §2.4: a missing `survival_bin`
column crashes mid-epoch at `2_HistoPath_train.py:313`); these tests pin
that every contract the validator gates on — label sanity, modality
columns, patch-directory integrity, cross-split leakage — is caught before
a job launches, and that a clean cohort passes with exit status 0.
"""

import json
import os

import numpy as np
import pandas as pd

from multimodalbrainsurvival_tpu.cli import validate_data
from tests.helpers import make_patch_dir, make_survival_csv


def _cfg(tmp_path, **extra):
    cfg = {
        "train_csv_path": str(tmp_path / "train.csv"),
        "val_csv_path": str(tmp_path / "val.csv"),
        "test_csv_path": str(tmp_path / "test.csv"),
        **extra,
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def _three_splits(tmp_path, *, n_rna=0, n_feature=0, wsis=None):
    names = {"train": [f"tr{i}" for i in range(6)],
             "val": [f"va{i}" for i in range(4)],
             "test": [f"te{i}" for i in range(4)]}
    frames = {}
    for k, (split, cases) in enumerate(names.items()):
        wsi_names = None
        if wsis is not None:
            wsi_names = [f"{w}.svs" for w in wsis[split]]
        frames[split] = make_survival_csv(
            str(tmp_path / f"{split}.csv"), cases, n_rna=n_rna,
            n_feature=n_feature, wsi_names=wsi_names, seed=7 + k)
    return frames


def test_clean_feature_cohort_passes(tmp_path, capsys):
    _three_splits(tmp_path, n_feature=8)
    rc = validate_data.main(["--config", _cfg(tmp_path), "--task", "feature"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "0 error(s)" in out and "OK" in out


def test_label_and_leakage_errors(tmp_path, capsys):
    frames = _three_splits(tmp_path, n_feature=8)
    # poison train: NaN label, negative months, bad status, leaked case
    df = frames["train"]
    df.loc[0, "survival_months"] = -3.0
    df.loc[1, "vital_status"] = 2
    df.loc[2, "survival_months"] = np.nan
    df.loc[3, "case"] = frames["val"].loc[0, "case"]
    df.to_csv(tmp_path / "train.csv", index=False)
    rc = validate_data.main(["--config", _cfg(tmp_path), "--task", "feature"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "negative survival_months" in out
    assert "vital_status values outside" in out
    assert "NaN values in 'survival_months'" in out
    assert "case leakage" in out and "train and val" in out


def test_missing_columns_and_nan_features(tmp_path, capsys):
    frames = _three_splits(tmp_path, n_feature=8)
    df = frames["val"].drop(columns=["vital_status"])
    df.loc[1, "feature_3"] = np.nan
    df.to_csv(tmp_path / "val.csv", index=False)
    rc = validate_data.main(["--config", _cfg(tmp_path), "--task", "feature"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "val: missing required columns: vital_status" in out
    assert "NaN/non-finite values" in out


def test_rna_vocabulary_width_and_order(tmp_path, capsys):
    _three_splits(tmp_path, n_rna=5)
    genes = tmp_path / "genes.txt"
    # reference genes.txt format: header + index,symbol rows
    # (2_GeneExpression/genes.txt) — helper columns are rna_0..rna_4
    genes.write_text("i,symbol\n" + "".join(
        f"{i},{s}\n" for i, s in enumerate(["0", "1", "2", "3", "4"])))
    rc = validate_data.main(["--config", _cfg(tmp_path), "--task", "rna",
                             "--genes", str(genes)])
    assert rc == 0

    # out-of-order vocabulary → warning, still passes
    genes.write_text("i,symbol\n" + "".join(
        f"{i},{s}\n" for i, s in enumerate(["1", "0", "2", "3", "4"])))
    rc = validate_data.main(["--config", _cfg(tmp_path), "--task", "rna",
                             "--genes", str(genes)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "out of vocabulary order" in out

    # wrong width with an EXPLICIT --genes → error
    genes.write_text("i,symbol\n0,g0\n1,g1\n")
    rc = validate_data.main(["--config", _cfg(tmp_path), "--task", "rna",
                             "--genes", str(genes)])
    out = capsys.readouterr().out
    assert rc == 1
    assert "gene vocabulary defines 2 genes" in out


def test_default_reference_vocab_mismatch_is_advisory(tmp_path, capsys):
    """Without --genes the reference's 12,778-gene vocabulary is implicit:
    a non-reference-shaped cohort should warn, not fail."""
    from multimodalbrainsurvival_tpu.data.genes import REFERENCE_GENES_TXT

    if not os.path.isfile(REFERENCE_GENES_TXT):
        import pytest

        pytest.skip("reference genes.txt not present")
    _three_splits(tmp_path, n_rna=5)
    rc = validate_data.main(["--config", _cfg(tmp_path), "--task", "rna"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "gene vocabulary defines 12778 genes" in out
    assert "WARN" in out


def test_histo_patch_directory_contracts(tmp_path, capsys):
    root = tmp_path / "patches"
    wsis = {"train": [f"TW{i}" for i in range(6)],
            "val": [f"VW{i}" for i in range(4)],
            "test": [f"EW{i}" for i in range(4)]}
    for split, names in wsis.items():
        for i, w in enumerate(names):
            make_patch_dir(str(root), w, 5, img_size=16, seed=i)
    _three_splits(tmp_path, wsis=wsis)
    cfgp = _cfg(tmp_path, data_path=str(root), train_bag_size=2,
                val_bag_size=2)
    rc = validate_data.main(["--config", cfgp, "--task", "histo"])
    out = capsys.readouterr().out
    assert rc == 0, out

    # break three contracts: a missing dir, a deleted PNG, a short bag
    os.rename(root / "TW0", root / "GONE")
    os.remove(root / "TW1" / "TW1_patch_4.png")
    loc = root / "TW2" / "loc.txt"
    lines = loc.read_text().splitlines(keepends=True)
    loc.write_text("".join(lines[:3]))  # 2 headers + 1 patch < bag_size 2
    rc = validate_data.main(["--config", cfgp, "--task", "histo"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "patch directory missing for TW0.svs" in out
    assert "TW1_patch_4.png is missing" in out
    assert "only 1 usable patches < bag_size 2" in out


def test_packed_shard_shorter_than_loc_is_an_error(tmp_path, capsys):
    root = tmp_path / "patches"
    wsis = {"train": [f"TW{i}" for i in range(6)],
            "val": [f"VW{i}" for i in range(4)],
            "test": [f"EW{i}" for i in range(4)]}
    for split, names in wsis.items():
        for i, w in enumerate(names):
            make_patch_dir(str(root), w, 4, img_size=16, seed=i)
    _three_splits(tmp_path, wsis=wsis)
    np.save(root / "TW0" / "patches.npy",
            np.zeros((2, 16, 16, 3), dtype=np.uint8))
    cfgp = _cfg(tmp_path, data_path=str(root))
    rc = validate_data.main(["--config", cfgp, "--task", "histo"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "patches.npy holds 2 patches but loc.txt promises 4" in out


def test_stale_packed_shard_falls_back_to_png_check(tmp_path, capsys):
    """Advisor (round 4): a patches.npy OLDER than loc.txt is IGNORED by the
    loader (data/patches.py:108 falls back to PNGs) — the validator must
    check the PNGs in that case, or a stale shard with missing PNGs passes
    validation yet crashes the loader mid-job."""
    root = tmp_path / "patches"
    wsis = {"train": [f"TW{i}" for i in range(6)],
            "val": [f"VW{i}" for i in range(4)],
            "test": [f"EW{i}" for i in range(4)]}
    for split, names in wsis.items():
        for i, w in enumerate(names):
            make_patch_dir(str(root), w, 4, img_size=16, seed=i)
    _three_splits(tmp_path, wsis=wsis)
    cfgp = _cfg(tmp_path, data_path=str(root))

    # a FULL-LENGTH shard that is stale (mtime < loc.txt) + a missing PNG:
    # the loader will use the PNGs and crash on the missing one
    shard = root / "TW0" / "patches.npy"
    np.save(shard, np.zeros((4, 16, 16, 3), dtype=np.uint8))
    loc = root / "TW0" / "loc.txt"
    os.utime(shard, (os.path.getmtime(loc) - 100,) * 2)
    os.remove(root / "TW0" / "TW0_patch_3.png")
    rc = validate_data.main(["--config", cfgp, "--task", "histo"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "TW0_patch_3.png is missing" in out

    # freshen the shard: the loader now uses it, so the missing PNG is fine
    os.utime(shard, None)
    rc = validate_data.main(["--config", cfgp, "--task", "histo"])
    assert rc == 0, capsys.readouterr().out


def test_missing_split_file_and_unset_key(tmp_path, capsys):
    _three_splits(tmp_path, n_feature=4)
    os.remove(tmp_path / "test.csv")
    cfg = {"train_csv_path": str(tmp_path / "train.csv"),
           "val_csv_path": str(tmp_path / "val.csv"),
           "test_csv_path": str(tmp_path / "test.csv")}
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    rc = validate_data.main(["--config", str(p), "--task", "feature"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "no such file" in out

    cfg.pop("test_csv_path")
    p.write_text(json.dumps(cfg))
    rc = validate_data.main(["--config", str(p), "--task", "feature"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "test_csv_path not set" in out


def test_fully_censored_split_warns_but_passes(tmp_path, capsys):
    frames = _three_splits(tmp_path, n_feature=4)
    df = frames["val"]
    df["vital_status"] = 0
    df.to_csv(tmp_path / "val.csv", index=False)
    rc = validate_data.main(["--config", _cfg(tmp_path), "--task", "feature"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "fully censored split" in out
