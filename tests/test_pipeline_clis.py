"""Glue / preprocessing CLI mains that only the full-chain example covered:

- ``wsi2patches`` (tiling CLI, incl. ``--pack``) and ``pack_patches``;
- ``concat_features`` (``3_EarlyFusion/1_Concat2Features.py`` parity —
  ``early_example.csv`` layout, off-by-one rename fixed);
- ``merge_scores`` (``4_LateFusion/1_MergeScores.py`` —
  ``late_example.csv`` schema);
- ``feature_train`` → ``feature_savescore`` (EarlyFusion pipeline);
- ``convert_checkpoint`` (torch ``.pt`` → our checkpoint format).
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from tests.helpers import make_survival_csv


def _fake_slide(path, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    slide = np.full((256, 256, 3), 255, np.uint8)
    noise = rng.integers(0, 60, size=(128, 160, 3), dtype=np.uint8)
    slide[64:192, 32:192] = np.array([200, 120, 160], np.uint8) - noise // 2
    cv2.imwrite(path, slide[:, :, ::-1])


def test_wsi2patches_cli_and_pack(tmp_path):
    from multimodalbrainsurvival_tpu.cli import pack_patches, wsi2patches

    wsi_dir = tmp_path / "wsi"
    os.makedirs(wsi_dir)
    for i in range(2):
        _fake_slide(str(wsi_dir / f"S{i}.png"), seed=i)
    wsi2patches.main([
        "--wsi_path", str(wsi_dir), "--patch_path", str(tmp_path / "patches"),
        "--mask_path", str(tmp_path / "masks"), "--patch_size", "32",
        "--max_patches_per_slide", "10", "--num_process", "1",
        "--ext", "png", "--pack", "1",
    ])
    for i in range(2):
        d = tmp_path / "patches" / f"S{i}"
        lines = (d / "loc.txt").read_text().splitlines()
        n = len(lines) - 2
        assert n > 0
        assert (d / f"S{i}_patch_0.png").is_file()
        packed = np.load(d / "patches.npy")
        assert packed.shape == (n, 32, 32, 3)
        assert (tmp_path / "masks" / f"S{i}" / "mask.npy").is_file()

    # pack_patches CLI is idempotent over an already-packed tree
    pack_patches.main(["--patch_path", str(tmp_path / "patches")])
    assert (tmp_path / "patches" / "S0" / "patches.npy").is_file()


def test_concat_features_early_example_layout(tmp_path):
    """Output must follow ExampleData/early_example.csv: case, survival
    labels, then feature_<i>_x (RNA) and feature_<i>_y (pathology) —
    the reference's columns[4:] off-by-one is fixed (SURVEY.md §2.4)."""
    from multimodalbrainsurvival_tpu.cli import concat_features

    cases = ["c1", "c2", "c3"]
    D = 4
    rng = np.random.default_rng(0)
    for tag in ("rna", "pathology"):
        pd.DataFrame(cases).to_csv(tmp_path / f"{tag}_cases.csv")
        np.savetxt(tmp_path / f"{tag}_features.csv",
                   rng.normal(size=(3, D)), delimiter=",")
    make_survival_csv(str(tmp_path / "info.csv"), cases)
    concat_features.main([
        "--rna_cases", str(tmp_path / "rna_cases.csv"),
        "--rna_features", str(tmp_path / "rna_features.csv"),
        "--pathology_cases", str(tmp_path / "pathology_cases.csv"),
        "--pathology_features", str(tmp_path / "pathology_features.csv"),
        "--patientinfo", str(tmp_path / "info.csv"),
        "--output", str(tmp_path / "features.csv"),
    ])
    out = pd.read_csv(tmp_path / "features.csv")
    assert list(out.columns[:3]) == ["case", "survival_months", "vital_status"]
    feat_cols = list(out.columns[3:])
    assert len(feat_cols) == 2 * D  # no dropped column
    assert sum(c.endswith("_x") for c in feat_cols) == D
    assert sum(c.endswith("_y") for c in feat_cols) == D
    assert all(c.startswith("feature_") for c in feat_cols)


def test_merge_scores_late_example_schema(tmp_path):
    from multimodalbrainsurvival_tpu.cli import merge_scores

    rng = np.random.default_rng(1)
    for tag in ("path", "rna"):
        pd.DataFrame({
            "id": ["c1", "c2", "c3"],
            "score": rng.normal(size=3),
            "survival_months": [10.0, 20.0, 30.0],
            "vital_status": [1, 0, 1],
        }).to_csv(tmp_path / f"{tag}_scores.csv", index=False)
    merge_scores.main([
        "--pathology_scores", str(tmp_path / "path_scores.csv"),
        "--rna_scores", str(tmp_path / "rna_scores.csv"),
        "--output", str(tmp_path / "combined_scores.csv"),
    ])
    out = pd.read_csv(tmp_path / "combined_scores.csv")
    for col in ("case", "path_score", "survival_months", "vital_status",
                "rna_score"):
        assert col in out.columns, col
    assert len(out) == 3


def test_feature_train_and_savescore_cli(tmp_path):
    from multimodalbrainsurvival_tpu.cli import feature_savescore, feature_train

    for split, n in [("train", 16), ("val", 8), ("test", 8)]:
        make_survival_csv(str(tmp_path / f"f_{split}.csv"),
                          [f"{split}{i}" for i in range(n)],
                          n_feature=24, seed=n)
    cfg = {
        "batch_size": 8, "use_cuda": False,
        "train_csv_path": str(tmp_path / "f_train.csv"),
        "val_csv_path": str(tmp_path / "f_val.csv"),
        "test_csv_path": str(tmp_path / "f_test.csv"),
        "num_workers": 1, "num_epochs": 2, "lr": 1e-4,
        "weight_decay": 1e-5, "flag": "ef_model",
        "checkpoint_path": str(tmp_path / "out") + "/",
        "summary_path": str(tmp_path / "out/summary") + "/",
        "restore_path": "", "model_path": "",
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    feature_train.main(["--config", str(p)])
    save_dir = tmp_path / "out/models/ef_model"
    assert (save_dir / "model_last").is_dir()

    cfg2 = dict(cfg)
    cfg2["model_path"] = str(save_dir / "model_last")
    cfg2["output_path"] = str(tmp_path / "scores") + "/"
    p2 = tmp_path / "cfg2.json"
    p2.write_text(json.dumps(cfg2))
    feature_savescore.main(["--config", str(p2)])
    score_files = [f for f in os.listdir(tmp_path / "scores") if "val" in f]
    assert score_files, "feature savescore wrote no val frame"
    sf = pd.read_csv(tmp_path / "scores" / score_files[0])
    assert np.isfinite(sf.select_dtypes("number")).all().all()


def test_convert_checkpoint_cli_rna(tmp_path):
    """torch RNAOnlyModel .pt → our checkpoint dir, loadable as model_path."""
    import torch

    from multimodalbrainsurvival_tpu.cli import convert_checkpoint
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    tn = torch.nn
    torch.manual_seed(0)
    G, H1, H2 = 24, 16, 8
    ref = tn.Module()
    ref.rna_mlp = tn.Sequential(tn.Dropout(), tn.Linear(G, H1), tn.ReLU(),
                                tn.Dropout(), tn.Linear(H1, H2))
    ref.final_mlp = tn.Sequential(tn.Linear(H2, 1))
    ref.eval()
    pt = tmp_path / "model_dict_best.pt"
    torch.save(ref.state_dict(), pt)

    out = tmp_path / "converted"
    convert_checkpoint.main([
        "--torch_path", str(pt), "--arch", "rna", "--output", str(out),
    ])
    assert out.is_dir()

    model = RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(H1, H2)))
    import jax
    import jax.numpy as jnp

    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, G)), train=False)
    restored = Checkpointer().restore(str(out), template)
    x = np.random.default_rng(0).normal(size=(5, G)).astype(np.float32)
    ours = model.apply(restored, jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = ref.final_mlp(ref.rna_mlp(torch.tensor(x))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-6)
