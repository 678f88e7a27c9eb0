"""Cross-stack golden runs of the reference's INFERENCE drivers.

The six training-free entry points — `2_GeneExpress_savescore.py`,
`3_GeneExpress_extractfeatures.py`, `3_HistoPath_savescore.py`,
`4_HistoPath_extractfeatures.py`, `3_EarlyFusion_savescore.py`,
`2_JointFusion_savescore.py` — executed end-to-end as subprocess oracles and
compared against our savescore / extractfeatures CLIs loading the SAME
(converted) checkpoint. Eval mode is deterministic on both stacks (dropout
inactive, BatchNorm running stats, no optimizer), so unlike the training
golden runs (tests/test_golden_crossstack.py) there is no Adam-sign-flip
drift: score frames and feature matrices pin at pure cross-stack forward
tolerance.

Alignment notes:
- the reference extractfeatures drivers iterate ``set(case_list)``
  (4_HistoPath_extractfeatures.py:82, 3_GeneExpress_extractfeatures.py:75),
  so their cases-CSV row order is hash-seed dependent; features are compared
  as case→row mappings, not positionally;
- the savescore frames are keyed by ``ids_unique = sorted(set(ids))``
  (2_GeneExpress_savescore.py:100) on both stacks → compared positionally;
- score ORDERING is additionally pinned by recomputing the C-index from both
  frames with the same native function.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
import pandas as pd
import pytest

from tests.helpers import make_patch_dir, make_survival_csv
from tests.test_golden_crossstack import (
    REFERENCE_DIR,
    _import_ref_module,
    _run_reference_driver,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference repo not mounted"
)


def _all_events_csv(path, cases, **kw):
    """Survival CSV with every subject an event: guarantees admissible
    C-index pairs in every split for BOTH stacks' in-driver CI prints."""
    df = make_survival_csv(path, cases, **kw)
    df["vital_status"] = 1
    df.to_csv(path, index=False)
    return df


def _run_ours(main, cfg, tmp_path, name):
    p = tmp_path / name
    p.write_text(json.dumps(cfg))
    main(["--config", str(p)])


def _compare_score_frames(ref_csv, our_csv, rtol, atol):
    ref = pd.read_csv(ref_csv).set_index("id").sort_index()
    our = pd.read_csv(our_csv).set_index("id").sort_index()
    assert list(ref.index) == list(our.index), ref_csv
    np.testing.assert_allclose(
        our["score"].to_numpy(), ref["score"].to_numpy(),
        rtol=rtol, atol=atol, err_msg=os.path.basename(str(ref_csv)),
    )
    np.testing.assert_allclose(
        our["survival_months"].to_numpy(), ref["survival_months"].to_numpy(),
        rtol=1e-6, err_msg=f"{ref_csv}: survival_months",
    )
    # same ranking ⇒ same C-index under the same native function
    from multimodalbrainsurvival_tpu.ops.metrics import concordance_index

    ci = [
        concordance_index(f["survival_months"].to_numpy(),
                          -f["score"].to_numpy(),
                          f["vital_status"].to_numpy())
        for f in (ref, our)
    ]
    assert ci[0] == ci[1], (ref_csv, ci)


def _compare_feature_maps(ref_cases_csv, ref_feats_csv, our_cases_csv,
                          our_feats_csv, rtol, atol):
    """Case→feature-row comparison, order-free (the reference's row order is
    `set` iteration order, which varies with the subprocess hash seed)."""
    def load(cases_csv, feats_csv):
        cases = pd.read_csv(cases_csv, index_col=0)["0"].tolist()
        feats = np.loadtxt(feats_csv, delimiter=",", ndmin=2)
        assert len(cases) == feats.shape[0], cases_csv
        return dict(zip(cases, feats))

    ref, our = load(ref_cases_csv, ref_feats_csv), load(our_cases_csv,
                                                        our_feats_csv)
    assert sorted(ref) == sorted(our), ref_cases_csv
    for case in sorted(ref):
        np.testing.assert_allclose(
            our[case], ref[case], rtol=rtol, atol=atol,
            err_msg=f"{os.path.basename(str(ref_feats_csv))}: {case}",
        )


# --- MergeScores (late-fusion input prep) -----------------------------------


def test_merge_scores_golden_run_matches_reference(tmp_path):
    """`4_LateFusion/1_MergeScores.py` executed verbatim as the oracle (its
    paths are hardcoded relative → run with cwd=tmp); our merge_scores CLI
    must produce a byte-identical combined_scores.csv."""
    import subprocess
    import sys

    sv = tmp_path / "savescore"
    sv.mkdir()
    # savescore-driver CSV layout: written index + id/score/... columns
    rng = np.random.default_rng(21)
    cases = [f"c{i}" for i in range(7)]
    path_df = pd.DataFrame({
        "id": cases[:6],
        "score": rng.normal(size=6),
        "survival_months": rng.uniform(1, 120, 6).round(4),
        "vital_status": rng.integers(0, 2, 6),
    })
    rna_df = pd.DataFrame({
        "id": cases[1:],
        "score": rng.normal(size=6),
        "survival_months": path_df["survival_months"].iloc[:6].to_numpy(),
        "vital_status": path_df["vital_status"].iloc[:6].to_numpy(),
    })
    path_df.to_csv(sv / "ffpe_scores.csv")
    rna_df.to_csv(sv / "rna_scores.csv")

    proc = subprocess.run(
        [sys.executable,
         os.path.join(REFERENCE_DIR, "4_LateFusion/1_MergeScores.py")],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    from multimodalbrainsurvival_tpu.cli import merge_scores

    out = tmp_path / "ours_combined.csv"
    merge_scores.main([
        "--pathology_scores", str(sv / "ffpe_scores.csv"),
        "--rna_scores", str(sv / "rna_scores.csv"),
        "--output", str(out),
    ])
    assert out.read_text() == (tmp_path / "combined_scores.csv").read_text()


# --- Concat2Features (early-fusion input prep) ------------------------------


def test_concat_features_golden_run_matches_reference_shimmed(tmp_path):
    """`3_EarlyFusion/1_Concat2Features.py` as the oracle. Verbatim it
    crashes on its own output shape (the `columns[4:]` rename at :63 names
    one column too few — SURVEY §2.4), which this test pins first; with
    that single token shimmed to the intended `[3:]`, the script runs
    end-to-end and our concat_features CLI must produce a byte-identical
    features.csv (merge order, _x/_y suffixes, column names, CSV
    formatting)."""
    import subprocess
    import sys

    rng = np.random.default_rng(33)
    ef = tmp_path / "extractfeatures"
    ef.mkdir()
    cases = [f"case{i}" for i in range(8)]
    # per-modality case lists overlap on 6 cases (inner-join exercised);
    # cases.csv files carry the extract drivers' single "0" column
    pd.DataFrame({"0": cases[:7]}).to_csv(ef / "rna_cases.csv", index=False)
    pd.DataFrame(rng.normal(size=(7, 5))).to_csv(
        ef / "rna_features.csv", index=False, header=False)
    pd.DataFrame({"0": cases[1:]}).to_csv(
        ef / "pathology_cases.csv", index=False)
    pd.DataFrame(rng.normal(size=(7, 5))).to_csv(
        ef / "pathology_features.csv", index=False, header=False)
    pd.DataFrame({
        "case": cases,
        "survival_months": rng.uniform(1, 120, 8).round(3),
        "vital_status": rng.integers(0, 2, 8),
        "extra_col": rng.normal(size=8),  # script must drop extras
    }).to_csv(tmp_path / "patientinfo.csv", index=False)

    script = os.path.join(REFERENCE_DIR, "3_EarlyFusion/1_Concat2Features.py")
    # 1) the defect: verbatim execution crashes on the rename length
    proc = subprocess.run([sys.executable, script], cwd=str(tmp_path),
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode != 0
    assert "Length mismatch" in proc.stderr

    # 2) the golden run: one-token shim [4:] -> [3:] (the intended slice,
    # per the shipped early_example.csv layout), everything else verbatim
    src = open(script).read()
    assert src.count("[4:]") == 1
    shimmed = tmp_path / "concat_shimmed.py"
    shimmed.write_text(src.replace("[4:]", "[3:]"))
    proc = subprocess.run([sys.executable, str(shimmed)], cwd=str(tmp_path),
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    ref_csv = (tmp_path / "features.csv").read_text()
    header = ref_csv.splitlines()[0].split(",")
    assert header[:3] == ["case", "survival_months", "vital_status"]
    assert header[3] == "feature_0_x" and header[-1] == "feature_4_y"
    assert len(ref_csv.splitlines()) == 7  # 6 inner-joined cases + header

    from multimodalbrainsurvival_tpu.cli import concat_features

    out = tmp_path / "ours_features.csv"
    concat_features.main([
        "--rna_cases", str(ef / "rna_cases.csv"),
        "--rna_features", str(ef / "rna_features.csv"),
        "--pathology_cases", str(ef / "pathology_cases.csv"),
        "--pathology_features", str(ef / "pathology_features.csv"),
        "--patientinfo", str(tmp_path / "patientinfo.csv"),
        "--output", str(out),
    ])
    assert out.read_text() == ref_csv


# --- RNA pipeline: savescore + extractfeatures ------------------------------


def test_rna_inference_golden_runs_match_reference(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from multimodalbrainsurvival_tpu.models.convert import (
        load_torch_state_dict,
        torch_rna_to_flax,
    )
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    ref_dir = os.path.join(REFERENCE_DIR, "2_GeneExpression")
    for split, n, seed in (("train", 8, 1), ("val", 6, 2), ("test", 6, 3)):
        _all_events_csv(str(tmp_path / f"rna_{split}.csv"),
                        [f"{split}{i}" for i in range(n)],
                        n_rna=12778, seed=seed)

    # seeded checkpoint restored by BOTH stacks (2_GeneExpress_savescore.py
    # :136-150 rebuilds this exact architecture before load_state_dict)
    ref_models = _import_ref_module(
        tmp_path, os.path.join(ref_dir, "models.py"), "ref_rna_models_inf"
    )
    torch.manual_seed(11)
    ref_model = ref_models.RNAOnlyModel(
        nn.Sequential(nn.Dropout(), nn.Linear(12778, 4096), nn.ReLU(),
                      nn.Dropout(), nn.Linear(4096, 2048)),
        nn.Sequential(nn.Linear(2048, 1)),
    )
    init_pt = tmp_path / "init.pt"
    torch.save(ref_model.state_dict(), str(init_pt))
    converted = jax.tree.map(
        np.asarray, torch_rna_to_flax(load_torch_state_dict(str(init_pt)))
    )
    init_ours = str(tmp_path / "init_flax")
    Checkpointer().save(init_ours, converted, block=True)

    csvs = {f"{s}_csv_path": str(tmp_path / f"rna_{s}.csv")
            for s in ("train", "val", "test")}
    common = dict(csvs, batch_size=8, flag="golden", num_workers=0,
                  use_cuda=False)

    ref_out, our_out = tmp_path / "ref_out", tmp_path / "our_out"
    ref_out.mkdir(), our_out.mkdir()

    from multimodalbrainsurvival_tpu.cli import rna_extractfeatures, rna_savescore

    # savescore: per-case frames rna_<split>_df.csv (:186-190)
    _run_reference_driver(
        tmp_path, os.path.join(ref_dir, "2_GeneExpress_savescore.py"),
        dict(common, model_path=str(init_pt), output_path=str(ref_out) + "/"),
    )
    _run_ours(rna_savescore.main,
              dict(common, model_path=init_ours, output_path=str(our_out)),
              tmp_path, "our_save.json")
    capsys.readouterr()
    for split in ("train", "val", "test"):
        _compare_score_frames(ref_out / f"rna_{split}_df.csv",
                              our_out / f"rna_{split}_df.csv",
                              rtol=1e-4, atol=1e-6)

    # extractfeatures: per-case 2048-d embedding means (:73-81, :136-149)
    _run_reference_driver(
        tmp_path, os.path.join(ref_dir, "3_GeneExpress_extractfeatures.py"),
        dict(common, model_path=str(init_pt), output_path=str(ref_out) + "/"),
    )
    _run_ours(rna_extractfeatures.main,
              dict(common, model_path=init_ours, output_path=str(our_out)),
              tmp_path, "our_extract.json")
    capsys.readouterr()
    for split in ("train", "val", "test"):
        _compare_feature_maps(
            ref_out / f"rna_cases_{split}.csv",
            ref_out / f"rna_features_{split}.csv",
            our_out / f"rna_cases_{split}.csv",
            our_out / f"rna_features_{split}.csv",
            rtol=1e-4, atol=1e-6,
        )


# --- EarlyFusion savescore ---------------------------------------------------


def test_earlyfusion_savescore_golden_run_matches_reference(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from multimodalbrainsurvival_tpu.models.convert import (
        load_torch_state_dict,
        torch_feature_to_flax,
    )
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    ref_dir = os.path.join(REFERENCE_DIR, "3_EarlyFusion")
    for split, n, seed in (("train", 8, 1), ("val", 6, 2), ("test", 6, 3)):
        _all_events_csv(str(tmp_path / f"feat_{split}.csv"),
                        [f"{split}{i}" for i in range(n)],
                        n_feature=4096, seed=seed)

    # the savescore driver rebuilds the 4096→2048→200→1 MLP
    # (3_EarlyFusion_savescore.py:137-151) before load_state_dict
    torch.manual_seed(13)
    ref_model = nn.Sequential(
        nn.Dropout(), nn.Linear(4096, 2048), nn.ReLU(), nn.Dropout(),
        nn.Linear(2048, 200), nn.ReLU(), nn.Dropout(), nn.Linear(200, 1),
    )
    init_pt = tmp_path / "init.pt"
    torch.save(ref_model.state_dict(), str(init_pt))
    converted = jax.tree.map(
        np.asarray, torch_feature_to_flax(load_torch_state_dict(str(init_pt)))
    )
    init_ours = str(tmp_path / "init_flax")
    Checkpointer().save(init_ours, converted, block=True)

    csvs = {f"{s}_csv_path": str(tmp_path / f"feat_{s}.csv")
            for s in ("train", "val", "test")}
    common = dict(csvs, batch_size=8, flag="golden", num_workers=0,
                  use_cuda=False)

    ref_out, our_out = tmp_path / "ref_out", tmp_path / "our_out"
    ref_out.mkdir(), our_out.mkdir()
    _run_reference_driver(
        tmp_path, os.path.join(ref_dir, "3_EarlyFusion_savescore.py"),
        dict(common, model_path=str(init_pt), output_path=str(ref_out) + "/"),
    )

    from multimodalbrainsurvival_tpu.cli import feature_savescore

    _run_ours(feature_savescore.main,
              dict(common, model_path=init_ours, output_path=str(our_out)),
              tmp_path, "our_save.json")
    capsys.readouterr()
    # frame name is prefixed with the checkpoint file's basename (:183-185)
    for split in ("train", "val", "test"):
        _compare_score_frames(
            ref_out / f"init.pt_feature_{split}_df.csv",
            our_out / f"init_flax_feature_{split}_df.csv",
            rtol=1e-4, atol=1e-6,
        )


# --- HistoPathology: savescore + extractfeatures ----------------------------


def test_histo_inference_golden_runs_match_reference(tmp_path, capsys):
    torch = pytest.importorskip("torch")

    from multimodalbrainsurvival_tpu.models.convert import (
        load_torch_state_dict,
        torch_mil_to_flax,
    )
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    ref_dir = os.path.join(REFERENCE_DIR, "1_HistoPathology")
    img, bag = 224, 2  # 224: the ref fork hardcodes AvgPool2d(7)

    root = tmp_path / "patches"
    wsis = [f"S{i}" for i in range(5)]
    for i, w in enumerate(wsis):
        make_patch_dir(str(root), w, bag, img_size=img, seed=40 + i)

    def cohort(name, cases, wsi_idx, seed):
        df = _all_events_csv(str(tmp_path / name), cases,
                             wsi_names=[f"{wsis[i]}.svs" for i in wsi_idx],
                             seed=seed)
        # the savescore evaluate reads survival_bin unconditionally
        # (3_HistoPath_savescore.py:75, same quirk as the train driver —
        # SURVEY §2.4), even for the Cox task
        df["survival_bin"] = np.arange(len(df)) % 4
        df.to_csv(str(tmp_path / name), index=False)

    cohort("ffpe_train.csv", ["c0", "c1"], [0, 1], 5)
    cohort("ffpe_val.csv", ["c2", "c3"], [2, 3], 6)
    cohort("ffpe_test.csv", ["c2", "c3"], [4, 2], 7)

    ref_resnet = _import_ref_module(
        tmp_path, os.path.join(ref_dir, "resnet.py"), "ref_histo_resnet_inf"
    )
    ref_models = _import_ref_module(
        tmp_path, os.path.join(ref_dir, "models.py"), "ref_histo_models_inf"
    )
    torch.manual_seed(17)
    ref_model = ref_models.AggregationModel(
        resnet=ref_resnet.resnet50(pretrained=False),
        aggregator=ref_models.Identity(),
        aggregator_dim=2048, resnet_dim=2048, out_features=1,
    )
    init_pt = tmp_path / "init.pt"
    torch.save(ref_model.state_dict(), str(init_pt))
    converted = jax.tree.map(
        np.asarray, torch_mil_to_flax(load_torch_state_dict(str(init_pt)))
    )
    init_ours = str(tmp_path / "init_flax")
    Checkpointer().save(init_ours, converted, block=True)

    common = {
        "num_classes": 1, "batch_size": 2, "use_cuda": False,
        "data_path": str(root),
        "train_csv_path": str(tmp_path / "ffpe_train.csv"),
        "val_csv_path": str(tmp_path / "ffpe_val.csv"),
        "test_csv_path": str(tmp_path / "ffpe_test.csv"),
        "num_workers": 0, "img_size": img, "pretrained": False,
        "train_bag_size": bag, "val_bag_size": bag,
        "aggregator": "identity", "aggregator_hdim": 2048,
        "task": "survival_prediction", "target_label": "vital_status",
        "flag": "golden",
        "max_patch_per_wsi_train": bag, "max_patch_per_wsi_val": bag,
    }
    ours_extra = {"model_name": "resnet50", "augment": False}

    ref_out, our_out = tmp_path / "ref_out", tmp_path / "our_out"
    ref_out.mkdir(), our_out.mkdir()

    from multimodalbrainsurvival_tpu.cli import (
        histo_extractfeatures,
        histo_savescore,
    )

    # savescore: case-level frames <ckpt>_pathology_<split>_df.csv (:344-349)
    _run_reference_driver(
        tmp_path, os.path.join(ref_dir, "3_HistoPath_savescore.py"),
        dict(common, model_path=str(init_pt), output_path=str(ref_out) + "/"),
    )
    _run_ours(histo_savescore.main,
              dict(common, **ours_extra, model_path=init_ours,
                   output_path=str(our_out)),
              tmp_path, "our_save.json")
    capsys.readouterr()
    for split in ("train", "val", "test"):
        _compare_score_frames(
            ref_out / f"init.pt_pathology_{split}_df.csv",
            our_out / f"init_flax_pathology_{split}_df.csv",
            rtol=1e-3, atol=1e-5,
        )

    # extractfeatures: per-case mean of the post-aggregator bag embedding
    # (:51-89); every split uses val transforms + val_bag_size (:146-159)
    _run_reference_driver(
        tmp_path, os.path.join(ref_dir, "4_HistoPath_extractfeatures.py"),
        dict(common, model_path=str(init_pt), output_path=str(ref_out) + "/"),
    )
    _run_ours(histo_extractfeatures.main,
              dict(common, **ours_extra, model_path=init_ours,
                   output_path=str(our_out)),
              tmp_path, "our_extract.json")
    capsys.readouterr()
    for split in ("train", "val", "test"):
        _compare_feature_maps(
            ref_out / f"pathology_cases_{split}.csv",
            ref_out / f"pathology_features_{split}.csv",
            our_out / f"pathology_cases_{split}.csv",
            our_out / f"pathology_features_{split}.csv",
            rtol=1e-3, atol=1e-5,
        )


def test_histo_savescore_attention_aggregator_golden(tmp_path, capsys):
    """TanhAttention end-to-end through the reference savescore driver: the
    learned gated attention (`1_HistoPathology/models.py:22-33`, including
    its rescale-by-bag-size quirk at :32) as part of a full driver run — the
    other golden runs all use the identity aggregator. The attention vector
    initializes to zeros (uniform weights ≡ identity), so the seeded init
    randomizes it to pin the real attention math."""
    torch = pytest.importorskip("torch")

    from multimodalbrainsurvival_tpu.models.convert import (
        load_torch_state_dict,
        torch_mil_to_flax,
    )
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    ref_dir = os.path.join(REFERENCE_DIR, "1_HistoPathology")
    img, bag = 224, 2
    root = tmp_path / "patches"
    for i, w in enumerate(("A0", "A1")):
        make_patch_dir(str(root), w, bag, img_size=img, seed=60 + i)
    csv = str(tmp_path / "cohort.csv")
    df = _all_events_csv(csv, ["c0", "c1"], wsi_names=["A0.svs", "A1.svs"],
                         seed=8)
    df["survival_bin"] = np.arange(len(df)) % 4  # read unconditionally (:75)
    df.to_csv(csv, index=False)

    ref_resnet = _import_ref_module(
        tmp_path, os.path.join(ref_dir, "resnet.py"), "ref_histo_resnet_attn"
    )
    ref_models = _import_ref_module(
        tmp_path, os.path.join(ref_dir, "models.py"), "ref_histo_models_attn"
    )
    torch.manual_seed(23)
    ref_model = ref_models.AggregationModel(
        resnet=ref_resnet.resnet50(pretrained=False),
        aggregator=ref_models.TanhAttention(dim=2048),
        aggregator_dim=2048, resnet_dim=2048, out_features=1,
    )
    with torch.no_grad():
        ref_model.aggregator.vector.data.normal_()
    init_pt = tmp_path / "init.pt"
    torch.save(ref_model.state_dict(), str(init_pt))
    converted = jax.tree.map(
        np.asarray, torch_mil_to_flax(load_torch_state_dict(str(init_pt)))
    )
    init_ours = str(tmp_path / "init_flax")
    Checkpointer().save(init_ours, converted, block=True)

    # one 2-case cohort reused for every split keeps the torch-CPU ResNet
    # cost down; the three output frames then pin the same forward thrice
    common = {
        "num_classes": 1, "batch_size": 2, "use_cuda": False,
        "data_path": str(root),
        "train_csv_path": csv, "val_csv_path": csv, "test_csv_path": csv,
        "num_workers": 0, "img_size": img, "pretrained": False,
        "train_bag_size": bag, "val_bag_size": bag,
        "aggregator": "attention", "aggregator_hdim": 2048,
        "task": "survival_prediction", "target_label": "vital_status",
        "flag": "golden",
        "max_patch_per_wsi_train": bag, "max_patch_per_wsi_val": bag,
    }
    ref_out, our_out = tmp_path / "ref_out", tmp_path / "our_out"
    ref_out.mkdir(), our_out.mkdir()
    _run_reference_driver(
        tmp_path, os.path.join(ref_dir, "3_HistoPath_savescore.py"),
        dict(common, model_path=str(init_pt), output_path=str(ref_out) + "/"),
    )

    from multimodalbrainsurvival_tpu.cli import histo_savescore

    _run_ours(histo_savescore.main,
              dict(common, model_name="resnet50", augment=False,
                   model_path=init_ours, output_path=str(our_out)),
              tmp_path, "our_save.json")
    capsys.readouterr()
    for split in ("train", "val", "test"):
        _compare_score_frames(
            ref_out / f"init.pt_pathology_{split}_df.csv",
            our_out / f"init_flax_pathology_{split}_df.csv",
            rtol=1e-3, atol=1e-5,
        )


# --- JointFusion savescore ---------------------------------------------------


def test_joint_savescore_golden_run_matches_reference(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from multimodalbrainsurvival_tpu.models.convert import (
        load_torch_state_dict,
        torch_joint_to_flax,
    )
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    ref_dir = os.path.join(REFERENCE_DIR, "5_JointFusion")
    img, bag = 224, 2
    root = tmp_path / "patches"
    wsis = [f"Q{i}" for i in range(5)]
    for i, w in enumerate(wsis):
        make_patch_dir(str(root), w, bag, img_size=img, seed=50 + i)

    def cohort(name, cases, wsi_idx, seed):
        # extension-LESS wsi names: the joint dataset uses wsi_file_name
        # verbatim as the patch dir (5_JointFusion/datasets.py:42-51)
        _all_events_csv(str(tmp_path / name), cases,
                        wsi_names=[wsis[i] for i in wsi_idx],
                        n_rna=12778, seed=seed)

    cohort("joint_train.csv", ["c0", "c1"], [0, 1], 5)
    cohort("joint_val.csv", ["c2", "c3"], [2, 3], 6)
    cohort("joint_test.csv", ["c2", "c3"], [4, 2], 7)

    ref_resnet = _import_ref_module(
        tmp_path, os.path.join(ref_dir, "resnet.py"), "ref_joint_resnet_inf"
    )
    ref_models = _import_ref_module(
        tmp_path, os.path.join(ref_dir, "models.py"), "ref_joint_models_inf"
    )
    torch.manual_seed(19)
    ref_model = ref_models.BagHistopathologyRNAModel(
        ref_resnet.resnet50(pretrained=False),
        nn.Sequential(nn.Dropout(), nn.Linear(12778, 4096), nn.ReLU(),
                      nn.Dropout(), nn.Linear(4096, 2048)),
        nn.Sequential(nn.Dropout(0.8), nn.Linear(4096, 1)),
    )
    init_pt = tmp_path / "init.pt"
    torch.save(ref_model.state_dict(), str(init_pt))
    converted = jax.tree.map(
        np.asarray, torch_joint_to_flax(load_torch_state_dict(str(init_pt)))
    )
    init_ours = str(tmp_path / "init_flax")
    Checkpointer().save(init_ours, converted, block=True)

    common = {
        "num_classes": 1, "num_epochs": 1, "batch_size": 2,
        "use_cuda": False, "data_path": str(root),
        "train_csv_path": str(tmp_path / "joint_train.csv"),
        "val_csv_path": str(tmp_path / "joint_val.csv"),
        "test_csv_path": str(tmp_path / "joint_test.csv"),
        "num_workers": 0, "img_size": img, "pretrained": False,
        "train_bag_size": bag, "val_bag_size": bag,
        "aggregator": "identity", "aggregator_hdim": 2048,
        "task": "survival_prediction", "target_label": "vital_status",
        "flag": "golden",
        "max_patch_per_wsi_train": bag, "max_patch_per_wsi_val": bag,
    }

    ref_out, our_out = tmp_path / "ref_out", tmp_path / "our_out"
    ref_out.mkdir(), our_out.mkdir()
    _run_reference_driver(
        tmp_path, os.path.join(ref_dir, "2_JointFusion_savescore.py"),
        dict(common, model_path=str(init_pt), output_path=str(ref_out) + "/"),
    )

    from multimodalbrainsurvival_tpu.cli import joint_savescore

    _run_ours(joint_savescore.main,
              dict(common, model_name="resnet50", augment=False,
                   model_path=init_ours, output_path=str(our_out)),
              tmp_path, "our_save.json")
    capsys.readouterr()
    for split in ("train", "val", "test"):
        _compare_score_frames(
            ref_out / f"init.pt_joint_{split}_df.csv",
            our_out / f"init_flax_joint_{split}_df.csv",
            rtol=1e-3, atol=1e-5,
        )
