"""Joint-fusion pipeline e2e through the real CLI mains (train -> savescore).

Parity surface: ``5_JointFusion/1_JointFusion_train.py`` (3 LR groups,
freeze ladder, --quick) and ``2_JointFusion_savescore.py`` artifacts. The
full-size chain also runs in examples/full_chain_demo.py; this is the
fast in-suite version (resnet18, 32x32 patches, 16 genes).
"""

import json

import numpy as np
import pandas as pd
import pytest

from tests.helpers import make_patch_dir, make_survival_csv


@pytest.fixture
def joint_experiment(tmp_path):
    root = tmp_path / "patches"
    wsis = [f"W{i}" for i in range(4)]
    for i, w in enumerate(wsis):
        make_patch_dir(str(root), w, 5 + i, img_size=32, seed=i)
    for split, idx in [("train", [0, 1, 2, 3]), ("val", [0, 1]), ("test", [2, 3])]:
        df = make_survival_csv(
            str(tmp_path / f"joint_{split}.csv"),
            [f"c{i}" for i in idx],
            wsi_names=[f"{wsis[i]}.svs" for i in idx],
            n_rna=16,
            seed=len(idx),
        )
        assert "wsi_file_name" in df.columns
    cfg = {
        "model_name": "resnet18", "num_classes": 1, "batch_size": 4,
        "use_cuda": False, "data_path": str(root),
        "train_csv_path": str(tmp_path / "joint_train.csv"),
        "val_csv_path": str(tmp_path / "joint_val.csv"),
        "test_csv_path": str(tmp_path / "joint_test.csv"),
        "num_workers": 1, "num_epochs": 1, "img_size": 32,
        "lr_rna": 1e-6, "lr_histo": 5e-5, "lr_mlp": 1e-2,
        "weight_decay": 1e-5, "pretrained": False,
        "aggregator": "identity", "aggregator_hdim": 512,
        "task": "survival_prediction", "n_layers_to_train": 2,
        "flag": "joint_model",
        "max_patch_per_wsi_train": 4, "max_patch_per_wsi_val": 4,
        "train_bag_size": 2, "val_bag_size": 2,
        "histo_restore_path": "", "rna_restore_path": "",
        "checkpoint_path": str(tmp_path / "out") + "/",
        "summary_path": str(tmp_path / "out/summary") + "/",
        "model_path": "", "restore_path": "",
    }
    p = tmp_path / "config_joint_train.json"
    p.write_text(json.dumps(cfg))
    return tmp_path, cfg, p


def test_joint_cli_end_to_end(joint_experiment):
    tmp_path, cfg, cfg_path = joint_experiment
    from multimodalbrainsurvival_tpu.cli import joint_savescore, joint_train

    joint_train.main(["--config", str(cfg_path), "--quick", "1"])
    save_dir = tmp_path / "out/models/joint_model"
    assert (save_dir / "model_last").is_dir()
    out_dir = tmp_path / "out/outputs/joint_model"
    frame = pd.read_csv(out_dir / "val_output_last.csv")
    assert len(frame) > 0 and np.isfinite(frame["score"]).all()

    cfg2 = dict(cfg)
    cfg2["model_path"] = str(save_dir / "model_last")
    cfg2["output_path"] = str(tmp_path / "scores") + "/"
    p2 = tmp_path / "cfg_savescore.json"
    p2.write_text(json.dumps(cfg2))
    joint_savescore.main(["--config", str(p2)])
    score_files = list((tmp_path / "scores").glob("*val*df.csv"))
    assert score_files, "joint savescore wrote no val score frame"
    sf = pd.read_csv(score_files[0])
    assert np.isfinite(sf.select_dtypes("number")).all().all()

    # quantize: "int8" — W8A8 patch encoder under the bimodal fusion
    # (models/quantize.py); scores must stay finite and track the float run
    cfg3 = dict(cfg2)
    cfg3["output_path"] = str(tmp_path / "scores_int8") + "/"
    cfg3["quantize"] = "int8"
    p3 = tmp_path / "cfg_savescore_int8.json"
    p3.write_text(json.dumps(cfg3))
    joint_savescore.main(["--config", str(p3)])
    qfiles = list((tmp_path / "scores_int8").glob("*val*df.csv"))
    assert qfiles, "int8 joint savescore wrote no val score frame"
    qf = pd.read_csv(qfiles[0])
    assert np.isfinite(qf["score"]).all()
    np.testing.assert_allclose(qf["score"], sf["score"], atol=0.05)


def test_joint_train_quantize_trunk(joint_experiment):
    """`quantize_trunk: "int8"` in the joint CLI: the frozen ResNet prefix
    runs W8A8 (QuantTrunkJointAdapter — the bimodal variant), the RNA
    encoder + fusion head stay float, and the checkpoint keeps the float
    layout (the stock joint savescore loads it)."""
    tmp_path, cfg, _ = joint_experiment
    from multimodalbrainsurvival_tpu.cli import joint_savescore, joint_train
    from multimodalbrainsurvival_tpu.train.adapters import (
        QuantTrunkJointAdapter,
    )

    cfg2 = dict(cfg)
    cfg2["quantize_trunk"] = "int8"
    cfg2["flag"] = "joint_qtrunk"
    cfg2["num_epochs"] = 1
    p = tmp_path / "cfg_joint_qtrunk.json"
    p.write_text(json.dumps(cfg2))

    built = {}
    init_orig = QuantTrunkJointAdapter.__init__

    def spy(self, *a, **kw):
        init_orig(self, *a, **kw)
        built["trunk_stages"] = self.trunk_stages
        built["qtree"] = self.qtree is not None

    QuantTrunkJointAdapter.__init__ = spy
    try:
        joint_train.main(["--config", str(p)])
    finally:
        QuantTrunkJointAdapter.__init__ = init_orig
    # n_layers_to_train=2 (fc + layer4 trainable) -> frozen = stem + 3 stages
    assert built == {"trunk_stages": 3, "qtree": True}
    frame = pd.read_csv(
        tmp_path / "out/outputs/joint_qtrunk/val_output_last.csv"
    )
    assert len(frame) > 0 and np.isfinite(frame["score"]).all()

    # float checkpoint layout: the stock (float) joint savescore loads it
    cfg3 = dict(cfg)
    cfg3["model_path"] = str(tmp_path / "out/models/joint_qtrunk/model_last")
    cfg3["output_path"] = str(tmp_path / "scores_joint_qtrunk") + "/"
    p3 = tmp_path / "cfg_joint_qtrunk_score.json"
    p3.write_text(json.dumps(cfg3))
    joint_savescore.main(["--config", str(p3)])
    score_files = list((tmp_path / "scores_joint_qtrunk").glob("*val*df.csv"))
    assert score_files, "joint savescore wrote no val frame from qtrunk model"
    got = pd.read_csv(score_files[0])
    assert np.isfinite(got["score"]).all()


def test_joint_train_with_mesh_sharded_device_cache(joint_experiment):
    """Joint CLI with cache_patches_on_device + mesh: the bimodal pipeline
    trains end-to-end from the mesh-sharded patch cache (same wiring as the
    histo CLI, exercised through build_joint_datasets)."""
    import jax

    tmp_path, cfg, _ = joint_experiment
    cfg2 = dict(cfg)
    cfg2["cache_patches_on_device"] = True
    cfg2["mesh"] = {"dp": 8}
    cfg2["flag"] = "joint_cached_mesh"
    cfg2["num_epochs"] = 1
    cfg2["batch_size"] = 8
    p = tmp_path / "cfg_joint_cached_mesh.json"
    p.write_text(json.dumps(cfg2))
    from multimodalbrainsurvival_tpu.cli import joint_train
    from multimodalbrainsurvival_tpu.data.device_cache import (
        DeviceCachedPatchBags,
    )

    built = {}
    orig = DeviceCachedPatchBags.__init__

    def spy(self, base, mesh=None, **kw):
        orig(self, base, mesh=mesh, **kw)
        built["shards"] = len(self._cache.sharding.device_set)
        built["has_rna"] = self._rna is not None

    DeviceCachedPatchBags.__init__ = spy
    try:
        joint_train.main(["--config", str(p)])
    finally:
        DeviceCachedPatchBags.__init__ = orig

    assert built["shards"] == len(jax.devices()) == 8
    assert built["has_rna"]  # the joint cache carries the RNA table on device
    frame = pd.read_csv(
        tmp_path / "out/outputs/joint_cached_mesh/val_output_last.csv"
    )
    assert len(frame) > 0 and np.isfinite(frame["score"]).all()
