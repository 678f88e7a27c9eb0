"""HistoPathology pipeline e2e through the real CLI mains:
train (Cox) -> savescore -> extractfeatures (with fold_bn serving).

Parity surface: ``2_HistoPath_train.py`` / ``3_HistoPath_savescore.py`` /
``4_HistoPath_extractfeatures.py`` artifact contracts. Fast in-suite
version (resnet18, 32x32 patches); the full-size chain runs in
examples/full_chain_demo.py.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from tests.helpers import make_patch_dir, make_survival_csv


@pytest.fixture
def histo_experiment(tmp_path):
    root = tmp_path / "patches"
    wsis = [f"H{i}" for i in range(4)]
    for i, w in enumerate(wsis):
        make_patch_dir(str(root), w, 6, img_size=32, seed=10 + i)
    for split, idx in [("train", [0, 1, 2, 3]), ("val", [0, 1]), ("test", [2, 3])]:
        make_survival_csv(
            str(tmp_path / f"ffpe_{split}.csv"),
            [f"c{i}" for i in idx],
            wsi_names=[f"{wsis[i]}.svs" for i in idx],
            seed=7 + len(idx),
        )
    cfg = {
        "model_name": "resnet18", "num_classes": 1, "batch_size": 4,
        "use_cuda": False, "data_path": str(root),
        "train_csv_path": str(tmp_path / "ffpe_train.csv"),
        "val_csv_path": str(tmp_path / "ffpe_val.csv"),
        "test_csv_path": str(tmp_path / "ffpe_test.csv"),
        "num_workers": 1, "num_epochs": 2, "img_size": 32,
        "lr": 5e-4, "weight_decay": 1e-5, "pretrained": False,
        "train_bag_size": 2, "val_bag_size": 2,
        "aggregator": "identity", "aggregator_hdim": 512,
        "task": "survival_prediction", "n_layers_to_train": 2,
        "flag": "ffpe_model",
        "max_patch_per_wsi_train": 4, "max_patch_per_wsi_val": 4,
        "checkpoint_path": str(tmp_path / "out") + "/",
        "summary_path": str(tmp_path / "out/summary") + "/",
        "model_path": "", "restore_path": "",
    }
    p = tmp_path / "config_ffpe_train.json"
    p.write_text(json.dumps(cfg))
    return tmp_path, cfg, p


def test_histo_cli_end_to_end(histo_experiment):
    tmp_path, cfg, cfg_path = histo_experiment
    from multimodalbrainsurvival_tpu.cli import (
        histo_extractfeatures,
        histo_savescore,
        histo_train,
    )

    histo_train.main(["--config", str(cfg_path)])
    save_dir = tmp_path / "out/models/ffpe_model"
    assert (save_dir / "model_last").is_dir()
    frame = pd.read_csv(tmp_path / "out/outputs/ffpe_model/val_output_last.csv")
    assert len(frame) > 0 and np.isfinite(frame["score"]).all()

    cfg2 = dict(cfg)
    cfg2["model_path"] = str(save_dir / "model_last")
    cfg2["output_path"] = str(tmp_path / "scores") + "/"
    p2 = tmp_path / "cfg_savescore.json"
    p2.write_text(json.dumps(cfg2))
    histo_savescore.main(["--config", str(p2)])
    # reference naming: <model>_pathology_<split>[_cv]_df.csv (:344-349)
    score_files = [f for f in os.listdir(tmp_path / "scores") if "val" in f]
    assert score_files, "histo savescore wrote no val score frame"

    # extractfeatures with folded-BN serving (fold_bn config key)
    cfg3 = dict(cfg2)
    cfg3["output_path"] = str(tmp_path / "feats") + "/"
    cfg3["fold_bn"] = True
    p3 = tmp_path / "cfg_extract.json"
    p3.write_text(json.dumps(cfg3))
    histo_extractfeatures.main(["--config", str(p3)])
    feats = np.loadtxt(tmp_path / "feats/pathology_features_val.csv",
                       delimiter=",")
    # reference writes pd.DataFrame(cases).to_csv(...) with header+index
    # (4_HistoPath_extractfeatures.py:186-188)
    cases = pd.read_csv(tmp_path / "feats/pathology_cases_val.csv", index_col=0)
    assert feats.shape == (len(cases), 512)  # resnet18 feature_dim
    assert np.isfinite(feats).all()

    # folding must not change the embeddings (vs unfolded serving)
    cfg4 = dict(cfg3)
    cfg4["output_path"] = str(tmp_path / "feats_nofold") + "/"
    cfg4["fold_bn"] = False
    p4 = tmp_path / "cfg_extract_nofold.json"
    p4.write_text(json.dumps(cfg4))
    histo_extractfeatures.main(["--config", str(p4)])
    feats_nofold = np.loadtxt(
        tmp_path / "feats_nofold/pathology_features_val.csv", delimiter=","
    )
    np.testing.assert_allclose(feats, feats_nofold, atol=5e-4)

    # quantize: "int8" — the W8A8 serving path (models/quantize.py) through
    # both serving CLIs; embeddings track the float ones (cosine), scores
    # stay finite. Opt-in numeric deviation; contract in tests/test_quantize.py.
    cfg5 = dict(cfg3)
    cfg5["output_path"] = str(tmp_path / "feats_int8") + "/"
    cfg5.pop("fold_bn")
    cfg5["quantize"] = "int8"
    p5 = tmp_path / "cfg_extract_int8.json"
    p5.write_text(json.dumps(cfg5))
    histo_extractfeatures.main(["--config", str(p5)])
    feats_q = np.loadtxt(tmp_path / "feats_int8/pathology_features_val.csv",
                         delimiter=",")
    assert feats_q.shape == feats.shape
    num = np.sum(feats_q * feats, axis=-1)
    den = np.linalg.norm(feats_q, axis=-1) * np.linalg.norm(feats, axis=-1)
    assert (num / np.maximum(den, 1e-30)).min() > 0.98

    cfg6 = dict(cfg5)
    cfg6["output_path"] = str(tmp_path / "scores_int8") + "/"
    p6 = tmp_path / "cfg_savescore_int8.json"
    p6.write_text(json.dumps(cfg6))
    histo_savescore.main(["--config", str(p6)])
    qscores = [f for f in os.listdir(tmp_path / "scores_int8") if "val" in f]
    assert qscores, "int8 savescore wrote no val score frame"
    qframe = pd.read_csv(tmp_path / "scores_int8" / qscores[0])
    assert np.isfinite(qframe["score"]).all()


def test_histo_train_with_device_cache(histo_experiment):
    """cache_patches_on_device: the CLI trains end-to-end feeding steps from
    the HBM-resident patch cache (index-only H2D; data/device_cache.py)."""
    tmp_path, cfg, _ = histo_experiment
    cfg2 = dict(cfg)
    cfg2["cache_patches_on_device"] = True
    cfg2["flag"] = "ffpe_cached"
    cfg2["num_epochs"] = 1
    p = tmp_path / "cfg_cached.json"
    p.write_text(json.dumps(cfg2))
    from multimodalbrainsurvival_tpu.cli import histo_train

    histo_train.main(["--config", str(p)])
    frame = pd.read_csv(
        tmp_path / "out/outputs/ffpe_cached/val_output_last.csv"
    )
    assert len(frame) > 0 and np.isfinite(frame["score"]).all()


def test_extractfeatures_sharded_matches_single_device(histo_experiment):
    """mesh: {"dp": 2} shards the extract inference across devices; the
    per-case features must equal the single-device run bit-for-bit-ish
    (fp32 reduction order)."""
    tmp_path, cfg, cfg_path = histo_experiment
    from multimodalbrainsurvival_tpu.cli import histo_extractfeatures, histo_train

    histo_train.main(["--config", str(cfg_path), "--quick", "1"])
    base = dict(cfg)
    base["model_path"] = str(tmp_path / "out/models/ffpe_model/model_last")

    outs = {}
    for tag, mesh, quant in [
        ("single", None, None),
        ("dp2", {"dp": 2}, None),
        # the int8 qtree rides in `variables`, so the same replication path
        # must cover it (quantize + mesh compose)
        ("int8_single", None, "int8"),
        ("int8_dp2", {"dp": 2}, "int8"),
    ]:
        c = dict(base)
        c["output_path"] = str(tmp_path / f"feats_{tag}") + "/"
        if mesh:
            c["mesh"] = mesh
        if quant:
            c["quantize"] = quant
        p = tmp_path / f"cfg_{tag}.json"
        p.write_text(json.dumps(c))
        histo_extractfeatures.main(["--config", str(p)])
        outs[tag] = np.loadtxt(
            tmp_path / f"feats_{tag}/pathology_features_val.csv", delimiter=","
        )
    np.testing.assert_allclose(outs["dp2"], outs["single"], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(outs["int8_dp2"], outs["int8_single"],
                               rtol=1e-5, atol=1e-6)


def test_histo_train_with_mesh_sharded_device_cache(histo_experiment):
    """cache_patches_on_device + mesh: the CLI trains end-to-end with the
    patch cache block-sharded over the 8-device mesh and batches assembled by
    the shard_map gather (VERDICT r2 next-round #1 'Done' criterion)."""
    import jax

    tmp_path, cfg, _ = histo_experiment
    cfg2 = dict(cfg)
    cfg2["cache_patches_on_device"] = True
    cfg2["mesh"] = {"dp": 8}
    cfg2["flag"] = "ffpe_cached_mesh"
    cfg2["num_epochs"] = 1
    cfg2["batch_size"] = 8
    p = tmp_path / "cfg_cached_mesh.json"
    p.write_text(json.dumps(cfg2))
    from multimodalbrainsurvival_tpu.cli import histo_train
    from multimodalbrainsurvival_tpu.data.device_cache import (
        DeviceCachedPatchBags,
    )

    built = {}
    orig = DeviceCachedPatchBags.__init__

    def spy(self, base, mesh=None, **kw):
        orig(self, base, mesh=mesh, **kw)
        built["mesh"] = mesh
        built["shards"] = len(self._cache.sharding.device_set)

    DeviceCachedPatchBags.__init__ = spy
    try:
        histo_train.main(["--config", str(p)])
    finally:
        DeviceCachedPatchBags.__init__ = orig

    assert built["mesh"] is not None  # the CLI wired the mesh into the cache
    assert built["shards"] == len(jax.devices()) == 8
    frame = pd.read_csv(
        tmp_path / "out/outputs/ffpe_cached_mesh/val_output_last.csv"
    )
    assert len(frame) > 0 and np.isfinite(frame["score"]).all()


def test_histo_train_quantize_trunk(histo_experiment):
    """`quantize_trunk: "int8"` trains end-to-end through the CLI: the freeze
    ladder's forward-only prefix runs W8A8 (QuantTrunkMILAdapter), the float
    checkpoint layout is unchanged (savescore loads it), and an invalid
    n_layers_to_train is rejected loudly."""
    tmp_path, cfg, _ = histo_experiment
    from multimodalbrainsurvival_tpu.cli import histo_savescore, histo_train
    from multimodalbrainsurvival_tpu.train.adapters import QuantTrunkMILAdapter

    cfg2 = dict(cfg)
    cfg2["quantize_trunk"] = "int8"
    cfg2["flag"] = "ffpe_qtrunk"
    cfg2["num_epochs"] = 1
    p = tmp_path / "cfg_qtrunk.json"
    p.write_text(json.dumps(cfg2))

    built = {}
    init_orig = QuantTrunkMILAdapter.__init__

    def spy(self, *a, **kw):
        init_orig(self, *a, **kw)
        built["trunk_stages"] = self.trunk_stages
        built["qtree"] = self.qtree is not None

    QuantTrunkMILAdapter.__init__ = spy
    try:
        histo_train.main(["--config", str(p)])
    finally:
        QuantTrunkMILAdapter.__init__ = init_orig
    # n_layers_to_train=2 -> frozen prefix = stem + 3 stages
    assert built == {"trunk_stages": 3, "qtree": True}
    frame = pd.read_csv(
        tmp_path / "out/outputs/ffpe_qtrunk/val_output_last.csv"
    )
    assert len(frame) > 0 and np.isfinite(frame["score"]).all()

    # the checkpoint stays float-layout: the stock (float) savescore loads it
    cfg3 = dict(cfg)
    cfg3["model_path"] = str(tmp_path / "out/models/ffpe_qtrunk/model_last")
    cfg3["output_path"] = str(tmp_path / "scores_qtrunk") + "/"
    p3 = tmp_path / "cfg_qtrunk_score.json"
    p3.write_text(json.dumps(cfg3))
    histo_savescore.main(["--config", str(p3)])
    score_files = [f for f in os.listdir(tmp_path / "scores_qtrunk")
                   if "val" in f]
    assert score_files, "savescore wrote no val frame from the qtrunk model"
    got = pd.read_csv(tmp_path / "scores_qtrunk" / score_files[0])
    assert np.isfinite(got["score"]).all()

    # full fine-tune leaves no frozen prefix to quantize -> loud error
    cfg4 = dict(cfg2, n_layers_to_train=5, flag="ffpe_qtrunk_bad")
    p4 = tmp_path / "cfg_qtrunk_bad.json"
    p4.write_text(json.dumps(cfg4))
    with pytest.raises(ValueError, match="n_layers_to_train"):
        histo_train.main(["--config", str(p4)])


def test_histo_train_quantize_trunk_with_cached_mesh(histo_experiment):
    """quantize_trunk composes with cache_patches_on_device + mesh: the
    calibration batches come off the mesh-sharded device cache and the qtree
    rides replicated over the mesh; training runs e2e with finite scores."""
    import jax

    tmp_path, cfg, _ = histo_experiment
    from multimodalbrainsurvival_tpu.cli import histo_train

    cfg2 = dict(cfg)
    cfg2["quantize_trunk"] = "int8"
    cfg2["cache_patches_on_device"] = True
    cfg2["mesh"] = {"dp": 8}
    cfg2["flag"] = "ffpe_qtrunk_mesh"
    cfg2["num_epochs"] = 1
    cfg2["batch_size"] = 8
    p = tmp_path / "cfg_qtrunk_mesh.json"
    p.write_text(json.dumps(cfg2))
    histo_train.main(["--config", str(p)])
    assert len(jax.devices()) == 8
    frame = pd.read_csv(
        tmp_path / "out/outputs/ffpe_qtrunk_mesh/val_output_last.csv"
    )
    assert len(frame) > 0 and np.isfinite(frame["score"]).all()


def test_cache_budget_config_key(histo_experiment):
    """`cache_max_bytes_per_device` drives the cache fit check: a tiny
    budget falls back to the host loader instead of caching."""
    import io
    from contextlib import redirect_stdout

    from multimodalbrainsurvival_tpu.cli.histo_train import build_datasets
    from multimodalbrainsurvival_tpu.config import Config
    from multimodalbrainsurvival_tpu.data import PatchBagDataset
    from multimodalbrainsurvival_tpu.data.device_cache import (
        DeviceCachedPatchBags,
    )

    _, cfg, _ = histo_experiment
    cfg2 = dict(cfg, cache_patches_on_device=True,
                cache_max_bytes_per_device=16)
    buf = io.StringIO()
    with redirect_stdout(buf):
        ds = build_datasets(Config(cfg2), quick=False)
    assert isinstance(ds["train"], PatchBagDataset)
    assert "falling back to the host loader" in buf.getvalue()

    cfg3 = dict(cfg, cache_patches_on_device=True,
                cache_max_bytes_per_device=1 << 30)
    ds = build_datasets(Config(cfg3), quick=False)
    assert isinstance(ds["train"], DeviceCachedPatchBags)


def test_histo_train_freeze_bn(histo_experiment):
    """`freeze_bn: true` config key: the histo CLI trains end-to-end with
    FrozenBatchNorm (running-stat normalization in train mode) and the
    checkpointed batch_stats are EXACTLY the initial ones (no updates)."""
    import jax
    import numpy as np

    from multimodalbrainsurvival_tpu.cli import histo_train
    from multimodalbrainsurvival_tpu.cli.histo_train import build_mil_model
    from multimodalbrainsurvival_tpu.config import Config
    from multimodalbrainsurvival_tpu.train.adapters import MILAdapter
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    tmp_path, cfg, _ = histo_experiment
    cfg2 = dict(cfg, freeze_bn=True, num_epochs=1, flag="fbn")
    p = tmp_path / "config_fbn.json"
    p.write_text(json.dumps(cfg2))
    histo_train.main(["--config", str(p), "--quick", "1"])

    saved_dir = tmp_path / "out/models/fbn/model_last"
    assert saved_dir.is_dir()
    # restore and compare batch_stats to a fresh init: untouched by training
    model = build_mil_model(Config(cfg2))
    adapter = MILAdapter(model=model)
    arrays = {
        "patch_bag": np.zeros((1, 2, 32, 32, 3), np.uint8),
        "bag_mask": np.ones((1, 2), np.float32),
        "sample_mask": np.ones((1,), bool),
    }
    init_v = adapter.init(jax.random.PRNGKey(0),
                          jax.tree.map(jax.numpy.asarray, arrays))
    restored = Checkpointer().restore(str(saved_dir), init_v)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(init_v["batch_stats"]),
        jax.tree_util.tree_leaves_with_path(restored["batch_stats"]),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"stats changed: {jax.tree_util.keystr(pa)}",
        )
    # params DID train
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(init_v["params"]),
                        jax.tree.leaves(restored["params"]))
    )
    assert changed
