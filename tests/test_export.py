"""Serving-artifact export (``multimodalbrainsurvival_tpu/serving.py``).

The exported StableHLO artifact must (a) reproduce the in-process serving
path exactly, (b) be shape-polymorphic over batch AND bag, and (c) load
without any of this package's model classes (jax only). TPU-native
deployment surface with no reference counterpart (the reference ships
``.pt`` + model code, ``3_HistoPath_savescore.py:228-349``).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import make_patch_dir, make_survival_csv


def _small_mil(fold_bn: bool):
    from multimodalbrainsurvival_tpu.models import (
        AggregationModel,
        make_aggregator,
        resnet18,
    )

    return AggregationModel(
        resnet=resnet18(fold_bn=fold_bn),
        aggregator=make_aggregator("attention", dim=512, hdim=32),
        aggregator_dim=512,
    )


def test_export_roundtrip_is_shape_polymorphic(tmp_path):
    from multimodalbrainsurvival_tpu.models.folding import (
        fold_resnet_variables,
    )
    from multimodalbrainsurvival_tpu.serving import (
        export_mil_artifact,
        load_artifact,
    )
    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches

    stock = _small_mil(False)
    v = stock.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 32, 32, 3)), train=False
    )
    folded = fold_resnet_variables(v)
    model = _small_mil(True)

    meta = export_mil_artifact(
        model, folded, str(tmp_path / "art"), img_size=32, arch="resnet18"
    )
    assert meta["quantize"] == "" and "cpu" in meta["platforms"]
    assert os.path.isfile(tmp_path / "art" / meta["artifact"])
    assert json.load(open(tmp_path / "art" / "meta.json"))["kind"] == (
        "mil_serving"
    )

    art = load_artifact(str(tmp_path / "art"))
    rng = np.random.default_rng(1)
    # two different (batch, bag) shapes through the SAME artifact
    for B, bag in ((3, 5), (1, 9)):
        x = jnp.asarray(
            rng.integers(0, 255, (B, bag, 32, 32, 3), dtype=np.uint8)
        )
        m = np.ones((B, bag), np.float32)
        m[:, -1] = 0.0  # a padded slot
        m = jnp.asarray(m)
        got = art.call(x, m)

        h = preprocess_patches(x, train=False)
        want_emb, want_attn = model.apply(
            folded, h, mask=m, train=False, method="extract"
        )
        want_scores, _ = model.apply(folded, h, mask=m, train=False)
        np.testing.assert_allclose(
            np.asarray(got["embedding"]), np.asarray(want_emb),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got["scores"]), np.asarray(want_scores),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got["attention"]), np.asarray(want_attn),
            rtol=1e-5, atol=1e-6,
        )
        assert np.all(np.asarray(got["attention"])[:, -1] == 0)


def test_export_table_roundtrip_rna_and_feature(tmp_path):
    """table_serving artifacts: the RNA MLP exports scores + embedding, the
    early-fusion MLP (no extract path, like the reference's
    3_EarlyFusion_savescore.py) scores only; both batch-polymorphic."""
    from multimodalbrainsurvival_tpu.models import (
        EarlyFusionMLP,
        RNAEncoder,
        RNAOnlyModel,
    )
    from multimodalbrainsurvival_tpu.serving import (
        export_table_artifact,
        load_artifact,
    )

    rng = np.random.default_rng(2)
    for name, model, want_emb in (
        ("rna", RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(16, 8),
                                                dropout=0.0)), True),
        ("feature", EarlyFusionMLP(hidden_dims=(16, 8), dropout=0.0), False),
    ):
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 12)), train=False)
        meta = export_table_artifact(
            model, v, str(tmp_path / name), in_features=12,
            kind=f"{name}_serving",
        )
        assert meta["kind"] == f"{name}_serving"
        art = load_artifact(str(tmp_path / name))
        for B in (3, 7):
            x = jnp.asarray(rng.normal(size=(B, 12)).astype(np.float32))
            got = art.call(x)
            np.testing.assert_allclose(
                np.asarray(got["scores"]),
                np.asarray(model.apply(v, x, train=False)),
                rtol=1e-5, atol=1e-6,
            )
            if want_emb:
                np.testing.assert_allclose(
                    np.asarray(got["embedding"]),
                    np.asarray(model.apply(v, x, train=False,
                                           method="extract")),
                    rtol=1e-5, atol=1e-6,
                )
            else:
                assert "embedding" not in got


def test_export_joint_roundtrip(tmp_path):
    """joint_serving: bimodal patch bag ⊕ RNA artifact matches the model's
    extract/__call__ and is (batch, bag)-polymorphic."""
    from multimodalbrainsurvival_tpu.models import (
        BagHistopathologyRNAModel,
        RNAEncoder,
        resnet18,
    )
    from multimodalbrainsurvival_tpu.models.folding import (
        fold_resnet_variables,
    )
    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches
    from multimodalbrainsurvival_tpu.serving import (
        export_joint_artifact,
        load_artifact,
    )

    def build(fold):
        return BagHistopathologyRNAModel(
            resnet=resnet18(fold_bn=fold),
            rna_encoder=RNAEncoder(hidden_dims=(16, 8), dropout=0.0),
            head_dropout=0.0,
        )

    stock = build(False)
    v = stock.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 1, 32, 32, 3)),
        jnp.zeros((1, 10)), train=False,
    )
    folded = fold_resnet_variables(v)
    model = build(True)
    meta = export_joint_artifact(
        model, folded, str(tmp_path / "joint"), img_size=32,
        rna_features=10, arch="resnet18",
    )
    assert meta["kind"] == "joint_serving" and meta["rna_features"] == 10

    art = load_artifact(str(tmp_path / "joint"))
    rng = np.random.default_rng(4)
    for B, bag in ((2, 4), (3, 2)):
        x = jnp.asarray(
            rng.integers(0, 255, (B, bag, 32, 32, 3), dtype=np.uint8)
        )
        m = jnp.asarray(np.ones((B, bag), np.float32))
        r = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32))
        got = art.call(x, m, r)

        h = preprocess_patches(x, train=False)
        want_emb = model.apply(folded, h, r, mask=m, train=False,
                               method="extract")
        want_scores = model.apply(folded, h, r, mask=m, train=False)
        np.testing.assert_allclose(
            np.asarray(got["embedding"]), np.asarray(want_emb),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got["scores"]), np.asarray(want_scores),
            rtol=1e-5, atol=1e-5,
        )


def test_export_cli_rna_kind(tmp_path):
    """export_kind: "rna" through the CLI: train-shaped checkpoint → artifact
    whose scores match the TableAdapter serving path."""
    from multimodalbrainsurvival_tpu.cli import export_model
    from multimodalbrainsurvival_tpu.cli.rna_train import build_rna_model
    from multimodalbrainsurvival_tpu.config import Config
    from multimodalbrainsurvival_tpu.data import RNATableDataset
    from multimodalbrainsurvival_tpu.serving import load_artifact
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    csv = tmp_path / "rna.csv"
    make_survival_csv(str(csv), [f"c{i}" for i in range(6)], n_rna=8, seed=5)
    cfg = {
        "batch_size": 4, "use_cuda": False, "num_workers": 1,
        "train_csv_path": str(csv), "val_csv_path": str(csv),
        "test_csv_path": str(csv), "flag": "rna_export",
        "model_path": str(tmp_path / "ckpt"),
        "export_path": str(tmp_path / "art"), "export_kind": "rna",
        "checkpoint_path": str(tmp_path / "out") + "/",
        "summary_path": str(tmp_path / "out/summary") + "/",
    }
    model = build_rna_model(Config(cfg))
    adapter = TableAdapter(model=model)
    ds = RNATableDataset(str(csv))
    probe = next(ds.batches(4))
    variables = adapter.init(
        jax.random.PRNGKey(9),
        {k: jnp.asarray(probe[k]) for k in adapter.array_keys},
    )
    Checkpointer().save(cfg["model_path"], variables, block=True)

    p = tmp_path / "cfg_rna_export.json"
    p.write_text(json.dumps(cfg))
    export_model.main(["--config", str(p)])

    art = load_artifact(cfg["export_path"])
    assert art.meta["kind"] == "rna_serving"
    assert art.meta["in_features"] == 8
    x = jnp.asarray(probe["data"])
    got = art.call(x)
    want, _ = adapter.apply(variables, {"data": x}, train=False)
    np.testing.assert_allclose(
        np.asarray(got["scores"]), np.asarray(want), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["embedding"]),
        np.asarray(adapter.extract(variables, {"data": x})),
        rtol=1e-5, atol=1e-5,
    )


@pytest.fixture
def export_experiment(tmp_path):
    root = tmp_path / "patches"
    wsis = [f"H{i}" for i in range(2)]
    for i, w in enumerate(wsis):
        make_patch_dir(str(root), w, 6, img_size=32, seed=20 + i)
    make_survival_csv(
        str(tmp_path / "ffpe_train.csv"),
        ["c0", "c1"],
        wsi_names=[f"{w}.svs" for w in wsis],
        seed=3,
    )
    cfg = {
        "model_name": "resnet18", "num_classes": 1, "batch_size": 2,
        "use_cuda": False, "data_path": str(root),
        "train_csv_path": str(tmp_path / "ffpe_train.csv"),
        "val_csv_path": str(tmp_path / "ffpe_train.csv"),
        "test_csv_path": str(tmp_path / "ffpe_train.csv"),
        "num_workers": 1, "num_epochs": 1, "img_size": 32,
        "lr": 5e-4, "weight_decay": 1e-5, "pretrained": False,
        "train_bag_size": 2, "val_bag_size": 2,
        "aggregator": "attention", "aggregator_hdim": 512,
        "task": "survival_prediction", "n_layers_to_train": 2,
        "flag": "export_model",
        "max_patch_per_wsi_train": 4, "max_patch_per_wsi_val": 4,
        "checkpoint_path": str(tmp_path / "out") + "/",
        "summary_path": str(tmp_path / "out/summary") + "/",
        "model_path": str(tmp_path / "ckpt"), "restore_path": "",
    }
    # fabricate the checkpoint the CLI will restore: the stock (unfolded)
    # variables tree, exactly what training saves
    from multimodalbrainsurvival_tpu.cli.histo_train import build_mil_model
    from multimodalbrainsurvival_tpu.config import Config
    from multimodalbrainsurvival_tpu.train.adapters import MILAdapter
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    adapter = MILAdapter(model=build_mil_model(Config(cfg)))
    variables = adapter.init(
        jax.random.PRNGKey(7),
        {
            "patch_bag": jnp.zeros((1, 1, 32, 32, 3), jnp.uint8),
            "bag_mask": jnp.ones((1, 1), jnp.float32),
            "sample_mask": jnp.ones((1,), bool),
        },
    )
    Checkpointer().save(cfg["model_path"], variables, block=True)
    return tmp_path, cfg


def test_export_cli_float_and_int8(export_experiment):
    tmp_path, cfg = export_experiment
    from multimodalbrainsurvival_tpu.cli import export_model
    from multimodalbrainsurvival_tpu.cli.histo_train import (
        build_datasets,
        build_mil_model,
    )
    from multimodalbrainsurvival_tpu.cli._common import (
        quantize_serving,
        restore_maybe_folded,
    )
    from multimodalbrainsurvival_tpu.config import Config
    from multimodalbrainsurvival_tpu.serving import load_artifact
    from multimodalbrainsurvival_tpu.train.adapters import MILAdapter

    # --- float (fold_bn) export through the CLI
    cfg_f = dict(cfg)
    cfg_f["fold_bn"] = True
    cfg_f["export_path"] = str(tmp_path / "art_float")
    p = tmp_path / "cfg_export.json"
    p.write_text(json.dumps(cfg_f))
    export_model.main(["--config", str(p)])

    art = load_artifact(cfg_f["export_path"])
    assert art.meta["fold_bn"] is True and art.meta["arch"] == "resnet18"

    # reference comparison: the in-process serving adapter on a real batch
    config = Config(cfg_f)
    datasets = build_datasets(config, False)
    probe = next(datasets["train"].batches(2))
    model = build_mil_model(config, fold_bn=True)
    adapter = MILAdapter(model=model)
    variables = restore_maybe_folded(
        config, adapter, MILAdapter(model=build_mil_model(config)), probe, 42
    )
    arrays = {
        "patch_bag": jnp.asarray(probe["patch_bag"]),
        "bag_mask": jnp.asarray(probe["bag_mask"], jnp.float32),
        "sample_mask": jnp.asarray(probe["sample_mask"]),
    }
    want = adapter.extract(variables, arrays)
    got = art.call(arrays["patch_bag"], arrays["bag_mask"])
    np.testing.assert_allclose(
        np.asarray(got["embedding"]), np.asarray(want), rtol=1e-5, atol=1e-5
    )

    # --- int8 export: calibrated on real cohort pixels, matches the
    # QuantizedMILAdapter serving path
    cfg_q = dict(cfg)
    cfg_q["quantize"] = "int8"
    cfg_q["export_path"] = str(tmp_path / "art_int8")
    pq = tmp_path / "cfg_export_int8.json"
    pq.write_text(json.dumps(cfg_q))
    export_model.main(["--config", str(pq)])

    art_q = load_artifact(cfg_q["export_path"])
    assert art_q.meta["quantize"] == "int8"
    qvariables, qadapter = quantize_serving(
        Config(cfg_q), model, adapter, variables, probe
    )
    want_q = qadapter.extract(qvariables, arrays)
    got_q = art_q.call(arrays["patch_bag"], arrays["bag_mask"])
    np.testing.assert_allclose(
        np.asarray(got_q["embedding"]), np.asarray(want_q),
        rtol=1e-4, atol=1e-4,
    )


def test_export_table_int8_roundtrip(tmp_path):
    """table_serving with variables["qtree"]: the artifact serves the int8
    encoder (models/quantize.quantized_mlp) + float head, matches the
    QuantizedTableAdapter numerics exactly, and stays batch-polymorphic."""
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.models.quantize import (
        quantize_rna_encoder,
        quantized_mlp,
    )
    from multimodalbrainsurvival_tpu.serving import (
        export_table_artifact,
        load_artifact,
    )

    model = RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(64, 32), dropout=0.0))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 48)), train=False)
    qv = {"params": v["params"], "qtree": quantize_rna_encoder(v)}
    meta = export_table_artifact(model, qv, str(tmp_path / "rna8"),
                                 in_features=48, kind="rna_serving")
    assert meta["quantize"] == "int8"

    art = load_artifact(str(tmp_path / "rna8"))
    rng = np.random.default_rng(9)
    for B in (3, 6):
        x = jnp.asarray(rng.normal(size=(B, 48)).astype(np.float32))
        got = art.call(x)
        want_emb = quantized_mlp(qv["qtree"], x)
        np.testing.assert_allclose(
            np.asarray(got["embedding"]), np.asarray(want_emb),
            rtol=1e-5, atol=1e-6,
        )
        want_scores = model.apply({"params": v["params"]}, want_emb,
                                  method="from_embedding")
        np.testing.assert_allclose(
            np.asarray(got["scores"]), np.asarray(want_scores),
            rtol=1e-5, atol=1e-6,
        )


def test_export_joint_int8_rna_roundtrip(tmp_path):
    """joint_serving with BOTH qtrees: the artifact runs int8 ResNet + int8
    RNA encoder + float fusion tail, matching QuantizedJointAdapter."""
    from multimodalbrainsurvival_tpu.models import (
        BagHistopathologyRNAModel,
        RNAEncoder,
        resnet18,
    )
    from multimodalbrainsurvival_tpu.models.folding import (
        fold_resnet_variables,
    )
    from multimodalbrainsurvival_tpu.models.quantize import (
        quantize_mil_resnet,
        quantize_rna_encoder,
    )
    from multimodalbrainsurvival_tpu.serving import (
        export_joint_artifact,
        load_artifact,
    )
    from multimodalbrainsurvival_tpu.train.adapters import (
        QuantizedJointAdapter,
    )

    def build(fold):
        return BagHistopathologyRNAModel(
            resnet=resnet18(fold_bn=fold),
            rna_encoder=RNAEncoder(hidden_dims=(16, 8), dropout=0.0),
            head_dropout=0.0,
        )

    stock = build(False)
    v = stock.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 1, 32, 32, 3)),
        jnp.zeros((1, 10)), train=False,
    )
    folded = fold_resnet_variables(v)
    rng = np.random.default_rng(4)
    cal_bag = rng.integers(0, 255, (2, 2, 32, 32, 3), dtype=np.uint8)
    qv = dict(folded)
    qv["qtree"] = quantize_mil_resnet(folded, [cal_bag], arch="resnet18")
    qv["qtree_rna"] = quantize_rna_encoder(folded, submodule="rna_encoder")

    model = build(True)
    meta = export_joint_artifact(
        model, qv, str(tmp_path / "joint8"), img_size=32,
        rna_features=10, arch="resnet18",
    )
    assert meta["quantize"] == "int8"

    art = load_artifact(str(tmp_path / "joint8"))
    adapter = QuantizedJointAdapter(model=model, arch="resnet18")
    for B, bag in ((2, 3), (3, 2)):
        arrays = {
            "patch_bag": jnp.asarray(
                rng.integers(0, 255, (B, bag, 32, 32, 3), dtype=np.uint8)
            ),
            "bag_mask": jnp.asarray(np.ones((B, bag), np.float32)),
            "sample_mask": jnp.ones((B,), bool),
            "rna_data": jnp.asarray(
                rng.normal(size=(B, 10)).astype(np.float32)
            ),
        }
        got = art.call(arrays["patch_bag"], arrays["bag_mask"],
                       arrays["rna_data"])
        want_scores, _ = adapter.apply(qv, arrays, train=False)
        want_emb = adapter.extract(qv, arrays)
        np.testing.assert_allclose(
            np.asarray(got["scores"]), np.asarray(want_scores),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got["embedding"]), np.asarray(want_emb),
            rtol=1e-5, atol=1e-5,
        )
