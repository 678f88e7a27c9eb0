"""Streaming slide→features serving CLI (``cli/slide_extractfeatures.py``).

The single-command WSI→features path must produce exactly what the two-step
reference workflow (tile to disk with ``wsi2patches``, then encode the patch
directory) produces: same tiles in the same order, same per-patch
embeddings, and a slide score equal to running the aggregator tail over one
slide-spanning bag.
"""

from __future__ import annotations

import json
import os

import cv2
import numpy as np
import pandas as pd
import pytest


def _make_slide(path: str, seed: int) -> None:
    rng = np.random.default_rng(seed)
    slide = np.full((512, 512, 3), 255, np.uint8)
    noise = rng.integers(0, 60, size=(256, 320, 3), dtype=np.uint8)
    slide[128:384, 64:384] = np.array([200, 120, 160], np.uint8) - noise // 2
    cv2.imwrite(path, slide[:, :, ::-1])


def _base_config(tmp_path, ckpt: str) -> dict:
    return {
        "model_name": "resnet18", "num_classes": 1,
        "aggregator": "identity", "aggregator_hdim": 512,
        "img_size": 64, "batch_size": 8, "max_patches_per_slide": 24,
        "compute_dtype": "float32",  # bf16 noise off: exactness is the point
        "model_path": ckpt,
        "slide_csv_path": str(tmp_path / "slides.csv"),
        "slide_path": str(tmp_path),
        "output_path": str(tmp_path / "out"),
        "save_patch_features": True,
        "use_cuda": False,
    }


@pytest.fixture
def cohort(tmp_path):
    """Two synthetic slides (one case), a seeded checkpoint, a config dict."""
    import jax
    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.cli.histo_train import build_mil_model
    from multimodalbrainsurvival_tpu.config import Config
    from multimodalbrainsurvival_tpu.train.adapters import MILAdapter
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    for i, name in enumerate(("S1", "S2")):
        _make_slide(str(tmp_path / f"{name}.png"), seed=i)
    pd.DataFrame(
        {"wsi_file_name": ["S1.png", "S2.png"], "case": ["c1", "c1"]}
    ).to_csv(tmp_path / "slides.csv", index=False)

    ckpt = str(tmp_path / "ckpt")
    cfg = _base_config(tmp_path, ckpt)
    model = build_mil_model(Config(cfg))
    adapter = MILAdapter(model=model)
    probe = {
        "patch_bag": jnp.zeros((1, 1, 64, 64, 3), jnp.uint8),
        "bag_mask": jnp.ones((1, 1), bool),
        "sample_mask": jnp.ones((1,), bool),
    }
    variables = adapter.init(jax.random.PRNGKey(0), probe)
    Checkpointer().save(ckpt, variables, block=True)
    return cfg, model, variables


def _run_cli(tmp_path, cfg: dict):
    from multimodalbrainsurvival_tpu.cli import slide_extractfeatures as sx

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    sx.main(["--config", str(cfg_path)])


def _twostep_patches(tmp_path, name: str,
                     max_patches: int = 24) -> tuple[np.ndarray, list]:
    """Oracle tiles via the artifact-writing path (what wsi2patches runs)."""
    from multimodalbrainsurvival_tpu.data.tiler import (
        TileConfig,
        extract_patches,
    )

    cfg = TileConfig(patch_size=64, max_patches_per_slide=max_patches)
    extract_patches(str(tmp_path / f"{name}.png"), str(tmp_path / "patches"),
                    str(tmp_path / "masks"), cfg)
    pdir = tmp_path / "patches" / name
    lines = open(pdir / "loc.txt").read().splitlines()[2:]
    patches = np.stack([
        cv2.imread(str(pdir / f"{name}_patch_{i}.png"))[:, :, ::-1]
        for i in range(len(lines))
    ])
    locs = [(int(ln.split()[1]), int(ln.split()[2])) for ln in lines]
    return patches, locs


def test_streaming_slide_features_match_twostep(tmp_path, cohort):
    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches

    cfg, model, variables = cohort
    _run_cli(tmp_path, cfg)
    out = tmp_path / "out"

    slide_embs = []
    for name in ("S1", "S2"):
        patches, want_locs = _twostep_patches(tmp_path, name)
        got = np.load(out / "patch_features" / f"{name}_features.npy")
        assert got.shape == (len(patches), 512)

        # 1. the streamed tiles are the tiler's tiles, in the tiler's order
        locs = pd.read_csv(out / "patch_features" / f"{name}_patches.csv")
        assert list(zip(locs["x"], locs["y"])) == want_locs
        # identity aggregator → uniform attention of 1.0 per real patch
        np.testing.assert_allclose(locs["attention"], 1.0)

        # 2. per-patch embeddings == bare ResNet on those pixels (the CLI
        # computes them in padded batches of 8; equality within f32 ulp)
        x = preprocess_patches(jnp.asarray(patches), train=False)
        want = model.resnet.apply(
            {"params": variables["params"]["resnet"],
             "batch_stats": variables["batch_stats"]["resnet"]},
            x, train=False, method="extract",
        )
        np.testing.assert_allclose(got, np.asarray(want, np.float32),
                                   rtol=1e-4, atol=1e-5)

        # 3. slide score == aggregator tail over ONE slide-spanning bag,
        # computed here UNPADDED (so the CLI's 128-bucket padding+mask is
        # also checked for no-op-ness)
        n = len(patches)
        emb, _ = model.apply(
            variables, got[None], mask=np.ones((1, n), bool), train=False,
            method="extract_from_feats",
        )
        score, _ = model.apply(
            variables, got[None], mask=np.ones((1, n), bool), train=False,
            method="from_feats",
        )
        slide_embs.append(np.asarray(emb)[0])
        frame = pd.read_csv(out / "slide_scores.csv").set_index("slide")
        assert int(frame.loc[name, "n_patches"]) == n
        np.testing.assert_allclose(frame.loc[name, "score"],
                                   float(score[0, 0]), rtol=1e-4, atol=1e-5)

    # 4. the per-case frame pair is the extractfeatures contract: one case,
    # features = mean of the two slide embeddings
    cases = pd.read_csv(out / "pathology_cases_slides.csv", index_col=0)
    assert list(cases["0"]) == ["c1"]
    feats = np.loadtxt(out / "pathology_features_slides.csv", delimiter=",")
    np.testing.assert_allclose(
        feats, np.mean(slide_embs, axis=0), rtol=1e-4, atol=1e-5
    )


def test_streaming_slide_features_mesh_dp(tmp_path, cohort):
    """mesh {"dp": 2}: dp-sharded patch batches + replicated params produce
    the identical artifacts (multi-chip serving path on the virtual mesh)."""
    cfg, _, _ = cohort
    _run_cli(tmp_path, cfg)
    single = pd.read_csv(tmp_path / "out" / "slide_scores.csv")

    cfg2 = dict(cfg, output_path=str(tmp_path / "out_mesh"),
                mesh={"dp": 2})
    _run_cli(tmp_path, cfg2)
    sharded = pd.read_csv(tmp_path / "out_mesh" / "slide_scores.csv")

    assert list(sharded["slide"]) == list(single["slide"])
    assert list(sharded["n_patches"]) == list(single["n_patches"])
    np.testing.assert_allclose(sharded["score"], single["score"],
                               rtol=1e-5, atol=1e-6)
    for name in ("S1", "S2"):
        a = np.load(tmp_path / "out" / "patch_features" / f"{name}_features.npy")
        b = np.load(tmp_path / "out_mesh" / "patch_features" / f"{name}_features.npy")
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_streaming_slide_attention_aggregator(tmp_path):
    """TanhAttention through the slide CLI: the exported per-patch attention
    is a distribution over the slide's real tiles (sums to 1)."""
    import jax
    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.cli.histo_train import build_mil_model
    from multimodalbrainsurvival_tpu.config import Config
    from multimodalbrainsurvival_tpu.train.adapters import MILAdapter
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    _make_slide(str(tmp_path / "S1.png"), seed=3)
    pd.DataFrame({"wsi_file_name": ["S1.png"]}).to_csv(
        tmp_path / "slides.csv", index=False
    )
    ckpt = str(tmp_path / "ckpt")
    cfg = dict(_base_config(tmp_path, ckpt), aggregator="attention",
               max_patches_per_slide=12)
    model = build_mil_model(Config(cfg))
    adapter = MILAdapter(model=model)
    probe = {
        "patch_bag": jnp.zeros((1, 1, 64, 64, 3), jnp.uint8),
        "bag_mask": jnp.ones((1, 1), bool),
        "sample_mask": jnp.ones((1,), bool),
    }
    # non-zero attention vector so the weights are NOT uniform by init
    import flax

    variables = flax.core.unfreeze(adapter.init(jax.random.PRNGKey(0), probe))
    params = variables["params"]
    vec = params["aggregator"]["vector"]
    params["aggregator"]["vector"] = (
        jax.random.normal(jax.random.PRNGKey(1), vec.shape) * 0.1
    )
    Checkpointer().save(ckpt, variables, block=True)

    _run_cli(tmp_path, cfg)
    locs = pd.read_csv(
        tmp_path / "out" / "patch_features" / "S1_patches.csv"
    )
    att = locs["attention"].to_numpy()
    assert att.shape[0] == 12 and (att > 0).all()
    np.testing.assert_allclose(att.sum(), 1.0, rtol=1e-4)
    assert att.std() > 0  # genuinely non-uniform under the random vector


@pytest.fixture
def joint_cohort(tmp_path):
    """Two slides + a joint-style cohort CSV (rna_* columns, survival
    labels, extension-less wsi names), a seeded joint checkpoint, config."""
    import jax
    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.cli.joint_train import build_joint_model
    from multimodalbrainsurvival_tpu.config import Config
    from multimodalbrainsurvival_tpu.train.adapters import JointAdapter
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    rng = np.random.default_rng(11)
    n_rna = 50
    for i, name in enumerate(("S1", "S2")):
        _make_slide(str(tmp_path / f"{name}.png"), seed=i)
    df = pd.DataFrame({
        # extension-LESS names, joint_example.csv style (the reference joint
        # dataset uses wsi_file_name verbatim as a directory name)
        "case": ["c1", "c2"], "wsi_file_name": ["S1", "S2"],
        "survival_months": [12.0, 30.0], "vital_status": [1, 1],
    })
    for g in range(n_rna):
        df[f"rna_{g}"] = rng.normal(size=2).astype(np.float32)
    df.to_csv(tmp_path / "joint.csv", index=False)

    ckpt = str(tmp_path / "ckpt")
    cfg = {
        "model_name": "resnet18", "num_classes": 1,
        "img_size": 64, "batch_size": 8, "max_patches_per_slide": 12,
        "compute_dtype": "float32", "model_path": ckpt,
        "slide_csv_path": str(tmp_path / "joint.csv"),
        "slide_path": str(tmp_path),
        "output_path": str(tmp_path / "out"), "use_cuda": False,
    }
    model = build_joint_model(Config(cfg))
    adapter = JointAdapter(model=model)
    probe = {
        "patch_bag": jnp.zeros((1, 1, 64, 64, 3), jnp.uint8),
        "bag_mask": jnp.ones((1, 1), bool),
        "sample_mask": jnp.ones((1,), bool),
        "rna_data": jnp.zeros((1, n_rna), jnp.float32),
    }
    variables = adapter.init(jax.random.PRNGKey(0), probe)
    Checkpointer().save(ckpt, variables, block=True)
    return cfg, model, variables, df, n_rna


def _run_joint_cli(tmp_path, cfg: dict):
    from multimodalbrainsurvival_tpu.cli import slide_joint_savescore as sj

    cfg_path = tmp_path / "jcfg.json"
    cfg_path.write_text(json.dumps(cfg))
    sj.main(["--config", str(cfg_path)])


def test_streaming_joint_savescore(tmp_path, capsys, joint_cohort):
    """Bimodal streaming scoring (``cli/slide_joint_savescore.py``): slides
    + RNA rows → joint scores that equal the joint model applied to the
    two-step pipeline's tiles, plus the case-level CI print."""
    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches

    cfg, model, variables, df, n_rna = joint_cohort
    _run_joint_cli(tmp_path, cfg)
    out_text = capsys.readouterr().out
    assert "case-level CI:" in out_text

    frame = pd.read_csv(tmp_path / "out" / "joint_slide_scores.csv")
    assert list(frame["slide"]) == ["S1", "S2"]
    assert list(frame["case"]) == ["c1", "c2"]
    assert list(frame["vital_status"]) == [1, 1]

    # oracle: tiles from the artifact-writing tiler, scored via the joint
    # model's own forward over ONE slide-spanning bag + the row's RNA
    for idx, name in enumerate(("S1", "S2")):
        patches, _ = _twostep_patches(tmp_path, name, max_patches=12)
        n = len(patches)
        assert int(frame.loc[idx, "n_patches"]) == n
        x = preprocess_patches(jnp.asarray(patches), train=False)
        feats = model.resnet.apply(
            {"params": variables["params"]["resnet"],
             "batch_stats": variables["batch_stats"]["resnet"]},
            x, train=False, method="extract",
        )
        rna = df.loc[[idx], [f"rna_{g}" for g in range(n_rna)]].to_numpy(
            np.float32
        )
        want = model.apply(
            variables, np.asarray(feats, np.float32)[None], rna,
            mask=np.ones((1, n), bool), train=False, method="from_feats",
        )
        np.testing.assert_allclose(
            frame.loc[idx, "score"], float(np.asarray(want)[0, 0]),
            rtol=1e-4, atol=1e-5,
        )


def test_streaming_joint_int8_and_mesh(tmp_path, joint_cohort):
    """The joint streaming CLI's advertised serving knobs are wired:
    quantize:int8 routes the joint variables through the int8 calibration
    and produces scores close to float; mesh {"dp": 2} reproduces the int8
    scores near-identically (wiring regressions would diverge or crash)."""
    cfg, _, _, _, _ = joint_cohort
    _run_joint_cli(tmp_path, cfg)
    flt = pd.read_csv(tmp_path / "out" / "joint_slide_scores.csv")

    cfg_i8 = dict(cfg, output_path=str(tmp_path / "out_i8"),
                  quantize="int8")
    _run_joint_cli(tmp_path, cfg_i8)
    i8 = pd.read_csv(tmp_path / "out_i8" / "joint_slide_scores.csv")
    assert list(i8["n_patches"]) == list(flt["n_patches"])
    # int8 rounding perturbs the image half of the fused embedding only
    # slightly (cosine > 0.99 pinned by the MIL int8 test); loose sanity
    # bound here — the tight assertion is the mesh-identity below
    np.testing.assert_allclose(i8["score"], flt["score"], rtol=0.3,
                               atol=0.1)

    cfg_mesh = dict(cfg_i8, output_path=str(tmp_path / "out_i8_mesh"),
                    mesh={"dp": 2})
    _run_joint_cli(tmp_path, cfg_mesh)
    mesh = pd.read_csv(tmp_path / "out_i8_mesh" / "joint_slide_scores.csv")
    np.testing.assert_allclose(mesh["score"], i8["score"], rtol=1e-5,
                               atol=1e-6)


def test_streaming_slide_features_int8(tmp_path, cohort):
    """quantize: "int8" — calibration on real tiles, embeddings close to the
    float path (per-sample cosine), scores finite."""
    cfg, _, _ = cohort
    _run_cli(tmp_path, cfg)

    cfg2 = dict(cfg, output_path=str(tmp_path / "out_int8"), quantize="int8")
    _run_cli(tmp_path, cfg2)

    frame = pd.read_csv(tmp_path / "out_int8" / "slide_scores.csv")
    assert np.isfinite(frame["score"]).all()
    for name in ("S1", "S2"):
        f32 = np.load(tmp_path / "out" / "patch_features" / f"{name}_features.npy")
        i8 = np.load(tmp_path / "out_int8" / "patch_features" / f"{name}_features.npy")
        cos = np.sum(f32 * i8, axis=1) / np.maximum(
            np.linalg.norm(f32, axis=1) * np.linalg.norm(i8, axis=1), 1e-9
        )
        assert cos.min() > 0.99, cos.min()


def test_check_mesh_batch_rejects_indivisible_batch():
    """Streaming batches shard over the mesh's dp axis; an indivisible
    batch_size must fail loudly at startup, not as an opaque XLA sharding
    error mid-slide."""
    from types import SimpleNamespace

    from multimodalbrainsurvival_tpu.cli.slide_extractfeatures import (
        check_mesh_batch,
    )

    check_mesh_batch(None, 7)  # no mesh: anything goes
    fn = SimpleNamespace(mesh=SimpleNamespace(shape={"dp": 4}))
    check_mesh_batch(fn, 8)
    with pytest.raises(ValueError, match="divisible by dp=4"):
        check_mesh_batch(fn, 6)
