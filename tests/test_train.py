"""Train infra: torch-Adam parity, freeze ladder, checkpoints, CLI e2e."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.helpers import make_survival_csv

from multimodalbrainsurvival_tpu.train.optim import (
    build_grouped_optimizer,
    mil_freeze_ladder,
    path_prefix_match,
    torch_adam,
)


def test_torch_adam_parity():
    """optax chain must match torch.optim.Adam(weight_decay=...) trajectories."""
    import torch

    # note: avoid grad == -wd*param (exact cancellation makes Adam amplify
    # sub-ulp fp32 ordering differences between torch and optax)
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.5, 0.1, -0.45], np.float32)

    wt = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.Adam([wt], lr=0.01, weight_decay=0.1)
    for _ in range(5):
        wt.grad = torch.tensor(g)
        opt.step()

    tx = torch_adam(0.01, weight_decay=0.1)
    wj = jnp.array(w0)
    state = tx.init(wj)
    for _ in range(5):
        updates, state = tx.update(jnp.array(g), state, wj)
        wj = wj + updates
    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(), rtol=1e-5)


def test_freeze_ladder_labels():
    params = {
        "fc": {"kernel": jnp.ones((2, 1))},
        "aggregator": {"vector": jnp.ones((4,))},
        "resnet": {
            "conv1": {"kernel": jnp.ones((1, 1, 3, 4))},
            "bn1": {"scale": jnp.ones(4)},
            "layer1_0": {"conv1": {"kernel": jnp.ones((1, 1, 4, 4))}},
            "layer4_1": {"conv2": {"kernel": jnp.ones((1, 1, 4, 4))}},
            "fc": {"kernel": jnp.ones((4, 10))},
        },
    }
    match = mil_freeze_ladder(2)  # fc + layer4 (+ aggregator)
    tx, labels = build_grouped_optimizer(
        params, [("train", match, torch_adam(0.1))]
    )
    assert labels["fc"]["kernel"] == "train"
    assert labels["aggregator"]["vector"] == "train"
    assert labels["resnet"]["layer4_1"]["conv2"]["kernel"] == "train"
    assert labels["resnet"]["layer1_0"]["conv1"]["kernel"] == "_frozen"
    assert labels["resnet"]["conv1"]["kernel"] == "_frozen"
    assert labels["resnet"]["bn1"]["scale"] == "_frozen"
    # resnet's own 1000-class fc must NOT match the head's "fc" spec
    assert labels["resnet"]["fc"]["kernel"] == "_frozen"

    # frozen params receive zero updates
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.asarray(updates["resnet"]["conv1"]["kernel"]) == 0)
    assert np.any(np.asarray(updates["fc"]["kernel"]) != 0)


def test_grouped_lrs_differ():
    params = {"encoder": {"k": jnp.ones(3)}, "final": {"k": jnp.ones(3)}}
    tx, _ = build_grouped_optimizer(
        params,
        [
            ("rna", path_prefix_match("encoder"), torch_adam(1e-2)),
            ("mlp", path_prefix_match("final"), torch_adam(1e-4)),
        ],
    )
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    assert abs(float(updates["encoder"]["k"][0])) > abs(
        float(updates["final"]["k"][0])
    ) * 50


def test_checkpoint_roundtrip(tmp_path):
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.int32(7),
    }
    ck = Checkpointer()
    path = str(tmp_path / "ckpt")
    ck.save(path, state)
    assert Checkpointer.exists(path)
    restored = ck.restore(path, state)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    assert int(restored["step"]) == 7


@pytest.fixture
def rna_experiment(tmp_path):
    """Tiny RNA experiment: CSVs + reference-schema config."""
    for split, n in [("train", 24), ("val", 12), ("test", 12)]:
        make_survival_csv(
            str(tmp_path / f"rna_{split}.csv"),
            [f"{split}{i}" for i in range(n)],
            n_rna=16,
            seed=hash(split) % 1000,
        )
    cfg = {
        "batch_size": 8,
        "use_cuda": False,
        "train_csv_path": str(tmp_path / "rna_train.csv"),
        "val_csv_path": str(tmp_path / "rna_val.csv"),
        "test_csv_path": str(tmp_path / "rna_test.csv"),
        "num_workers": 1,
        "num_epochs": 2,
        "lr_rna": 1e-4,
        "lr_mlp": 1e-4,
        "weight_decay": 1e-5,
        "flag": "rna_model",
        "checkpoint_path": str(tmp_path / "out") + "/",
        "summary_path": str(tmp_path / "out/summary") + "/",
        "restore_path": "",
        "model_path": "",
    }
    cfg_path = tmp_path / "config_rna_train.json"
    cfg_path.write_text(json.dumps(cfg))
    return tmp_path, cfg, cfg_path


def test_rna_cli_end_to_end(rna_experiment):
    """train → savescore → extractfeatures through the real CLI mains."""
    tmp_path, cfg, cfg_path = rna_experiment
    from multimodalbrainsurvival_tpu.cli import (
        rna_extractfeatures,
        rna_savescore,
        rna_train,
    )

    rna_train.main(["--config", str(cfg_path)])
    save_dir = tmp_path / "out/models/rna_model"
    assert (save_dir / "model_last").is_dir()
    assert (save_dir / "model_dict_best").is_dir()
    out_dir = tmp_path / "out/outputs/rna_model"
    for split in ("train", "val", "test"):
        for tag in ("last", "best"):
            f = out_dir / f"{split}_output_{tag}.csv"
            assert f.is_file()
            header = f.read_text().splitlines()[0]
            assert header == "id,score,survival_months,vital_status"

    cfg2 = dict(cfg)
    cfg2["model_path"] = str(save_dir / "model_last")
    cfg2["output_path"] = str(tmp_path / "scores") + "/"
    p2 = tmp_path / "cfg_savescore.json"
    p2.write_text(json.dumps(cfg2))
    rna_savescore.main(["--config", str(p2)])
    assert (tmp_path / "scores/rna_val_df.csv").is_file()

    cfg3 = dict(cfg2)
    cfg3["output_path"] = str(tmp_path / "feats") + "/"
    p3 = tmp_path / "cfg_extract.json"
    p3.write_text(json.dumps(cfg3))
    rna_extractfeatures.main(["--config", str(p3)])
    feats = np.loadtxt(tmp_path / "feats/rna_features_val.csv", delimiter=",")
    assert feats.shape == (12, 2048)


def test_quick_flag_limits_epochs(rna_experiment):
    tmp_path, cfg, cfg_path = rna_experiment
    from multimodalbrainsurvival_tpu.cli import rna_train

    rna_train.main(["--config", str(cfg_path), "--quick", "1"])
    # quick run: only model_last guaranteed (best requires epoch > 0)
    assert (tmp_path / "out/models/rna_model/model_last").is_dir()
