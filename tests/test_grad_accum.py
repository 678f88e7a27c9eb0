"""Gradient accumulation (``TrainSettings.accumulate_steps``).

TPU-native extension — the reference trains only at its device batch size
(2_HistoPath_train.py:308-364 has no accumulation). Semantics pinned here:

- per-sample-mean losses (classification/NLLSurv): k-microbatch accumulation
  equals the single full-batch step exactly (mean of equal-count microbatch
  means == the full-batch mean), so ``accumulate_steps`` is a pure memory
  knob for those tasks;
- Cox partial likelihood: the risk set forms PER microbatch (torch-style
  gradient accumulation) — pinned against a manual two-microbatch
  computation with interleaved membership rows [i::k];
- BatchNorm running statistics update sequentially, one microbatch at a
  time, threaded through the lax.scan carry;
- dp-sharded batches run the scan path unchanged (virtual 8-device mesh);
- CLI wiring: ``accumulate_steps`` in a train config drives the scan path,
  and a non-dividing value fails loudly.
"""

import copy
import json

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tests.helpers import make_survival_csv
from multimodalbrainsurvival_tpu.data.tables import FeatureTableDataset
from multimodalbrainsurvival_tpu.ops import cox_partial_likelihood_loss
from multimodalbrainsurvival_tpu.train import TrainSettings, train_model
from multimodalbrainsurvival_tpu.train.adapters import TableAdapter


class _TinyMLP(nn.Module):
    """Dropout- and BN-free: the forward is rng-independent, so k=1 and k>1
    runs are comparable without replicating the loop's key stream."""

    out: int = 2

    @nn.compact
    def __call__(self, x, train=False):
        h = nn.relu(nn.Dense(16)(x))
        return nn.Dense(self.out)(h)

    def extract(self, x, train=False):
        return x


def _dataset(tmp_path, n, n_feature=6, seed=0):
    path = str(tmp_path / f"accum_{n}_{seed}.csv")
    make_survival_csv(
        path, [f"c{i}" for i in range(n)], n_feature=n_feature, seed=seed
    )
    return FeatureTableDataset(path)


def _settings(task, **kw):
    base = dict(
        num_epochs=2,
        task=task,
        num_classes=2 if task == "classification" else 1,
        target_label="vital_status",
        batch_size=8,
        eval_splits_during_training=(),
        log_interval=100,
        seed=3,
    )
    base.update(kw)
    return TrainSettings(**base)


def _train(ds, settings, variables, lr=0.05):
    adapter = TableAdapter(model=_TinyMLP(out=settings.num_classes))
    last, _, _ = train_model(
        adapter,
        {"train": ds},
        optax.sgd(lr),
        settings,
        variables=copy.deepcopy(variables),
        rng=jax.random.PRNGKey(7),
    )
    return last["params"]


def test_accumulated_step_matches_full_batch_for_per_sample_mean_loss(
    tmp_path,
):
    """classification: mean-of-microbatch-mean grads == full-batch grads
    (equal valid counts per microbatch), so k=1 vs k=4 params agree to
    float reassociation."""
    ds = _dataset(tmp_path, 16)  # 2 batches of 8, no padding
    adapter = TableAdapter(model=_TinyMLP())
    probe = next(ds.batches(8))
    variables = adapter.init(
        jax.random.PRNGKey(0), {"data": jnp.asarray(probe["data"])}
    )

    p1 = _train(ds, _settings("classification", accumulate_steps=1), variables)
    p4 = _train(ds, _settings("classification", accumulate_steps=4), variables)

    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        )


def test_cox_accumulation_builds_risk_sets_per_microbatch(tmp_path):
    """survival task, k=2, one batch, one epoch: the update must equal the
    manually computed mean of the two interleaved microbatches' Cox grads
    (each with its OWN risk set — torch-accumulation semantics)."""
    ds = _dataset(tmp_path, 8, seed=5)
    adapter = TableAdapter(model=_TinyMLP(out=1))
    probe = next(ds.batches(8))
    variables = adapter.init(
        jax.random.PRNGKey(0), {"data": jnp.asarray(probe["data"])}
    )
    settings = _settings(
        "survival_prediction", num_epochs=1, accumulate_steps=2
    )
    lr = 0.05
    got = _train(ds, settings, variables, lr=lr)

    # reconstruct the exact epoch-0 batch the loop consumes
    batch = next(ds.batches(8, shuffle=True, seed=settings.seed + 0))
    model = _TinyMLP(out=1)

    def cox_grads(params, rows):
        def loss(p):
            out = model.apply(
                {"params": p}, jnp.asarray(batch["data"][rows])
            )
            return cox_partial_likelihood_loss(
                out[:, 0],
                jnp.asarray(batch["survival_months"][rows]),
                jnp.asarray(batch["vital_status"][rows]),
                mask=jnp.asarray(batch["mask"][rows]),
                reference_parity=True,
            )

        return jax.grad(loss)(params)

    g0 = cox_grads(variables["params"], np.arange(0, 8, 2))
    g1 = cox_grads(variables["params"], np.arange(1, 8, 2))
    want = jax.tree.map(
        lambda p, a, b: p - lr * (a + b) / 2.0, variables["params"], g0, g1
    )
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        )


class _TinyBN(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        h = nn.Dense(8)(x)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, axis_name=None
        )(h)
        return nn.Dense(1)(h)


class _BNAdapter:
    """Minimal adapter-contract implementation with a mutable BN collection
    (TableAdapter is BN-free by design)."""

    sample_mask_key = "mask"
    array_keys = ("data", "mask")
    id_keys = ("case",)
    loader_kwargs: dict = {}

    def __init__(self, model):
        self.model = model

    def init(self, rng, arrays):
        return self.model.init(rng, arrays["data"], train=False)

    def apply(self, variables, arrays, *, train, rng=None):
        if train:
            out, upd = self.model.apply(
                variables, arrays["data"], train=True, mutable=["batch_stats"]
            )
            return out, upd["batch_stats"]
        return self.model.apply(variables, arrays["data"], train=False), None

    def extract(self, variables, arrays):
        return arrays["data"]


def test_batch_stats_thread_sequentially_through_microbatches(tmp_path):
    """BN running stats after one k=2 step == applying the model on
    microbatch 0 then (with microbatch-0 stats) on microbatch 1."""
    ds = _dataset(tmp_path, 8, seed=9)
    model = _TinyBN()
    adapter = _BNAdapter(model)
    probe = next(ds.batches(8))
    variables = adapter.init(
        jax.random.PRNGKey(0), {"data": jnp.asarray(probe["data"])}
    )
    settings = _settings(
        "survival_prediction", num_epochs=1, accumulate_steps=2
    )
    last, _, _ = train_model(
        adapter,
        {"train": ds},
        optax.sgd(0.05),
        settings,
        variables=copy.deepcopy(variables),
        rng=jax.random.PRNGKey(7),
    )

    batch = next(ds.batches(8, shuffle=True, seed=settings.seed + 0))
    stats = variables["batch_stats"]
    for i in range(2):
        _, upd = model.apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(batch["data"][i::2]),
            train=True,
            mutable=["batch_stats"],
        )
        stats = upd["batch_stats"]
    for a, b in zip(
        jax.tree.leaves(stats), jax.tree.leaves(last["batch_stats"])
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )


def test_accumulation_under_dp_sharding(tmp_path):
    """the scan path compiles and matches the unsharded run when batches are
    dp-sharded over the virtual 8-device mesh (the interleaved microbatch
    reshape must not force a resharding that changes results)."""
    from multimodalbrainsurvival_tpu.parallel import batch_device_put, make_mesh

    ds = _dataset(tmp_path, 16, seed=11)
    adapter = TableAdapter(model=_TinyMLP())
    probe = next(ds.batches(8))
    variables = adapter.init(
        jax.random.PRNGKey(0), {"data": jnp.asarray(probe["data"])}
    )

    plain = _train(
        ds, _settings("classification", accumulate_steps=2), variables
    )
    mesh = make_mesh(dp=4, mp=1)
    sharded = _train(
        ds,
        _settings(
            "classification",
            accumulate_steps=2,
            device_put_fn=batch_device_put(mesh),
        ),
        variables,
    )
    for a, b in zip(jax.tree.leaves(plain), jax.tree.leaves(sharded)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        )


def test_non_dividing_accumulate_steps_fails_loudly(tmp_path):
    ds = _dataset(tmp_path, 8)
    adapter = TableAdapter(model=_TinyMLP())
    probe = next(ds.batches(8))
    variables = adapter.init(
        jax.random.PRNGKey(0), {"data": jnp.asarray(probe["data"])}
    )
    with pytest.raises(ValueError, match="accumulate_steps"):
        train_model(
            adapter,
            {"train": ds},
            optax.sgd(0.05),
            _settings("classification", accumulate_steps=3),
            variables=variables,
            rng=jax.random.PRNGKey(7),
        )


def test_cli_wiring_accumulate_steps(tmp_path):
    """`accumulate_steps` in a reference-schema train config drives the
    accumulating step end-to-end through the feature-pipeline CLI."""
    from multimodalbrainsurvival_tpu.cli import feature_train

    for split, n in [("train", 16), ("val", 8), ("test", 8)]:
        make_survival_csv(
            str(tmp_path / f"f_{split}.csv"),
            [f"{split}{i}" for i in range(n)],
            n_feature=6,
            seed=hash(split) % 1000,
        )
    cfg = {
        "batch_size": 8,
        "use_cuda": False,
        "train_csv_path": str(tmp_path / "f_train.csv"),
        "val_csv_path": str(tmp_path / "f_val.csv"),
        "test_csv_path": str(tmp_path / "f_test.csv"),
        "num_workers": 1,
        "num_epochs": 1,
        "lr": 1e-4,
        "weight_decay": 1e-5,
        "flag": "feat_accum",
        "checkpoint_path": str(tmp_path / "out") + "/",
        "summary_path": str(tmp_path / "out/summary") + "/",
        "restore_path": "",
        "model_path": "",
        "accumulate_steps": 2,
    }
    cfg_path = tmp_path / "config_feature_train.json"
    cfg_path.write_text(json.dumps(cfg))
    feature_train.main(["--config", str(cfg_path)])
    assert (tmp_path / "out/models/feat_accum/model_last").is_dir()
