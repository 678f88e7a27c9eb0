"""LR schedules, global-norm gradient clipping, and early stopping.

TPU-native training extensions — the reference trains at a constant Adam LR
with no clipping and always runs every epoch (2_HistoPath_train.py:552-559,
:286-383). Pinned here:

- ``relative_lr_schedule`` factor shapes: warmup ramp, cosine/linear/step
  decay endpoints, torch-``StepLR``-shaped staircase, input validation;
- ``wrap_optimizer`` is a strict no-op (same object) with no knobs, so plain
  runs keep an identical optimizer-state tree / checkpoint layout;
- clipping matches ``torch.nn.utils.clip_grad_norm_`` (one global norm over
  the full tree) numerically;
- the schedule multiplies the FINAL update, i.e. every parameter group's own
  base LR shares one decay shape;
- ``tune_optimizer`` config wiring (no keys → untouched tx) and the
  ``early_stop_*`` config keys;
- ``train_model`` stops after ``early_stop_patience`` stale val epochs and
  still runs the post-training tail.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodalbrainsurvival_tpu.train.optim import (
    relative_lr_schedule,
    torch_adam,
    wrap_optimizer,
)


def test_schedule_warmup_ramp_and_constant_tail():
    s = relative_lr_schedule("constant", total_steps=100, warmup_steps=4)
    got = [float(s(c)) for c in range(6)]
    np.testing.assert_allclose(got, [0.25, 0.5, 0.75, 1.0, 1.0, 1.0])


def test_schedule_cosine_endpoints_and_midpoint():
    s = relative_lr_schedule("cosine", total_steps=100, min_factor=0.1)
    np.testing.assert_allclose(float(s(0)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(s(50)), 0.1 + 0.9 * 0.5, atol=1e-6)
    np.testing.assert_allclose(float(s(100)), 0.1, atol=1e-6)
    np.testing.assert_allclose(float(s(10_000)), 0.1, atol=1e-6)  # clamped


def test_schedule_linear():
    s = relative_lr_schedule("linear", total_steps=10, min_factor=0.0)
    np.testing.assert_allclose(float(s(5)), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(s(10)), 0.0, atol=1e-6)


def test_schedule_step_staircase():
    # torch StepLR shape: gamma ** floor(step / step_every)
    s = relative_lr_schedule(
        "step", total_steps=100, step_every=10, step_gamma=0.5,
        min_factor=0.2,
    )
    np.testing.assert_allclose(float(s(0)), 1.0)
    np.testing.assert_allclose(float(s(9)), 1.0)
    np.testing.assert_allclose(float(s(10)), 0.5)
    np.testing.assert_allclose(float(s(25)), 0.25)
    np.testing.assert_allclose(float(s(90)), 0.2)  # floored at min_factor


def test_schedule_warmup_composes_with_decay():
    s = relative_lr_schedule("linear", total_steps=12, warmup_steps=2)
    np.testing.assert_allclose(float(s(0)), 0.5)
    np.testing.assert_allclose(float(s(1)), 1.0)
    # decay spans the remaining 10 steps
    np.testing.assert_allclose(float(s(7)), 0.5, atol=1e-6)


def test_schedule_validation():
    with pytest.raises(ValueError, match="expected one of"):
        relative_lr_schedule("exponential", total_steps=10)
    with pytest.raises(ValueError, match="step_every"):
        relative_lr_schedule("step", total_steps=10)
    with pytest.raises(ValueError, match="total_steps"):
        relative_lr_schedule("cosine", total_steps=0)


def test_wrap_optimizer_no_knobs_is_identity():
    tx = torch_adam(1e-3, 0.0)
    assert wrap_optimizer(tx) is tx


def test_wrap_optimizer_rejects_bad_clip():
    with pytest.raises(ValueError, match="grad_clip_norm"):
        wrap_optimizer(optax.sgd(1.0), grad_clip_norm=0.0)


def _grad_tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "a": {"kernel": jnp.asarray(rng.normal(size=(3, 4)), jnp.float32)},
        "b": jnp.asarray(rng.normal(size=(5,)) * 3.0, jnp.float32),
    }


def test_global_norm_clip_matches_torch():
    """One norm across the FULL tree, exactly
    torch.nn.utils.clip_grad_norm_(parameters, max_norm) semantics."""
    import torch

    grads = _grad_tree()
    params = jax.tree.map(jnp.zeros_like, grads)
    max_norm = 1.5

    tx = wrap_optimizer(optax.sgd(1.0), grad_clip_norm=max_norm)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)

    tgrads = [torch.tensor(np.asarray(g)) for g in jax.tree.leaves(grads)]
    tparams = [torch.nn.Parameter(torch.zeros_like(g)) for g in tgrads]
    for p, g in zip(tparams, tgrads):
        p.grad = g.clone()
    torch.nn.utils.clip_grad_norm_(tparams, max_norm)

    for got, want_p in zip(jax.tree.leaves(updates), tparams):
        # sgd(1.0) update == -clipped_grad
        np.testing.assert_allclose(
            np.asarray(got), -want_p.grad.numpy(), rtol=1e-6, atol=1e-7
        )

    # norm already under the cap → untouched
    small = jax.tree.map(lambda g: g * 1e-3, grads)
    updates, _ = tx.update(small, tx.init(params), params)
    for got, g in zip(jax.tree.leaves(updates), jax.tree.leaves(small)):
        np.testing.assert_allclose(np.asarray(got), -np.asarray(g), rtol=1e-6)


def test_schedule_multiplies_every_groups_base_lr():
    """The relative factor scales the FINAL update, so grouped per-LR
    transforms (lr_rna vs lr_mlp, 1_GeneExpress_train.py:303-305) share one
    decay shape."""
    grads = _grad_tree()
    params = jax.tree.map(jnp.zeros_like, grads)
    sched = relative_lr_schedule("constant", total_steps=8, warmup_steps=4)

    base = optax.sgd(1.0)
    tx = wrap_optimizer(base, schedule=sched)
    state = tx.init(params)
    for count in range(3):
        updates, state = tx.update(grads, state, params)
        factor = (count + 1) / 4.0
        for got, g in zip(jax.tree.leaves(updates), jax.tree.leaves(grads)):
            np.testing.assert_allclose(
                np.asarray(got), -factor * np.asarray(g), rtol=1e-6
            )


def test_tune_optimizer_config_wiring():
    from multimodalbrainsurvival_tpu.cli._common import tune_optimizer
    from multimodalbrainsurvival_tpu.config import Config

    tx = optax.sgd(1.0)
    plain = Config({"task": "survival_prediction"})
    assert tune_optimizer(tx, plain, 100, num_epochs=2, batch_size=8) is tx

    cfg = Config({
        "lr_schedule": "linear", "warmup_steps": 2, "grad_clip_norm": 10.0,
    })
    # n=16, batch=8 → 2 steps/epoch × 2 epochs = 4 total; warmup 2, decay 2
    wrapped = tune_optimizer(tx, cfg, 16, num_epochs=2, batch_size=8)
    assert wrapped is not tx
    grads = _grad_tree()
    params = jax.tree.map(jnp.zeros_like, grads)
    state = wrapped.init(params)
    factors = []
    for _ in range(4):
        updates, state = wrapped.update(grads, state, params)
        ref = jax.tree.leaves(grads)[0]
        factors.append(
            float(np.asarray(jax.tree.leaves(updates)[0])[0, 0]
                  / -np.asarray(ref)[0, 0])
        )
    # warmup counts 0-1 ramp 0.5→1.0; decay counts 2-3 span progress 0→0.5
    np.testing.assert_allclose(factors, [0.5, 1.0, 1.0, 0.5], atol=1e-6)


def test_early_stop_kwargs_defaults_and_values():
    from multimodalbrainsurvival_tpu.cli._common import early_stop_kwargs
    from multimodalbrainsurvival_tpu.config import Config

    assert early_stop_kwargs(Config({})) == {
        "early_stop_patience": 0, "early_stop_min_delta": 0.0,
    }
    got = early_stop_kwargs(
        Config({"early_stop_patience": 3, "early_stop_min_delta": 1e-3})
    )
    assert got == {"early_stop_patience": 3, "early_stop_min_delta": 1e-3}


class _TinyMLP(nn.Module):
    out: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        return nn.Dense(self.out)(nn.relu(nn.Dense(8)(x)))

    def extract(self, x, train=False):
        return x


def test_early_stopping_stops_and_runs_tail(tmp_path, capsys):
    """lr=0 → the val loss never improves after epoch 0; patience=2 must
    stop after epoch 2 (3 of 10 epochs) and the post-training tail (final
    evals / output frames) still runs."""
    from tests.helpers import make_survival_csv
    from multimodalbrainsurvival_tpu.data.tables import FeatureTableDataset
    from multimodalbrainsurvival_tpu.train import TrainSettings, train_model
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter

    path = str(tmp_path / "es.csv")
    make_survival_csv(path, [f"c{i}" for i in range(8)], n_feature=4, seed=0)
    ds = FeatureTableDataset(path)
    adapter = TableAdapter(model=_TinyMLP())

    settings = TrainSettings(
        num_epochs=10, task="survival_prediction", batch_size=8,
        target_label="vital_status", log_interval=100, seed=3,
        eval_splits_during_training=("val",),
        early_stop_patience=2,
    )
    last, best, outputs = train_model(
        adapter, {"train": ds, "val": ds}, optax.sgd(0.0), settings,
        rng=jax.random.PRNGKey(0),
    )
    out = capsys.readouterr().out
    assert "Early stopping at epoch 2" in out
    assert out.count("VAL Loss") == 3
    assert last is not None and any(k.startswith("val") for k in outputs)

    # patience=0 (default) never stops
    import dataclasses
    settings2 = dataclasses.replace(
        settings, early_stop_patience=0, num_epochs=5
    )
    train_model(
        adapter, {"train": ds, "val": ds}, optax.sgd(0.0), settings2,
        rng=jax.random.PRNGKey(0),
    )
    out2 = capsys.readouterr().out
    assert "Early stopping" not in out2
    assert out2.count("VAL Loss") == 5
