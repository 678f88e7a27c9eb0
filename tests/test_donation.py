"""Train-step buffer donation (``TrainSettings.donate_state``).

TPU-native extension: the jitted train step donates the incoming
params / batch_stats / opt_state buffers so XLA aliases the updated state
in place instead of double-buffering it (the reference's torch optimizer
mutates tensors in place and never pays the copy; a naive functional step
would — ``2_HistoPath_train.py:335-340``). Pinned here:

- the step really donates: the state arrays passed in are deleted after the
  call (and are NOT with ``donate_state=False``);
- batches and the PRNG key are never donated (device-cached batches are
  reused across steps);
- numerics are bit-identical with donation on/off;
- ``train_model`` protects caller-passed ``variables``: the same variables
  object drives two training runs (the documented pattern in
  tests/test_grad_accum.py) and stays readable afterwards.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodalbrainsurvival_tpu.train.loop import (
    TrainSettings,
    build_train_step,
    make_loss_fn,
    train_model,
)


class _TinyMLP(nn.Module):
    out: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        return nn.Dense(self.out)(nn.relu(nn.Dense(8)(x)))

    def extract(self, x, train=False):
        return x


def _step_fixture(donate_state: bool, accumulate_steps: int = 1):
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter

    adapter = TableAdapter(model=_TinyMLP())
    settings = TrainSettings(
        task="survival_prediction", batch_size=4, donate_state=donate_state,
        accumulate_steps=accumulate_steps,
    )
    loss_fn, _ = make_loss_fn(settings)

    def forward_loss(params, batch_stats, arrays, step_rng):
        out, new_stats = adapter.apply(
            {"params": params}, arrays, train=True, rng=step_rng
        )
        return loss_fn(out, arrays, arrays[adapter.sample_mask_key]), new_stats

    arrays = {
        "data": jnp.ones((4, 6), jnp.float32),
        "mask": jnp.ones((4,), bool),
        "survival_months": jnp.arange(1.0, 5.0),
        "vital_status": jnp.ones((4,), jnp.float32),
    }
    variables = adapter.init(jax.random.PRNGKey(0), arrays)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])
    step = build_train_step(settings, tx, forward_loss)
    return step, variables["params"], opt_state, arrays, jax.random.PRNGKey(1)


def _leaves_deleted(tree):
    return [leaf.is_deleted() for leaf in jax.tree.leaves(tree)]


def test_step_donates_state_not_batch():
    for k in (1, 2):  # plain and accumulation branches
        step, params, opt_state, arrays, rng = _step_fixture(True, k)
        new_params, _, new_opt, loss, _ = step(
            params, None, opt_state, arrays, rng
        )
        assert all(_leaves_deleted(params)), f"params not donated (k={k})"
        assert all(_leaves_deleted(opt_state)), f"opt_state not donated (k={k})"
        # batches and the key are NOT donated: reusable across steps
        assert not any(_leaves_deleted(arrays))
        assert not rng.is_deleted()
        step(new_params, None, new_opt, arrays, rng)  # arrays reuse works
        assert np.isfinite(float(loss))


def test_donate_state_false_leaves_inputs_alive():
    step, params, opt_state, arrays, rng = _step_fixture(False)
    step(params, None, opt_state, arrays, rng)
    assert not any(_leaves_deleted(params))
    assert not any(_leaves_deleted(opt_state))


def test_donation_numerics_identical():
    outs = []
    for donate in (True, False):
        step, params, opt_state, arrays, rng = _step_fixture(donate)
        for _ in range(3):
            params, _, opt_state, loss, rng = step(
                params, None, opt_state, arrays, rng
            )
        outs.append((jax.tree.leaves(params), float(loss)))
    for a, b in zip(*[o[0] for o in outs]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert outs[0][1] == outs[1][1]


def test_caller_variables_survive_two_runs(tmp_path):
    """train_model never invalidates caller-passed variables: the same
    object drives two runs and its arrays stay readable."""
    from tests.helpers import make_survival_csv
    from multimodalbrainsurvival_tpu.data.tables import FeatureTableDataset
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter

    path = str(tmp_path / "don.csv")
    make_survival_csv(path, [f"c{i}" for i in range(8)], n_feature=6, seed=0)
    ds = FeatureTableDataset(path)
    adapter = TableAdapter(model=_TinyMLP())
    probe = next(ds.batches(8))
    variables = adapter.init(
        jax.random.PRNGKey(0), {"data": jnp.asarray(probe["data"])}
    )
    settings = TrainSettings(
        num_epochs=2, task="survival_prediction", batch_size=8,
        log_interval=100, eval_splits_during_training=(),
    )
    runs = []
    for _ in range(2):
        last, _, _ = train_model(
            adapter, {"train": ds}, optax.adam(1e-2), settings,
            variables=variables, rng=jax.random.PRNGKey(7),
        )
        runs.append(jax.tree.leaves(last["params"]))
    # caller's arrays still alive and identical runs (same rng, same init)
    assert not any(_leaves_deleted(variables["params"]))
    _ = [np.asarray(x) for x in jax.tree.leaves(variables["params"])]
    for a, b in zip(*runs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_donation_matches_no_donation_through_train_model(tmp_path):
    """Whole-loop equivalence: donate_state on/off trains to identical
    weights (same data, same rng), including BN-free and eval interleaving."""
    from tests.helpers import make_survival_csv
    from multimodalbrainsurvival_tpu.data.tables import FeatureTableDataset
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter

    path = str(tmp_path / "eq.csv")
    make_survival_csv(path, [f"c{i}" for i in range(10)], n_feature=5, seed=1)
    ds = FeatureTableDataset(path)

    results = []
    for donate in (True, False):
        adapter = TableAdapter(model=_TinyMLP())
        settings = TrainSettings(
            num_epochs=3, task="survival_prediction", batch_size=5,
            log_interval=100, donate_state=donate,
            eval_splits_during_training=("val",),
        )
        last, _, _ = train_model(
            adapter, {"train": ds, "val": ds}, optax.adam(1e-2), settings,
            rng=jax.random.PRNGKey(3),
        )
        results.append(jax.tree.leaves(last["params"]))
    for a, b in zip(*results):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
