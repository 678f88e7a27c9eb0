"""Cox partial-likelihood loss: parity vs independent oracles + sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from multimodalbrainsurvival_tpu.ops.cox import (
    cox_partial_likelihood_loss,
    logcumsumexp,
)


def torch_reference_cox(scores, times, status):
    """Independent torch oracle implementing the published reference semantics:
    sort by descending time, max-subtract, log(cumsum(exp) + 1e-5), masked by
    event status, mean over the full batch (1_HistoPathology/models.py:90-118).
    """
    s = torch.as_tensor(scores, dtype=torch.float32)
    t = torch.as_tensor(times, dtype=torch.float32)
    d = torch.as_tensor(status, dtype=torch.float32)
    order = torch.sort(-t).indices
    s, d = s[order], d[order]
    s = s - s.max()
    partial = s - torch.log(torch.cumsum(torch.exp(s), 0) + 1e-5)
    return float((-(partial * d)).mean())


def numpy_corrected_cox(scores, times, status):
    """Oracle for the corrected estimator: exact logcumsumexp, /n_events."""
    order = np.argsort(-np.asarray(times), kind="stable")
    s = np.asarray(scores, np.float64)[order]
    d = np.asarray(status, np.float64)[order]
    lse = np.logaddexp.accumulate(s)
    return float(-np.sum((s - lse) * d) / max(d.sum(), 1.0))


@pytest.fixture
def batch():
    rng = np.random.default_rng(0)
    n = 64
    return (
        rng.normal(size=n).astype(np.float32),
        rng.uniform(1.0, 120.0, size=n).astype(np.float32),
        (rng.uniform(size=n) < 0.6).astype(np.float32),
    )


def test_parity_vs_torch_oracle(batch):
    s, t, d = batch
    ours = cox_partial_likelihood_loss(jnp.array(s), jnp.array(t), jnp.array(d))
    assert np.isclose(float(ours), torch_reference_cox(s, t, d), rtol=1e-5)


def test_corrected_vs_numpy_oracle(batch):
    s, t, d = batch
    ours = cox_partial_likelihood_loss(
        jnp.array(s), jnp.array(t), jnp.array(d), reference_parity=False
    )
    assert np.isclose(float(ours), numpy_corrected_cox(s, t, d), rtol=1e-5)


def test_all_censored_is_finite(batch):
    s, t, _ = batch
    zeros = jnp.zeros_like(jnp.array(s))
    for parity in (True, False):
        val = cox_partial_likelihood_loss(
            jnp.array(s), jnp.array(t), zeros, reference_parity=parity
        )
        assert np.isfinite(float(val))


def test_padding_invariance(batch):
    """Padded rows must not change the loss vs the unpadded batch."""
    s, t, d = batch
    base = cox_partial_likelihood_loss(jnp.array(s), jnp.array(t), jnp.array(d))
    pad = 32
    sp = jnp.concatenate([jnp.array(s), jnp.full((pad,), 7.0)])
    tp = jnp.concatenate([jnp.array(t), jnp.full((pad,), 3.0)])
    dp = jnp.concatenate([jnp.array(d), jnp.ones((pad,))])
    mask = jnp.concatenate([jnp.ones((len(s),), bool), jnp.zeros((pad,), bool)])
    padded = cox_partial_likelihood_loss(sp, tp, dp, mask=mask)
    assert np.isclose(float(base), float(padded), rtol=1e-6)


def test_grad_finite(batch):
    s, t, d = batch
    for parity in (True, False):
        g = jax.grad(
            lambda x: cox_partial_likelihood_loss(
                x, jnp.array(t), jnp.array(d), reference_parity=parity
            )
        )(jnp.array(s))
        assert np.all(np.isfinite(np.asarray(g)))


def test_logcumsumexp_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 37)).astype(np.float32) * 10
    got = np.asarray(logcumsumexp(jnp.array(x), axis=-1))
    want = np.logaddexp.accumulate(x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_extreme_scores_parity_mode_stable(batch):
    _, t, d = batch
    s = jnp.array(np.linspace(-200, 200, len(t)), jnp.float32)
    val = cox_partial_likelihood_loss(s, jnp.array(t), jnp.array(d))
    assert np.isfinite(float(val))


def test_sharded_batch_matches_single_device(batch):
    """DP-sharded global batch → identical loss to single-device computation.

    The Cox risk set is batch-global; under jit with a sharded batch XLA
    all-gathers the (score, time, event) triple (SURVEY.md §2.2).
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    s, t, d = batch
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("dp",))
    sharding = NamedSharding(mesh, P("dp"))

    f = jax.jit(cox_partial_likelihood_loss)
    base = f(jnp.array(s), jnp.array(t), jnp.array(d))
    ss = jax.device_put(jnp.array(s), sharding)
    ts = jax.device_put(jnp.array(t), sharding)
    ds = jax.device_put(jnp.array(d), sharding)
    sharded = f(ss, ts, ds)
    assert np.isclose(float(base), float(sharded), rtol=1e-6)
