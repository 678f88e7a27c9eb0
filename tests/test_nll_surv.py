"""Discrete-time NLL survival loss vs an independent torch oracle."""

import numpy as np
import jax.numpy as jnp
import torch

from multimodalbrainsurvival_tpu.ops.nll_surv import nll_surv_loss


def torch_oracle(h, y, c, alpha=0.0, eps=1e-7):
    """Zadeh & Schmid (2020) discrete NLL, as in the reference
    (1_HistoPathology/models.py:157-232), written independently."""
    h = torch.as_tensor(h, dtype=torch.float32)
    y = torch.as_tensor(y, dtype=torch.int64).view(-1, 1)
    c = torch.as_tensor(c, dtype=torch.float32).view(-1, 1)
    hz = torch.sigmoid(h)
    S = torch.cumprod(1 - hz, dim=1)
    Sp = torch.cat([torch.ones_like(c), S], dim=1)
    s_prev = Sp.gather(1, y).clamp(min=eps)
    h_this = hz.gather(1, y).clamp(min=eps)
    s_this = Sp.gather(1, y + 1).clamp(min=eps)
    unc = -(1 - c) * (s_prev.log() + h_this.log())
    cen = -c * s_this.log()
    return float(((1 - alpha) * cen + unc).mean())


def make_batch(seed=0, n=32, k=4):
    rng = np.random.default_rng(seed)
    h = rng.normal(size=(n, k)).astype(np.float32)
    y = rng.integers(0, k, size=n)
    c = (rng.uniform(size=n) < 0.4).astype(np.float32)
    return h, y, c


def test_matches_oracle():
    h, y, c = make_batch()
    ours = nll_surv_loss(jnp.array(h), jnp.array(y), jnp.array(c))
    assert np.isclose(float(ours), torch_oracle(h, y, c), rtol=1e-5)


def test_alpha_weighting():
    h, y, c = make_batch(seed=1)
    ours = nll_surv_loss(jnp.array(h), jnp.array(y), jnp.array(c), alpha=0.3)
    assert np.isclose(float(ours), torch_oracle(h, y, c, alpha=0.3), rtol=1e-5)


def test_mask_padding_invariance():
    h, y, c = make_batch(seed=2)
    base = nll_surv_loss(jnp.array(h), jnp.array(y), jnp.array(c))
    pad = 8
    hp = np.concatenate([h, np.ones((pad, h.shape[1]), np.float32)])
    yp = np.concatenate([y, np.zeros(pad, np.int64)])
    cp = np.concatenate([c, np.zeros(pad, np.float32)])
    mask = np.concatenate([np.ones(len(y), bool), np.zeros(pad, bool)])
    padded = nll_surv_loss(
        jnp.array(hp), jnp.array(yp), jnp.array(cp), mask=jnp.array(mask)
    )
    assert np.isclose(float(base), float(padded), rtol=1e-6)


def test_sum_reduction():
    h, y, c = make_batch(seed=3)
    mean = nll_surv_loss(jnp.array(h), jnp.array(y), jnp.array(c))
    total = nll_surv_loss(jnp.array(h), jnp.array(y), jnp.array(c), reduction="sum")
    assert np.isclose(float(total), float(mean) * len(y), rtol=1e-5)
