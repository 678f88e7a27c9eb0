"""KKT optimality of the Cox elastic-net path (`ops/coxnet.py`).

With R/glmnet absent from the image (PARITY.md), the strongest available
oracle for the FISTA solver is mathematical: at every λ on the path the
returned β must satisfy the elastic-net subgradient conditions of
``F(β) = npll(β) + λ(α‖β‖₁ + (1-α)/2‖β‖₂²)`` —

- active coordinates:  ∇npll_j + λ(1-α)β_j + λα·sign(β_j) = 0
- zero coordinates:    |∇npll_j + λ(1-α)β_j| ≤ λα

This pins the solver at ARBITRARY λ (the existing tests pin only the
path end against an unpenalized scipy MLE) and for both the lasso and the
mixed-penalty parameterization glmnet uses (`2_LateFusion.R:27-48`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalbrainsurvival_tpu.ops.coxnet import _npll, fit_coxnet


def _survival_data(n=160, p=6, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p)).astype(np.float32)
    beta_true = np.array([1.0, -0.8, 0.5, 0.0, 0.0, 0.0])[:p]
    t = rng.exponential(np.exp(-X @ beta_true)).astype(np.float32)
    e = (rng.uniform(size=n) < 0.75).astype(np.float32)
    return X, t, e


@pytest.mark.parametrize("alpha", [1.0, 0.5])
def test_kkt_subgradient_conditions_along_path(alpha):
    X, t, e = _survival_data()
    fit = fit_coxnet(X, t, e, alpha=alpha, n_folds=3, n_lambda=25, seed=0)

    # the solver works on standardized covariates and returns original-scale
    # betas (coxnet.py:137-139,164); map back for the optimality check
    sd = np.where(X.std(0) > 0, X.std(0), 1.0)
    Xs = (X - X.mean(0)) / sd
    grad = jax.grad(_npll)

    n_lam = len(fit.lambdas)
    checked_active = 0
    for i in (n_lam // 4, n_lam // 2, (3 * n_lam) // 4, n_lam - 1):
        lam = float(fit.lambdas[i])
        b = (fit.betas_path[i] * sd).astype(np.float32)
        g = np.asarray(
            grad(jnp.asarray(b), jnp.asarray(Xs), jnp.asarray(t),
                 jnp.asarray(e))
        ) + lam * (1.0 - alpha) * b
        tol = max(2e-3, 0.02 * lam * alpha)
        active = np.abs(b) > 1e-5
        if active.any():
            resid = g[active] + lam * alpha * np.sign(b[active])
            assert np.abs(resid).max() < tol, (i, lam, resid)
            checked_active += int(active.sum())
        if (~active).any():
            assert np.abs(g[~active]).max() <= lam * alpha + tol, (i, lam)
    # the path must actually exercise the active-set condition somewhere
    assert checked_active > 0


def test_cv_deviance_minimum_is_interior_or_flagged():
    """lambda.min should sit strictly inside the path on well-posed data —
    an endpoint minimum means the path range failed to bracket the optimum
    (glmnet's own diagnostic heuristic)."""
    X, t, e = _survival_data(n=200, p=4, seed=5)
    fit = fit_coxnet(X, t, e, alpha=1.0, n_folds=4, n_lambda=30, seed=1)
    best = int(np.nanargmin(fit.cv_mean))
    assert 0 < best < len(fit.lambdas) - 1, (best, fit.cv_mean)
