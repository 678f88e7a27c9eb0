"""ops/coxnet vs an independent implementation of glmnet's own algorithm.

Round-4 verdict Next #5: the KKT pins (test_coxnet_kkt.py) prove our FISTA
solutions are optimal for the stated objective; these tests additionally
prove the whole PATH (betas + CV deviance + lambda.min selection) agrees
with glmnet's actual cyclic-coordinate-descent-on-IRLS algorithm
(tests/glmnet_oracle.py — pure numpy, written from the 2011 paper, zero
shared code), on continuous-time AND heavily tied cohorts, and that both
meet the unpenalized ``ops/survival.cox_ph`` Newton MLE at vanishing
penalty. Reference semantics being replaced: `4_LateFusion/2_LateFusion.R:
27-48`.
"""

from __future__ import annotations

import numpy as np
import pytest

from multimodalbrainsurvival_tpu.ops.coxnet import fit_coxnet
from tests.glmnet_oracle import (
    breslow_npll,
    glmnet_cox_path,
)


def _cohort(n=140, p=5, seed=7, tie_grid=None, censor=0.3):
    """Synthetic survival cohort; ``tie_grid`` rounds times onto that many
    distinct values (heavy Breslow ties)."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p)).astype(np.float32)
    beta_true = np.zeros(p)
    beta_true[:3] = [0.9, -0.7, 0.4]
    t = rng.exponential(np.exp(-X @ beta_true))
    if tie_grid:
        # quantile-bin onto tie_grid distinct times (keeps every bin
        # populated, unlike plain rounding)
        edges = np.quantile(t, np.linspace(0, 1, tie_grid + 1))
        t = edges[np.clip(np.searchsorted(edges, t), 1, tie_grid)]
    e = (rng.uniform(size=n) > censor).astype(np.float32)
    return X.astype(np.float32), t.astype(np.float32), e


def _standardize(X):
    sd = np.where(X.std(0) > 0, X.std(0), 1.0)
    return (X - X.mean(0)) / sd, sd


@pytest.mark.parametrize("tie_grid,alpha", [(None, 1.0), (8, 1.0),
                                            (8, 0.5)])
def test_full_path_betas_match_glmnet_algorithm(tie_grid, alpha):
    """Path-wise beta agreement, lasso and mixed penalty, with and without
    heavy ties (tie_grid=8 → ~17 samples share each distinct time)."""
    X, t, e = _cohort(tie_grid=tie_grid)
    fit = fit_coxnet(X, t, e, alpha=alpha, n_lambda=20, n_folds=3, seed=0,
                     max_iter=800)
    Xs, sd = _standardize(X)

    # scale map: ops/coxnet normalizes the npll by n_events, the glmnet
    # paper by n — identical paths under lam_glmnet = lam * n_events / n
    scale = float(e.sum()) / len(t)
    oracle = glmnet_cox_path(Xs, t, e, fit.lambdas * scale, alpha=alpha)

    ours_std = fit.betas_path * sd  # back to the standardized scale
    err = np.abs(ours_std - oracle).max(axis=1)
    assert err.max() < 5e-3, (tie_grid, alpha, err)
    # support agreement where the lasso is decisive (clearly active /
    # clearly zero on the oracle side)
    if alpha == 1.0:
        active = np.abs(oracle) > 1e-2
        zero = np.abs(oracle) < 1e-6
        assert np.all(np.abs(ours_std[active]) > 1e-3)
        assert np.all(np.abs(ours_std[zero]) < 2e-3)


def test_cv_deviance_and_lambda_min_match_oracle():
    """Replicate fit_coxnet's deterministic fold assignment, run the oracle
    through the same CV protocol, and require the same deviance curve and
    the same lambda.min choice."""
    # small cohort: held-out deviance RISES again at small lambda
    # (overfitting), giving an interior lambda.min with real curvature —
    # a flat tail would make the argmin a coin flip between solvers
    X, t, e = _cohort(n=60, seed=11, tie_grid=10)
    n = len(t)
    n_folds = 3
    fit = fit_coxnet(X, t, e, n_lambda=15, n_folds=n_folds, seed=5,
                     max_iter=800)

    # identical event-stratified fold assignment (ops/coxnet.py:149-152)
    rng = np.random.default_rng(5)
    fold = np.empty(n, np.int64)
    for m in (e > 0, e <= 0):
        idx = np.flatnonzero(m)
        fold[idx[rng.permutation(len(idx))]] = np.arange(len(idx)) % n_folds

    Xs, sd = _standardize(X)
    scale = float(e.sum()) / n
    cv = np.zeros((n_folds, len(fit.lambdas)))
    for f in range(n_folds):
        tr, te = fold != f, fold == f
        # EXACTLY fit_coxnet's fold protocol (coxnet.py:160-166): fold
        # models are solved on the GLOBALLY standardized matrix (CD does
        # not require per-column unit variance — only the lambda scale
        # map does, and the per-fold event share provides it), held-out
        # deviance is the per-event Breslow npll on the same matrix
        scale_tr = float(e[tr].sum()) / int(tr.sum())
        betas = glmnet_cox_path(Xs[tr], t[tr], e[tr],
                                fit.lambdas * scale_tr, alpha=1.0)
        for i, b in enumerate(betas):
            cv[f, i] = breslow_npll(b, Xs[te], t[te], e[te],
                                    per_event=True)
    cv_mean = cv.mean(0)

    # the curves approximately agree and choose the SAME lambda.min
    finite = np.isfinite(fit.cv_mean)
    np.testing.assert_allclose(cv_mean[finite], fit.cv_mean[finite],
                               atol=2e-2)
    ours_idx = int(np.nanargmin(fit.cv_mean))
    oracle_idx = int(np.argmin(cv_mean))
    assert 0 < oracle_idx < len(cv_mean) - 1  # interior min, not a tail
    assert ours_idx == oracle_idx, (cv_mean, fit.cv_mean)
    assert np.isclose(fit.lambda_min, fit.lambdas[oracle_idx])


def test_oracle_and_ours_meet_coxph_mle_at_vanishing_penalty():
    """At lambda -> 0 both the oracle's CD path end and our FISTA path end
    equal the unpenalized Breslow MLE from ops/survival.cox_ph (Newton with
    full Hessian — a third independent optimizer), tied cohort included."""
    from multimodalbrainsurvival_tpu.ops.survival import cox_ph

    X, t, e = _cohort(n=150, p=4, seed=3, tie_grid=12)
    mle = cox_ph(t, e, X, ties="breslow").coef

    Xs, sd = _standardize(X)
    lam_path = np.geomspace(0.2, 1e-5, 12)
    oracle_end = glmnet_cox_path(Xs, t, e, lam_path)[-1] / sd
    np.testing.assert_allclose(oracle_end, mle, atol=5e-3)

    fit = fit_coxnet(X, t, e, n_lambda=25, lambda_min_ratio=1e-4,
                     n_folds=3, seed=0, max_iter=1500)
    np.testing.assert_allclose(fit.betas_path[-1], mle, atol=1e-2)
