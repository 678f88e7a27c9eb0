"""Cross-validated Cox elastic-net — native replacement for R glmnet.

The reference's late-fusion step is 47 lines of R: ``cv.glmnet(x, Surv(t, d),
family="cox")`` on the two unimodal risk scores, predicting the linear score
at ``lambda.min`` (``4_LateFusion/2_LateFusion.R:27-48``). This module
implements the same estimator natively so the whole stack is single-language
(SURVEY.md §7 step 8):

- Breslow partial likelihood, computed with the same sorted
  ``logcumsumexp`` machinery as the training loss (``ops/cox.py``);
- elastic-net penalty ``λ (α‖β‖₁ + (1-α)/2 ‖β‖₂²)`` with glmnet's default
  ``α = 1`` (lasso);
- a geometric λ path from ``λ_max`` (smallest λ with β ≡ 0, derived from the
  null-model gradient) down to ``λ_max · lambda_min_ratio``;
- proximal gradient (FISTA) with backtracking — each solve is jitted; the
  whole path is warm-started;
- k-fold CV choosing ``lambda.min`` by held-out partial-likelihood deviance
  (glmnet's "deviance" criterion for Cox).

Scale note: glmnet standardizes covariates internally and returns
coefficients on the original scale; we do the same.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from multimodalbrainsurvival_tpu.ops.cox import logcumsumexp


def _npll(beta, X, times, events):
    """Breslow negative log partial likelihood, mean over events.

    TRUE Breslow risk sets under ties: every sample with ``t_j >= t_i`` is
    in event i's denominator, INCLUDING samples tied at exactly ``t_i``.
    After the descending-time sort the inclusive ``logcumsumexp`` at
    position k only covers positions ``<= k``, so tied samples sorted
    later would be dropped — each position therefore reads the scan value
    at the LAST index of its tie group (glmnet and ``ops/survival.cox_ph``
    both use the full tied risk set; ``2_LateFusion.R:27-48``)."""
    eta = X @ beta
    order = jnp.argsort(-times, stable=True)
    eta = eta[order]
    d = events[order]
    t_desc = times[order]
    scan = logcumsumexp(eta)
    # last index of each tie group in the descending sort (ascending in -t)
    last = jnp.searchsorted(-t_desc, -t_desc, side="right") - 1
    log_risk = scan[last]
    ll = (eta - log_risk) * d
    return -jnp.sum(ll) / jnp.maximum(jnp.sum(d), 1.0)


def _soft_threshold(x, thr):
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - thr, 0.0)


@partial(jax.jit, static_argnames=("max_iter",))
def _fista_solve(X, times, events, lam, alpha, beta0, max_iter: int = 500):
    """FISTA with fixed step from a Lipschitz bound on the Cox Hessian.

    The Hessian of the Breslow NPLL is bounded by (1/4?) — conservatively we
    use L = σ_max(XᵀX)/n_events which upper-bounds the curvature of the
    partial likelihood in practice; backtracking is replaced by a safety
    factor (the objective is checked monotone in tests).
    """
    n_ev = jnp.maximum(jnp.sum(events), 1.0)
    L = jnp.linalg.norm(X, ord=2) ** 2 / n_ev + 1e-6
    step = 1.0 / L
    grad = jax.grad(_npll)

    def body(_, carry):
        beta, z, t = carry
        g = grad(z, X, times, events) + lam * (1.0 - alpha) * z
        z_new = z - step * g
        beta_new = _soft_threshold(z_new, step * lam * alpha)
        t_new = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) / 2.0
        z_next = beta_new + ((t - 1.0) / t_new) * (beta_new - beta)
        return beta_new, z_next, t_new

    beta, _, _ = jax.lax.fori_loop(
        0, max_iter, body, (beta0, beta0, jnp.float32(1.0))
    )
    return beta


@dataclass
class CoxnetResult:
    beta: np.ndarray          # coefficients at lambda.min (original scale)
    intercept_shift: float    # ⟨beta, mean⟩ removed by standardization
    lambdas: np.ndarray
    cv_mean: np.ndarray
    lambda_min: float
    betas_path: np.ndarray    # (n_lambda, p), original scale

    def predict(self, X: np.ndarray) -> np.ndarray:
        """Linear risk score (glmnet ``predict(type='link')`` minus the
        constant, which is irrelevant for Cox ranking)."""
        return np.asarray(X, np.float64) @ self.beta


def _lambda_path(X, times, events, alpha, n_lambda, lambda_min_ratio):
    g0 = np.asarray(
        jax.grad(_npll)(
            jnp.zeros(X.shape[1]), jnp.asarray(X), jnp.asarray(times),
            jnp.asarray(events),
        )
    )
    lam_max = np.max(np.abs(g0)) / max(alpha, 1e-3)
    lam_max = max(lam_max, 1e-4)
    return np.geomspace(lam_max, lam_max * lambda_min_ratio, n_lambda)


def _solve_path(X, times, events, lambdas, alpha, max_iter):
    p = X.shape[1]
    betas = np.zeros((len(lambdas), p), np.float32)
    beta = jnp.zeros(p, jnp.float32)
    Xj, tj, ej = jnp.asarray(X), jnp.asarray(times), jnp.asarray(events)
    for i, lam in enumerate(lambdas):
        beta = _fista_solve(Xj, tj, ej, jnp.float32(lam), jnp.float32(alpha),
                            beta, max_iter=max_iter)
        betas[i] = np.asarray(beta)
    return betas


def fit_coxnet(
    X: np.ndarray,
    times: np.ndarray,
    events: np.ndarray,
    *,
    alpha: float = 1.0,
    n_lambda: int = 50,
    lambda_min_ratio: float = 1e-3,
    n_folds: int = 10,
    max_iter: int = 500,
    seed: int = 0,
) -> CoxnetResult:
    """cv.glmnet(family='cox') equivalent: full-path fit + k-fold CV."""
    X = np.asarray(X, np.float32)
    times = np.asarray(times, np.float32).reshape(-1)
    events = np.asarray(events, np.float32).reshape(-1)
    n, p = X.shape

    mu, sd = X.mean(0), X.std(0)
    sd = np.where(sd > 0, sd, 1.0)
    Xs = (X - mu) / sd

    lambdas = _lambda_path(Xs, times, events, alpha, n_lambda, lambda_min_ratio)

    n_folds = min(n_folds, max(2, n // 3))
    rng = np.random.default_rng(seed)
    # event-stratified fold assignment: permute events and censored rows
    # separately so small cohorts don't land all their events in one fold
    # (a fold with no events has no Cox partial likelihood — such folds are
    # skipped below, and unstratified assignment can degenerate them all)
    fold = np.empty(n, np.int64)
    for m in (events > 0, events <= 0):
        idx = np.flatnonzero(m)
        fold[idx[rng.permutation(len(idx))]] = np.arange(len(idx)) % n_folds
    cv_dev = np.zeros((n_folds, len(lambdas)))
    for f in range(n_folds):
        tr = fold != f
        te = fold == f
        if events[te].sum() == 0 or events[tr].sum() == 0:
            cv_dev[f] = np.nan
            continue
        betas = _solve_path(Xs[tr], times[tr], events[tr], lambdas, alpha,
                            max_iter)
        for i, b in enumerate(betas):
            cv_dev[f, i] = float(
                _npll(jnp.asarray(b), jnp.asarray(Xs[te]),
                      jnp.asarray(times[te]), jnp.asarray(events[te]))
            )
    with np.errstate(invalid="ignore"):
        cv_mean = np.nanmean(cv_dev, axis=0)
    if np.all(np.isnan(cv_mean)):
        # every fold was event-degenerate (tiny or near-fully-censored
        # cohort): CV cannot choose a lambda. Fall back to the most
        # regularized end of the path (beta ~ 0) instead of crashing —
        # cv.glmnet errors here; a conservative finite answer serves the
        # late-fusion pipeline better than a traceback.
        import warnings

        warnings.warn(
            "coxnet CV degenerate: no fold had events on both sides; "
            "falling back to the largest lambda (maximal shrinkage)",
            stacklevel=2,
        )
        best = 0
    else:
        best = int(np.nanargmin(cv_mean))

    betas_std = _solve_path(Xs, times, events, lambdas, alpha, max_iter)
    betas_orig = betas_std / sd  # back to original scale
    beta = betas_orig[best]
    return CoxnetResult(
        beta=beta.astype(np.float64),
        intercept_shift=float(beta @ mu),
        lambdas=lambdas,
        cv_mean=cv_mean,
        lambda_min=float(lambdas[best]),
        betas_path=betas_orig,
    )
