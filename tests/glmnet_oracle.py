"""Test-only oracle: glmnet's ACTUAL Cox elastic-net algorithm.

`ops/coxnet.py` replaces the reference's R step
``cv.glmnet(x, Surv(t, d), family="cox")`` (`4_LateFusion/2_LateFusion.R:
27-48`) with a FISTA proximal-gradient solver. With R absent from this
image, the strongest available check of *algorithmic* (not just KKT)
agreement is an independent implementation of the algorithm glmnet itself
runs — Simon, Friedman, Hastie & Tibshirani (2011), "Regularization Paths
for Cox's Proportional Hazards Model via Coordinate Descent":

outer IRLS loop
    eta = X beta
    w_k = -d²/deta_k² of the Breslow partial log-likelihood (diagonal)
    z_k = eta_k + (dl/deta_k) / w_k          (working response)
inner loop: cyclic coordinate descent on the penalized weighted
    least-squares problem
    min_beta (1/2n) sum_k w_k (z_k - x_k beta)^2
             + lam * (alpha*||beta||_1 + (1-alpha)/2 * ||beta||_2^2)

Pure numpy, written directly from the paper's equations (§2-3) — shares no
code with ops/coxnet.py (associative-scan FISTA in JAX) and is deliberately
a *different* optimizer for the same objective.

Normalization note: the paper scales the log partial likelihood by 1/n
(observations); ops/coxnet scales by 1/n_events. The two parameterize the
SAME path with lambda_glmnet = lambda_ours * n_events / n — tests map
accordingly.
"""

from __future__ import annotations

import numpy as np


def breslow_npll(beta, X, times, events, *, per_event: bool = True):
    """Breslow negative log partial likelihood with TRUE tied risk sets
    (every ``t_j >= t_i`` in event i's denominator). ``per_event`` divides
    by the event count (ops/coxnet's scaling); else by n (glmnet paper)."""
    beta = np.asarray(beta, np.float64)
    X = np.asarray(X, np.float64)
    t = np.asarray(times, np.float64).reshape(-1)
    d = np.asarray(events, np.float64).reshape(-1)
    eta = X @ beta
    m = eta.max()
    order = np.argsort(-t, kind="stable")
    w = np.exp(eta[order] - m)
    csum = np.cumsum(w)
    t_desc = t[order]
    # last index of each tie group in the descending sort: the cumulative
    # sum there covers every sample with t_j >= t_i
    last = np.searchsorted(-t_desc, -t_desc, side="right") - 1
    log_risk = np.log(csum[last]) + m
    ll = ((eta[order] - log_risk) * d[order]).sum()
    denom = max(d.sum(), 1.0) if per_event else len(t)
    return -ll / denom


def _grad_hess_diag(eta, times, events):
    """(dl/deta, -diag d²l/deta²) of the UNSCALED Breslow partial
    log-likelihood (paper eq. 10-11 with the diagonal-Hessian
    approximation glmnet uses):

        dl/deta_k  = d_k - e^{eta_k} * A_k
        w_k        = e^{eta_k} * A_k - e^{2 eta_k} * B_k
        A_k = sum_{events i with t_i <= t_k} d_i / R_i
        B_k = sum_{events i with t_i <= t_k} d_i / R_i^2
        R_i = sum_{j: t_j >= t_i} e^{eta_j}     (true tied risk set)
    """
    t = np.asarray(times, np.float64).reshape(-1)
    d = np.asarray(events, np.float64).reshape(-1)
    n = len(t)
    order = np.argsort(-t, kind="stable")  # descending time
    m = eta.max()
    ex = np.exp(eta[order] - m)
    csum = np.cumsum(ex)
    t_desc = t[order]
    last = np.searchsorted(-t_desc, -t_desc, side="right") - 1
    R = csum[last] * np.exp(m)  # risk mass per (sorted) position

    # accumulate d_i / R_i over event positions, in ASCENDING time order,
    # then for sample k sum those with t_i <= t_k: in the descending sort
    # that's a reversed cumulative sum from the end up to k's tie group's
    # FIRST index... equivalently sum over events at positions >= first
    # index of k's tie group.
    dg = d[order] / R
    dg2 = d[order] / R**2
    # suffix sums over the descending order = sum over events with
    # t_i <= t_k (later positions have smaller-or-equal time)
    suf = np.cumsum(dg[::-1])[::-1]
    suf2 = np.cumsum(dg2[::-1])[::-1]
    first = np.searchsorted(-t_desc, -t_desc, side="left")
    A = suf[first]
    B = suf2[first]

    e_eta = np.exp(eta[order])
    grad_sorted = d[order] - e_eta * A
    w_sorted = e_eta * A - e_eta**2 * B
    grad = np.empty(n)
    w = np.empty(n)
    grad[order] = grad_sorted
    w[order] = np.maximum(w_sorted, 0.0)  # clip tiny negative round-off
    return grad, w


def _wls_coordinate_descent(X, w, z, beta, lam, alpha, *, tol=1e-10,
                            max_iter=1000):
    """Cyclic coordinate descent on the penalized weighted least squares
    (paper eq. 14): beta_j <- S(u_j, lam*alpha) / (v_j + lam*(1-alpha))
    with u_j = (1/n) sum w x_j r^{(-j)}, v_j = (1/n) sum w x_j^2."""
    n, p = X.shape
    wx2 = (w[:, None] * X**2).sum(0) / n  # v_j, fixed within the WLS solve
    r = z - X @ beta
    for _ in range(max_iter):
        delta = 0.0
        for j in range(p):
            bj = beta[j]
            u = (w * X[:, j] * r).sum() / n + wx2[j] * bj
            bn = np.sign(u) * max(abs(u) - lam * alpha, 0.0)
            bn /= (wx2[j] + lam * (1.0 - alpha))
            if bn != bj:
                r += X[:, j] * (bj - bn)
                beta[j] = bn
                delta = max(delta, abs(bn - bj))
        if delta < tol:
            break
    return beta


def glmnet_cox_solve(X, times, events, lam, alpha=1.0, beta0=None, *,
                     outer_iter=100, outer_tol=1e-9):
    """One lambda of glmnet's Cox path: IRLS + coordinate descent.

    ``X`` must already be standardized (glmnet standardizes internally);
    ``lam`` is on the paper's 1/n scale. Returns beta on the standardized
    scale."""
    X = np.asarray(X, np.float64)
    n, p = X.shape
    beta = np.zeros(p) if beta0 is None else np.asarray(beta0, np.float64).copy()
    for _ in range(outer_iter):
        eta = X @ beta
        grad, w = _grad_hess_diag(eta, times, events)
        # working response; w == 0 implies grad == 0 (no events at or
        # before that sample's time), so the sample drops out of the WLS
        z = eta + np.divide(grad, w, out=np.zeros_like(grad),
                            where=w > 1e-12)
        new = _wls_coordinate_descent(X, w, z, beta.copy(), lam, alpha)
        if np.abs(new - beta).max() < outer_tol:
            beta = new
            break
        beta = new
    return beta


def glmnet_cox_path(X, times, events, lambdas, alpha=1.0):
    """Warm-started path over DECREASING ``lambdas`` (paper §2.3).
    Returns (n_lambda, p) standardized-scale betas."""
    X = np.asarray(X, np.float64)
    betas = np.zeros((len(lambdas), X.shape[1]))
    beta = None
    for i, lam in enumerate(lambdas):
        beta = glmnet_cox_solve(X, times, events, float(lam), alpha,
                                beta0=beta)
        betas[i] = beta
    return betas
