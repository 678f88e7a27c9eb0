"""Survival-analysis statistics over model risk scores (host-side numpy).

The paper behind the reference repo (Steyaert et al. 2022) evaluates its
models the same way throughout: Harrell's C-index on held-out cases, risk
groups split at the **median training risk score**, Kaplan-Meier curves per
risk group, and a log-rank test between them. The reference code computes
only the C-index point estimate (``2_HistoPath_train.py:184-209``) and
leaves the KM / log-rank / confidence-interval analysis to external
R / lifelines tooling the repo never ships. This module implements that
downstream analysis natively (numpy + scipy.stats only — no lifelines, no
sksurv, no R), consumed by ``cli/evaluate_scores.py`` on the exact score
frames every savescore CLI writes (columns ``id, score, survival_months,
vital_status``).

Definitions implemented:

- **Kaplan-Meier product-limit estimator** with Greenwood variance and
  log-minus-log (exp(-exp)) confidence bands — the lifelines/R-survival
  default, which keeps the band inside [0, 1].
- **k-sample log-rank test**: observed-vs-expected event counts under the
  hypergeometric model at each distinct event time, full covariance matrix,
  chi-squared statistic on k-1 degrees of freedom (two-sample case reduces
  to the textbook O-E/V form).
- **Median survival time** per group (first time S(t) drops to <= 0.5).
- **Bootstrap confidence interval for the C-index**: case-level resampling
  with replacement, percentile interval, deterministic under a seed.

Everything is plain numpy on host — these run once per evaluation on
hundreds-to-thousands of cases, which is negligible next to the device
forward passes that produced the scores.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from multimodalbrainsurvival_tpu.ops.metrics import concordance_index


def _as_arrays(times, events):
    t = np.asarray(times, dtype=np.float64).reshape(-1)
    e = np.asarray(events).reshape(-1).astype(bool)
    if t.shape != e.shape:
        raise ValueError(f"times {t.shape} and events {e.shape} differ")
    if t.size == 0:
        raise ValueError("empty survival data")
    if np.any(~np.isfinite(t)) or np.any(t < 0):
        raise ValueError("survival times must be finite and non-negative")
    return t, e


@dataclasses.dataclass
class KaplanMeier:
    """Product-limit estimate evaluated at the distinct event times.

    ``survival[i]`` is S(time[i]) — the value of the right-continuous step
    function *at and after* ``time[i]`` until the next event time. S(t) = 1
    for t before ``time[0]``.
    """

    time: np.ndarray        # distinct event times, ascending
    survival: np.ndarray    # S(t) at each event time
    at_risk: np.ndarray     # n_i: subjects at risk just before time[i]
    observed: np.ndarray    # d_i: events at time[i]
    ci_lower: np.ndarray    # pointwise lower confidence band
    ci_upper: np.ndarray    # pointwise upper confidence band
    alpha: float            # band level: (1 - alpha) two-sided

    def step_function(self, at: np.ndarray) -> np.ndarray:
        """S evaluated at arbitrary times (right-continuous step lookup)."""
        at = np.asarray(at, dtype=np.float64)
        idx = np.searchsorted(self.time, at, side="right") - 1
        s = np.concatenate([[1.0], self.survival])
        return s[idx + 1]

    @property
    def median_survival(self) -> float:
        """First time S(t) <= 0.5; inf if the curve never reaches it."""
        below = np.flatnonzero(self.survival <= 0.5)
        return float(self.time[below[0]]) if below.size else float("inf")


def kaplan_meier(times, events, alpha: float = 0.05) -> KaplanMeier:
    """Kaplan-Meier estimator with Greenwood log-minus-log confidence bands.

    At each distinct event time t_i with n_i at risk and d_i events:
    S(t_i) = prod_{j<=i} (1 - d_j/n_j). Greenwood:
    Var[log S] = sum d_j / (n_j (n_j - d_j)); the band is computed on the
    log(-log S) scale (exp(-exp(...))), which is the lifelines / R
    ``survival`` default and cannot leave [0, 1].
    """
    from scipy.stats import norm

    t, e = _as_arrays(times, events)
    order = np.argsort(t, kind="stable")
    t, e = t[order], e[order]

    event_times = np.unique(t[e])
    if event_times.size == 0:
        # all censored: flat S(t) = 1 with no event steps
        return KaplanMeier(
            time=np.array([]), survival=np.array([]),
            at_risk=np.array([], np.int64), observed=np.array([], np.int64),
            ci_lower=np.array([]), ci_upper=np.array([]), alpha=alpha,
        )

    # n_i: at risk just before each event time; d_i: events at that time
    n_at_risk = t.size - np.searchsorted(t, event_times, side="left")
    d = np.array([int(np.sum((t == et) & e)) for et in event_times])

    frac = 1.0 - d / n_at_risk
    surv = np.cumprod(frac)

    # Greenwood on the log(-log) scale; degenerate terms (n == d, S == 0 or
    # S == 1) get NaN bands, matching lifelines' behaviour at the curve tail
    with np.errstate(divide="ignore", invalid="ignore"):
        green = np.cumsum(d / (n_at_risk * (n_at_risk - d).astype(np.float64)))
        log_s = np.log(surv)
        se_cloglog = np.sqrt(green) / np.abs(log_s)
        z = norm.ppf(1.0 - alpha / 2.0)
        theta = np.log(-log_s)
        lower = np.exp(-np.exp(theta + z * se_cloglog))
        upper = np.exp(-np.exp(theta - z * se_cloglog))

    return KaplanMeier(
        time=event_times, survival=surv,
        at_risk=n_at_risk.astype(np.int64), observed=d.astype(np.int64),
        ci_lower=lower, ci_upper=upper, alpha=alpha,
    )


@dataclasses.dataclass
class LogrankResult:
    chi2: float
    p_value: float
    df: int
    observed: np.ndarray  # per-group observed event counts
    expected: np.ndarray  # per-group expected event counts under H0


def logrank_test(times, events, groups) -> LogrankResult:
    """k-sample log-rank test.

    At each distinct event time t with n at risk overall, n_g at risk in
    group g, and d events total, group g expects E_g = d * n_g / n events;
    the covariance of the observed counts is the multivariate
    hypergeometric one:
    V_gh = d (n - d) / (n - 1) * (delta_gh n_g / n - n_g n_h / n^2).
    The statistic (O - E)' V^+ (O - E) over the first k-1 groups is
    chi-squared with k-1 degrees of freedom under H0. For k = 2 this is
    the textbook (O_1 - E_1)^2 / V_11 form (verified against
    ``scipy.stats.logrank`` in tests/test_survival.py).
    """
    from scipy.stats import chi2 as chi2_dist

    t, e = _as_arrays(times, events)
    g = np.asarray(groups).reshape(-1)
    if g.shape != t.shape:
        raise ValueError(f"groups {g.shape} and times {t.shape} differ")
    labels, g_idx = np.unique(g, return_inverse=True)
    k = labels.size
    if k < 2:
        raise ValueError("log-rank test needs at least two groups")

    event_times = np.unique(t[e])
    observed = np.zeros(k)
    expected = np.zeros(k)
    cov = np.zeros((k, k))
    for et in event_times:
        at_risk = t >= et
        n = float(at_risk.sum())
        d = float(np.sum((t == et) & e))
        if n <= 0 or d <= 0:
            continue
        n_g = np.array([float(np.sum(at_risk & (g_idx == j))) for j in range(k)])
        d_g = np.array([float(np.sum((t == et) & e & (g_idx == j)))
                        for j in range(k)])
        observed += d_g
        expected += d * n_g / n
        if n > 1:
            hyper = d * (n - d) / (n - 1.0)
            cov += hyper * (np.diag(n_g / n) - np.outer(n_g, n_g) / n**2)

    delta = (observed - expected)[: k - 1]
    v = cov[: k - 1, : k - 1]
    # pinv: a group with no at-risk overlap contributes a singular direction
    chi2 = float(delta @ np.linalg.pinv(v) @ delta)
    p = float(chi2_dist.sf(chi2, df=k - 1))
    return LogrankResult(chi2=chi2, p_value=p, df=k - 1,
                         observed=observed, expected=expected)


def risk_groups(scores, cutoff: float | None = None) -> tuple[np.ndarray, float]:
    """Split scores into low (0) / high (1) risk at ``cutoff``.

    ``cutoff`` defaults to the median of ``scores``; the paper's protocol
    fixes it at the *training* cohort's median score and applies it
    unchanged to validation/test cohorts — pass that value explicitly.
    Scores strictly above the cutoff are high risk, so a median cutoff on
    an odd-length cohort puts the median case in the low-risk group.
    """
    s = np.asarray(scores, dtype=np.float64).reshape(-1)
    if cutoff is None:
        cutoff = float(np.median(s))
    return (s > cutoff).astype(np.int64), float(cutoff)


def bootstrap_concordance(
    times,
    scores,
    events,
    n_boot: int = 1000,
    alpha: float = 0.05,
    seed: int = 0,
) -> dict:
    """C-index point estimate + percentile bootstrap confidence interval.

    Resamples cases with replacement; degenerate resamples with no
    comparable pair (all-censored draws) are skipped. ``scores`` are risk
    scores (higher = shorter expected survival), matching the savescore
    frames; internally this calls :func:`ops.metrics.concordance_index`
    with ``-score`` exactly like the reference's evaluation
    (``2_HistoPath_train.py:207``).
    """
    t, e = _as_arrays(times, events)
    s = np.asarray(scores, dtype=np.float64).reshape(-1)
    if s.shape != t.shape:
        raise ValueError(f"scores {s.shape} and times {t.shape} differ")

    point = concordance_index(t, -s, e)
    rng = np.random.default_rng(seed)
    draws = []
    for _ in range(n_boot):
        idx = rng.integers(0, t.size, size=t.size)
        ci = concordance_index(t[idx], -s[idx], e[idx])
        if np.isfinite(ci):
            draws.append(ci)
    draws = np.asarray(draws)
    lo, hi = (
        (float(np.quantile(draws, alpha / 2)),
         float(np.quantile(draws, 1 - alpha / 2)))
        if draws.size
        else (float("nan"), float("nan"))
    )
    return {
        "c_index": float(point),
        "ci_lower": lo,
        "ci_upper": hi,
        "alpha": float(alpha),
        "n_boot": int(draws.size),
    }
