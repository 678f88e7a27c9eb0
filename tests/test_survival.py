"""Survival-statistics toolkit (ops/survival.py) + evaluate_scores CLI.

Oracles: the classic Freireich 6-MP Kaplan-Meier table (hand-computable),
and scipy's independent implementations — ``scipy.stats.ecdf`` on censored
data for the KM curve and its log-log confidence band, ``scipy.stats.logrank``
for the two-sample log-rank test. The k-sample path is pinned by its k=2
reduction plus invariance properties.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from multimodalbrainsurvival_tpu.ops.survival import (
    KaplanMeier,
    bootstrap_concordance,
    kaplan_meier,
    logrank_test,
    risk_groups,
)

# Freireich et al. 1963, 6-MP arm (21 leukemia patients; + = censored):
# 6, 6, 6, 6+, 7, 9+, 10, 10+, 11+, 13, 16, 17+, 19+, 20+, 22, 23,
# 25+, 32+, 32+, 34+, 35+
FREIREICH_T = np.array([6, 6, 6, 6, 7, 9, 10, 10, 11, 13, 16, 17, 19, 20,
                        22, 23, 25, 32, 32, 34, 35], dtype=float)
FREIREICH_E = np.array([1, 1, 1, 0, 1, 0, 1, 0, 0, 1, 1, 0, 0, 0,
                        1, 1, 0, 0, 0, 0, 0], dtype=bool)


def test_km_matches_freireich_hand_values():
    km = kaplan_meier(FREIREICH_T, FREIREICH_E)
    np.testing.assert_array_equal(km.time, [6, 7, 10, 13, 16, 22, 23])
    np.testing.assert_array_equal(km.at_risk, [21, 17, 15, 12, 11, 7, 6])
    np.testing.assert_array_equal(km.observed, [3, 1, 1, 1, 1, 1, 1])
    # the textbook product-limit values
    expected = [18 / 21,
                18 / 21 * 16 / 17,
                18 / 21 * 16 / 17 * 14 / 15]
    np.testing.assert_allclose(km.survival[:3], expected, rtol=1e-12)
    np.testing.assert_allclose(km.survival[-1], 0.448, atol=5e-4)
    # right-continuous step lookup
    np.testing.assert_allclose(
        km.step_function(np.array([0.0, 6.0, 6.5, 35.0])),
        [1.0, expected[0], expected[0], km.survival[-1]],
    )
    # S never reaches 0.5 exactly... it does at t=23 (0.448)
    assert km.median_survival == 23.0


def test_km_matches_scipy_ecdf_curve_and_band():
    from scipy import stats

    rng = np.random.default_rng(7)
    t = rng.exponential(10.0, size=200).round(1) + 0.1
    c = rng.exponential(14.0, size=200).round(1) + 0.1
    obs = np.minimum(t, c)
    ev = t <= c

    km = kaplan_meier(obs, ev)
    sample = stats.CensoredData(
        uncensored=obs[ev], right=obs[~ev]
    )
    sf = stats.ecdf(sample).sf
    ours_at = km.step_function(sf.quantiles)
    np.testing.assert_allclose(ours_at, sf.probabilities, rtol=1e-10)

    band = sf.confidence_interval(confidence_level=0.95, method="log-log")
    # compare at OUR event times (scipy's quantiles include censor times
    # where the band just carries forward)
    idx = np.searchsorted(sf.quantiles, km.time)
    lo = band.low.probabilities[idx]
    hi = band.high.probabilities[idx]
    finite = np.isfinite(km.ci_lower) & np.isfinite(km.ci_upper)
    np.testing.assert_allclose(km.ci_lower[finite], lo[finite], rtol=1e-8)
    np.testing.assert_allclose(km.ci_upper[finite], hi[finite], rtol=1e-8)


def test_km_all_censored_is_flat_unit():
    km = kaplan_meier([3.0, 5.0, 9.0], [0, 0, 0])
    assert km.time.size == 0
    np.testing.assert_allclose(km.step_function(np.array([0.0, 100.0])), 1.0)
    assert km.median_survival == float("inf")


def test_logrank_two_sample_matches_scipy():
    from scipy import stats

    rng = np.random.default_rng(11)
    n = 120
    t0 = rng.exponential(10.0, n)
    t1 = rng.exponential(16.0, n)
    c = rng.exponential(20.0, 2 * n)
    raw = np.concatenate([t0, t1])
    obs = np.minimum(raw, c).round(2)
    ev = raw <= c
    grp = np.repeat([0, 1], n)

    res = logrank_test(obs, ev, grp)
    x = stats.CensoredData(uncensored=obs[:n][ev[:n]], right=obs[:n][~ev[:n]])
    y = stats.CensoredData(uncensored=obs[n:][ev[n:]], right=obs[n:][~ev[n:]])
    ref = stats.logrank(x, y)
    # scipy's statistic is the signed normal deviate; ours is its square
    np.testing.assert_allclose(res.chi2, ref.statistic**2, rtol=1e-10)
    np.testing.assert_allclose(res.p_value, ref.pvalue, rtol=1e-8)
    assert res.df == 1
    # O and E sum to the same total event count
    np.testing.assert_allclose(res.observed.sum(), res.expected.sum())


def test_logrank_k_sample_properties():
    rng = np.random.default_rng(3)
    t = rng.exponential(10.0, 150).round(2) + 0.01
    e = rng.random(150) < 0.7

    # three groups drawn from the SAME distribution: chi2 small, p large
    g3 = np.repeat([0, 1, 2], 50)
    res = logrank_test(t, e, g3)
    assert res.df == 2
    assert res.p_value > 0.01

    # group labels are nominal: permuting label names changes nothing
    relabel = np.array([2, 0, 1])[g3]
    res2 = logrank_test(t, e, relabel)
    np.testing.assert_allclose(res2.chi2, res.chi2, rtol=1e-10)

    # a strongly separated third group drives chi2 up
    t_sep = t.copy()
    t_sep[g3 == 2] += 30.0
    res3 = logrank_test(t_sep, e, g3)
    assert res3.chi2 > res.chi2
    assert res3.p_value < 1e-4


def test_risk_groups_median_split():
    s = np.array([0.1, 0.2, 0.3, 0.4])
    grp, cutoff = risk_groups(s)
    assert cutoff == pytest.approx(0.25)
    np.testing.assert_array_equal(grp, [0, 0, 1, 1])
    # explicit (train-median) cutoff is honored; boundary goes low-risk
    grp2, c2 = risk_groups(s, cutoff=0.3)
    assert c2 == 0.3
    np.testing.assert_array_equal(grp2, [0, 0, 0, 1])


def test_bootstrap_concordance_deterministic_and_sane():
    rng = np.random.default_rng(5)
    n = 80
    risk = rng.normal(size=n)
    # higher risk → shorter survival, plus noise
    t = np.exp(1.5 - risk + 0.3 * rng.normal(size=n))
    e = rng.random(n) < 0.8

    a = bootstrap_concordance(t, risk, e, n_boot=200, seed=42)
    b = bootstrap_concordance(t, risk, e, n_boot=200, seed=42)
    assert a == b  # seed-deterministic
    assert 0.5 < a["c_index"] <= 1.0
    assert a["ci_lower"] <= a["c_index"] <= a["ci_upper"]
    assert 0.0 <= a["ci_lower"] and a["ci_upper"] <= 1.0
    assert a["n_boot"] == 200

    # anti-concordant scores land below 0.5
    c = bootstrap_concordance(t, -risk, e, n_boot=50, seed=0)
    assert c["c_index"] < 0.5


def _write_frame(path, n, seed, hazard_spread=1.2):
    """Synthetic savescore frame: score is a real (noisy) risk signal."""
    rng = np.random.default_rng(seed)
    score = rng.normal(size=n)
    t = np.exp(2.0 - hazard_spread * score + 0.3 * rng.normal(size=n))
    e = (rng.random(n) < 0.75).astype(int)
    pd.DataFrame({
        "id": [f"case{i}" for i in range(n)],
        "score": score,
        "survival_months": np.round(t, 2),
        "vital_status": e,
    }).to_csv(path)
    return score


def test_evaluate_scores_cli_end_to_end(tmp_path):
    from multimodalbrainsurvival_tpu.cli.evaluate_scores import main

    train_csv = tmp_path / "model_pathology_train_df.csv"
    test_csv = tmp_path / "model_pathology_test_df.csv"
    train_scores = _write_frame(train_csv, 120, seed=1)
    _write_frame(test_csv, 90, seed=2)
    out_dir = tmp_path / "eval"

    main([
        "--scores", str(test_csv),
        "--train_scores", str(train_csv),
        "--output_dir", str(out_dir),
        "--n_boot", "100",
        "--plot", "1",
    ])

    report_path = out_dir / "evaluation_model_pathology_test_df.json"
    km_path = out_dir / "km_model_pathology_test_df.csv"
    png_path = out_dir / "km_model_pathology_test_df.png"
    assert report_path.exists() and km_path.exists() and png_path.exists()

    rep = json.loads(report_path.read_text())
    assert rep["n_cases"] == 90
    # cutoff is the TRAIN median (the paper's protocol), not the test median
    assert rep["cutoff"] == pytest.approx(float(np.median(train_scores)))
    assert rep["cutoff_source"] == "train_median"
    assert 0.5 < rep["c_index"] <= 1.0
    assert rep["ci_lower"] <= rep["c_index"] <= rep["ci_upper"]
    # a hazard_spread this strong must separate the groups decisively
    assert rep["logrank_p"] < 0.01
    assert rep["groups"]["high"]["n"] + rep["groups"]["low"]["n"] == 90
    assert rep["groups"]["high"]["median_survival"] <= \
        rep["groups"]["low"]["median_survival"]

    km = pd.read_csv(km_path)
    assert set(km.columns) >= {"group", "time", "survival",
                               "ci_lower", "ci_upper", "at_risk", "observed"}
    assert set(km["group"]) == {"low", "high"}
    # PNG is a real image, not a zero-byte touch
    assert os.path.getsize(png_path) > 1000


def test_evaluate_scores_cli_self_cutoff(tmp_path):
    """Without --train_scores the cutoff falls back to the frame's own median."""
    from multimodalbrainsurvival_tpu.cli.evaluate_scores import main

    csv = tmp_path / "scores.csv"
    scores = _write_frame(csv, 60, seed=3)
    out_dir = tmp_path / "eval"
    main(["--scores", str(csv), "--output_dir", str(out_dir),
          "--n_boot", "20"])
    rep = json.loads((out_dir / "evaluation_scores.json").read_text())
    assert rep["cutoff"] == pytest.approx(float(np.median(scores)))
    assert rep["cutoff_source"] == "self_median"
    assert not (out_dir / "km_scores.png").exists()  # plot is opt-in


# ---------------------------------------------------------------------------
# Cox proportional-hazards regression
# ---------------------------------------------------------------------------


def _synthetic_cohort(n, p, seed, tie_grid=None, binary_cols=()):
    """Exponential survival with true log-hazard X @ beta, ~30% censoring."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p))
    for j in binary_cols:
        X[:, j] = (X[:, j] > 0).astype(float)
    beta_true = np.linspace(0.8, -0.5, p)
    lam = np.exp(X @ beta_true)
    t_event = rng.exponential(1.0 / lam)
    t_cens = rng.exponential(2.0 / np.median(lam))
    t = np.minimum(t_event, t_cens)
    e = t_event <= t_cens
    if tie_grid is not None:
        t = np.ceil(t * tie_grid) / tie_grid  # discretize -> tied times
    return t, e, X


def _naive_breslow_loglik(beta, X, t, e):
    """Loop-written Breslow partial log-likelihood (independent of ops)."""
    ll = 0.0
    for et in np.unique(t[e]):
        risk = t >= et
        dead = (t == et) & e
        ll += float(X[dead] @ beta).__float__() if X[dead].shape[0] == 1 \
            else float((X[dead] @ beta).sum())
        ll -= dead.sum() * np.log(np.exp(X[risk] @ beta).sum())
    return ll


def test_cox_score_test_equals_logrank_without_ties():
    """Score test of a binary one-covariate Cox model at beta=0 is EXACTLY
    the log-rank statistic when no event times tie (classic identity; our
    logrank_test is itself pinned against scipy.stats.logrank above)."""
    from multimodalbrainsurvival_tpu.ops.survival import cox_ph

    rng = np.random.default_rng(7)
    n = 120
    g = (rng.normal(size=n) > 0).astype(float)
    t = rng.exponential(1.0 / np.exp(0.7 * g))  # continuous -> untied a.s.
    e = rng.random(n) > 0.25
    assert np.unique(t[e]).size == e.sum()  # no ties among events

    fit = cox_ph(t, e, g, names=["group"])
    lr = logrank_test(t, e, g.astype(int))
    assert fit.score_chi2 == pytest.approx(lr.chi2, rel=1e-9)
    assert fit.score_p == pytest.approx(lr.p_value, rel=1e-9)


@pytest.mark.parametrize("ties", ["breslow", "efron"])
def test_cox_mle_matches_independent_scipy_optimizer(ties):
    """MLE == scipy.optimize on a loop-written likelihood; SE == the
    finite-difference observed information of that same likelihood."""
    from scipy.optimize import minimize

    from multimodalbrainsurvival_tpu.ops.survival import cox_ph

    t, e, X = _synthetic_cohort(150, 3, seed=11)  # continuous times: no ties
    assert np.unique(t[e]).size == e.sum()
    fit = cox_ph(t, e, X, ties=ties, tol=1e-11)

    # with no ties Breslow and Efron coincide, so one naive oracle serves both
    nll = lambda b: -_naive_breslow_loglik(b, X, t, e)  # noqa: E731
    opt = minimize(nll, np.zeros(3), method="BFGS",
                   options={"gtol": 1e-10, "maxiter": 500})
    np.testing.assert_allclose(fit.coef, opt.x, atol=5e-6)
    assert fit.log_likelihood == pytest.approx(-opt.fun, abs=1e-8)

    # central-difference Hessian of the naive loglik -> Wald SEs
    h = 1e-4
    p = 3
    hess = np.zeros((p, p))
    for i in range(p):
        for j in range(p):
            bpp = fit.coef.copy(); bpp[i] += h; bpp[j] += h
            bpm = fit.coef.copy(); bpm[i] += h; bpm[j] -= h
            bmp = fit.coef.copy(); bmp[i] -= h; bmp[j] += h
            bmm = fit.coef.copy(); bmm[i] -= h; bmm[j] -= h
            hess[i, j] = (nll(bpp) - nll(bpm) - nll(bmp) + nll(bmm)) / (4 * h * h)
    se_fd = np.sqrt(np.diag(np.linalg.inv(hess)))
    np.testing.assert_allclose(fit.se, se_fd, rtol=1e-4)


def test_cox_efron_handles_ties_and_differs_from_breslow():
    from multimodalbrainsurvival_tpu.ops.survival import cox_ph

    t, e, X = _synthetic_cohort(200, 2, seed=3, tie_grid=4.0)
    assert np.unique(t[e]).size < e.sum()  # ties present
    fb = cox_ph(t, e, X, ties="breslow")
    fe = cox_ph(t, e, X, ties="efron")
    assert not np.allclose(fb.coef, fe.coef)
    # both converge: score ~ 0 at their own optimum via a tiny perturbation
    for fit in (fb, fe):
        assert fit.n_iter < 100
        assert np.all(np.isfinite(fit.se)) and np.all(fit.se > 0)
        # Wald internals are mutually consistent
        np.testing.assert_allclose(fit.hr, np.exp(fit.coef))
        np.testing.assert_allclose(fit.z, fit.coef / fit.se)


def test_cox_matches_coxnet_at_vanishing_penalty():
    """Unpenalized Newton fit == ops/coxnet's FISTA solution at tiny lambda
    (two completely different optimizers on the same Breslow objective)."""
    from multimodalbrainsurvival_tpu.ops.coxnet import _solve_path
    from multimodalbrainsurvival_tpu.ops.survival import cox_ph

    t, e, X = _synthetic_cohort(120, 3, seed=21)
    fit = cox_ph(t, e, X)
    # coxnet standardizes internally (fit_coxnet:137-139); mirror that and
    # map the FISTA solution back to the original scale
    sd = X.std(0)
    Xs = (X - X.mean(0)) / sd
    betas = _solve_path(Xs.astype(np.float32), t.astype(np.float32),
                        e.astype(np.float32), [1e-8], alpha=0.5,
                        max_iter=4000)
    np.testing.assert_allclose(fit.coef, betas[0] / sd, atol=5e-3)


def test_cox_baseline_hazard_is_nelson_aalen_at_zero_effect():
    """With an all-but-noise covariate forced to zero effect the Breslow
    baseline reduces to Nelson-Aalen sum(d/n). Checked by fitting on a
    covariate independent of survival and comparing H0 against
    Nelson-Aalen computed at the FITTED beta by hand."""
    from multimodalbrainsurvival_tpu.ops.survival import cox_ph

    rng = np.random.default_rng(5)
    n = 80
    t = rng.exponential(1.0, size=n)
    e = rng.random(n) > 0.3
    x = rng.normal(size=n)
    fit = cox_ph(t, e, x)

    w = np.exp(x * fit.coef[0])
    expected = []
    acc = 0.0
    for et in fit.baseline_time:
        acc += np.sum((t == et) & e) / w[t >= et].sum()
        expected.append(acc)
    np.testing.assert_allclose(fit.baseline_cumhaz, expected, rtol=1e-10)

    # predict_survival: S(t|x) = exp(-H0 e^{x beta}); monotone in t, in [0,1]
    s = fit.predict_survival([0.0], fit.baseline_time)
    np.testing.assert_allclose(s, np.exp(-fit.baseline_cumhaz))
    assert np.all(np.diff(s) <= 1e-12) and s[0] <= 1.0 and s[-1] >= 0.0


def test_cox_lr_test_and_validation_errors():
    from multimodalbrainsurvival_tpu.ops.survival import cox_ph

    t, e, X = _synthetic_cohort(100, 2, seed=9)
    fit = cox_ph(t, e, X)
    assert fit.lr_chi2 == pytest.approx(
        2.0 * (fit.log_likelihood - fit.ll_null))
    assert 0.0 <= fit.lr_p <= 1.0
    assert fit.n == 100 and fit.n_events == int(e.sum())

    with pytest.raises(ValueError, match="constant"):
        cox_ph(t, e, np.ones((100, 1)))
    with pytest.raises(ValueError, match="at least one event"):
        cox_ph(t, np.zeros(100, bool), X)
    with pytest.raises(ValueError, match="names"):
        cox_ph(t, e, X, names=["only_one"])


def test_evaluate_scores_cli_cox_adjusted(tmp_path):
    """--cohort/--covariates produce the adjusted Cox section + table; the
    univariable HR-per-SD matches a direct cox_ph fit on the same frame."""
    from multimodalbrainsurvival_tpu.cli.evaluate_scores import main
    from multimodalbrainsurvival_tpu.ops.survival import cox_ph

    csv = tmp_path / "scores.csv"
    _write_frame(csv, 100, seed=4)
    df = pd.read_csv(csv)

    rng = np.random.default_rng(0)
    pd.DataFrame({
        "case": df["id"],
        "age": rng.integers(40, 80, size=len(df)),
        "gender": rng.choice(["F", "M"], size=len(df)),
    }).to_csv(tmp_path / "cohort.csv", index=False)

    out_dir = tmp_path / "eval"
    main(["--scores", str(csv), "--output_dir", str(out_dir),
          "--n_boot", "10", "--cohort", str(tmp_path / "cohort.csv"),
          "--covariates", "age,gender"])

    rep = json.loads((out_dir / "evaluation_scores.json").read_text())
    uni = rep["cox_univariable"]["covariates"]
    assert [r["covariate"] for r in uni] == ["score_per_sd"]

    s = df["score"].to_numpy(np.float64)
    direct = cox_ph(df["survival_months"], df["vital_status"].astype(bool),
                    s / s.std(), names=["score_per_sd"])
    assert uni[0]["hr"] == pytest.approx(float(direct.hr[0]), rel=1e-8)
    assert uni[0]["p"] == pytest.approx(float(direct.p_value[0]), rel=1e-6)

    adj = rep["cox_adjusted"]
    assert {r["covariate"] for r in adj["covariates"]} == \
        {"score_per_sd", "age", "gender_M"}
    assert adj["n"] == 100 and adj["n_dropped_missing"] == 0
    # the score stays a strong effect after adjusting for noise covariates
    score_row = next(r for r in adj["covariates"]
                     if r["covariate"] == "score_per_sd")
    assert score_row["hr"] > 1.5 and score_row["p"] < 1e-4

    cox_table = pd.read_csv(out_dir / "cox_scores.csv")
    assert set(cox_table["model"]) == {"cox_univariable", "cox_adjusted"}
    assert set(cox_table.columns) >= {"model", "covariate", "coef", "se",
                                      "z", "p", "hr", "hr_ci_lower",
                                      "hr_ci_upper"}


def test_evaluate_scores_cli_covariates_require_cohort(tmp_path):
    from multimodalbrainsurvival_tpu.cli.evaluate_scores import main

    csv = tmp_path / "scores.csv"
    _write_frame(csv, 30, seed=6)
    with pytest.raises(SystemExit, match="--cohort"):
        main(["--scores", str(csv), "--covariates", "age"])


def test_cox_adjusted_drops_missing_categorical_rows(tmp_path):
    """NaN in a CATEGORICAL covariate must drop the row, not silently code
    it as the reference level (pd.get_dummies maps NaN -> all-zero dummies,
    so the check must run before dummy-coding). Advisor r3 (medium)."""
    from multimodalbrainsurvival_tpu.cli.evaluate_scores import cox_models

    rng = np.random.default_rng(7)
    n = 80
    score = rng.normal(size=n)
    t = np.exp(2.0 - 1.2 * score + 0.3 * rng.normal(size=n))
    gender = rng.choice(["F", "M"], size=n).astype(object)
    gender[:7] = None  # missing categoricals
    df = pd.DataFrame({
        "id": [f"case{i}" for i in range(n)],
        "score": score,
        "survival_months": np.round(t, 2),
        "vital_status": 1,
        "gender": gender,
    })
    out, table = cox_models(df, ["gender"])
    adj = out["cox_adjusted"]
    assert adj["n_dropped_missing"] == 7
    assert adj["n"] == n - 7  # dropped, not coded as reference level

    # ground truth: fit only the complete rows directly
    from multimodalbrainsurvival_tpu.ops.survival import cox_ph
    keep = pd.notna(df["gender"]).to_numpy()
    s = df["score"].to_numpy(np.float64)
    X = np.column_stack([
        (s / s.std())[keep],
        (df.loc[keep, "gender"] == "M").to_numpy(np.float64),
    ])
    direct = cox_ph(df["survival_months"].to_numpy()[keep],
                    np.ones(keep.sum(), bool), X,
                    names=["score_per_sd", "gender_M"])
    got = {r["covariate"]: r["coef"] for r in adj["covariates"]}
    assert got["score_per_sd"] == pytest.approx(float(direct.coef[0]),
                                                rel=1e-8)
    assert got["gender_M"] == pytest.approx(float(direct.coef[1]), rel=1e-8)


def test_evaluate_scores_cohort_duplicate_cases_deduped(tmp_path, capsys):
    """Duplicate `case` rows in the cohort CSV must not replicate score rows
    (inflating n, understating SEs). Advisor r3 (low)."""
    from multimodalbrainsurvival_tpu.cli.evaluate_scores import main

    csv = tmp_path / "scores.csv"
    _write_frame(csv, 60, seed=9)
    df = pd.read_csv(csv)
    cohort = pd.DataFrame({
        "case": df["id"],
        "age": np.arange(len(df)) % 50 + 30,
    })
    # duplicate the first 10 cases with a different age
    dup = cohort.head(10).assign(age=99)
    pd.concat([cohort, dup]).to_csv(tmp_path / "cohort.csv", index=False)

    out_dir = tmp_path / "eval"
    main(["--scores", str(csv), "--output_dir", str(out_dir),
          "--n_boot", "10", "--cohort", str(tmp_path / "cohort.csv"),
          "--covariates", "age"])
    rep = json.loads((out_dir / "evaluation_scores.json").read_text())
    assert rep["cox_adjusted"]["n"] == 60  # NOT 70
    assert "duplicate case" in capsys.readouterr().out


def test_evaluate_scores_cohort_missing_case_column(tmp_path):
    """A cohort CSV without `case` exits cleanly, like other missing
    columns, instead of a raw pandas KeyError. Advisor r3 (low)."""
    from multimodalbrainsurvival_tpu.cli.evaluate_scores import main

    csv = tmp_path / "scores.csv"
    _write_frame(csv, 30, seed=11)
    pd.DataFrame({"patient": ["case0"], "age": [50]}).to_csv(
        tmp_path / "cohort.csv", index=False)
    with pytest.raises(SystemExit, match="case"):
        main(["--scores", str(csv), "--output_dir", str(tmp_path / "eval"),
              "--cohort", str(tmp_path / "cohort.csv"),
              "--covariates", "age"])


def test_cox_ph_reports_nonconvergence():
    """Monotone likelihood (complete separation) exhausts max_iter: the fit
    must say so via `converged` + a RuntimeWarning rather than returning
    huge coefs as a clean result. Advisor r3 (low)."""
    from multimodalbrainsurvival_tpu.ops.survival import cox_ph

    # group 0 all dies first, group 1 all censored late -> beta -> -inf
    t = np.array([1., 2., 3., 4., 10., 11., 12., 13.])
    e = np.array([1, 1, 1, 1, 0, 0, 0, 0], bool)
    x = np.array([0., 0., 0., 0., 1., 1., 1., 1.])
    with pytest.warns(RuntimeWarning, match="did not converge"):
        fit = cox_ph(t, e, x, names=["g"], max_iter=5)
    assert fit.converged is False

    # a well-posed fit converges and says so
    rng = np.random.default_rng(3)
    n = 100
    z = rng.normal(size=n)
    tt = np.exp(1.0 - 0.5 * z + rng.normal(size=n))
    fit2 = cox_ph(tt, np.ones(n, bool), z)
    assert fit2.converged is True


# ---------------------------------------------------------------------------
# Time-dependent accuracy: IPCW Brier score + cumulative/dynamic AUC
# ---------------------------------------------------------------------------


def _censored_sample(n, seed, censor_frac=0.35):
    """Risk-signal survival data with real censoring."""
    rng = np.random.default_rng(seed)
    score = rng.normal(size=n)
    t = np.exp(2.0 - 0.9 * score + 0.4 * rng.normal(size=n))
    e = rng.random(n) > censor_frac
    return t, e, score


def _loop_censoring_G(t, e):
    """Independent censoring-KM oracle: explicit product over distinct
    censoring times, at-risk rule `t >= u` (deaths before censorings)."""
    cens_times = np.unique(t[~e])

    def G(at, left=False):
        prod = 1.0
        for u in cens_times:
            if u < at or (not left and u == at):
                n_u = int(np.sum(t >= u))
                d_u = int(np.sum((t == u) & ~e))
                prod *= 1.0 - d_u / n_u
        return prod

    return G


def test_brier_no_censoring_reduces_to_mse():
    from multimodalbrainsurvival_tpu.ops.survival import brier_score

    rng = np.random.default_rng(0)
    n = 50
    t = rng.uniform(1, 100, n)
    e = np.ones(n, bool)
    taus = np.array([10.0, 30.0, 60.0])
    S = rng.uniform(0, 1, (n, taus.size))
    bs = brier_score(t, e, S, taus)
    expected = [np.mean(((t > tau).astype(float) - S[:, j]) ** 2)
                for j, tau in enumerate(taus)]
    np.testing.assert_allclose(bs, expected, rtol=1e-12)


def test_cumulative_dynamic_auc_no_censoring_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    from multimodalbrainsurvival_tpu.ops.survival import (
        cumulative_dynamic_auc,
    )

    rng = np.random.default_rng(1)
    n = 80
    score = rng.normal(size=n)
    t = np.exp(2.0 - score + 0.5 * rng.normal(size=n))
    e = np.ones(n, bool)
    taus = np.quantile(t, [0.25, 0.5, 0.75])
    auc, mean_auc = cumulative_dynamic_auc(t, e, score, taus)
    for j, tau in enumerate(taus):
        np.testing.assert_allclose(
            auc[j], roc_auc_score(t <= tau, score), rtol=1e-12
        )
    assert min(auc) <= mean_auc <= max(auc)


def test_brier_and_auc_match_loop_oracle_censored():
    """Both IPCW metrics against independent loop-written formulas with an
    independently-computed censoring KM (Graf 1999 / Uno 2007 forms)."""
    from multimodalbrainsurvival_tpu.ops.survival import (
        brier_score,
        cumulative_dynamic_auc,
    )

    t, e, score = _censored_sample(60, seed=2)
    taus = np.quantile(np.unique(t[e]), [0.2, 0.5, 0.8])
    rng = np.random.default_rng(3)
    S = rng.uniform(0, 1, (t.size, taus.size))
    G = _loop_censoring_G(t, e)

    bs_expected = []
    auc_expected = []
    for j, tau in enumerate(taus):
        acc = 0.0
        for i in range(t.size):
            if t[i] <= tau and e[i]:
                acc += S[i, j] ** 2 / G(t[i], left=True)
            elif t[i] > tau:
                acc += (1.0 - S[i, j]) ** 2 / G(tau)
        bs_expected.append(acc / t.size)

        num = den_w = 0.0
        n_ctrl = int(np.sum(t > tau))
        for i in range(t.size):
            if not (t[i] <= tau and e[i]):
                continue
            w = 1.0 / G(t[i], left=True)
            den_w += w
            for k in range(t.size):
                if t[k] > tau:
                    num += w * (float(score[i] > score[k])
                                + 0.5 * float(score[i] == score[k]))
        auc_expected.append(num / (den_w * n_ctrl))

    np.testing.assert_allclose(brier_score(t, e, S, taus), bs_expected,
                               rtol=1e-10)
    auc, _ = cumulative_dynamic_auc(t, e, score, taus)
    np.testing.assert_allclose(auc, auc_expected, rtol=1e-10)


def test_integrated_brier_score_is_the_trapezoid():
    from multimodalbrainsurvival_tpu.ops.survival import (
        brier_score,
        integrated_brier_score,
    )

    t, e, _ = _censored_sample(40, seed=4)
    taus = np.quantile(np.unique(t[e]), [0.2, 0.45, 0.8])
    S = np.random.default_rng(5).uniform(0, 1, (t.size, taus.size))
    bs = brier_score(t, e, S, taus)
    ibs = integrated_brier_score(t, e, S, taus)
    assert ibs == pytest.approx(
        np.trapezoid(bs, taus) / (taus[-1] - taus[0]), rel=1e-12
    )
    with pytest.raises(ValueError, match=">= 2 eval times"):
        integrated_brier_score(t, e, S[:, :1], taus[:1])


def test_auc_perfect_ranking_is_one_under_censoring():
    from multimodalbrainsurvival_tpu.ops.survival import (
        cumulative_dynamic_auc,
    )

    # score = -time: every case outranks every control at every horizon
    t = np.array([2., 4., 6., 8., 10., 12., 14., 16.])
    e = np.array([1, 1, 0, 1, 0, 1, 1, 0], bool)
    auc, mean_auc = cumulative_dynamic_auc(t, e, -t, np.array([5.0, 9.0]))
    np.testing.assert_allclose(auc, 1.0)
    assert mean_auc == pytest.approx(1.0)


def test_time_dependent_validation_errors():
    from multimodalbrainsurvival_tpu.ops.survival import (
        brier_score,
        cumulative_dynamic_auc,
    )

    t, e, score = _censored_sample(30, seed=6)
    S = np.full((30, 1), 0.5)
    with pytest.raises(ValueError, match="beyond follow-up"):
        brier_score(t, e, S, [float(t.max()) + 1.0])
    with pytest.raises(ValueError, match="strictly increasing"):
        cumulative_dynamic_auc(t, e, score, [5.0, 5.0])
    with pytest.raises(ValueError, match="surv_probs"):
        brier_score(t, e, np.full((30, 2), 0.5), [float(np.median(t))])
    with pytest.raises(ValueError, match="probabilities"):
        brier_score(t, e, np.full((30, 1), 1.5), [float(np.median(t))])


def test_default_eval_times_are_valid_horizons():
    from multimodalbrainsurvival_tpu.ops.survival import (
        brier_score,
        default_eval_times,
    )

    t, e, _ = _censored_sample(70, seed=7)
    taus = default_eval_times(t, e)
    assert taus.size >= 2
    assert np.all(np.diff(taus) > 0)
    for tau in taus:
        assert np.any((t <= tau) & e)  # a case exists
        assert np.any(t > tau)         # a control exists
    # the whole grid is usable by the metrics without raising
    S = np.full((t.size, taus.size), 0.5)
    assert np.all(np.isfinite(brier_score(t, e, S, taus)))
    # degenerate cohort: no events -> empty grid
    assert default_eval_times(t, np.zeros_like(e)).size == 0


def test_predict_survival_matrix_matches_rowwise():
    from multimodalbrainsurvival_tpu.ops.survival import cox_ph

    t, e, score = _censored_sample(50, seed=8)
    fit = cox_ph(t, e, score[:, None])
    at = np.quantile(t, [0.3, 0.6, 0.9])
    mat = fit.predict_survival(score[:, None], at)
    assert mat.shape == (50, 3)
    for i in (0, 17, 49):
        np.testing.assert_allclose(
            mat[i], fit.predict_survival(score[i:i + 1], at), rtol=1e-12
        )
    # survival curves decrease in t and in risk
    assert np.all(np.diff(mat, axis=1) <= 0)


def test_evaluate_scores_cli_time_dependent(tmp_path):
    from multimodalbrainsurvival_tpu.cli.evaluate_scores import main

    train_csv = tmp_path / "train_df.csv"
    test_csv = tmp_path / "test_df.csv"
    _write_frame(train_csv, 120, seed=9)
    _write_frame(test_csv, 90, seed=10)
    out_dir = tmp_path / "eval"
    main(["--scores", str(test_csv), "--train_scores", str(train_csv),
          "--output_dir", str(out_dir), "--n_boot", "20"])
    td = json.loads((out_dir / "evaluation_test_df.json").read_text())[
        "time_dependent"]
    assert td["calibration"] == "train_cox"
    assert len(td["eval_times"]) == len(td["auc"]) == len(td["brier"])
    # a strong risk signal must discriminate and beat the trivial 0.25
    assert td["mean_auc"] > 0.6
    assert 0.0 < td["ibs"] < 0.25

    # explicit horizons + self-calibration
    out2 = tmp_path / "eval2"
    main(["--scores", str(test_csv), "--output_dir", str(out2),
          "--n_boot", "20", "--eval_times", "5,10,20"])
    td2 = json.loads((out2 / "evaluation_test_df.json").read_text())[
        "time_dependent"]
    assert td2["calibration"] == "self_cox"
    assert td2["eval_times"] == [5.0, 10.0, 20.0]
