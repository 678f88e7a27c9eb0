"""Survival evaluation of savescore frames: KM, log-rank, bootstrap C-index.

The paper's downstream analysis (Steyaert et al. 2022) — which the reference
repo leaves to external R / lifelines tooling — as one command over the score
frames every savescore CLI writes (columns ``id, score, survival_months,
vital_status``; ``3_HistoPath_savescore.py:110-117`` schema):

- Harrell's C-index with a case-resampled bootstrap confidence interval.
- Risk stratification at the **median training score** (pass the train
  split's frame via ``--train_scores``; falls back to the evaluated frame's
  own median otherwise, and the report records which).
- Kaplan-Meier curves per risk group with Greenwood log-minus-log bands,
  per-group median survival, and the log-rank test between groups.
- Cox proportional-hazards regression on the model score — univariable
  always, and **covariate-adjusted** when clinical columns are supplied
  (``--cohort <csv> --covariates age,gender``; merged ``id`` → ``case``,
  categorical columns dummy-coded). Hazard ratios per score SD, Wald
  tests, likelihood-ratio test (``ops/survival.cox_ph``).
- Time-dependent accuracy: IPCW **Brier score / IBS** (calibration; the
  score becomes S(t|x) through a one-covariate Cox model, fitted on the
  train frame when ``--train_scores`` is given) and **cumulative/dynamic
  AUC(t)** (discrimination at each horizon), default horizons at the
  event-time percentiles, override with ``--eval_times 12,24,60``.

Outputs per input frame ``<name>.csv`` under ``--output_dir``:

- ``evaluation_<name>.json`` — the full report (also printed).
- ``km_<name>.csv`` — plot-ready per-group KM curves (time, survival, band,
  at-risk, observed).
- ``cox_<name>.csv`` — per-covariate Cox summary table (coef, se, z, p,
  HR + CI), one row block per fitted model.
- ``km_<name>.png`` — the KM figure (``--plot 1``; matplotlib).

Works on ANY of the pipelines' frames (pathology / RNA / early / joint) and
on the ``cv_run`` per-fold frames unchanged.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pandas as pd

from multimodalbrainsurvival_tpu.ops.survival import (
    bootstrap_concordance,
    brier_score,
    cox_ph,
    cumulative_dynamic_auc,
    default_eval_times,
    integrated_brier_score,
    kaplan_meier,
    logrank_test,
    risk_groups,
)

GROUP_NAMES = {0: "low", 1: "high"}
# dataviz reference palette, categorical slots 1-2 (validated order):
# low risk = blue, high risk = orange; light-mode surface/ink tokens
SERIES = {"low": "#2a78d6", "high": "#eb6834"}
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK_2 = "#52514e"


def _load_frame(path: str) -> pd.DataFrame:
    df = pd.read_csv(path, header=0)
    missing = {"score", "survival_months", "vital_status"} - set(df.columns)
    if missing:
        raise SystemExit(
            f"{path}: not a savescore frame — missing columns {sorted(missing)}"
        )
    return df


def evaluate_frame(df: pd.DataFrame, cutoff: float | None,
                   n_boot: int, seed: int, alpha: float = 0.05):
    """Full survival report for one score frame. Returns (report, km_frame)."""
    scores = df["score"].to_numpy(dtype=np.float64)
    months = df["survival_months"].to_numpy(dtype=np.float64)
    events = df["vital_status"].to_numpy().astype(bool)

    boot = bootstrap_concordance(months, scores, events,
                                 n_boot=n_boot, alpha=alpha, seed=seed)
    cutoff_source = "self_median" if cutoff is None else "train_median"
    grp, cutoff = risk_groups(scores, cutoff=cutoff)

    report = {
        "n_cases": int(len(df)),
        "n_events": int(events.sum()),
        **boot,
        "cutoff": cutoff,
        "cutoff_source": cutoff_source,
        "groups": {},
    }

    km_rows = []
    curves = {}
    for g in (0, 1):
        name = GROUP_NAMES[g]
        sel = grp == g
        if not sel.any():
            report["groups"][name] = {"n": 0, "events": 0,
                                      "median_survival": None}
            continue
        km = kaplan_meier(months[sel], events[sel], alpha=alpha)
        curves[name] = (km, months[sel], events[sel])
        med = km.median_survival
        report["groups"][name] = {
            "n": int(sel.sum()),
            "events": int(events[sel].sum()),
            "median_survival": med if np.isfinite(med) else None,
        }
        for i in range(km.time.size):
            km_rows.append({
                "group": name,
                "time": km.time[i],
                "survival": km.survival[i],
                "ci_lower": km.ci_lower[i],
                "ci_upper": km.ci_upper[i],
                "at_risk": km.at_risk[i],
                "observed": km.observed[i],
            })

    if len(curves) == 2:
        lr = logrank_test(months, events, grp)
        report["logrank_chi2"] = lr.chi2
        report["logrank_p"] = lr.p_value
    else:
        report["logrank_chi2"] = report["logrank_p"] = None

    return report, pd.DataFrame(km_rows), curves


def cox_models(df: pd.DataFrame, covariate_cols: list) -> tuple[dict, pd.DataFrame]:
    """Univariable (score only) + optional adjusted Cox PH fits.

    The score enters **per its own standard deviation** so the hazard ratio
    reads "per 1 SD of model risk score" — comparable across pipelines whose
    raw score scales differ. Categorical covariates are dummy-coded
    (first level is the reference); rows with missing covariates drop with
    a recorded count.
    """
    months = df["survival_months"].to_numpy(np.float64)
    events = df["vital_status"].to_numpy().astype(bool)
    score = df["score"].to_numpy(np.float64)
    sd = score.std()
    score_per_sd = score / sd if sd > 0 else score

    out: dict = {}
    rows = []

    def _fit(tag, X, names, t, e):
        try:
            fit = cox_ph(t, e, X, names=names)
        except (ValueError, np.linalg.LinAlgError) as err:
            out[tag] = {"error": str(err)}
            return
        out[tag] = {
            "covariates": fit.summary_rows(),
            "lr_chi2": fit.lr_chi2,
            "lr_p": fit.lr_p,
            "log_likelihood": fit.log_likelihood,
            "n": fit.n,
            "n_events": fit.n_events,
            "ties": fit.ties,
            "converged": fit.converged,
        }
        for r in fit.summary_rows():
            rows.append({"model": tag, **r})

    _fit("cox_univariable", score_per_sd[:, None], ["score_per_sd"],
         months, events)

    if covariate_cols:
        # Missing-row mask BEFORE dummy-coding: pd.get_dummies maps NaN in a
        # categorical column to an all-zero dummy row (i.e. silently codes it
        # as the reference level), so the NaN check must run on the raw
        # covariate frame, not the dummy-coded one.
        keep = ~df[covariate_cols].isna().any(axis=1).to_numpy()
        dropped = int((~keep).sum())
        covs = pd.get_dummies(df.loc[keep, covariate_cols], drop_first=True,
                              dtype=np.float64)
        X = np.column_stack([score_per_sd[keep],
                             covs.to_numpy(np.float64)])
        _fit("cox_adjusted", X, ["score_per_sd"] + list(covs.columns),
             months[keep], events[keep])
        if isinstance(out.get("cox_adjusted"), dict):
            out["cox_adjusted"]["n_dropped_missing"] = dropped

    return out, pd.DataFrame(rows)


def time_dependent_report(df: pd.DataFrame, train_df: pd.DataFrame | None,
                          eval_times: np.ndarray | None) -> dict:
    """IPCW Brier/IBS + cumulative/dynamic AUC(t) for one score frame.

    The scalar risk score becomes a survival function through a
    one-covariate Cox model (S(t|score) = exp(-H0(t) e^{beta*score}),
    Breslow baseline): fitted on the TRAIN frame when given (the proper
    protocol — calibration measured out-of-sample), else self-calibrated
    on the evaluated frame (recorded as such). The censoring distribution
    G is always estimated on the evaluated frame. AUC(t) uses the raw
    scores directly (discrimination needs no calibration).
    """
    months = df["survival_months"].to_numpy(np.float64)
    events = df["vital_status"].to_numpy().astype(bool)
    score = df["score"].to_numpy(np.float64)

    fit_df = train_df if train_df is not None else df
    try:
        fit = cox_ph(
            fit_df["survival_months"].to_numpy(np.float64),
            fit_df["vital_status"].to_numpy().astype(bool),
            fit_df["score"].to_numpy(np.float64)[:, None],
            names=["score"],
        )
    except (ValueError, np.linalg.LinAlgError) as err:
        return {"error": f"calibration Cox fit failed: {err}"}

    taus = (np.asarray(eval_times, np.float64) if eval_times is not None
            else default_eval_times(months, events))
    if taus.size == 0:
        return {"error": "no valid evaluation times (degenerate cohort)"}
    try:
        surv = fit.predict_survival(score[:, None], taus)
        auc, mean_auc = cumulative_dynamic_auc(months, events, score, taus)
        out = {
            "eval_times": [float(x) for x in taus],
            "auc": [float(x) if np.isfinite(x) else None for x in auc],
            "mean_auc": float(mean_auc) if np.isfinite(mean_auc) else None,
            "brier": [float(x) for x in
                      brier_score(months, events, surv, taus)],
            "calibration": ("train_cox" if train_df is not None
                            else "self_cox"),
        }
        if taus.size >= 2:
            out["ibs"] = integrated_brier_score(months, events, surv, taus)
        return out
    except ValueError as err:
        return {"error": str(err)}


def plot_km(curves: dict, report: dict, out_png: str, title: str) -> None:
    """KM step plot: 2 series (validated palette order), Greenwood bands,
    censor ticks, direct labels + legend, recessive grid, single axis."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7.0, 4.6), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    t_max = 0.0
    for name, (km, months, events) in curves.items():
        color = SERIES[name]
        # right-continuous step curve anchored at S(0)=1
        xs = np.concatenate([[0.0], km.time])
        ys = np.concatenate([[1.0], km.survival])
        ax.step(xs, ys, where="post", color=color, lw=2.0,
                label=f"{name} risk (n={report['groups'][name]['n']})",
                solid_capstyle="butt", zorder=3)
        finite = np.isfinite(km.ci_lower) & np.isfinite(km.ci_upper)
        if finite.any():
            ax.fill_between(km.time[finite], km.ci_lower[finite],
                            km.ci_upper[finite], step="post",
                            color=color, alpha=0.14, lw=0, zorder=2)
        # censor ticks on the curve
        cens = np.sort(months[~events])
        if cens.size:
            ax.plot(cens, km.step_function(cens), linestyle="none",
                    marker="|", markersize=7, markeredgewidth=1.2,
                    color=color, zorder=4)
        t_max = max(t_max, float(months.max()))

    p = report.get("logrank_p")
    if p is not None:
        label = f"log-rank p = {p:.2e}" if p < 1e-3 else f"log-rank p = {p:.3f}"
        ax.text(0.985, 0.97, label, transform=ax.transAxes,
                ha="right", va="top", fontsize=9, color=INK_2)

    ax.set_xlim(0, t_max * 1.02 if t_max else 1.0)
    ax.set_ylim(0.0, 1.02)
    ax.set_xlabel("Time (months)", color=INK)
    ax.set_ylabel("Survival probability", color=INK)
    ax.set_title(title, color=INK, fontsize=11, loc="left")
    ax.grid(axis="y", color="#e4e3df", lw=0.8, zorder=1)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color(INK_2)
    ax.tick_params(colors=INK_2, labelsize=9)
    leg = ax.legend(loc="lower left", frameon=False, fontsize=9)
    for text in leg.get_texts():
        text.set_color(INK)
    fig.tight_layout()
    fig.savefig(out_png, facecolor=SURFACE)
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scores", nargs="+", required=True,
                   help="savescore frame(s) to evaluate (val/test splits)")
    p.add_argument("--train_scores", default="",
                   help="train-split frame; fixes the risk cutoff at ITS "
                        "median score (the paper's protocol)")
    p.add_argument("--output_dir", default="evaluation")
    p.add_argument("--n_boot", type=int, default=1000,
                   help="bootstrap resamples for the C-index CI")
    p.add_argument("--alpha", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--plot", type=int, default=0,
                   help="1 = also write km_<name>.png")
    p.add_argument("--cohort", default="",
                   help="cohort CSV (reference ExampleData schema, `case` "
                        "ids) providing clinical covariates to adjust for")
    p.add_argument("--covariates", default="",
                   help="comma-separated cohort columns for the adjusted "
                        "Cox model (e.g. age,gender)")
    p.add_argument("--eval_times", default="",
                   help="comma-separated horizons (months) for the "
                        "time-dependent Brier/AUC metrics; default = "
                        "percentiles 10..90 of the frame's event times")
    a = p.parse_args(argv)

    covariate_cols = [c for c in a.covariates.split(",") if c]
    cohort_df = None
    if covariate_cols:
        if not a.cohort:
            raise SystemExit("--covariates needs --cohort")
        cohort_df = pd.read_csv(a.cohort, header=0)
        cohort_df.columns = [str(c).lstrip("﻿") for c in cohort_df.columns]
        missing = set(covariate_cols + ["case"]) - set(cohort_df.columns)
        if missing:
            raise SystemExit(f"{a.cohort}: missing column(s) "
                             f"{sorted(missing)}")
        cohort_df = cohort_df[["case"] + covariate_cols].astype({"case": str})
        if not cohort_df["case"].is_unique:
            n_dup = int(cohort_df["case"].duplicated().sum())
            print(f"# {a.cohort}: {n_dup} duplicate case row(s) dropped "
                  f"(keeping first) — duplicates would replicate score rows "
                  f"and understate Cox SEs")
            cohort_df = cohort_df.drop_duplicates("case", keep="first")

    cutoff = None
    train_df = None
    if a.train_scores:
        train_df = _load_frame(a.train_scores)
        cutoff = float(np.median(train_df["score"].to_numpy(np.float64)))
    eval_times = (np.array(sorted(float(x) for x in a.eval_times.split(",")
                                  if x))
                  if a.eval_times else None)

    os.makedirs(a.output_dir, exist_ok=True)
    for path in a.scores:
        name = os.path.splitext(os.path.basename(path))[0]
        df = _load_frame(path)
        report, km_frame, curves = evaluate_frame(
            df, cutoff, n_boot=a.n_boot, seed=a.seed, alpha=a.alpha
        )
        cox_df = df
        if cohort_df is not None:
            cox_df = df.assign(id=df["id"].astype(str)).merge(
                cohort_df, left_on="id", right_on="case", how="inner")
            if len(cox_df) < len(df):
                print(f"# {name}: {len(df) - len(cox_df)} score rows have "
                      f"no cohort match on id=case")
            elif len(cox_df) > len(df):
                # cannot happen after the cohort dedupe above; guard anyway
                print(f"# {name}: WARNING merge grew the frame "
                      f"{len(df)} -> {len(cox_df)} rows (duplicate cohort "
                      f"cases?) — Cox SEs would be understated")
        cox_report, cox_table = cox_models(cox_df, covariate_cols)
        report.update(cox_report)
        report["time_dependent"] = time_dependent_report(df, train_df,
                                                         eval_times)
        if len(cox_table):
            cox_path = os.path.join(a.output_dir, f"cox_{name}.csv")
            cox_table.to_csv(cox_path, index=False)
            print(f"wrote {cox_path}")
        report_path = os.path.join(a.output_dir, f"evaluation_{name}.json")
        with open(report_path, "w") as f:
            json.dump(report, f, indent=2)
        km_path = os.path.join(a.output_dir, f"km_{name}.csv")
        km_frame.to_csv(km_path, index=False)
        print(f"{name}: C-index {report['c_index']:.3f} "
              f"[{report['ci_lower']:.3f}, {report['ci_upper']:.3f}] "
              f"(n={report['n_cases']}, events={report['n_events']}); "
              f"log-rank p={report['logrank_p']}")
        uni = report.get("cox_univariable", {})
        for r in uni.get("covariates", []):
            print(f"{name}: Cox HR per score SD {r['hr']:.3f} "
                  f"[{r['hr_ci_lower']:.3f}, {r['hr_ci_upper']:.3f}], "
                  f"p={r['p']:.3g}")
        td = report["time_dependent"]
        if "error" not in td:
            mean_auc = td["mean_auc"]
            ibs = td.get("ibs")
            print(f"{name}: mean AUC(t) "
                  + (f"{mean_auc:.3f}" if mean_auc is not None else "n/a")
                  + (f", IBS {ibs:.4f}" if ibs is not None else "")
                  + f" over {len(td['eval_times'])} horizons "
                    f"({td['calibration']})")
        adj = report.get("cox_adjusted", {})
        for r in adj.get("covariates", []):
            print(f"{name}: adjusted Cox {r['covariate']}: HR {r['hr']:.3f} "
                  f"[{r['hr_ci_lower']:.3f}, {r['hr_ci_upper']:.3f}], "
                  f"p={r['p']:.3g}")
        print(f"wrote {report_path}")
        print(f"wrote {km_path}")
        if a.plot:
            png_path = os.path.join(a.output_dir, f"km_{name}.png")
            plot_km(curves, report, png_path, title=name)
            print(f"wrote {png_path}")


if __name__ == "__main__":
    main()
