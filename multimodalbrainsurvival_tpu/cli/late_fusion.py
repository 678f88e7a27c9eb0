"""Late fusion CLI: cross-validated Cox elastic-net over unimodal risk scores.

Single-language replacement for ``4_LateFusion/2_LateFusion.R``: reads the
merged score frames (``combined_score_train.csv`` / ``combined_score_val.csv``
from ``merge_scores``), fits ``cv.glmnet(family='cox')``-equivalent on the
``(path_score, rna_score)`` covariates (the R script's ``[, c(2,6)]`` column
pick, resolved here by name), predicts the linear score at ``lambda.min`` and
writes ``model_late_train.csv`` / ``model_late_val.csv`` with a ``score``
column appended (``2_LateFusion.R:38-48``).
"""

from __future__ import annotations

import argparse
import os

import pandas as pd

from multimodalbrainsurvival_tpu.ops.coxnet import fit_coxnet
from multimodalbrainsurvival_tpu.ops.metrics import concordance_index_censored


def run_late_fusion(
    train_csv: str,
    val_csv: str,
    output_dir: str = ".",
    covariates: tuple = ("path_score", "rna_score"),
    seed: int = 0,
) -> dict:
    train = pd.read_csv(train_csv)
    val = pd.read_csv(val_csv)
    cov = list(covariates)

    fit = fit_coxnet(
        train[cov].to_numpy(),
        train["survival_months"].to_numpy(),
        train["vital_status"].to_numpy(),
        seed=seed,
    )
    print(f"lambda.min = {fit.lambda_min:.5f}, beta = {dict(zip(cov, fit.beta))}")

    results = {}
    for name, frame in (("train", train), ("val", val)):
        scores = fit.predict(frame[cov].to_numpy())
        out = frame.copy()
        out["score"] = scores
        path = os.path.join(output_dir, f"model_late_{name}.csv")
        out.to_csv(path, index=False)
        ci = concordance_index_censored(
            frame["vital_status"].to_numpy().astype(bool),
            frame["survival_months"].to_numpy(),
            scores,
        )
        print(f"late fusion {name} CI = {ci:.3f} -> {path}")
        results[name] = {"ci": ci, "frame": out}
    results["fit"] = fit
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_csv", default="combined_score_train.csv")
    p.add_argument("--val_csv", default="combined_score_val.csv")
    p.add_argument("--output_dir", default=".")
    p.add_argument("--covariates", nargs="+",
                   default=["path_score", "rna_score"])
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)
    os.makedirs(a.output_dir, exist_ok=True)
    run_late_fusion(a.train_csv, a.val_csv, a.output_dir,
                    tuple(a.covariates), a.seed)


if __name__ == "__main__":
    main()
