"""Merge unimodal risk-score frames for late fusion.

Parity with ``4_LateFusion/1_MergeScores.py``: inner-join pathology and RNA
per-case score frames into ``combined_scores.csv`` with columns
``case, score→path_score, survival_months, vital_status, rna_score``
(the ``ExampleData/late_example.csv`` schema). Paths are CLI flags.
"""

from __future__ import annotations

import argparse

import pandas as pd


def merge_scores(pathology_scores: str, rna_scores: str, output: str) -> pd.DataFrame:
    path_df = pd.read_csv(pathology_scores, header=0)
    path_df = path_df.rename({"score": "path_score", "id": "case"}, axis=1)
    rna_df = pd.read_csv(rna_scores, header=0)
    rna_df = rna_df.rename({"score": "rna_score", "id": "case"}, axis=1)
    final = path_df.merge(rna_df[["case", "rna_score"]], how="inner", on="case")
    final = final.drop(columns=[c for c in final.columns if c.startswith("Unnamed")])
    final.to_csv(output, index=False)
    return final


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pathology_scores", default="savescore/ffpe_scores.csv")
    p.add_argument("--rna_scores", default="savescore/rna_scores.csv")
    p.add_argument("--output", default="combined_scores.csv")
    a = p.parse_args(argv)
    final = merge_scores(a.pathology_scores, a.rna_scores, a.output)
    print(final.shape)


if __name__ == "__main__":
    main()
