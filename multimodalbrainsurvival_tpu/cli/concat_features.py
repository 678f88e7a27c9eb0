"""Concatenate RNA + pathology feature embeddings for early fusion.

Parity with ``3_EarlyFusion/1_Concat2Features.py``: inner-join the 2048-d RNA
and 2048-d pathology per-case features with patient info, producing a
``features.csv`` whose columns are ``case, survival_months, vital_status,
feature_<i>_x..., feature_<i>_y...`` (the layout of
``ExampleData/early_example.csv``). The reference's off-by-one rename
(``columns[4:]`` at ``1_Concat2Features.py:63``, which drops a feature column)
is fixed here — §2.4 of SURVEY.md.

Paths are CLI flags (the reference hardcodes them).
"""

from __future__ import annotations

import argparse

import pandas as pd


def concat_features(
    rna_cases: str,
    rna_features: str,
    pathology_cases: str,
    pathology_features: str,
    patientinfo: str,
    output: str,
) -> pd.DataFrame:
    rna_c = pd.read_csv(rna_cases, header=0)
    rna_f = pd.read_csv(rna_features, header=None)
    path_c = pd.read_csv(pathology_cases, header=0)
    path_f = pd.read_csv(pathology_features, header=None)
    info = pd.read_csv(patientinfo, header=0)
    info = info[["case", "survival_months", "vital_status"]]

    rna_f = rna_f.copy()
    rna_f["case"] = list(rna_c["0"])
    path_f = path_f.copy()
    path_f["case"] = list(path_c["0"])

    merged = rna_f.merge(path_f, how="inner", on="case")
    final = info.merge(merged, how="inner", on="case")
    final.columns = ["case", "survival_months", "vital_status"] + [
        f"feature_{col}" for col in list(final.columns)[3:]
    ]
    final.to_csv(output, index=False)
    return final


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rna_cases", default="extractfeatures/rna_cases.csv")
    p.add_argument("--rna_features", default="extractfeatures/rna_features.csv")
    p.add_argument("--pathology_cases", default="extractfeatures/pathology_cases.csv")
    p.add_argument("--pathology_features",
                   default="extractfeatures/pathology_features.csv")
    p.add_argument("--patientinfo", default="patientinfo.csv")
    p.add_argument("--output", default="features.csv")
    a = p.parse_args(argv)
    final = concat_features(a.rna_cases, a.rna_features, a.pathology_cases,
                            a.pathology_features, a.patientinfo, a.output)
    print(final.shape)


if __name__ == "__main__":
    main()
