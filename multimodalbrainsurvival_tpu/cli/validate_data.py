"""Pre-flight cohort/data validation CLI (beyond-reference usability).

The reference has no input validation at all: a missing ``survival_bin``
column crashes mid-epoch (``2_HistoPath_train.py:313``), a truncated patch
directory raises ``FileNotFoundError`` deep inside a DataLoader worker, and
a train/val case overlap silently inflates every reported C-index. This CLI
runs the same contracts our data layer enforces — plus the silent-leakage
checks nothing enforces — BEFORE a training job is launched::

    python -m multimodalbrainsurvival_tpu.cli.validate_data \
        --config config_ffpe_train.json --task histo

Checks, per split CSV (``{train,val,test}_csv_path``):

- file exists and parses; required label columns for the config's task
  (``case`` + ``survival_months``/``vital_status`` for Cox,
  ``survival_bin`` for the discrete task — incl. the histo driver's quirk
  of reading it unconditionally, SURVEY.md §2.4 — ``label`` for
  classification);
- label sanity: NaN labels, negative survival months, non-{0,1} vital
  status, non-integer survival bins;
- modality columns: ``rna_``/``feature_`` column count (and, for RNA,
  order/width vs the gene vocabulary — ``data/genes.py``; an explicit
  ``--genes`` file is a contract and mismatches are errors, the implicit
  reference default is advisory and mismatches warn), NaN/non-finite
  values in the modality matrix;
- histo/joint: every ``wsi_file_name``'s patch directory exists with a
  ``loc.txt``, the PNGs (or packed ``patches.npy``) the loc count promises
  are actually on disk, and slides whose usable patch count falls below
  ``bag_size`` (their bags silently drop, ``models.py:266-267``) are
  called out;
- cross-split: case overlap between train/val/test (leakage), duplicate
  ``wsi_file_name`` rows within a split.

Findings print as ``ERROR``/``WARN`` lines plus a summary; exit status is
non-zero iff errors were found (warnings alone pass), so the command slots
into job-submission scripts as a gate.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

from multimodalbrainsurvival_tpu.cli._common import make_parser
from multimodalbrainsurvival_tpu.config import Config
from multimodalbrainsurvival_tpu.data.genes import (
    REFERENCE_GENES_TXT,
    GeneVocabulary,
)

TASKS = ("histo", "rna", "feature", "joint")


class Report:
    def __init__(self) -> None:
        self.errors: list[str] = []
        self.warnings: list[str] = []

    def error(self, msg: str) -> None:
        self.errors.append(msg)
        print(f"ERROR: {msg}")

    def warn(self, msg: str) -> None:
        self.warnings.append(msg)
        print(f"WARN: {msg}")


def _check_labels(df: pd.DataFrame, split: str, task: str, target_label: str,
                  rep: Report) -> None:
    required = ["case"]
    if task == "survival_prediction":
        required += ["survival_months", "vital_status"]
    elif task == "survival_bin":
        # the histo driver reads survival_bin unconditionally AND the Cox
        # labels for the CI metric (2_HistoPath_train.py:313, :184-209)
        required += ["survival_months", "vital_status", "survival_bin"]
    elif task == "classification":
        required += [target_label]
    missing = [c for c in required if c not in df.columns]
    if missing:
        rep.error(f"{split}: missing required columns: {', '.join(missing)}")
        return
    for col in required:
        n_nan = int(df[col].isna().sum())
        if n_nan:
            rep.error(f"{split}: {n_nan} NaN values in '{col}'")
    if "survival_months" in required:
        months = pd.to_numeric(df["survival_months"], errors="coerce")
        neg = int((months < 0).sum())
        if neg:
            rep.error(f"{split}: {neg} negative survival_months values")
    if "vital_status" in required:
        status = pd.to_numeric(df["vital_status"], errors="coerce")
        bad = int((~status.isin([0, 1])).sum())
        if bad:
            rep.error(f"{split}: {bad} vital_status values outside {{0, 1}}")
        elif int(status.sum()) == 0:
            rep.warn(f"{split}: fully censored split (zero events) — the Cox "
                     "loss is identically zero and the C-index undefined")
    if "survival_bin" in required:
        bins = pd.to_numeric(df["survival_bin"], errors="coerce")
        if not np.array_equal(bins.dropna(), bins.dropna().astype(int)):
            rep.error(f"{split}: non-integer survival_bin values")


def _check_modality(df: pd.DataFrame, split: str, prefix: str, vocab,
                    rep: Report, *, vocab_strict: bool = True) -> None:
    cols = [c for c in df.columns if prefix in c]
    if not cols:
        rep.error(f"{split}: no '{prefix}' columns found")
        return
    mat = df[cols].apply(pd.to_numeric, errors="coerce").to_numpy()
    n_bad = int((~np.isfinite(mat)).sum())
    if n_bad:
        rep.error(f"{split}: {n_bad} NaN/non-finite values across the "
                  f"{len(cols)} '{prefix}' columns")
    if vocab is not None and prefix == "rna_":
        if len(cols) != len(vocab):
            # an explicit --genes vocabulary is a contract (error); the
            # implicit reference default is advisory for non-reference
            # cohorts (warn)
            report = rep.error if vocab_strict else rep.warn
            report(f"{split}: {len(cols)} 'rna_' columns but the gene "
                   f"vocabulary defines {len(vocab)} genes")
        else:
            syms = [c.split("rna_", 1)[-1] for c in cols]
            mismatched = sum(1 for s, v in zip(syms, vocab.symbols) if s != v)
            if mismatched:
                rep.warn(f"{split}: {mismatched}/{len(cols)} rna_ columns "
                         "out of vocabulary order (models trained on the "
                         "canonical order need data/genes.reorder)")


def _check_patches(df: pd.DataFrame, split: str, data_path: str,
                   bag_size: int, max_total: int, rep: Report) -> None:
    if "wsi_file_name" not in df.columns:
        rep.error(f"{split}: missing required column 'wsi_file_name'")
        return
    dup = df["wsi_file_name"].duplicated()
    if dup.any():
        rep.error(f"{split}: {int(dup.sum())} duplicate wsi_file_name rows "
                  "(the last row silently wins in the bag index)")
    for name in df["wsi_file_name"].astype(str):
        wsi = name.split(".")[0]
        d = os.path.join(data_path, wsi)
        loc = os.path.join(d, "loc.txt")
        if not os.path.isdir(d):
            rep.error(f"{split}: patch directory missing for {name}: {d}")
            continue
        if not os.path.isfile(loc):
            rep.error(f"{split}: {wsi}: no loc.txt in {d}")
            continue
        with open(loc) as f:
            n = sum(1 for _ in f) - 2  # two header lines (models.py:258)
        if n <= 0:
            rep.error(f"{split}: {wsi}: loc.txt promises no patches (n={n})")
            continue
        usable = min(n, max_total)
        packed = os.path.join(d, "patches.npy")
        # mirror the loader's branch exactly (data/patches.py:108): a stale
        # shard (mtime older than loc.txt) is IGNORED by the loader, which
        # falls back to PNGs — so validate the PNGs in that case, not the
        # shard, or a stale shard with missing PNGs would pass here yet
        # crash the loader mid-job.
        if os.path.isfile(packed) and os.path.getmtime(
                packed) >= os.path.getmtime(loc):
            try:
                n_packed = len(np.load(packed, mmap_mode="r"))
            except Exception as e:  # corrupt shard
                rep.error(f"{split}: {wsi}: unreadable patches.npy ({e})")
                n_packed = None
            if n_packed is not None and n_packed < usable:
                rep.error(f"{split}: {wsi}: patches.npy holds {n_packed} "
                          f"patches but loc.txt promises {n}")
        else:
            # the bag index constructs paths 0..usable-1; spot the endpoints
            for i in (0, usable - 1):
                p = os.path.join(d, f"{wsi}_patch_{i}.png")
                if not os.path.isfile(p):
                    rep.error(f"{split}: {wsi}: loc.txt promises {n} patches "
                              f"but {os.path.basename(p)} is missing")
                    break
        if usable < bag_size:
            rep.warn(f"{split}: {wsi}: only {usable} usable patches < "
                     f"bag_size {bag_size} — every bag drops "
                     "(models.py:266-267), the slide never trains")


def main(argv=None) -> int:
    parser = make_parser(__doc__)
    parser.add_argument("--task", type=str, required=True,
                        help=f"pipeline to validate: {'/'.join(TASKS)}")
    parser.add_argument("--genes", type=str, default="",
                        help="gene vocabulary file (default: the reference "
                             "genes.txt when present; '' skips the check)")
    args = parser.parse_args(argv)
    if args.task not in TASKS:
        raise SystemExit(f"unknown --task {args.task!r}; one of {TASKS}")
    config = Config.from_json(args.config)
    task = config.get("task", "survival_prediction")
    target_label = config.get("target_label", "label")
    rep = Report()

    vocab = None
    if args.task in ("rna", "joint"):
        genes_path = args.genes or (
            REFERENCE_GENES_TXT if os.path.isfile(REFERENCE_GENES_TXT) else "")
        if genes_path:
            vocab = GeneVocabulary.from_file(genes_path)
            print(f"gene vocabulary: {genes_path} ({len(vocab)} genes)")

    cases: dict[str, set] = {}
    for split in ("train", "val", "test"):
        key = f"{split}_csv_path"
        path = config.get(key, "")
        if not path:
            rep.warn(f"{key} not set — split skipped")
            continue
        if not os.path.isfile(path):
            rep.error(f"{key}: no such file: {path}")
            continue
        try:
            df = pd.read_csv(path)
        except Exception as e:
            rep.error(f"{key}: unreadable CSV ({e})")
            continue
        df.columns = [c.lstrip("﻿") for c in df.columns]
        print(f"-- {split}: {path} ({len(df)} rows)")
        if not len(df):
            rep.error(f"{split}: empty cohort")
            continue
        _check_labels(df, split, task, target_label, rep)
        if "case" in df.columns:
            cases[split] = set(df["case"].astype(str))
        if args.task in ("rna", "joint"):
            _check_modality(df, split, "rna_", vocab, rep,
                            vocab_strict=bool(args.genes))
        if args.task == "feature":
            _check_modality(df, split, "feature_", None, rep)
        if args.task in ("histo", "joint"):
            data_path = config.get("data_path", "")
            if not data_path:
                rep.error("config has no data_path (patch root)")
            else:
                # test reuses the val caps, like the histo driver
                # (cli/histo_train.py:101-126)
                which = "train" if split == "train" else "val"
                bag = int(config.get(f"{which}_bag_size", 1))
                max_total = int(config.get(f"max_patch_per_wsi_{which}",
                                           1000))
                _check_patches(df, split, data_path, bag, max_total, rep)

    for a, b in (("train", "val"), ("train", "test"), ("val", "test")):
        overlap = cases.get(a, set()) & cases.get(b, set())
        if overlap:
            rep.error(f"case leakage: {len(overlap)} cases appear in both "
                      f"{a} and {b} (e.g. {sorted(overlap)[:3]})")

    print(f"validation: {len(rep.errors)} error(s), "
          f"{len(rep.warnings)} warning(s)")
    if rep.errors:
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
