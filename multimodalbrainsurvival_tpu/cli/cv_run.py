"""K-fold cross-validation orchestrator (beyond-reference convenience).

The reference's published workflow evaluates every pipeline with K-fold CV,
but ships no driver for it: the user hand-splits the cohort, writes K config
files whose ``flag`` contains ``cv`` (the magic substring the savescore
naming keys on — ``2_GeneExpress_savescore.py:186-190``; our
``cli/_common.savescore_name``), and runs the task's train then savescore
script once per fold. This CLI automates exactly that loop for any of the
four trainable pipelines:

    python -m multimodalbrainsurvival_tpu.cli.cv_run \
        --config config_rna_train.json --task rna --folds 5

- **Split**: case-level (every row of a case lands in the same fold — no
  leakage across train/val, the error mode case-replicated survival cohorts
  invite), stratified by the case's event indicator so each fold holds
  events, deterministic under ``--seed``. The cohort is ``cv_csv_path`` if
  set, else the union of the base config's train+val CSVs.
- **Per fold k (1-based)**: writes ``<checkpoint_path>/cv/fold{k}/
  {train,val}.csv`` and a derived config with ``flag: "<flag>_cv{k}"``, then
  runs the task's train CLI and (unless ``--no_savescore``) its savescore
  CLI against the fold's best checkpoint
  (``<checkpoint_path>/models/<flag>_cv{k}/model_dict_best``). Score frames
  land under ``<checkpoint_path>/outputs/<flag>_cv{k}/`` with the
  reference's ``_cv`` file naming, so MergeScores / LateFusion consume them
  unchanged.
- **Summary**: for survival tasks, per-fold val/test C-index (one
  ``ops.metrics.survival_ci`` implementation, like every driver) plus
  mean +/- std across folds, printed and written to
  ``<checkpoint_path>/cv_summary.csv``.
- **Out-of-fold frame**: the fold val frames concatenate into
  ``<checkpoint_path>/cv_oof_val_df.csv`` — every case scored once by the
  model that never trained on it, with the pooled OOF C-index printed.
  This is the leak-free per-case score frame the late-fusion stage should
  train on (feed it to ``merge_scores``/``late_fusion`` in place of a
  train-split frame).
- **Fold ensemble**: when the base config pins a fixed ``test_csv_path``,
  the K fold models' test scores are averaged per case (the standard CV
  committee deployment the reference leaves to the user) into
  ``<checkpoint_path>/cv_ensemble_test_df.csv`` — savescore frame schema,
  so ``evaluate_scores``/``merge_scores`` consume it unchanged — and the
  ensemble C-index is printed.

Config keys: ``cv_csv_path`` (optional single-cohort CSV), ``cv_folds``
(overrides ``--folds``, config-over-args like the reference's flag
handling). Everything else is the task's normal train config; ``mesh`` /
``cache_patches_on_device`` / ``quantize_trunk`` etc. apply per fold
unchanged.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd

from multimodalbrainsurvival_tpu.cli._common import load_config, make_parser

TASKS = ("rna", "histo", "feature", "joint")


def _task_mains(task: str):
    """(train_main, savescore_main) for a pipeline, imported lazily so one
    task's optional deps never block another's run."""
    if task == "rna":
        from multimodalbrainsurvival_tpu.cli import rna_savescore, rna_train

        return rna_train.main, rna_savescore.main
    if task == "histo":
        from multimodalbrainsurvival_tpu.cli import histo_savescore, histo_train

        return histo_train.main, histo_savescore.main
    if task == "feature":
        from multimodalbrainsurvival_tpu.cli import (
            feature_savescore,
            feature_train,
        )

        return feature_train.main, feature_savescore.main
    if task == "joint":
        from multimodalbrainsurvival_tpu.cli import joint_savescore, joint_train

        return joint_train.main, joint_savescore.main
    raise ValueError(f"--task must be one of {TASKS}, got {task!r}")


def load_cohort(config) -> pd.DataFrame:
    """The frame to split: ``cv_csv_path`` or train ∪ val rows."""
    if config.get("cv_csv_path"):
        return pd.read_csv(config["cv_csv_path"])
    frames = [pd.read_csv(config[k]) for k in ("train_csv_path", "val_csv_path")
              if config.get(k)]
    if not frames:
        raise ValueError("config needs cv_csv_path or train/val_csv_path")
    return pd.concat(frames, ignore_index=True)


def assign_folds(df: pd.DataFrame, k: int, seed: int) -> dict[str, int]:
    """case → fold index. Case-level so multi-WSI/multi-row cases never
    straddle a fold boundary; stratified on the case's event indicator
    (max ``vital_status`` over its rows) so no fold is event-free."""
    if "case" not in df.columns:
        raise ValueError("cohort CSV needs a 'case' column for CV splitting")
    cases = df["case"].astype(str)
    if "vital_status" in df.columns:
        strata = df.groupby(cases, sort=True)["vital_status"].max()
    else:
        strata = pd.Series(0, index=sorted(cases.unique()))
    if len(strata) < k:
        raise ValueError(f"{len(strata)} cases cannot fill {k} folds")
    rng = np.random.default_rng(seed)
    fold_of: dict[str, int] = {}
    for _, group in strata.groupby(strata):
        ids = list(group.index)
        rng.shuffle(ids)
        # round-robin with a random phase: each stratum spreads evenly over
        # the folds instead of always loading fold 0 first
        phase = int(rng.integers(k))
        for i, case in enumerate(ids):
            fold_of[case] = (i + phase) % k
    return fold_of


def _fold_frame(output_dir: str, flag_k: str, split: str):
    """One fold's saved ``<split>`` survival score frame, or None when the
    task wrote no survival frame (classification) or skipped the split."""
    pattern = os.path.join(output_dir, f"*_{split}_*{flag_k}*_df.csv")
    matches = sorted(glob.glob(pattern))
    if not matches:
        return None
    frame = pd.read_csv(matches[0])
    need = {"score", "survival_months", "vital_status"}
    if not need.issubset(frame.columns):
        return None
    return frame


def _frame_ci(frame: pd.DataFrame) -> float:
    from multimodalbrainsurvival_tpu.ops.metrics import survival_ci

    ci, _ = survival_ci(
        frame["score"].to_numpy(),
        list(frame["id"] if "id" in frame.columns else frame.index),
        frame["survival_months"].to_numpy(),
        frame["vital_status"].to_numpy(),
    )
    return float(ci)


def _fold_ci(output_dir: str, flag_k: str, split: str):
    """C-index of one fold's saved ``<split>`` score frame, or None."""
    frame = _fold_frame(output_dir, flag_k, split)
    return None if frame is None else _frame_ci(frame)


def ensemble_frames(frames: list) -> pd.DataFrame:
    """Average the fold models' risk scores per case — the standard way a
    K-fold CV committee is deployed on a held-out cohort.

    The reference stops at per-fold score frames (``3_HistoPath_savescore.py:
    344-349`` writes ``..._cv{k}_df.csv`` and leaves combination to the
    user); this completes the protocol. Cases are inner-joined on ``id``
    (a case missing from any fold's frame is dropped — every fold must have
    voted), ``score`` is the across-fold mean, and the survival labels come
    from the first frame (constant per case by construction). The result has
    the exact savescore frame schema, so ``evaluate_scores`` /
    ``merge_scores`` consume it unchanged.
    """
    if not frames:
        raise ValueError("no fold frames to ensemble")
    base = frames[0][["id", "survival_months", "vital_status"]]
    scores = None
    for k, frame in enumerate(frames):
        one = frame[["id", "score"]].rename(columns={"score": f"s{k}"})
        scores = one if scores is None else scores.merge(one, on="id",
                                                         how="inner")
    score_cols = [c for c in scores.columns if c != "id"]
    out = scores.merge(base, on="id", how="inner")
    out["score"] = out[score_cols].mean(axis=1)
    return out[["id", "score", "survival_months", "vital_status"]]


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--task", type=str, required=True,
                        help=f"pipeline to cross-validate: {'/'.join(TASKS)}")
    parser.add_argument("--folds", type=int, default=5,
                        help="number of CV folds (config cv_folds overrides)")
    parser.add_argument("--no_savescore", type=int, default=0,
                        help="1 = train the folds only, skip score export")
    args = parser.parse_args(argv)
    train_main, savescore_main = _task_mains(args.task)
    config, flag, checkpoint_path, _ = load_config(args)
    k = int(config.get("cv_folds", 0) or args.folds)

    df = load_cohort(config)
    fold_of = assign_folds(df, k, args.seed)
    folds = df["case"].astype(str).map(fold_of)
    cv_dir = os.path.join(checkpoint_path, "cv")

    child_args = ["--seed", str(args.seed)]
    if args.quick:
        child_args += ["--quick", "1"]

    rows = []
    for f in range(k):
        fold_dir = os.path.join(cv_dir, f"fold{f + 1}")
        os.makedirs(fold_dir, exist_ok=True)
        train_csv = os.path.join(fold_dir, "train.csv")
        val_csv = os.path.join(fold_dir, "val.csv")
        df[folds != f].to_csv(train_csv, index=False)
        df[folds == f].to_csv(val_csv, index=False)

        flag_k = f"{flag}_cv{f + 1}"
        raw = {key: v for key, v in dict(config.raw).items()
               if not key.startswith("cv_")}
        raw.update(
            train_csv_path=train_csv,
            val_csv_path=val_csv,
            # an unseen test split stays fixed across folds when the base
            # config has one; else fall back to the fold's val split so every
            # train CLI (which loads all three) still runs
            test_csv_path=config.get("test_csv_path") or val_csv,
            flag=flag_k,
        )
        cfg_path = os.path.join(fold_dir, "config_train.json")
        with open(cfg_path, "w") as fh:
            json.dump(raw, fh, indent=2)

        n_val = int((folds == f).sum())
        print(f"=== fold {f + 1}/{k}: {len(df) - n_val} train rows, "
              f"{n_val} val rows (flag {flag_k}) ===")
        train_main(["--config", cfg_path] + child_args)

        row = {"fold": f + 1, "flag": flag_k,
               "n_train_rows": len(df) - n_val, "n_val_rows": n_val}
        if not args.no_savescore:
            output_dir = os.path.join(checkpoint_path, "outputs", flag_k)
            score_raw = dict(
                raw,
                model_path=os.path.join(checkpoint_path, "models", flag_k,
                                        "model_dict_best"),
                restore_path="",
                output_path=output_dir,
            )
            score_path = os.path.join(fold_dir, "config_savescore.json")
            with open(score_path, "w") as fh:
                json.dump(score_raw, fh, indent=2)
            savescore_main(["--config", score_path] + child_args)
            for split in ("val", "test"):
                ci = _fold_ci(output_dir, flag_k, split)
                if ci is not None:
                    row[f"{split}_CI"] = ci
        rows.append(row)

    summary = pd.DataFrame(rows)
    for split in ("val", "test"):
        col = f"{split}_CI"
        if col in summary.columns:
            # CI is NaN for a fold with no comparable pairs (tiny or fully
            # censored val split) — report over the folds where it exists
            good = summary[col].dropna()
            print(f"CV {split} CI: {good.mean():.4f} "
                  f"+/- {good.std(ddof=0):.4f} over {len(good)}/{k} folds")
    out = os.path.join(checkpoint_path, "cv_summary.csv")
    summary.to_csv(out, index=False)
    print(f"wrote {out}")

    # Out-of-fold frame: the fold val splits partition the cohort, so
    # concatenating them scores every case exactly once by the one model
    # that never saw it — the leak-free score frame a downstream
    # merge_scores -> late_fusion stage should train on.
    if not args.no_savescore:
        val_frames = [f for f in (
            _fold_frame(os.path.join(checkpoint_path, "outputs",
                                     f"{flag}_cv{j + 1}"),
                        f"{flag}_cv{j + 1}", "val")
            for j in range(k)) if f is not None]
        if val_frames and len(val_frames) == k:
            oof = pd.concat(val_frames, ignore_index=True)
            dup = oof["id"].duplicated()
            if dup.any():  # can't happen with assign_folds' partition
                print(f"warning: {int(dup.sum())} duplicate cases across "
                      "fold val frames")
            oof_out = os.path.join(checkpoint_path, "cv_oof_val_df.csv")
            oof.to_csv(oof_out, index=False)
            print(f"CV out-of-fold val CI: {_frame_ci(oof):.4f} over "
                  f"{len(oof)} cases (pooled across {k} folds)")
            print("  note: Cox risk scores are rank-comparable only within "
                  "a fold; pooling mixes K model scales — compare against "
                  "the per-fold mean +/- std above")
            print(f"wrote {oof_out}")

    # Fold-ensemble deployment: when the base config pins a test split that
    # stays FIXED across folds, average every fold model's test scores per
    # case and report the committee's C-index. (The per-fold val splits are
    # disjoint cohorts — averaging them would be meaningless.)
    if not args.no_savescore and config.get("test_csv_path"):
        frames = [f for f in (
            _fold_frame(os.path.join(checkpoint_path, "outputs",
                                     f"{flag}_cv{j + 1}"),
                        f"{flag}_cv{j + 1}", "test")
            for j in range(k)) if f is not None]
        if frames and len(frames) == k:
            ens = ensemble_frames(frames)
            if len(ens) < max(len(f) for f in frames):
                print(f"ensemble dropped {max(len(f) for f in frames) - len(ens)} "
                      "cases missing from some fold's frame")
            ens_out = os.path.join(checkpoint_path, "cv_ensemble_test_df.csv")
            ens.to_csv(ens_out, index=False)
            ci = _frame_ci(ens)
            print(f"CV ensemble test CI: {ci:.4f} over {len(ens)} cases "
                  f"({k} fold models averaged)")
            print(f"wrote {ens_out}")


if __name__ == "__main__":
    main()
