"""Hyperparameter sweep orchestrator (beyond-reference convenience).

The reference's model selection is hand-edited config JSONs re-run one at a
time (`ExampleConfigs/*.json` ship single points; per-module LRs like
``lr_histo``/``lr_rna``/``lr_mlp`` in ``config_joint_train.json`` are the
knobs its paper tunes). This CLI runs the whole grid with one command, for
any of the four trainable pipelines::

    python -m multimodalbrainsurvival_tpu.cli.sweep \
        --config config_rna_train.json --task rna \
        --grid '{"lr_rna": [1e-4, 1e-5], "dropout": [0.3, 0.5]}'

- ``--grid`` is inline JSON ``{key: [values...]}`` or a path to a JSON
  file; the config key ``sweep_grid`` overrides it (config-over-args, like
  the reference's ``flag`` handling). Keys are ordinary train-config keys
  and are validated against the known-key schema up front — a typo'd key
  would otherwise train N identical models and "select" a winner from
  noise.
- Each combination c (1-based, cartesian product in sorted-key order)
  trains under ``flag: "<flag>_hp{c}"`` — checkpoints and score frames
  land in the standard per-flag layout, nothing is overwritten.
- Selection metric: the **validation** C-index of the best checkpoint's
  score frame (``outputs/<flag>_hp{c}/val_output_best.csv`` — the frame
  every train CLI already writes, ``2_HistoPath_train.py:422-432``). The
  test CI is recorded alongside for reporting but never drives selection.
- Artifacts: ``<checkpoint_path>/sweep_summary.csv`` (one row per combo,
  sorted by val CI) and ``<checkpoint_path>/sweep_best_config.json`` — the
  full merged config of the winner, ready to re-run or hand to ``cv_run``.

Budgeted modes (full cartesian grids are impractical at the paper's scale
on one chip):

- ``--max_trials N`` trains a seeded (``--seed``) random subset of N
  combinations; the dropped combos are named up front — never a silent cap.
- ``--halving ETA`` (eta >= 2) runs successive halving: every combo first
  trains a small epoch budget, then only the top ``1/eta`` by val CI
  *continue* (``resume: true`` — full train state incl. optimizer moments
  and the best-checkpoint race restores, so no epoch is retrained) to an
  ``eta``-times larger budget, until one winner finishes the config's full
  ``num_epochs``. Total epoch-units are typically a fraction of the full
  grid's ``n_combos * num_epochs`` (printed at the end, recorded per combo
  in the ``epochs_trained`` summary column).
"""

from __future__ import annotations

import itertools
import json
import math
import os

import numpy as np
import pandas as pd

from multimodalbrainsurvival_tpu.cli._common import load_config, make_parser
from multimodalbrainsurvival_tpu.cli.cv_run import (
    TASKS,
    _frame_ci,
    _task_mains,
)
from multimodalbrainsurvival_tpu.config import KNOWN_KEYS


def _normalize_grid(grid: dict, origin: str) -> dict:
    """Scalar values promote to one-element lists (``{"lr": 1e-4}`` pins a
    key across the sweep); empty value lists are rejected up front — they
    would expand to ZERO combinations and die later with an opaque
    ``KeyError`` from an empty summary frame."""
    if not isinstance(grid, dict) or not grid:
        raise SystemExit(f"{origin}: grid must be a non-empty JSON object")
    out = {}
    for k, v in grid.items():
        v = v if isinstance(v, list) else [v]
        if not v:
            raise SystemExit(
                f"{origin}: key {k!r} has an empty value list — every grid "
                "key needs at least one value")
        out[k] = v
    unknown = sorted(k for k in out if k not in KNOWN_KEYS)
    if unknown:
        raise SystemExit(
            f"{origin}: grid key(s) {unknown} are not recognized "
            "train-config keys — a typo here would train "
            "identical models and select a winner from noise "
            "(see multimodalbrainsurvival_tpu.config.KNOWN_KEYS)")
    return out


def parse_grid(spec: str) -> dict:
    """``--grid`` inline-JSON-or-path → {key: [values]}."""
    if not spec:
        raise SystemExit("--grid (or config sweep_grid) is required")
    if os.path.isfile(spec):
        with open(spec) as f:
            grid = json.load(f)
        return _normalize_grid(grid, spec)
    try:
        grid = json.loads(spec)
    except json.JSONDecodeError as err:
        raise SystemExit(f"--grid is neither a file nor JSON: {err}")
    return _normalize_grid(grid, "--grid")


def combinations(grid: dict) -> list[dict]:
    keys = sorted(grid)
    return [dict(zip(keys, values))
            for values in itertools.product(*(grid[k] for k in keys))]


def subsample(combos: list[dict], max_trials: int, seed: int) -> list[dict]:
    """Seeded random subset of the grid (``--max_trials``); deterministic
    under ``--seed``. Returns combos in original (cartesian) order."""
    if max_trials <= 0 or max_trials >= len(combos):
        return combos
    rng = np.random.default_rng(seed)
    keep = sorted(rng.choice(len(combos), size=max_trials, replace=False))
    dropped = len(combos) - max_trials
    print(f"--max_trials {max_trials}: sampling {max_trials}/{len(combos)} "
          f"combinations (seed {seed}); dropping {dropped}: "
          + "; ".join(
              ", ".join(f"{k}={v}" for k, v in sorted(combos[i].items()))
              for i in range(len(combos)) if i not in set(keep)))
    return [combos[i] for i in keep]


def halving_rungs(n_combos: int, num_epochs: int, eta: int) -> list[int]:
    """Cumulative epoch targets for successive halving: the first rung
    trains ``max(1, R // eta**k)`` epochs (k = rounds needed to shrink
    ``n_combos`` to 1 by keep-top-``1/eta``), each later rung eta-times
    more, the last always the full ``R = num_epochs``."""
    if n_combos <= 1:
        return [num_epochs]
    k = max(1, math.ceil(math.log(n_combos, eta)))
    targets = []
    for i in range(k, 0, -1):
        targets.append(max(1, num_epochs // eta**i))
    targets.append(num_epochs)
    # strictly increasing (tiny num_epochs can collapse early rungs)
    out = []
    for t in targets:
        if not out or t > out[-1]:
            out.append(t)
    return out


def _ci_of(output_dir: str, split: str):
    path = os.path.join(output_dir, f"{split}_output_best.csv")
    if not os.path.isfile(path):
        return None
    frame = pd.read_csv(path)
    if not {"score", "survival_months", "vital_status"}.issubset(frame.columns):
        return None  # classification task — no survival frame to rank
    return _frame_ci(frame)


def main(argv=None):
    parser = make_parser(__doc__)
    parser.add_argument("--task", type=str, required=True,
                        help=f"pipeline to sweep: {'/'.join(TASKS)}")
    parser.add_argument("--grid", type=str, default="",
                        help="JSON object {config_key: [values...]} or a "
                             "path to one (config sweep_grid overrides)")
    parser.add_argument("--max_trials", type=int, default=0,
                        help="train only a seeded random subset of N "
                             "combinations (0 = the full grid)")
    parser.add_argument("--halving", type=int, default=0,
                        help="successive-halving factor eta (>=2): short "
                             "budgets for all combos, top-1/eta continue "
                             "via resume until one finishes num_epochs "
                             "(0 = off, train every combo fully)")
    args = parser.parse_args(argv)
    if args.halving == 1 or args.halving < 0:
        raise SystemExit("--halving must be 0 (off) or an eta >= 2")
    train_main, _ = _task_mains(args.task)
    config, flag, checkpoint_path, _ = load_config(args)
    if config.get("sweep_grid"):
        grid = _normalize_grid(config["sweep_grid"], "config sweep_grid")
    else:
        grid = parse_grid(args.grid)
    combos = subsample(combinations(grid), args.max_trials, args.seed)
    num_epochs = config.num_epochs

    child_args = ["--seed", str(args.seed)]
    if args.quick:
        child_args += ["--quick", "1"]

    sweep_dir = os.path.join(checkpoint_path, "sweep")
    os.makedirs(sweep_dir, exist_ok=True)

    # combo id -> mutable record; ids are 1-based positions in the (possibly
    # subsampled) combo list so flags stay stable across rungs
    records = {c: {"combo": c, "flag": f"{flag}_hp{c}", **overrides,
                   "epochs_trained": 0, "val_CI": None, "test_CI": None}
               for c, overrides in enumerate(combos, start=1)}

    def run_combo(c: int, overrides: dict, target_epochs=None,
                  resume: bool = False) -> None:
        """Train one combo. ``target_epochs`` is only set by the halving
        rungs; the full-grid mode leaves the combo's own overrides (which
        may legitimately sweep ``num_epochs``) untouched."""
        flag_c = records[c]["flag"]
        raw = {k: v for k, v in dict(config.raw).items()
               if k != "sweep_grid"}
        raw.update(overrides, flag=flag_c)
        if target_epochs is not None:  # halving controls the budget
            raw.update(num_epochs=target_epochs, resume=bool(resume))
        cfg_path = os.path.join(sweep_dir, f"config_hp{c}.json")
        with open(cfg_path, "w") as fh:
            json.dump(raw, fh, indent=2)
        train_main(["--config", cfg_path] + child_args)
        records[c]["epochs_trained"] = (
            target_epochs if target_epochs is not None
            else int(raw.get("num_epochs", num_epochs)))
        output_dir = os.path.join(checkpoint_path, "outputs", flag_c)
        records[c]["val_CI"] = _ci_of(output_dir, "val")
        records[c]["test_CI"] = _ci_of(output_dir, "test")

    if args.halving:
        if "num_epochs" in grid:
            raise SystemExit(
                "--halving controls each combo's epoch budget itself — "
                "sweeping num_epochs at the same time is contradictory; "
                "drop it from the grid or run without --halving")
        if config.get("task", "survival_prediction") == "classification":
            raise SystemExit(
                "--halving ranks combos by the survival val C-index, which "
                "a classification task does not produce — run the full "
                "grid instead")
        rungs = halving_rungs(len(combos), num_epochs, args.halving)
        print(f"successive halving (eta={args.halving}): "
              f"{len(combos)} combos, cumulative epoch targets {rungs}")
        alive = list(records)  # combo ids still in the race
        for r, target in enumerate(rungs):
            for c in alive:
                rec = records[c]
                print(f"=== halving rung {r + 1}/{len(rungs)} "
                      f"(-> epoch {target}): combo {c} "
                      + ", ".join(f"{k}={v}" for k, v in sorted(
                          combos[c - 1].items()))
                      + f" (flag {rec['flag']}) ===")
                run_combo(c, combos[c - 1], target, resume=r > 0)
            if r == len(rungs) - 1:
                break
            if all(records[c]["val_CI"] is None for c in alive):
                # backstop (the classification case is rejected up front):
                # persist the completed rung's work before bailing
                pd.DataFrame(list(records.values())).to_csv(
                    os.path.join(checkpoint_path, "sweep_summary.csv"),
                    index=False)
                raise SystemExit(
                    "--halving: no combo produced a survival val score "
                    "frame to rank by after rung 1 (partial results in "
                    "sweep_summary.csv) — run the full grid instead")
            ranked_alive = sorted(
                alive,
                key=lambda c: (records[c]["val_CI"] is not None,
                               records[c]["val_CI"] or 0.0),
                reverse=True)
            keep = max(1, math.ceil(len(alive) / args.halving))
            cut = ranked_alive[keep:]
            alive = sorted(ranked_alive[:keep])
            if cut:
                print(f"halving rung {r + 1}: keep {alive} "
                      f"(top {keep} by val CI), cut {sorted(cut)}")
    else:
        for c, overrides in enumerate(combos, start=1):
            print(f"=== sweep {c}/{len(combos)}: "
                  + ", ".join(f"{k}={v}" for k, v in sorted(overrides.items()))
                  + f" (flag {records[c]['flag']}) ===")
            run_combo(c, overrides)

    summary = pd.DataFrame(list(records.values()))
    ranked = summary.sort_values(
        ["epochs_trained", "val_CI"], ascending=False, na_position="last")
    out = os.path.join(checkpoint_path, "sweep_summary.csv")
    ranked.to_csv(out, index=False)
    print(f"wrote {out}")
    total = int(summary["epochs_trained"].sum())
    full = len(combos) * num_epochs
    print(f"sweep epoch-units trained: {total} "
          f"(full grid would be {full})")
    best = ranked.iloc[0]
    if pd.notna(best.get("val_CI")):
        best_overrides = {k: combos[int(best["combo"]) - 1][k] for k in grid}
        print("sweep best (by val CI): "
              + ", ".join(f"{k}={v}" for k, v in sorted(
                  best_overrides.items()))
              + f" -> val CI {best['val_CI']:.4f}")
        best_raw = {k: v for k, v in dict(config.raw).items()
                    if k != "sweep_grid"}
        best_raw.update(best_overrides)  # winner's knobs, original flag
        best_path = os.path.join(checkpoint_path, "sweep_best_config.json")
        with open(best_path, "w") as fh:
            json.dump(best_raw, fh, indent=2)
        print(f"wrote {best_path}")
    else:
        print("sweep: no survival val frames to rank "
              "(classification task or skipped savescore)")


if __name__ == "__main__":
    main()
