"""Hyperparameter grid-sweep orchestrator (beyond-reference convenience).

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
  the reference's ``flag`` handling). Keys are ordinary train-config keys.
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
"""

from __future__ import annotations

import itertools
import json
import os

import pandas as pd

from multimodalbrainsurvival_tpu.cli._common import load_config, make_parser
from multimodalbrainsurvival_tpu.cli.cv_run import (
    TASKS,
    _frame_ci,
    _task_mains,
)


def parse_grid(spec: str) -> dict:
    """``--grid`` inline-JSON-or-path → {key: [values]}; scalars promote to
    one-element lists so ``{"lr": 1e-4}`` pins a key across the sweep."""
    if not spec:
        raise SystemExit("--grid (or config sweep_grid) is required")
    if os.path.isfile(spec):
        with open(spec) as f:
            grid = json.load(f)
    else:
        try:
            grid = json.loads(spec)
        except json.JSONDecodeError as err:
            raise SystemExit(f"--grid is neither a file nor JSON: {err}")
    if not isinstance(grid, dict) or not grid:
        raise SystemExit("grid must be a non-empty JSON object")
    return {k: (v if isinstance(v, list) else [v]) for k, v in grid.items()}


def combinations(grid: dict) -> list[dict]:
    keys = sorted(grid)
    return [dict(zip(keys, values))
            for values in itertools.product(*(grid[k] for k in keys))]


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
    args = parser.parse_args(argv)
    train_main, _ = _task_mains(args.task)
    config, flag, checkpoint_path, _ = load_config(args)
    grid = config.get("sweep_grid") or parse_grid(args.grid)
    grid = {k: (v if isinstance(v, list) else [v]) for k, v in grid.items()}
    combos = combinations(grid)

    child_args = ["--seed", str(args.seed)]
    if args.quick:
        child_args += ["--quick", "1"]

    sweep_dir = os.path.join(checkpoint_path, "sweep")
    os.makedirs(sweep_dir, exist_ok=True)
    rows = []
    for c, overrides in enumerate(combos, start=1):
        flag_c = f"{flag}_hp{c}"
        raw = {k: v for k, v in dict(config.raw).items()
               if k != "sweep_grid"}
        raw.update(overrides, flag=flag_c)
        cfg_path = os.path.join(sweep_dir, f"config_hp{c}.json")
        with open(cfg_path, "w") as fh:
            json.dump(raw, fh, indent=2)
        print(f"=== sweep {c}/{len(combos)}: "
              + ", ".join(f"{k}={v}" for k, v in sorted(overrides.items()))
              + f" (flag {flag_c}) ===")
        train_main(["--config", cfg_path] + child_args)
        output_dir = os.path.join(checkpoint_path, "outputs", flag_c)
        rows.append({"combo": c, "flag": flag_c, **overrides,
                     "val_CI": _ci_of(output_dir, "val"),
                     "test_CI": _ci_of(output_dir, "test")})

    summary = pd.DataFrame(rows)
    ranked = summary.sort_values("val_CI", ascending=False,
                                 na_position="last")
    out = os.path.join(checkpoint_path, "sweep_summary.csv")
    ranked.to_csv(out, index=False)
    print(f"wrote {out}")
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
