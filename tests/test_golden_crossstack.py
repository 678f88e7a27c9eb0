"""Cross-stack golden pipeline runs (VERDICT r2 next-round #2).

The reference's OWN drivers (`2_GeneExpression/1_GeneExpress_train.py:224-325`
and `3_EarlyFusion/2_EarlyFusion_train.py:122-216`) are executed end-to-end as
subprocess oracles on a deterministic synthetic cohort, and their results —
per-epoch loss trace, per-epoch train/val C-index trace, the best epoch, the
final `model_last.pt` / `model_dict_best.pt` weights, and the per-case score
frames — are compared against OUR CLIs started from converted-identical init.
This converts "parity by construction" (function-level pins) into "parity by
execution" of the whole stack: dataset CSV parsing → full-batch Cox training
→ Adam dynamics → best-checkpoint selection → score frames.

Determinism knobs (identical on both sides, documented divergences only):
- dropout disabled (the runner monkeypatches ``torch.nn.Dropout`` to p=0;
  our CLIs take the ``dropout: 0`` config key) — dropout RNG streams are the
  one thing that cannot match across torch and JAX;
- full-batch training (batch_size == len(train)): the Cox loss, its
  gradients, and Adam updates are permutation-invariant over the batch, so
  torch's RandomSampler order is irrelevant;
- identical initial weights via ``restore_path`` on both sides (a seeded
  torch state dict, converted with ``models/convert.py`` for ours).

Environment stubs: the zero-egress image lacks lifelines / torchvision; the
oracle subprocess gets import-compatible stubs (lifelines.utils backed by
``ops/metrics.concordance_index``, an empty torchvision surface — the RNA /
EarlyFusion drivers import but never use it).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import textwrap

import numpy as np
import pandas as pd
import pytest

from tests.helpers import make_survival_csv

REFERENCE_DIR = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference repo not mounted"
)


# --- oracle-subprocess scaffolding -----------------------------------------

_STUB_FILES = {
    "lifelines/__init__.py": "from . import utils\n",
    "lifelines/utils/__init__.py": (
        "from multimodalbrainsurvival_tpu.ops.metrics import "
        "concordance_index\n"
    ),
    "torchvision/__init__.py": (
        "__version__ = '0.0-stub'\n"
        "from . import datasets, models, transforms, utils\n"
    ),
    "torchvision/datasets.py": "",
    "torchvision/models.py": "",
    "torchvision/transforms.py": "",
    "torchvision/utils.py": "__all__ = []\n",
}

_RUNNER = """
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {stubs!r})
sys.path.insert(0, {refdir!r})
import torch.nn as nn
_D = nn.Dropout
nn.Dropout = lambda *a, **k: _D(p=0.0)  # determinism: dropout-free oracle
# reference defect shim: 2_EarlyFusion_train.py:221 reads args.flag but its
# parser never defines --flag, so the driver crashes on every invocation;
# default it to "" (the config's 'flag' key overwrites it two lines later,
# exactly like the drivers whose parsers do define it)
import argparse
_parse = argparse.ArgumentParser.parse_args
def _parse_with_flag(self, *a, **k):
    ns = _parse(self, *a, **k)
    if not hasattr(ns, "flag"):
        ns.flag = ""
    return ns
argparse.ArgumentParser.parse_args = _parse_with_flag
import runpy
sys.argv = ["driver.py", "--config", {cfg!r}]
runpy.run_path({driver!r}, run_name="__main__")
"""


def _run_reference_driver(tmp_path, driver: str, cfg: dict) -> str:
    stubs = tmp_path / "stubs"
    for rel, body in _STUB_FILES.items():
        p = stubs / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(body)
    cfg_path = tmp_path / "ref_cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    runner = tmp_path / "runner.py"
    runner.write_text(
        textwrap.dedent(
            _RUNNER.format(
                repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                stubs=str(stubs),
                refdir=os.path.dirname(driver),
                cfg=str(cfg_path),
                driver=driver,
            )
        )
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, str(runner)], capture_output=True, text=True,
        timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc.stdout


def _epoch_losses(out: str, tag: str) -> list[float]:
    return [float(m.group(1))
            for m in re.finditer(rf"{tag} Loss: ([-\d.]+)", out)]


def _ci_lines(out: str, limit: int | None = None) -> list[tuple[str, float]]:
    """(mode, CI) sequence of the per-epoch eval prints, both stacks emit
    the identical `"{mode} case  | epoch {e} | CI {ci:.3f}"` format."""
    got = [(m.group(1), float(m.group(2)))
           for m in re.finditer(r"(\w+) case\s+\| epoch [-\d]+ \| CI ([\d.]+)",
                                out)]
    return got[:limit] if limit is not None else got


def _assert_tree_close(got, want, rtol, atol, ctx):
    import jax

    def chk(path, g, w):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=rtol, atol=atol,
            err_msg=f"{ctx}: {jax.tree_util.keystr(path)}",
        )

    jax.tree_util.tree_map_with_path(chk, got, want)


def _best_epoch(out: str) -> int:
    m = re.search(r"best epoch = (-?\d+)", out)
    assert m, out
    return int(m.group(1))


# --- RNA pipeline -----------------------------------------------------------


def test_rna_pipeline_golden_run_matches_reference(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    import importlib.util

    import jax

    from multimodalbrainsurvival_tpu.models.convert import (
        load_torch_state_dict,
        torch_rna_to_flax,
    )
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    ref_dir = os.path.join(REFERENCE_DIR, "2_GeneExpression")

    # deterministic cohort: full-batch train (16), no tied times, events in
    # every split (seeds checked below)
    frames = {}
    for split, n, seed in (("train", 16, 1), ("val", 8, 2), ("test", 8, 3)):
        frames[split] = make_survival_csv(
            str(tmp_path / f"rna_{split}.csv"),
            [f"{split}{i}" for i in range(n)], n_rna=12778, seed=seed,
        )
        assert frames[split]["vital_status"].sum() >= 2

    # identical init: a seeded torch state dict restored by BOTH stacks
    spec = importlib.util.spec_from_file_location(
        "ref_rna_models_golden", os.path.join(ref_dir, "models.py")
    )
    stubs_added = str(tmp_path / "stubs")
    for rel, body in _STUB_FILES.items():
        p = tmp_path / "stubs" / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(body)
    sys.path.insert(0, stubs_added)
    try:
        ref_models = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_models)
    finally:
        sys.path.remove(stubs_added)
        # drop the in-process torchvision stub so later tests that probe for
        # a REAL torchvision (importorskip) don't find the empty stand-in
        for mod in [m for m in sys.modules if m.startswith("torchvision")]:
            del sys.modules[mod]
    import torch.nn as nn

    torch.manual_seed(42)
    model_rna = nn.Sequential(
        nn.Dropout(), nn.Linear(12778, 4096), nn.ReLU(), nn.Dropout(),
        nn.Linear(4096, 2048),
    )
    ref_model = ref_models.RNAOnlyModel(model_rna, nn.Sequential(nn.Linear(2048, 1)))
    init_pt = tmp_path / "init.pt"
    torch.save(ref_model.state_dict(), str(init_pt))

    common = {
        "batch_size": 16, "num_epochs": 3, "num_workers": 0,
        "use_cuda": False, "weight_decay": 1e-4,
        "lr_rna": 1e-3, "lr_mlp": 1e-3,
        "train_csv_path": str(tmp_path / "rna_train.csv"),
        "val_csv_path": str(tmp_path / "rna_val.csv"),
        "test_csv_path": str(tmp_path / "rna_test.csv"),
        "flag": "golden",
    }

    # --- oracle: the reference's own driver, end-to-end
    ref_out = _run_reference_driver(
        tmp_path,
        os.path.join(ref_dir, "1_GeneExpress_train.py"),
        dict(common, restore_path=str(init_pt),
             checkpoint_path=str(tmp_path / "ref_out") + "/",
             summary_path=str(tmp_path / "ref_out/summary") + "/"),
    )
    ref_save = tmp_path / "ref_out/models/golden"
    assert (ref_save / "model_last.pt").is_file()

    # --- ours: the rna_train CLI from the converted-identical init
    converted = jax.tree.map(
        np.asarray, torch_rna_to_flax(load_torch_state_dict(str(init_pt)))
    )
    init_ours = str(tmp_path / "init_flax")
    Checkpointer().save(init_ours, converted, block=True)

    from multimodalbrainsurvival_tpu.cli import rna_train

    cfg2 = dict(common, dropout=0.0, restore_path=init_ours,
                checkpoint_path=str(tmp_path / "our_out") + "/",
                summary_path=str(tmp_path / "our_out/summary") + "/")
    p2 = tmp_path / "our_cfg.json"
    p2.write_text(json.dumps(cfg2))
    rna_train.main(["--config", str(p2)])
    our_out = capsys.readouterr().out

    # 1. per-epoch loss trace (printed at 1e-4 precision on both sides)
    ref_losses = _epoch_losses(ref_out, "TRAIN")
    our_losses = _epoch_losses(our_out, "EPOCH")
    assert len(ref_losses) == 3
    np.testing.assert_allclose(our_losses, ref_losses, atol=2e-3)

    # 2. per-epoch train/val C-index trace (2 lines per epoch, 3 epochs)
    assert _ci_lines(our_out, 6) == _ci_lines(ref_out, 6)

    # 3. the same best epoch
    assert _best_epoch(our_out) == _best_epoch(ref_out)

    # 4. final weights, last AND best, within fp32-accumulated tolerance
    ours_ck = Checkpointer()
    for name, pt in (("model_last", "model_last.pt"),
                     ("model_dict_best", "model_dict_best.pt")):
        want = torch_rna_to_flax(load_torch_state_dict(str(ref_save / pt)))
        got = ours_ck.restore(
            str(tmp_path / "our_out/models/golden" / name),
            jax.tree.map(np.asarray, want),
        )
        # fp32-accumulated tolerance: Adam's m/sqrt(v) normalization turns
        # a sub-ulp cross-stack difference in a NEAR-ZERO first-step
        # gradient into an lr-scale update flip (measured: ~250 of 52M
        # elements at |diff| <= 1.5e-4 with lr=1e-3) — a property of Adam,
        # not of the stacks; the loss/CI traces above pin the dynamics
        _assert_tree_close(got["params"], want["params"],
                           rtol=2e-3, atol=5e-4, ctx=name)

    # 5. score frames: our val CSVs vs the reference checkpoints' forward
    # pass over the val cohort (the frames the ref driver computes but never
    # writes — 1_GeneExpress_train.py:209-216 discards pandas_output)
    rna_cols = [c for c in frames["val"].columns if c.startswith("rna_")]
    x = torch.tensor(frames["val"][rna_cols].to_numpy(np.float32))
    for tag, pt in (("last", "model_last.pt"), ("best", "model_dict_best.pt")):
        ref_model.load_state_dict(torch.load(str(ref_save / pt)))
        ref_model.eval()
        with torch.no_grad():
            want_scores = ref_model(x).numpy().reshape(-1)
        frame = pd.read_csv(
            tmp_path / f"our_out/outputs/golden/val_output_{tag}.csv"
        )
        got = frame.set_index("id")["score"]
        want = pd.Series(want_scores, index=frames["val"]["case"]).groupby(
            level=0).mean()
        np.testing.assert_allclose(
            got.sort_index().to_numpy(), want.sort_index().to_numpy(),
            rtol=1e-3, atol=2e-4, err_msg=f"val scores ({tag})",
        )


# --- EarlyFusion pipeline ---------------------------------------------------


def test_earlyfusion_pipeline_golden_run_matches_reference(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    import jax

    from multimodalbrainsurvival_tpu.models.convert import (
        load_torch_state_dict,
        torch_feature_to_flax,
    )
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    ref_dir = os.path.join(REFERENCE_DIR, "3_EarlyFusion")
    import torch.nn as nn

    frames = {}
    for split, n, seed in (("train", 16, 1), ("val", 8, 2), ("test", 8, 3)):
        frames[split] = make_survival_csv(
            str(tmp_path / f"feat_{split}.csv"),
            [f"{split}{i}" for i in range(n)], n_feature=4096, seed=seed,
        )
        assert frames[split]["vital_status"].sum() >= 2

    torch.manual_seed(43)
    ref_model = nn.Sequential(
        nn.Dropout(), nn.Linear(4096, 2048), nn.ReLU(), nn.Dropout(),
        nn.Linear(2048, 200), nn.ReLU(), nn.Dropout(), nn.Linear(200, 1),
    )
    init_pt = tmp_path / "init.pt"
    torch.save(ref_model.state_dict(), str(init_pt))

    common = {
        "batch_size": 16, "num_epochs": 3, "num_workers": 0,
        "use_cuda": False, "weight_decay": 1e-4, "lr": 1e-3,
        "train_csv_path": str(tmp_path / "feat_train.csv"),
        "val_csv_path": str(tmp_path / "feat_val.csv"),
        "test_csv_path": str(tmp_path / "feat_test.csv"),
        "flag": "golden",
    }

    ref_out = _run_reference_driver(
        tmp_path,
        os.path.join(ref_dir, "2_EarlyFusion_train.py"),
        dict(common, restore_path=str(init_pt),
             checkpoint_path=str(tmp_path / "ref_out") + "/",
             summary_path=str(tmp_path / "ref_out/summary") + "/"),
    )
    ref_save = tmp_path / "ref_out/models/golden"
    assert (ref_save / "model_last.pt").is_file()

    converted = jax.tree.map(
        np.asarray, torch_feature_to_flax(load_torch_state_dict(str(init_pt)))
    )
    init_ours = str(tmp_path / "init_flax")
    Checkpointer().save(init_ours, converted, block=True)

    from multimodalbrainsurvival_tpu.cli import feature_train

    cfg2 = dict(common, dropout=0.0, restore_path=init_ours,
                checkpoint_path=str(tmp_path / "our_out") + "/",
                summary_path=str(tmp_path / "our_out/summary") + "/")
    p2 = tmp_path / "our_cfg.json"
    p2.write_text(json.dumps(cfg2))
    feature_train.main(["--config", str(p2)])
    our_out = capsys.readouterr().out

    ref_losses = _epoch_losses(ref_out, "TRAIN")
    our_losses = _epoch_losses(our_out, "EPOCH")
    assert len(ref_losses) == 3
    np.testing.assert_allclose(our_losses, ref_losses, atol=2e-3)

    # epoch(-1) pre-training eval (2_EarlyFusion_train.py:311-312) + 3
    # epochs x (train, val): 8 in-training CI lines on both sides
    assert _ci_lines(our_out, 8) == _ci_lines(ref_out, 8)
    assert _best_epoch(our_out) == _best_epoch(ref_out)

    ours_ck = Checkpointer()
    for name, pt in (("model_last", "model_last.pt"),
                     ("model_dict_best", "model_dict_best.pt")):
        want = torch_feature_to_flax(load_torch_state_dict(str(ref_save / pt)))
        got = ours_ck.restore(
            str(tmp_path / "our_out/models/golden" / name),
            jax.tree.map(np.asarray, want),
        )
        # fp32-accumulated tolerance: Adam's m/sqrt(v) normalization turns
        # a sub-ulp cross-stack difference in a NEAR-ZERO first-step
        # gradient into an lr-scale update flip (measured: ~250 of 52M
        # elements at |diff| <= 1.5e-4 with lr=1e-3) — a property of Adam,
        # not of the stacks; the loss/CI traces above pin the dynamics
        _assert_tree_close(got["params"], want["params"],
                           rtol=2e-3, atol=5e-4, ctx=name)

    feat_cols = [c for c in frames["val"].columns if c.startswith("feature_")]
    x = torch.tensor(frames["val"][feat_cols].to_numpy(np.float32))
    for tag, pt in (("last", "model_last.pt"), ("best", "model_dict_best.pt")):
        ref_model.load_state_dict(torch.load(str(ref_save / pt)))
        ref_model.eval()
        with torch.no_grad():
            want_scores = ref_model(x).numpy().reshape(-1)
        frame = pd.read_csv(
            tmp_path / f"our_out/outputs/golden/val_output_{tag}.csv"
        )
        got = frame.set_index("id")["score"]
        want = pd.Series(want_scores, index=frames["val"]["case"]).groupby(
            level=0).mean()
        np.testing.assert_allclose(
            got.sort_index().to_numpy(), want.sort_index().to_numpy(),
            rtol=1e-3, atol=2e-4, err_msg=f"val scores ({tag})",
        )
