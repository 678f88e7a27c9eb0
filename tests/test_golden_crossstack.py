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
    # sksurv stub: the reference indexes [0] of the returned tuple
    # (2_HistoPath_train.py:271-272)
    "sksurv/__init__.py": "from . import metrics\n",
    "sksurv/metrics.py": (
        "from multimodalbrainsurvival_tpu.ops.metrics import "
        "concordance_index_censored as _ci\n"
        "def concordance_index_censored(events, times, risks,"
        " tied_tol=1e-8):\n"
        "    return (_ci(events, times, risks, tied_tol),"
        " None, None, None, None)\n"
    ),
    "torchvision/__init__.py": (
        "__version__ = '0.0-stub'\n"
        "from . import datasets, models, transforms, utils\n"
    ),
    "torchvision/datasets.py": "",
    "torchvision/models.py": "",
    # FUNCTIONAL transforms, deterministic by construction: ToTensor and
    # Normalize match torchvision's math exactly; Resize is exact when the
    # stored patches already have the target size (golden cohorts are
    # generated at img_size, sidestepping PIL-vs-cv2 resample differences);
    # the random augmentations (flips, ColorJitter) are identity — the
    # golden runs disable augmentation on our side too (`augment: false`)
    "torchvision/transforms.py": """
import numpy as np
import torch


class Compose:
    def __init__(self, ts):
        self.ts = ts

    def __call__(self, x):
        for t in self.ts:
            x = t(x)
        return x


class Resize:
    def __init__(self, size, *a, **k):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        if (img.size[1], img.size[0]) == self.size:
            return img
        return img.resize((self.size[1], self.size[0]))


class RandomHorizontalFlip:  # identity: deterministic golden-run stub
    def __init__(self, p=0.5):
        pass

    def __call__(self, img):
        return img


class RandomVerticalFlip(RandomHorizontalFlip):
    pass


class ColorJitter:  # identity: deterministic golden-run stub
    def __init__(self, *a, **k):
        pass

    def __call__(self, img):
        return img


class ToTensor:
    def __call__(self, img):
        arr = np.asarray(img, dtype=np.float32) / 255.0
        return torch.from_numpy(arr.transpose(2, 0, 1).copy())


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std
""",
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


def _ci_lines(out: str, limit: int | None = None) -> list[tuple[str, str, float]]:
    """(mode, kind, CI) sequence of the per-epoch eval prints; both stacks
    emit the identical `"{mode} {wsi|case}  | epoch {e} | CI {ci:.3f}"`
    format (the histo pipeline prints a wsi-level AND a case-level line)."""
    got = [(m.group(1), m.group(2), float(m.group(3)))
           for m in re.finditer(
               r"(\w+) (wsi|case)\s+\| epoch [-\d]+ \| CI ([\d.]+)", out)]
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


def _import_ref_module(tmp_path, path: str, name: str):
    """Import a reference module under a UNIQUE name with the dependency
    stubs on sys.path (and scrub the stub modules from sys.modules after, so
    later tests that probe for the real packages don't find stand-ins)."""
    import importlib.util

    stubs = tmp_path / "stubs"
    for rel, body in _STUB_FILES.items():
        p = stubs / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(body)
    sys.path.insert(0, str(stubs))
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(str(stubs))
        for m in [m for m in sys.modules
                  if m.startswith(("torchvision", "sksurv", "lifelines"))]:
            del sys.modules[m]
    return mod


# --- RNA pipeline -----------------------------------------------------------


@pytest.mark.golden
def test_rna_pipeline_golden_run_matches_reference(tmp_path, capsys):
    torch = pytest.importorskip("torch")
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
    ref_models = _import_ref_module(
        tmp_path, os.path.join(ref_dir, "models.py"), "ref_rna_models_golden"
    )
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
        # atol bound: an Adam sign-flip on a near-zero gradient moves an
        # element by up to 2*lr per step (measured max ~5.5e-4 over 3 steps
        # at lr=1e-4), so 1e-3 covers the flip ceiling with margin while
        # staying far below any systematic divergence
        _assert_tree_close(got["params"], want["params"],
                           rtol=2e-3, atol=1e-3, ctx=name)

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


def _run_earlyfusion_golden(tmp_path, capsys, *, num_epochs: int,
                            n_train: int):
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
    for split, n, seed in (("train", n_train, 1), ("val", 8, 2),
                           ("test", 8, 3)):
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
        "batch_size": n_train, "num_epochs": num_epochs, "num_workers": 0,
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
    assert len(ref_losses) == num_epochs
    np.testing.assert_allclose(our_losses, ref_losses, atol=2e-3)

    # epoch(-1) pre-training eval (2_EarlyFusion_train.py:311-312) +
    # num_epochs x (train, val) in-training CI lines on both sides
    assert _ci_lines(our_out, 2 * (num_epochs + 1)) == _ci_lines(
        ref_out, 2 * (num_epochs + 1))
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
        # atol bound: an Adam sign-flip on a near-zero gradient moves an
        # element by up to 2*lr per step (measured max ~5.5e-4 over 3 steps
        # at lr=1e-4), so 1e-3 covers the flip ceiling with margin while
        # staying far below any systematic divergence
        _assert_tree_close(got["params"], want["params"],
                           rtol=2e-3, atol=1e-3, ctx=name)

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


@pytest.mark.golden
def test_earlyfusion_pipeline_golden_run_matches_reference(tmp_path, capsys):
    _run_earlyfusion_golden(tmp_path, capsys, num_epochs=3, n_train=16)


def test_earlyfusion_quick_golden_run_matches_reference(tmp_path, capsys):
    """Reduced cross-stack run that stays in the DEFAULT suite tier
    (round-4 verdict Next #8): 1 epoch, half cohort — still executes the
    reference's own driver end-to-end as an oracle and compares the loss
    trace, CI lines, best epoch, final weights, and score frames, at ~1/4
    the wall-clock of the full @golden variant."""
    _run_earlyfusion_golden(tmp_path, capsys, num_epochs=1, n_train=8)


# --- HistoPathology (flagship) pipeline -------------------------------------


@pytest.mark.golden
@pytest.mark.parametrize(
    "task,num_classes,lr,strict_stats",
    # the Cox variant is the TIGHT biased-vs-unbiased running-variance
    # sentinel (elementwise 2e-3); NLLSurv's 4-class gradients accumulate
    # run-to-run-varying activation chaos over the 3 steps (measured var
    # drift 4e-3..1.2e-2 relative across identical runs), so the bin
    # variant gets the distribution bound instead
    [("survival_prediction", 1, 1e-4, True), ("survival_bin", 4, 1e-4, False)],
)
def test_histo_pipeline_golden_run_matches_reference(
    tmp_path, capsys, task, num_classes, lr, strict_stats
):
    """The FLAGSHIP driver (`2_HistoPath_train.py`) executed end-to-end as
    the oracle: PNG decode → Resize/ToTensor/Normalize → ResNet-50 MIL →
    Cox (or NLLSurv for the survival_bin variant) → Adam → best-checkpoint →
    the six `*_output_{last,best}.csv` frames, compared against our histo
    CLI from converted-identical init.

    Determinism: augmentation off on BOTH sides (stubbed flips/jitter are
    identity; our `augment: false`), patches stored at img_size so Resize
    is exact, one bag per slide so the per-epoch in-slide shuffle cannot
    change bag composition (forward/loss are order-invariant within a bag),
    and full-batch training. BatchNorm runs in its normal train mode on
    both sides — batch statistics are permutation-invariant."""
    torch = pytest.importorskip("torch")
    import jax

    from multimodalbrainsurvival_tpu.models.convert import (
        load_torch_state_dict,
        torch_mil_to_flax,
    )
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer
    from tests.helpers import make_patch_dir

    ref_dir = os.path.join(REFERENCE_DIR, "1_HistoPathology")
    # img MUST be 224: the reference ResNet fork hardcodes AvgPool2d(7)
    # (resnet.py:143), so sub-224 inputs crash it ("output size too small").
    # The cohort is minimal to keep torch-CPU resnet50 tractable: 2 train
    # slides x 2 patches (one bag each), 2 val/test slides (so the C-index
    # has an admissible pair).
    img, bag = 224, 2

    root = tmp_path / "patches"
    wsis = [f"W{i}" for i in range(5)]
    for i, w in enumerate(wsis):
        make_patch_dir(str(root), w, bag, img_size=img, seed=20 + i)

    def cohort_csv(name, cases, wsi_idx, seed):
        df = make_survival_csv(
            str(tmp_path / name), cases,
            wsi_names=[f"{wsis[i]}.svs" for i in wsi_idx], seed=seed,
        )
        # the reference train loop reads survival_bin unconditionally
        # (2_HistoPath_train.py:313, SURVEY §2.4)
        df["survival_bin"] = np.arange(len(df)) % 4
        df.to_csv(str(tmp_path / name), index=False)
        return df

    cohort_csv("ffpe_train.csv", ["c0", "c1"], [0, 1], 5)
    cohort_csv("ffpe_val.csv", ["c2", "c3"], [2, 3], 6)
    cohort_csv("ffpe_test.csv", ["c2", "c3"], [4, 2], 7)

    # identical init: seeded torch AggregationModel state dict
    ref_resnet = _import_ref_module(
        tmp_path, os.path.join(ref_dir, "resnet.py"), "ref_histo_resnet_golden"
    )
    ref_models = _import_ref_module(
        tmp_path, os.path.join(ref_dir, "models.py"), "ref_histo_models_golden"
    )
    torch.manual_seed(7)
    ref_model = ref_models.AggregationModel(
        resnet=ref_resnet.resnet50(pretrained=False),
        aggregator=ref_models.Identity(),
        aggregator_dim=2048, resnet_dim=2048, out_features=num_classes,
    )
    init_pt = tmp_path / "init.pt"
    torch.save(ref_model.state_dict(), str(init_pt))

    common = {
        "num_classes": num_classes, "batch_size": 2, "use_cuda": False,
        "data_path": str(root),
        "train_csv_path": str(tmp_path / "ffpe_train.csv"),
        "val_csv_path": str(tmp_path / "ffpe_val.csv"),
        "test_csv_path": str(tmp_path / "ffpe_test.csv"),
        "num_workers": 0, "num_epochs": 3, "img_size": img,
        "lr": lr, "weight_decay": 1e-4, "pretrained": False,
        "train_bag_size": bag, "val_bag_size": bag,
        "aggregator": "identity", "aggregator_hdim": 2048,
        "task": task, "target_label": "vital_status",
        "n_layers_to_train": 6, "flag": "golden",
        "max_patch_per_wsi_train": bag, "max_patch_per_wsi_val": bag,
        "model_path": "",
    }

    ref_out = _run_reference_driver(
        tmp_path,
        os.path.join(ref_dir, "2_HistoPath_train.py"),
        dict(common, restore_path=str(init_pt),
             checkpoint_path=str(tmp_path / "ref_out") + "/",
             summary_path=str(tmp_path / "ref_out/summary") + "/"),
    )
    ref_save = tmp_path / "ref_out/models/golden"
    assert (ref_save / "model_last.pt").is_file()

    converted = jax.tree.map(
        np.asarray, torch_mil_to_flax(load_torch_state_dict(str(init_pt)))
    )
    init_ours = str(tmp_path / "init_flax")
    Checkpointer().save(init_ours, converted, block=True)

    from multimodalbrainsurvival_tpu.cli import histo_train

    cfg2 = dict(common, model_name="resnet50", augment=False,
                restore_path=init_ours,
                checkpoint_path=str(tmp_path / "our_out") + "/",
                summary_path=str(tmp_path / "our_out/summary") + "/")
    p2 = tmp_path / "our_cfg.json"
    p2.write_text(json.dumps(cfg2))
    histo_train.main(["--config", str(p2)])
    our_out = capsys.readouterr().out

    # per-epoch eval-loss traces: the histo driver's 'TRAIN Loss'/'VAL Loss'
    # lines come from evaluate(), printed by both stacks under those names
    for tag in ("TRAIN", "VAL"):
        ref_losses = _epoch_losses(ref_out, tag)
        assert len(ref_losses) == 3
        np.testing.assert_allclose(
            _epoch_losses(our_out, tag)[:3], ref_losses, atol=2e-3,
            err_msg=tag,
        )

    # per-epoch wsi- AND case-level CI traces (4 lines per epoch)
    assert _ci_lines(our_out, 12) == _ci_lines(ref_out, 12)
    # histo quirk preserved: best only from epoch > 0 (:378). The argmin may
    # legitimately flip between epochs whose val losses tie within the
    # cross-stack fp32 drift — accept a flip ONLY in that case, judged on
    # the reference's own val-loss trace.
    ours_best, ref_best = _best_epoch(our_out), _best_epoch(ref_out)
    assert ours_best > 0 and ref_best > 0
    if ours_best != ref_best:
        ref_val = _epoch_losses(ref_out, "VAL")
        assert abs(ref_val[ours_best] - ref_val[ref_best]) < 3e-3, (
            ours_best, ref_best, ref_val
        )

    # weights AND BatchNorm running stats, last + best ("best" artifacts
    # are only comparable when both stacks picked the same epoch — a
    # tie-flip means they checkpointed different steps)
    compare = [("model_last", "model_last.pt")]
    if ours_best == ref_best:
        compare.append(("model_dict_best", "model_dict_best.pt"))
    ours_ck = Checkpointer()
    for name, pt in compare:
        want = torch_mil_to_flax(load_torch_state_dict(str(ref_save / pt)))
        got = ours_ck.restore(
            str(tmp_path / "our_out/models/golden" / name),
            jax.tree.map(np.asarray, want),
        )
        # atol bound: an Adam sign-flip on a near-zero gradient moves an
        # element by up to 2*lr per step (measured max ~5.5e-4 over 3 steps
        # at lr=1e-4), so 1e-3 covers the flip ceiling with margin while
        # staying far below any systematic divergence
        _assert_tree_close(got["params"], want["params"],
                           rtol=2e-3, atol=1e-3, ctx=name)
        # running stats accumulate activation-level drift from the
        # Adam-sign-flip weight divergence upstream (see params comment),
        # so they get a slightly wider absolute band than the params
        if strict_stats:
            _assert_tree_close(got["batch_stats"], want["batch_stats"],
                               rtol=2e-3, atol=2e-3,
                               ctx=name + ".batch_stats")
        else:
            diffs = []
            jax.tree_util.tree_map(
                lambda g, w: diffs.append(np.abs(
                    np.asarray(g, np.float64) - np.asarray(w, np.float64)
                ).ravel()),
                got["batch_stats"], want["batch_stats"],
            )
            d = np.concatenate(diffs)
            assert np.median(d) < 1e-3 and d.max() < 0.25, (
                name, float(np.median(d)), float(d.max())
            )

    # the six score frames the reference writes are compared file-to-file
    tags = ("last", "best") if ours_best == ref_best else ("last",)
    for split in ("train", "val", "test"):
        for tag in tags:
            f = f"{split}_output_{tag}.csv"
            ref_frame = pd.read_csv(tmp_path / "ref_out/outputs/golden" / f)
            our_frame = pd.read_csv(tmp_path / "our_out/outputs/golden" / f)
            ref_s = ref_frame.set_index("id")["score"].sort_index()
            our_s = our_frame.set_index("id")["score"].sort_index()
            assert list(ref_s.index) == list(our_s.index), f
            np.testing.assert_allclose(
                our_s.to_numpy(), ref_s.to_numpy(), rtol=1e-3, atol=2e-4,
                err_msg=f,
            )


# --- JointFusion pipeline ---------------------------------------------------


@pytest.mark.golden
def test_joint_pipeline_golden_run_matches_reference(tmp_path, capsys):
    """The end-to-end bimodal driver (`1_JointFusion_train.py`) as the
    oracle: patch bags through ResNet-50 ⊕ 12,778-gene RNA MLP → fusion
    head → Cox, with THREE Adam param groups (lr_histo/lr_rna/lr_mlp) and
    gradients flowing into both encoders. Same determinism knobs as the
    histo golden run (augmentation/dropout off, 224px one-bag-per-slide
    cohort, full batch, converted-identical init); compares loss trace,
    wsi/case CI traces, best epoch, last/best weights + BN stats, and the
    reference's three output frames (val last/best, test best — WSI-level,
    1_JointFusion_train.py:121-124,272-275)."""
    torch = pytest.importorskip("torch")
    import jax

    from multimodalbrainsurvival_tpu.models.convert import (
        load_torch_state_dict,
        torch_joint_to_flax,
    )
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer
    from tests.helpers import make_patch_dir

    ref_dir = os.path.join(REFERENCE_DIR, "5_JointFusion")
    import torch.nn as nn

    img, bag = 224, 2
    root = tmp_path / "patches"
    wsis = [f"J{i}" for i in range(5)]
    for i, w in enumerate(wsis):
        make_patch_dir(str(root), w, bag, img_size=img, seed=30 + i)

    def cohort_csv(name, cases, wsi_idx, seed):
        # extension-LESS wsi names (joint_example.csv style): the reference
        # joint dataset uses wsi_file_name verbatim as the patch dir
        # (5_JointFusion/datasets.py:42-51 — no .svs strip, unlike histo's),
        # ours strips an extension if present; bare names agree on both
        df = make_survival_csv(
            str(tmp_path / name), cases,
            wsi_names=[wsis[i] for i in wsi_idx],
            n_rna=12778, seed=seed,
        )
        # all-events: a 2-case cohort needs an admissible pair for a real
        # C-index (and a nonzero Cox loss) on both sides
        df["vital_status"] = 1
        df.to_csv(str(tmp_path / name), index=False)

    cohort_csv("joint_train.csv", ["c0", "c1"], [0, 1], 5)
    cohort_csv("joint_val.csv", ["c2", "c3"], [2, 3], 6)
    cohort_csv("joint_test.csv", ["c2", "c3"], [4, 2], 7)

    ref_resnet = _import_ref_module(
        tmp_path, os.path.join(ref_dir, "resnet.py"), "ref_joint_resnet_golden"
    )
    ref_models = _import_ref_module(
        tmp_path, os.path.join(ref_dir, "models.py"), "ref_joint_models_golden"
    )
    torch.manual_seed(9)
    ref_model = ref_models.BagHistopathologyRNAModel(
        ref_resnet.resnet50(pretrained=False),
        nn.Sequential(nn.Dropout(), nn.Linear(12778, 4096), nn.ReLU(),
                      nn.Dropout(), nn.Linear(4096, 2048)),
        nn.Sequential(nn.Dropout(0.8), nn.Linear(4096, 1)),
    )
    init_pt = tmp_path / "init.pt"
    torch.save(ref_model.state_dict(), str(init_pt))

    common = {
        "num_classes": 1, "batch_size": 2, "use_cuda": False,
        "data_path": str(root),
        "train_csv_path": str(tmp_path / "joint_train.csv"),
        "val_csv_path": str(tmp_path / "joint_val.csv"),
        "test_csv_path": str(tmp_path / "joint_test.csv"),
        "num_workers": 0, "num_epochs": 3, "img_size": img,
        "lr_histo": 5e-5, "lr_rna": 1e-5, "lr_mlp": 1e-3,
        "weight_decay": 1e-4, "pretrained": False,
        "train_bag_size": bag, "val_bag_size": bag,
        "aggregator": "identity", "aggregator_hdim": 2048,
        "task": "survival_prediction", "target_label": "vital_status",
        "n_layers_to_train": 6, "flag": "golden",
        "max_patch_per_wsi_train": bag, "max_patch_per_wsi_val": bag,
        "model_path": "",
    }

    ref_out = _run_reference_driver(
        tmp_path,
        os.path.join(ref_dir, "1_JointFusion_train.py"),
        dict(common, restore_path=str(init_pt),
             checkpoint_path=str(tmp_path / "ref_out") + "/",
             summary_path=str(tmp_path / "ref_out/summary") + "/"),
    )
    ref_save = tmp_path / "ref_out/models/golden"
    assert (ref_save / "model_last.pt").is_file()

    converted = jax.tree.map(
        np.asarray, torch_joint_to_flax(load_torch_state_dict(str(init_pt)))
    )
    init_ours = str(tmp_path / "init_flax")
    Checkpointer().save(init_ours, converted, block=True)

    from multimodalbrainsurvival_tpu.cli import joint_train

    cfg2 = dict(common, model_name="resnet50", augment=False, dropout=0.0,
                restore_path=init_ours,
                checkpoint_path=str(tmp_path / "our_out") + "/",
                summary_path=str(tmp_path / "our_out/summary") + "/")
    p2 = tmp_path / "our_cfg.json"
    p2.write_text(json.dumps(cfg2))
    joint_train.main(["--config", str(p2)])
    our_out = capsys.readouterr().out

    # the joint driver prints only the RUNNING epoch loss ('TRAIN Loss: x
    # Acc: y', 1_JointFusion_train.py:239) — that corresponds to our
    # 'EPOCH Loss' line; it never prints an eval VAL loss
    ref_losses = _epoch_losses(ref_out, "TRAIN")
    assert len(ref_losses) >= 3, ref_out
    np.testing.assert_allclose(
        _epoch_losses(our_out, "EPOCH")[:3], ref_losses[:3], atol=2e-3,
    )
    ref_ci = _ci_lines(ref_out, 12)
    assert len(ref_ci) == 12, ref_out  # real CIs, not skipped-nan lines
    assert _ci_lines(our_out, 12) == ref_ci
    assert _best_epoch(our_out) == _best_epoch(ref_out)

    ours_ck = Checkpointer()
    for name, pt in (("model_last", "model_last.pt"),
                     ("model_dict_best", "model_dict_best.pt")):
        want = torch_joint_to_flax(load_torch_state_dict(str(ref_save / pt)))
        got = ours_ck.restore(
            str(tmp_path / "our_out/models/golden" / name),
            jax.tree.map(np.asarray, want),
        )
        # atol bound: an Adam sign-flip on a near-zero gradient moves an
        # element by up to 2*lr per step (measured max ~5.5e-4 over 3 steps
        # at lr=1e-4), so 1e-3 covers the flip ceiling with margin while
        # staying far below any systematic divergence
        _assert_tree_close(got["params"], want["params"],
                           rtol=2e-3, atol=1e-3, ctx=name)
        # BN running stats: the joint model trains BOTH encoders (3 LR
        # groups), so ulp-level cross-stack (and run-to-run: XLA CPU
        # intra-op threading) differences amplify chaotically through 3
        # steps of dual-encoder training — measured q99.9 of |diff| varies
        # 3e-3..3e-2 across otherwise-identical runs while params, losses,
        # CI traces and score frames stay pinned. After ONE step from
        # identical init the worst |diff| is 1.4e-4 (pure-forward parity),
        # so stats here get only a loose divergence bound; the tight
        # biased-vs-unbiased-variance sentinel is the HISTO golden test's
        # elementwise 2e-3 band, where a single LR group keeps chaos small.
        diffs = []
        jax.tree_util.tree_map(
            lambda g, w: diffs.append(np.abs(
                np.asarray(g, np.float64) - np.asarray(w, np.float64)
            ).ravel()),
            got["batch_stats"], want["batch_stats"],
        )
        d = np.concatenate(diffs)
        assert np.median(d) < 1e-3 and d.max() < 0.25, (
            name, float(np.median(d)), float(d.max())
        )

    for f in ("val_output_last.csv", "val_output_best.csv",
              "test_output_best.csv"):
        ref_frame = pd.read_csv(tmp_path / "ref_out/outputs/golden" / f)
        our_frame = pd.read_csv(tmp_path / "our_out/outputs/golden" / f)
        ref_s = ref_frame.set_index("id")["score"].sort_index()
        our_s = our_frame.set_index("id")["score"].sort_index()
        assert list(ref_s.index) == list(our_s.index), f
        # scores carry the same 3-step dual-encoder chaos as the BN stats
        # (measured drift ~3e-4 absolute, varying run to run); their
        # ORDERING is pinned exactly by the CI-trace equality above
        np.testing.assert_allclose(
            our_s.to_numpy(), ref_s.to_numpy(), rtol=2e-2, atol=1e-3,
            err_msg=f,
        )
