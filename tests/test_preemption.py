"""Preemption / emergency checkpointing (SURVEY.md §5 "failure detection /
elastic recovery" — a capability the reference lacks entirely).

SIGTERM (or the ``preempt_after_steps`` test hook) makes ``train_model``
commit a blocking full-state checkpoint at the next step boundary — including
the mid-epoch batch position — and raise ``TrainingPreempted``. A rerun with
``resume=True`` skips the already-consumed batches of the interrupted epoch
and continues bitwise-exactly.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest

from helpers import make_survival_csv

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _assert_tree_equal(a, b):
    for (pa, xa), (_, xb) in zip(
        jax.tree_util.tree_leaves_with_path(a),
        jax.tree_util.tree_leaves_with_path(b),
    ):
        np.testing.assert_array_equal(
            np.asarray(xa), np.asarray(xb), err_msg=jax.tree_util.keystr(pa)
        )


def test_midepoch_preemption_resume_is_exact(tmp_path):
    """Preempt mid-epoch (hook), resume, and land on EXACTLY the params of an
    uninterrupted run — same batches, same dropout keys."""
    import optax

    from multimodalbrainsurvival_tpu.data import RNATableDataset
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.train import (
        TrainingPreempted,
        TrainSettings,
        train_model,
    )
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter

    make_survival_csv(str(tmp_path / "rna.csv"),
                      [f"c{i}" for i in range(16)], n_rna=8, seed=4)
    ds = RNATableDataset(str(tmp_path / "rna.csv"))

    def make():
        # dropout > 0 so the PRNG stream actually matters for exactness
        return TableAdapter(
            model=RNAOnlyModel(
                encoder=RNAEncoder(hidden_dims=(16, 8), dropout=0.5)
            )
        )

    def settings(save_dir, *, resume=False, preempt_after=0):
        return TrainSettings(
            num_epochs=3, batch_size=8, save_dir=save_dir, seed=17,
            eval_splits_during_training=("val",), resume=resume,
            preempt_after_steps=preempt_after,
        )

    # uninterrupted control: 3 epochs × 2 batches
    v_straight, _, _ = train_model(
        make(), {"train": ds, "val": ds}, optax.adam(1e-3),
        settings(str(tmp_path / "a")),
    )

    # preempted mid-epoch-1 (after global step 3 = epoch 1, batch 1)
    with pytest.raises(TrainingPreempted) as exc:
        train_model(make(), {"train": ds, "val": ds}, optax.adam(1e-3),
                    settings(str(tmp_path / "b"), preempt_after=3))
    assert exc.value.epoch == 1
    assert exc.value.epoch_step == 1

    # resume: re-enters epoch 1 at batch 2, then runs epoch 2
    v_resumed, _, _ = train_model(
        make(), {"train": ds, "val": ds}, optax.adam(1e-3),
        settings(str(tmp_path / "b"), resume=True),
    )
    _assert_tree_equal(v_straight["params"], v_resumed["params"])


def test_resumed_epoch_loss_trace_matches_uninterrupted(tmp_path, capsys):
    """The resumed epoch's printed 'EPOCH Loss' must cover the WHOLE epoch
    (the emergency checkpoint persists the running-loss accumulators), so the
    trace matches an uninterrupted run — not just the post-resume batches."""
    import optax

    from multimodalbrainsurvival_tpu.data import RNATableDataset
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.train import (
        TrainingPreempted,
        TrainSettings,
        train_model,
    )
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter

    make_survival_csv(str(tmp_path / "rna.csv"),
                      [f"c{i}" for i in range(16)], n_rna=8, seed=4)
    ds = RNATableDataset(str(tmp_path / "rna.csv"))

    def make():
        return TableAdapter(
            model=RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(16, 8)))
        )

    def settings(save_dir, *, resume=False, preempt_after=0):
        return TrainSettings(
            num_epochs=2, batch_size=8, save_dir=save_dir, seed=17,
            eval_splits_during_training=(), resume=resume,
            preempt_after_steps=preempt_after,
        )

    def epoch_losses(out: str) -> list[float]:
        # values only: the accumulators round-trip through float32 in the
        # checkpoint, so compare numerically rather than string-exactly
        return [float(ln.split(":")[1]) for ln in out.splitlines()
                if ln.startswith("EPOCH Loss")]

    train_model(make(), {"train": ds}, optax.adam(1e-3),
                settings(str(tmp_path / "a")))
    straight = epoch_losses(capsys.readouterr().out)
    assert len(straight) == 2

    # preempt mid-epoch-1 (step 3 = epoch 1, batch 1 done), then resume;
    # ALSO covers the edge where the whole epoch was consumed (step 4)
    for n, preempt_after in (("b", 3), ("c", 4)):
        with pytest.raises(TrainingPreempted):
            train_model(make(), {"train": ds}, optax.adam(1e-3),
                        settings(str(tmp_path / n), preempt_after=preempt_after))
        capsys.readouterr()
        train_model(make(), {"train": ds}, optax.adam(1e-3),
                    settings(str(tmp_path / n), resume=True))
        resumed = epoch_losses(capsys.readouterr().out)
        np.testing.assert_allclose(
            resumed, straight[1:], atol=1e-3,
            err_msg=f"preempt_after={preempt_after}",
        )


def test_preemption_at_last_batch_of_epoch_resumes_cleanly(tmp_path):
    """Edge: the emergency save lands after the epoch's final batch — resume
    re-enters that epoch with nothing left to consume, finishes its eval +
    boundary save, and continues."""
    import optax

    from multimodalbrainsurvival_tpu.data import RNATableDataset
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.train import (
        TrainingPreempted,
        TrainSettings,
        train_model,
    )
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter

    make_survival_csv(str(tmp_path / "rna.csv"),
                      [f"c{i}" for i in range(16)], n_rna=8, seed=4)
    ds = RNATableDataset(str(tmp_path / "rna.csv"))

    def make():
        return TableAdapter(
            model=RNAOnlyModel(
                encoder=RNAEncoder(hidden_dims=(16, 8), dropout=0.5)
            )
        )

    def settings(save_dir, *, resume=False, preempt_after=0):
        return TrainSettings(
            num_epochs=3, batch_size=8, save_dir=save_dir, seed=17,
            eval_splits_during_training=("val",), resume=resume,
            preempt_after_steps=preempt_after,
        )

    v_straight, _, _ = train_model(
        make(), {"train": ds, "val": ds}, optax.adam(1e-3),
        settings(str(tmp_path / "a")),
    )
    # step 2 == last batch of epoch 0 (2 batches per epoch)
    with pytest.raises(TrainingPreempted) as exc:
        train_model(make(), {"train": ds, "val": ds}, optax.adam(1e-3),
                    settings(str(tmp_path / "b"), preempt_after=2))
    assert (exc.value.epoch, exc.value.epoch_step) == (0, 2)
    v_resumed, _, _ = train_model(
        make(), {"train": ds, "val": ds}, optax.adam(1e-3),
        settings(str(tmp_path / "b"), resume=True),
    )
    _assert_tree_equal(v_straight["params"], v_resumed["params"])


def test_midepoch_preemption_resume_exact_mil_patch_pipeline(tmp_path):
    """The hard variant: a patch-bag MIL pipeline. Mid-epoch resume must
    replay the in-slide shuffle stream (fast-forward + skip-once for the
    interrupted epoch), the loader's per-epoch batch order, BN statistics,
    and the augmentation/dropout PRNG stream — params must match the
    uninterrupted run bitwise."""
    import optax

    from helpers import make_patch_dir

    from multimodalbrainsurvival_tpu.data import PatchBagDataset
    from multimodalbrainsurvival_tpu.models import (
        AggregationModel,
        make_aggregator,
        resnet18,
    )
    from multimodalbrainsurvival_tpu.train import (
        TrainingPreempted,
        TrainSettings,
        train_model,
    )
    from multimodalbrainsurvival_tpu.train.adapters import MILAdapter

    root = tmp_path / "patches"
    make_patch_dir(str(root), "W1", 8, img_size=16)
    make_patch_dir(str(root), "W2", 8, img_size=16)
    csv = tmp_path / "ffpe.csv"
    make_survival_csv(str(csv), ["c1", "c2"], wsi_names=["W1.svs", "W2.svs"])

    def make_adapter():
        return MILAdapter(
            model=AggregationModel(
                resnet=resnet18(),
                aggregator=make_aggregator("identity", dim=512),
                aggregator_dim=512,
                out_features=1,
            ),
            loader_kwargs={"num_threads": 2},
        )

    def make_ds():
        return PatchBagDataset(str(root), str(csv), img_size=16, bag_size=2)

    def settings(save_dir, *, resume=False, preempt_after=0):
        return TrainSettings(
            num_epochs=2, batch_size=2, save_dir=save_dir, seed=23,
            eval_splits_during_training=(), resume=resume,
            preempt_after_steps=preempt_after,
        )

    # 8 bags / batch 2 -> 4 steps per epoch
    ds = make_ds()
    v_straight, _, _ = train_model(
        make_adapter(), {"train": ds, "val": ds}, optax.adam(1e-3),
        settings(str(tmp_path / "a")),
    )
    with pytest.raises(TrainingPreempted) as exc:
        train_model(make_adapter(), {"train": make_ds(), "val": make_ds()},
                    optax.adam(1e-3),
                    settings(str(tmp_path / "b"), preempt_after=6))
    assert (exc.value.epoch, exc.value.epoch_step) == (1, 2)
    v_resumed, _, _ = train_model(
        make_adapter(), {"train": make_ds(), "val": make_ds()},
        optax.adam(1e-3), settings(str(tmp_path / "b"), resume=True),
    )
    _assert_tree_equal(v_straight["params"], v_resumed["params"])
    _assert_tree_equal(
        v_straight.get("batch_stats", {}), v_resumed.get("batch_stats", {})
    )



def test_loader_skip_batches_matches_suffix(tmp_path):
    """skip_batches=k yields exactly the batches after the k-th of the same
    deterministic epoch order (tables + patch loaders)."""
    from helpers import make_patch_dir

    from multimodalbrainsurvival_tpu.data import (
        PatchBagDataset,
        RNATableDataset,
    )

    make_survival_csv(str(tmp_path / "rna.csv"),
                      [f"c{i}" for i in range(13)], n_rna=4, seed=0)
    tab = RNATableDataset(str(tmp_path / "rna.csv"))
    full = list(tab.batches(4, shuffle=True, seed=7))
    tail = list(tab.batches(4, shuffle=True, seed=7, skip_batches=2))
    assert len(tail) == len(full) - 2
    for a, b in zip(full[2:], tail):
        np.testing.assert_array_equal(a["data"], b["data"])
        assert a["case"] == b["case"]

    root = tmp_path / "patches"
    make_patch_dir(str(root), "W1", 8)
    make_patch_dir(str(root), "W2", 6)
    csv = tmp_path / "ffpe.csv"
    make_survival_csv(str(csv), ["c1", "c2"], wsi_names=["W1.svs", "W2.svs"])
    pb = PatchBagDataset(str(root), str(csv), img_size=16, bag_size=2)
    full = list(pb.batches(2, shuffle=True, seed=7, num_threads=2))
    tail = list(pb.batches(2, shuffle=True, seed=7, num_threads=2,
                           skip_batches=1))
    assert len(tail) == len(full) - 1
    for a, b in zip(full[1:], tail):
        np.testing.assert_array_equal(a["patch_bag"], b["patch_bag"])
        assert a["WSI"] == b["WSI"]


def test_sigkill_mid_save_leaves_resumable_state(tmp_path):
    """A SIGKILL during the emergency save must not break resume: orbax
    commits via tmp-dir + atomic rename, so a killed save leaves only an
    ``*.orbax-checkpoint-tmp-*`` orphan and never a half-written final dir.
    Simulate the aftermath (orphan tmp dir, no final ``.preempt``) and assert
    resume falls back to the boundary checkpoint and completes."""
    import optax

    from multimodalbrainsurvival_tpu.data import RNATableDataset
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.train import TrainSettings, train_model
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter

    make_survival_csv(str(tmp_path / "rna.csv"),
                      [f"c{i}" for i in range(16)], n_rna=8, seed=4)
    ds = RNATableDataset(str(tmp_path / "rna.csv"))

    def make():
        return TableAdapter(
            model=RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(16, 8)))
        )

    def settings(*, num_epochs, resume=False):
        return TrainSettings(
            num_epochs=num_epochs, batch_size=8, seed=17,
            save_dir=str(tmp_path / "run"),
            eval_splits_during_training=(), resume=resume,
        )

    # epoch-boundary checkpoints committed through epoch 1
    train_model(make(), {"train": ds}, optax.adam(1e-3),
                settings(num_epochs=2))

    # aftermath of a SIGKILL mid-emergency-save: an orphan tmp dir only
    orphan = tmp_path / "run" / (
        "train_state.preempt.orbax-checkpoint-tmp-1234567890"
    )
    orphan.mkdir()
    (orphan / "partial_write").write_bytes(b"\x00" * 64)
    assert not (tmp_path / "run" / "train_state.preempt").exists()

    v, _, _ = train_model(make(), {"train": ds}, optax.adam(1e-3),
                          settings(num_epochs=3, resume=True))
    # resumed from the epoch-1 boundary state and ran the remaining epoch
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(v["params"]))


def test_resume_is_elastic_across_mesh_shapes(tmp_path):
    """Elastic recovery (SURVEY.md §5): the full-state checkpoint is
    topology-free. A run preempted while training over a dp=2 mesh resumes
    over a dp=4 mesh — or with no mesh at all — and lands on the params of an
    uninterrupted single-device run (up to fp32 cross-device reduction order;
    SGD is used so reduction-order noise stays sub-ulp instead of being
    amplified by Adam's g/√(g²) — see test_dp_training_step_matches_single_device).
    """
    import optax

    from multimodalbrainsurvival_tpu.data import RNATableDataset
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.parallel import batch_device_put, make_mesh
    from multimodalbrainsurvival_tpu.train import (
        TrainingPreempted,
        TrainSettings,
        train_model,
    )
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter

    make_survival_csv(str(tmp_path / "rna.csv"),
                      [f"c{i}" for i in range(16)], n_rna=8, seed=4)
    ds = RNATableDataset(str(tmp_path / "rna.csv"))

    def make():
        return TableAdapter(
            model=RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(16, 8),
                                                  dropout=0.0))
        )

    def settings(save_dir, *, dp=None, resume=False, preempt_after=0):
        return TrainSettings(
            num_epochs=3, batch_size=8, save_dir=save_dir, seed=17,
            eval_splits_during_training=(), resume=resume,
            preempt_after_steps=preempt_after,
            device_put_fn=batch_device_put(make_mesh(dp=dp, mp=1))
            if dp else None,
        )

    # uninterrupted single-device control (3 epochs × 2 batches)
    v_straight, _, _ = train_model(
        make(), {"train": ds}, optax.sgd(1e-2),
        settings(str(tmp_path / "a")),
    )

    def preempt_then_resume(name, *, dp_before, dp_after):
        with pytest.raises(TrainingPreempted) as exc:
            train_model(make(), {"train": ds}, optax.sgd(1e-2),
                        settings(str(tmp_path / name), dp=dp_before,
                                 preempt_after=3))
        assert (exc.value.epoch, exc.value.epoch_step) == (1, 1)
        v, _, _ = train_model(
            make(), {"train": ds}, optax.sgd(1e-2),
            settings(str(tmp_path / name), dp=dp_after, resume=True),
        )
        for (pa, xa), (_, xb) in zip(
            jax.tree_util.tree_leaves_with_path(v_straight["params"]),
            jax.tree_util.tree_leaves_with_path(v["params"]),
        ):
            np.testing.assert_allclose(
                np.asarray(xa), np.asarray(xb), rtol=1e-5, atol=1e-6,
                err_msg=f"{name}: {jax.tree_util.keystr(pa)}",
            )

    # grow the mesh across the restart, shrink it away entirely, and
    # introduce one where there was none
    preempt_then_resume("grow", dp_before=2, dp_after=4)
    preempt_then_resume("shrink", dp_before=4, dp_after=None)
    preempt_then_resume("appear", dp_before=None, dp_after=8)


def test_sigterm_triggers_emergency_checkpoint_in_subprocess(tmp_path):
    """Real signal delivery: SIGTERM a training subprocess mid-run; it must
    commit the emergency checkpoint, report PREEMPTED, and exit cleanly; a
    resume run must pick the state up."""
    make_survival_csv(str(tmp_path / "rna.csv"),
                      [f"c{i}" for i in range(64)], n_rna=8, seed=4)
    script = textwrap.dedent(f"""
        import jax
        jax.config.update("jax_platforms", "cpu")
        import sys
        sys.path.insert(0, {str(os.path.join(REPO, "tests"))!r})
        import optax
        from multimodalbrainsurvival_tpu.data import RNATableDataset
        from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
        from multimodalbrainsurvival_tpu.train import (
            TrainingPreempted, TrainSettings, train_model,
        )
        from multimodalbrainsurvival_tpu.train.adapters import TableAdapter

        ds = RNATableDataset({str(tmp_path / "rna.csv")!r})
        adapter = TableAdapter(model=RNAOnlyModel(
            encoder=RNAEncoder(hidden_dims=(16, 8))))
        resume = bool(int(sys.argv[1]))
        s = TrainSettings(
            num_epochs=3 if resume else 10_000, batch_size=8, seed=17,
            save_dir={str(tmp_path / "ckpt")!r}, log_interval=1,
            eval_splits_during_training=(), resume=resume,
        )
        try:
            train_model(adapter, {{"train": ds, "val": ds}}, optax.adam(1e-3), s)
        except TrainingPreempted as e:
            print("caught:", e)
    """)
    proc = subprocess.Popen(
        [sys.executable, "-c", script, "0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, bufsize=1,
        cwd=REPO,
    )
    lines = []
    try:
        for line in proc.stdout:
            lines.append(line)
            if "bags/s" in line:  # at least one optimizer step has completed
                proc.send_signal(signal.SIGTERM)
                break
        out_rest = proc.communicate(timeout=180)[0]
        lines.append(out_rest or "")
    finally:
        if proc.poll() is None:
            proc.kill()
    out = "".join(lines)
    assert proc.returncode == 0, out
    assert "PREEMPTED: saved full train state" in out, out
    # the emergency snapshot goes to a SIBLING path so a SIGKILL mid-save can
    # never destroy the boundary checkpoint (orbax force=True deletes the
    # destination before the fresh write commits)
    assert os.path.isdir(tmp_path / "ckpt" / "train_state.preempt")

    # the committed state resumes (short run to completion)
    res = subprocess.run(
        [sys.executable, "-c", script, "1"],
        capture_output=True, text=True, cwd=REPO, timeout=180,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "Resumed full train state" in res.stdout, res.stdout
