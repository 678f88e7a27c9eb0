"""Train-state resume, per-patch joint dataset, gene vocabulary."""

import json
import os

import numpy as np
import jax
import pytest

from tests.helpers import make_patch_dir, make_survival_csv


def test_full_train_state_resume(tmp_path):
    """Interrupt training, resume from the full state (params + opt moments +
    epoch/step), and confirm it continues instead of restarting."""
    import optax

    from multimodalbrainsurvival_tpu.data import RNATableDataset
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.train import TrainSettings, train_model
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter

    make_survival_csv(str(tmp_path / "rna.csv"),
                      [f"c{i}" for i in range(16)], n_rna=8)
    ds = RNATableDataset(str(tmp_path / "rna.csv"))
    save_dir = str(tmp_path / "ckpt")

    def make():
        return TableAdapter(
            model=RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(16, 8)))
        )

    s1 = TrainSettings(num_epochs=2, batch_size=8, save_dir=save_dir,
                       eval_splits_during_training=("val",))
    v_last, _, _ = train_model(make(), {"train": ds, "val": ds},
                               optax.adam(1e-3), s1)
    assert os.path.isdir(os.path.join(save_dir, "train_state"))

    # resume with a HIGHER epoch budget: must start at epoch 2, not 0
    s2 = TrainSettings(num_epochs=4, batch_size=8, save_dir=save_dir,
                       eval_splits_during_training=("val",), resume=True)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        v2, _, _ = train_model(make(), {"train": ds, "val": ds},
                               optax.adam(1e-3), s2)
    out = buf.getvalue()
    assert "Resumed full train state" in out
    assert "Epoch 2/3" in out and "Epoch 0/3" not in out
    # params actually moved further
    a = jax.tree.leaves(v_last["params"])[0]
    b = jax.tree.leaves(v2["params"])[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_checkify_debug_mode_localizes_nan(tmp_path):
    """debug_checkify raises with the offending primitive named."""
    import optax
    import pandas as pd

    from multimodalbrainsurvival_tpu.data import RNATableDataset
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.train import TrainSettings, train_model
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter

    make_survival_csv(str(tmp_path / "rna.csv"), [f"c{i}" for i in range(8)],
                      n_rna=6)
    df = pd.read_csv(tmp_path / "rna.csv")
    df["rna_0"] = np.inf
    df.to_csv(tmp_path / "poison.csv", index=False)
    ds = RNATableDataset(str(tmp_path / "poison.csv"))
    adapter = TableAdapter(
        model=RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(8, 4)))
    )
    s = TrainSettings(num_epochs=1, batch_size=4, save_dir=None,
                      debug_checkify=True, eval_splits_during_training=())
    with pytest.raises(Exception, match="primitive"):
        train_model(adapter, {"train": ds, "val": ds}, optax.adam(1e-3), s)


def test_patch_rna_dataset(tmp_path):
    from multimodalbrainsurvival_tpu.data.patches import PatchRNADataset

    root = tmp_path / "patches"
    make_patch_dir(str(root), "W1", 5)
    csv = tmp_path / "joint.csv"
    make_survival_csv(str(csv), ["c1"], wsi_names=["W1.svs"], n_rna=6)
    ds = PatchRNADataset(str(root), str(csv), img_size=32)
    assert len(ds) == 5  # one item per patch
    b = next(ds.batches(3, num_threads=1))
    assert b["patch"].shape == (3, 32, 32, 3)
    assert b["rna_data"].shape == (3, 6)
    assert b["sample_mask"].all()


def test_gene_vocabulary(tmp_path):
    import pandas as pd

    from multimodalbrainsurvival_tpu.data.genes import GeneVocabulary

    path = tmp_path / "genes.txt"
    path.write_text("symbol\nTSPAN6\nTNMD\nDPM1\n")
    vocab = GeneVocabulary.from_file(str(path))
    assert len(vocab) == 3
    assert "TNMD" in vocab and "NOPE" not in vocab
    with pytest.raises(ValueError):
        vocab.validate_width(2)
    vocab.validate_width(3)

    frame = pd.DataFrame(
        {"expr_DPM1": [1.0], "expr_TSPAN6": [2.0], "expr_TNMD": [3.0]}
    )
    mat = vocab.reorder(
        frame, lambda c: c[5:] if c.startswith("expr_") else None
    )
    np.testing.assert_array_equal(mat, [[2.0, 3.0, 1.0]])


@pytest.mark.skipif(
    not os.path.isfile("/root/reference/2_GeneExpression/genes.txt"),
    reason="reference genes.txt not mounted",
)
def test_gene_vocabulary_reads_reference_file():
    from multimodalbrainsurvival_tpu.data.genes import (
        REFERENCE_GENES_TXT,
        GeneVocabulary,
    )

    vocab = GeneVocabulary.from_file(REFERENCE_GENES_TXT)
    assert len(vocab) == 12778  # SURVEY.md §2.1 #24
    assert vocab.symbols[0] == "TSPAN6"


def test_resume_is_exact_including_rng(tmp_path):
    """A run interrupted after epoch k and resumed must produce EXACTLY the
    params of the uninterrupted run: the checkpoint carries the PRNG stream,
    so dropout keys continue instead of restarting (round-2 upgrade)."""
    import optax

    from multimodalbrainsurvival_tpu.data import RNATableDataset
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.train import TrainSettings, train_model
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter

    make_survival_csv(str(tmp_path / "rna.csv"),
                      [f"c{i}" for i in range(16)], n_rna=8, seed=4)
    ds = RNATableDataset(str(tmp_path / "rna.csv"))

    def make():
        # dropout > 0 so the rng stream actually matters
        return TableAdapter(
            model=RNAOnlyModel(
                encoder=RNAEncoder(hidden_dims=(16, 8), dropout=0.5)
            )
        )

    def settings(save_dir, epochs, resume=False):
        return TrainSettings(
            num_epochs=epochs, batch_size=8, save_dir=save_dir, seed=17,
            eval_splits_during_training=("val",), resume=resume,
        )

    # uninterrupted: 3 epochs
    v_straight, _, _ = train_model(
        make(), {"train": ds, "val": ds}, optax.adam(1e-3),
        settings(str(tmp_path / "a"), 3),
    )
    # interrupted: 2 epochs, then resume for the 3rd
    train_model(make(), {"train": ds, "val": ds}, optax.adam(1e-3),
                settings(str(tmp_path / "b"), 2))
    v_resumed, _, _ = train_model(
        make(), {"train": ds, "val": ds}, optax.adam(1e-3),
        settings(str(tmp_path / "b"), 3, resume=True),
    )

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(v_straight["params"]),
        jax.tree_util.tree_leaves_with_path(v_resumed["params"]),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(pa)
        )


def test_resume_fast_forwards_in_slide_shuffle(tmp_path):
    """On resume, the freshly built patch dataset's per-epoch shuffle stream
    is advanced to match the uninterrupted run's (loop.py resume path)."""
    import optax

    from multimodalbrainsurvival_tpu.data import PatchBagDataset, RNATableDataset
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.train import TrainSettings, train_model
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter

    root = tmp_path / "patches"
    make_patch_dir(str(root), "W1", 6)
    csv = tmp_path / "ffpe.csv"
    make_survival_csv(str(csv), ["c1"], wsi_names=["W1.svs"])

    # straight stream: shuffle() called once per epoch for 3 epochs
    straight = PatchBagDataset(str(root), str(csv), img_size=16, bag_size=2)
    for _ in range(3):
        straight.shuffle()

    # resumed stream: a dataset that records shuffles, driven through a
    # 2-epoch run + a resume-for-epoch-2 run of a cheap table model but
    # with THIS dataset passed as "train" would couple MIL into the test;
    # instead assert the loop's fast-forward contract directly
    resumed = PatchBagDataset(str(root), str(csv), img_size=16, bag_size=2)
    start_epoch = 2
    for _ in range(start_epoch):  # what the resume path performs
        resumed.shuffle()
    resumed.shuffle()  # epoch 2's own in-loop shuffle
    assert straight.data["W1"]["images"] == resumed.data["W1"]["images"]


def test_resume_from_pre_rng_checkpoint(tmp_path):
    """Checkpoints written before the PRNG stream joined the train state
    (no meta.rng) must still resume (legacy-template fallback in loop.py)."""
    import optax

    from multimodalbrainsurvival_tpu.data import RNATableDataset
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.train import TrainSettings, train_model
    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter
    from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer

    make_survival_csv(str(tmp_path / "rna.csv"),
                      [f"c{i}" for i in range(16)], n_rna=8, seed=2)
    ds = RNATableDataset(str(tmp_path / "rna.csv"))
    save_dir = str(tmp_path / "ck")

    adapter = TableAdapter(
        model=RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(16, 8)))
    )
    train_model(adapter, {"train": ds, "val": ds}, optax.adam(1e-3),
                TrainSettings(num_epochs=1, batch_size=8, save_dir=save_dir,
                              eval_splits_during_training=("val",)))

    # rewrite the state WITHOUT meta.rng, as a round-1 checkpoint would be
    ck = Checkpointer()
    state_path = os.path.join(save_dir, "train_state")
    state = ck.restore(state_path)
    assert "rng" in state["meta"]
    state["meta"].pop("rng")
    import shutil

    shutil.rmtree(state_path)
    ck.save(state_path, state, block=True)

    # resume must fall back to the legacy template and continue
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        train_model(
            TableAdapter(
                model=RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(16, 8)))
            ),
            {"train": ds, "val": ds}, optax.adam(1e-3),
            TrainSettings(num_epochs=2, batch_size=8, save_dir=save_dir,
                          eval_splits_during_training=("val",), resume=True),
        )
    out = buf.getvalue()
    assert "Resumed full train state" in out and "Epoch 1/1" in out


def test_metric_writer_jsonl_stream(tmp_path):
    """MetricWriter (utils/logging.py): durable JSONL regardless of
    TensorBoard availability; scalar/text/close lifecycle; appends across
    reopens (resume keeps one continuous stream)."""
    import json

    from multimodalbrainsurvival_tpu.utils.logging import MetricWriter

    d = str(tmp_path / "logs")
    w = MetricWriter(log_dir=d)
    w.scalar("train/loss", 1.5, step=1)
    w.text("config", {"lr": 1e-3})
    w.close()
    w = MetricWriter(log_dir=d)  # resume appends, not truncates
    w.scalar("train/loss", 1.25, step=2)
    w.close()

    path = tmp_path / "logs" / "metrics.jsonl"
    events = [json.loads(line) for line in path.read_text().splitlines()]
    assert [e.get("tag") for e in events] == [
        "train/loss", "config", "train/loss"
    ]
    assert events[0]["value"] == 1.5 and events[0]["step"] == 1
    assert "lr" in events[1]["text"]
    assert events[2]["value"] == 1.25 and events[2]["step"] == 2
    assert all("ts" in e for e in events)

    # jsonl_path-only construction (no TB dir)
    alt = str(tmp_path / "alt.jsonl")
    w = MetricWriter(jsonl_path=alt)
    w.scalar("x", 0.0, step=0)
    w.close()
    assert json.loads(open(alt).read())["tag"] == "x"
