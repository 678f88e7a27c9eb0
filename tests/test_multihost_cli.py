"""Multi-host CLI end-to-end: the SAME ``mmbs-feature-train`` command on two
OS processes (``mesh: {"dp": 2, "distributed": true}``) trains ONE model over
a process-spanning mesh.

This is the user-facing surface of the multi-host stack (worker-level proofs
in test_parallel.py): config-driven ``initialize_from_env`` join, dp-sharded
batches, collective orbax checkpoints to one shared save_dir, primary-only
output frames, and ``use_cuda: false`` device-select parity
(`2_HistoPath_train.py:457`) routing both workers to host CPU so the test
never claims the real accelerator.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.helpers import make_survival_csv

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _val_losses(out: str) -> list:
    return [
        float(line.split(":")[1])
        for line in out.splitlines()
        if line.startswith("VAL Loss:")
    ]


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh_cli")
    for split, n in [("train", 16), ("val", 8), ("test", 8)]:
        make_survival_csv(
            str(root / f"{split}.csv"), [f"{split}{i}" for i in range(n)],
            n_feature=6, seed=hash(split) % 1000,
        )
    return root


def _config(root, flag, mesh):
    cfg = {
        "batch_size": 8,
        "use_cuda": False,  # device-select parity: run on host CPU
        "train_csv_path": str(root / "train.csv"),
        "val_csv_path": str(root / "val.csv"),
        "test_csv_path": str(root / "test.csv"),
        "num_epochs": 2,
        "lr": 1e-3,
        "weight_decay": 1e-5,
        "flag": flag,
        "checkpoint_path": str(root / "out"),
        "summary_path": str(root / "out" / "summary"),
    }
    if mesh:
        cfg["mesh"] = mesh
    path = root / f"{flag}.json"
    path.write_text(json.dumps(cfg))
    return str(path)


def test_distributed_requires_explicit_flag(cohort, tmp_path):
    """No `flag` + distributed must fail loudly BEFORE joining the runtime:
    the timestamp fallback is per-process wall clock, so hosts would compute
    different experiment dirs and the collective checkpoint would diverge."""
    from multimodalbrainsurvival_tpu.cli.feature_train import main

    root = cohort
    cfg = {
        "batch_size": 8, "use_cuda": False,
        "train_csv_path": str(root / "train.csv"),
        "val_csv_path": str(root / "val.csv"),
        "test_csv_path": str(root / "test.csv"),
        "num_epochs": 1, "lr": 1e-3, "weight_decay": 1e-5,
        "checkpoint_path": str(tmp_path / "out"),
        "mesh": {"dp": 1, "distributed": True},
    }
    path = tmp_path / "noflag.json"
    path.write_text(json.dumps(cfg))
    with pytest.raises(SystemExit, match="explicit 'flag'"):
        main(["--config", str(path), "--seed", "7", "--log", "0"])


def test_feature_train_cli_two_processes(cohort):
    root = cohort
    cfg = _config(root, "mh", {"dp": 2, "distributed": True})

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env_base = dict(os.environ)
    env_base.pop("XLA_FLAGS", None)  # workers: one CPU device per process
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-m",
             "multimodalbrainsurvival_tpu.cli.feature_train",
             "--config", cfg, "--seed", "7", "--log", "0"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
            assert p.returncode == 0, out[-3000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for o in outs:
        assert "joined distributed runtime: process" in o, o[-2000:]
        assert "training over mesh {'dp': 2, 'mp': 1}" in o, o[-2000:]
    # every process computes the identical global eval
    assert _val_losses(outs[0]) == _val_losses(outs[1])
    assert len(_val_losses(outs[0])) >= 2

    # only the primary writes the output frames; checkpoints are collective
    n_wrote = sum("Wrote model output files" in o for o in outs)
    assert n_wrote == 1, n_wrote
    outdir = root / "out" / "outputs" / "mh"
    assert sorted(os.listdir(outdir)) == [
        "test_output_best.csv", "test_output_last.csv",
        "train_output_best.csv", "train_output_last.csv",
        "val_output_best.csv", "val_output_last.csv",
    ]
    for name in ("model_dict_best", "model_last", "train_state"):
        assert os.path.isdir(root / "out" / "models" / "mh" / name)

    # single-process control on the same cohort: the dp=2 two-process run
    # must train the same model (float tolerance: reduction order differs)
    from multimodalbrainsurvival_tpu.cli.feature_train import main

    ctl_cfg = _config(root, "ctl", None)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["--config", ctl_cfg, "--seed", "7", "--log", "0"])
    np.testing.assert_allclose(
        _val_losses(outs[0]), _val_losses(buf.getvalue()), rtol=5e-4
    )
