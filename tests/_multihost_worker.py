"""Worker for the two-process jax.distributed smoke test (test_parallel.py).

Each process initializes the distributed runtime via the library's own
``initialize_distributed`` wrapper (parallel/mesh.py), builds the SAME
``make_mesh`` the single-host code uses — now spanning both processes —
and runs one jitted cross-process reduction through it. This is the
multi-host DCN path of SURVEY.md §2.2 exercised for real (two OS processes,
one coordinator), not prose.

Usage: python _multihost_worker.py <process_id> <num_processes> <coord_addr>
"""

import os
import sys

# self-sufficient import: the worker must find the package even if the
# editable install is absent in this interpreter (observed: the venv's
# site-packages can be recreated under this container)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def _full_value(global_array) -> np.ndarray:
    """Host copy of a REPLICATED global array (each device holds the full
    value, so the first addressable shard is the whole array — device_get
    would refuse the non-addressable remote shards)."""
    return np.asarray(global_array.addressable_shards[0].data)


def build_train_fixture():
    """Model + settings + forward_loss shared BIT-EXACTLY between the worker
    processes and the pytest harness's single-process control run."""
    import flax.linen as nn

    from multimodalbrainsurvival_tpu.train.adapters import TableAdapter
    from multimodalbrainsurvival_tpu.train.loop import (
        TrainSettings, make_loss_fn,
    )

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(1)(nn.tanh(nn.Dense(8)(x)))

        def extract(self, x, train=False):
            return x

    adapter = TableAdapter(model=MLP())
    settings = TrainSettings(task="survival_prediction", batch_size=8)
    loss_fn, _ = make_loss_fn(settings)

    def forward_loss(params, stats, arrays, step_rng):
        out, new = adapter.apply(
            {"params": params}, arrays, train=True, rng=step_rng
        )
        return loss_fn(out, arrays, arrays[adapter.sample_mask_key]), new

    return adapter, settings, forward_loss


def train_step_phase(mesh, process_id: int) -> None:
    """Run the PRODUCTION train step (train.loop.build_train_step — the exact
    step every train CLI drives, donation included) across the processes:
    dp-sharded batches placed with the library's own batch_device_put
    (host_to_global → make_array_from_callback on multi-process), the Cox
    partial likelihood coupling the risk set across BOTH hosts inside jit,
    and gradients reduced by GSPMD collectives over the process boundary.
    Prints a bit-exact digest of the final params for the pytest harness to
    compare across processes and against a single-process control."""
    import optax

    from multimodalbrainsurvival_tpu.parallel import batch_device_put
    from multimodalbrainsurvival_tpu.parallel.mesh import host_to_global
    from multimodalbrainsurvival_tpu.train.loop import build_train_step

    adapter, settings, forward_loss = build_train_fixture()
    batch = make_worker_batch()
    put = batch_device_put(mesh)
    arrays = put(batch)

    # identical init on every process (same seed), then replicate globally
    variables = adapter.init(
        jax.random.PRNGKey(0), {"data": jnp.asarray(batch["data"])}
    )
    host_params = jax.tree.map(np.asarray, variables["params"])
    rep = NamedSharding(mesh, P())
    params = jax.tree.map(lambda v: host_to_global(v, rep), host_params)

    # SGD, not Adam: the harness compares against a single-process control,
    # and Adam's g/sqrt(v) amplifies benign cross-process reduction-order
    # float noise unboundedly on near-zero-gradient params; SGD keeps the
    # discrepancy proportional to the gradient itself
    tx = optax.sgd(1e-2)
    # eager ops on non-fully-addressable arrays are illegal — init under jit
    opt_state = jax.jit(tx.init)(params)
    step = build_train_step(settings, tx, forward_loss)

    rng = host_to_global(
        np.asarray(jax.random.PRNGKey(1), np.uint32), rep
    )
    loss = None
    for _ in range(3):
        params, _, opt_state, loss, rng = step(
            params, None, opt_state, arrays, rng
        )
    flat = np.concatenate(
        [_full_value(leaf).ravel() for leaf in jax.tree.leaves(params)]
    ).astype(np.float32)
    print(
        f"MULTIHOST-TRAIN OK pid={process_id} "
        f"loss={float(_full_value(loss)):.6f} "
        f"params={flat.tobytes().hex()}",
        flush=True,
    )


def make_worker_batch() -> dict:
    """The fixed synthetic survival batch — module-level so the pytest
    harness imports it for the single-process control run."""
    rng = np.random.default_rng(42)
    return {
        "data": rng.normal(size=(8, 6)).astype(np.float32),
        "mask": np.ones((8,), bool),
        "survival_months": rng.uniform(1, 100, 8).astype(np.float32),
        "vital_status": (rng.uniform(size=8) < 0.7).astype(np.float32),
    }


def train_loop_phase(mesh, process_id: int, data_dir: str) -> None:
    """Run the FULL production train loop (train.loop.train_model — epochs,
    deferred loss drain, per-epoch evaluate with metrics, early-stop/best
    bookkeeping) across the processes, exactly as a train CLI drives it, with
    dp-sharded batches from batch_device_put. Exercises the multi-host fetch
    paths (_drain_losses / evaluate's global_to_host branches) for real.
    Prints the per-epoch val losses and a bit-exact digest of the final
    params; the pytest harness compares against a single-process control."""
    import optax

    from multimodalbrainsurvival_tpu.data.tables import FeatureTableDataset
    from multimodalbrainsurvival_tpu.parallel import batch_device_put
    from multimodalbrainsurvival_tpu.train.loop import (
        TrainSettings, train_model,
    )

    adapter, _, _ = build_train_fixture()
    ds = FeatureTableDataset(os.path.join(data_dir, "mh.csv"))
    settings = TrainSettings(
        num_epochs=2, task="survival_prediction", batch_size=8,
        log_interval=100, seed=5, eval_splits_during_training=("val",),
        device_put_fn=batch_device_put(mesh),
    )
    last, _, outputs = train_model(
        adapter, {"train": ds, "val": ds}, optax.sgd(1e-2), settings,
        rng=jax.random.PRNGKey(2),
    )
    from multimodalbrainsurvival_tpu.parallel.mesh import global_to_host

    flat = np.concatenate(
        [global_to_host(leaf).ravel()
         for leaf in jax.tree.leaves(last["params"])]
    ).astype(np.float32)
    print(
        f"MULTIHOST-LOOP OK pid={process_id} "
        f"val={outputs['val_metrics_last']['loss']:.6f} "
        f"params={flat.tobytes().hex()}",
        flush=True,
    )


def checkpoint_phase(mesh, process_id: int, data_dir: str) -> None:
    """Multi-host checkpoint/resume: train 1 epoch with a SHARED save_dir
    (orbax coordinates the collective save across the jax.distributed
    runtime — both processes call save on the same path), then a second
    train_model with resume=True continues to epoch 2. Prints the resumed
    run's final-params digest; the pytest harness compares it against a
    single-process STRAIGHT 2-epoch control, proving the multi-host
    save→restore round-trip preserves training exactly."""
    import optax

    from multimodalbrainsurvival_tpu.data.tables import FeatureTableDataset
    from multimodalbrainsurvival_tpu.parallel import batch_device_put
    from multimodalbrainsurvival_tpu.parallel.mesh import global_to_host
    from multimodalbrainsurvival_tpu.train.loop import (
        TrainSettings, train_model,
    )

    ds = FeatureTableDataset(os.path.join(data_dir, "mh.csv"))
    save_dir = os.path.join(data_dir, "mh_ckpt")

    def settings(num_epochs, resume):
        return TrainSettings(
            num_epochs=num_epochs, task="survival_prediction", batch_size=8,
            log_interval=100, seed=5, eval_splits_during_training=("val",),
            device_put_fn=batch_device_put(mesh), save_dir=save_dir,
            resume=resume,
            # site-exact stop position for the deterministic assertion
            # (the production default of 8 trades stop latency for
            # dispatch pipelining)
            preempt_sync_every=1,
        )

    adapter, _, _ = build_train_fixture()
    train_model(adapter, {"train": ds, "val": ds}, optax.sgd(1e-2),
                settings(1, False), rng=jax.random.PRNGKey(2))

    adapter, _, _ = build_train_fixture()
    last, _, _ = train_model(adapter, {"train": ds, "val": ds},
                             optax.sgd(1e-2), settings(2, True),
                             rng=jax.random.PRNGKey(2))
    flat = np.concatenate(
        [global_to_host(leaf).ravel()
         for leaf in jax.tree.leaves(last["params"])]
    ).astype(np.float32)
    print(
        f"MULTIHOST-CKPT OK pid={process_id} "
        f"params={flat.tobytes().hex()}",
        flush=True,
    )


class _SigtermAtBatch:
    """Dataset wrapper that delivers a REAL ``SIGTERM`` to THIS process,
    once, right before yielding batch ``fire_batch`` of epoch ``fire_epoch``
    (epochs counted by ``batches()`` invocations) — the deterministic stand-in
    for a scheduler preempting ONE host of a pod mid-epoch."""

    def __init__(self, inner, fire: bool, fire_epoch: int, fire_batch: int):
        self._inner = inner
        self._fire = fire
        self._fire_epoch = fire_epoch
        self._fire_batch = fire_batch
        self._epoch = -1
        self._fired = False

    def __len__(self):
        return len(self._inner)

    def batches(self, *args, **kwargs):
        # the TRAIN loop passes shuffle=True once per epoch; the init
        # probe does not — only count real epochs
        is_epoch = bool(kwargs.get("shuffle"))
        if is_epoch:
            self._epoch += 1
        for i, batch in enumerate(self._inner.batches(*args, **kwargs)):
            if (
                is_epoch
                and self._fire
                and not self._fired
                and self._epoch == self._fire_epoch
                and i == self._fire_batch
            ):
                self._fired = True
                import signal

                os.kill(os.getpid(), signal.SIGTERM)
            yield batch


def preempt_phase(mesh, process_id: int, data_dir: str,
                  sync_every: int = 1, tag: str = "MULTIHOST-PREEMPT") -> None:
    """Coordinated multi-host preemption (round-4 verdict Next #2): SIGTERM
    reaches ONLY process 0, mid-epoch. The preemption-flag consensus
    (train/loop.py) must bring BOTH processes into the collective emergency
    save at the same check site — then a resume=True rerun continues
    bit-exactly. The pytest harness compares the resumed final params
    against an uninterrupted single-process control.

    ``sync_every=1`` pins the site-exact stop position; ``sync_every>1``
    exercises the THINNED consensus (the production default skips most
    sites), where the stop lands at the first eligible site after the
    signal — still identical across processes."""
    import optax

    from multimodalbrainsurvival_tpu.data.tables import FeatureTableDataset
    from multimodalbrainsurvival_tpu.parallel import batch_device_put
    from multimodalbrainsurvival_tpu.parallel.mesh import global_to_host
    from multimodalbrainsurvival_tpu.train.loop import (
        TrainingPreempted, TrainSettings, train_model,
    )

    ds = FeatureTableDataset(os.path.join(data_dir, "mh.csv"))
    save_dir = os.path.join(data_dir, f"mh_preempt_ckpt_k{sync_every}")

    def settings(resume):
        return TrainSettings(
            num_epochs=3, task="survival_prediction", batch_size=8,
            log_interval=100, seed=5, eval_splits_during_training=("val",),
            device_put_fn=batch_device_put(mesh), save_dir=save_dir,
            resume=resume,
            preempt_sync_every=sync_every,
        )

    # 16 rows / batch 8 = 2 steps per epoch; process 0 is SIGTERMed right
    # before batch 1 of epoch 1 — a mid-epoch signal on one host only
    adapter, _, _ = build_train_fixture()
    wrapped = _SigtermAtBatch(
        ds, fire=(process_id == 0), fire_epoch=1, fire_batch=1
    )
    try:
        train_model(adapter, {"train": wrapped, "val": ds}, optax.sgd(1e-2),
                    settings(False), rng=jax.random.PRNGKey(2))
        raise AssertionError("expected TrainingPreempted")
    except TrainingPreempted as e:
        print(
            f"{tag}-STOP pid={process_id} "
            f"epoch={e.epoch} batch={e.epoch_step}",
            flush=True,
        )

    adapter, _, _ = build_train_fixture()
    last, _, _ = train_model(adapter, {"train": ds, "val": ds},
                             optax.sgd(1e-2), settings(True),
                             rng=jax.random.PRNGKey(2))
    flat = np.concatenate(
        [global_to_host(leaf).ravel()
         for leaf in jax.tree.leaves(last["params"])]
    ).astype(np.float32)
    print(
        f"{tag} OK pid={process_id} "
        f"params={flat.tobytes().hex()}",
        flush=True,
    )


def main() -> None:
    process_id, num_processes, coord = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    )
    from multimodalbrainsurvival_tpu.parallel import make_mesh
    from multimodalbrainsurvival_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=coord,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.device_count() == num_processes  # 1 CPU device per process

    mesh = make_mesh(dp=num_processes, mp=1)
    sharding = NamedSharding(mesh, P("dp"))

    # each process contributes its own shard of a global dp-sharded array
    local = np.full((1,), float(process_id + 1), np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local)

    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    expected = num_processes * (num_processes + 1) / 2
    np.testing.assert_allclose(jax.device_get(total), expected)
    print(f"MULTIHOST OK pid={process_id} total={float(total)}", flush=True)

    train_step_phase(mesh, process_id)
    if len(sys.argv) > 4:
        train_loop_phase(mesh, process_id, sys.argv[4])
        checkpoint_phase(mesh, process_id, sys.argv[4])
        preempt_phase(mesh, process_id, sys.argv[4])
        preempt_phase(mesh, process_id, sys.argv[4], sync_every=3,
                      tag="MULTIHOST-PREEMPT-K3")


if __name__ == "__main__":
    main()
