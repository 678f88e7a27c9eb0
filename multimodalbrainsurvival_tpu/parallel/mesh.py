"""Device-mesh construction and batch placement.

The reference is strictly single-device (``model.to('cuda:0')``,
``2_HistoPath_train.py:457,530`` — no DDP/NCCL anywhere; SURVEY.md §2.2).
Parallelism here is first-class and TPU-native: a ``jax.sharding.Mesh`` with
two logical axes —

- ``dp``: data parallelism over samples/bags. Gradients are reduced by XLA
  (psum over ``dp``) and the batch-global Cox risk set is assembled by an
  XLA all-gather of the (score, time, event) triple inside the loss
  (``ops/cox.py``).
- ``mp``: model parallelism. Used as tensor parallelism for the RNA MLP's
  12778×4096×2048 matmuls (hidden axis sharded) and as the bag/sequence axis
  for bag-sharded MIL aggregation (``parallel/sharding.py``) — the
  workload's analog of sequence/context parallelism.

Multi-host: ``jax.distributed.initialize()`` before ``make_mesh`` makes the
same code span hosts over DCN; in-slice collectives ride ICI.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host entry: call once per host process before ``make_mesh``.

    Thin wrapper over ``jax.distributed.initialize`` so the same mesh/sharding
    code spans hosts (collectives ride ICI within a slice, DCN across). On a
    single-host container this is a no-op if coordination env vars are absent.
    """
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or kwargs:
        jax.distributed.initialize(**kwargs)


def initialize_from_env() -> None:
    """Join the distributed runtime for a CLI run (``mesh: {"distributed":
    true}``): explicit coordination env vars when present
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` — how a scheduler or the two-process CLI test wires
    workers up), otherwise bare ``jax.distributed.initialize()`` so TPU-pod
    auto-detection does the rest. Idempotent across repeat calls in one
    process."""
    import os

    if jax.distributed.is_initialized():
        return  # externally joined (a launcher, or an earlier call) — done
    kwargs = {}
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
        # partial env wiring is honest: initialize() auto-detects whatever
        # is omitted from the cluster environment where it can
        n = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        if n is not None:
            kwargs["num_processes"] = int(n)
        if pid is not None:
            kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)


def make_mesh(
    dp: int | None = None, mp: int = 1, *, devices=None
) -> Mesh:
    """Build a (dp, mp) mesh; dp defaults to n_devices // mp."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // mp
    if dp * mp > n:
        raise ValueError(f"mesh {dp}x{mp} needs {dp * mp} devices, have {n}")
    grid = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, ("dp", "mp"))


# batch keys whose leading axis is the sample axis
_BATCH_AXIS_KEYS = {
    "patch_bag", "bag_mask", "sample_mask", "mask", "data", "rna_data",
    "feature_data", "survival_months", "vital_status", "survival_bin", "label",
}


def host_to_global(value, sharding: NamedSharding):
    """Place host data onto a (possibly multi-process) sharding.

    Single-process: plain ``jax.device_put``. Multi-process (the mesh spans
    hosts after ``initialize_distributed``): ``jax.make_array_from_callback``
    — every process presents the same GLOBAL host value and the callback is
    invoked only for this process's addressable shards, so each host
    transfers exactly its slice of the batch over PCIe and the resulting
    global array is legal as a jit input spanning hosts. (A bare
    ``device_put`` cannot target non-addressable devices.)
    """
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    v = np.asarray(value)
    return jax.make_array_from_callback(v.shape, sharding, lambda idx: v[idx])


def global_to_host(x) -> np.ndarray:
    """Host numpy value of a jit output on ANY runtime.

    - fully addressable (single-process, or host-local): plain np.asarray;
    - replicated across processes: read this host's shard (every device
      holds the full value; np.asarray would refuse the remote shards);
    - sharded across processes: ``multihost_utils.process_allgather`` — a
      COLLECTIVE, so call it from every process at the same point (the
      train/eval loops are process-symmetric, which is exactly that).
    """
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    if x.sharding.is_fully_replicated:
        return np.asarray(x.addressable_shards[0].data)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def batch_device_put(mesh: Mesh, *, shard_bag: bool = False):
    """Returns a ``device_put_fn`` for ``TrainSettings``: shards every batch
    array on ``dp`` along axis 0 (and the bag axis on ``mp`` when
    ``shard_bag``), replicating anything unknown. Works unchanged when the
    mesh spans processes (multi-host DCN): see :func:`host_to_global`;
    proven end-to-end by the two-process production-train-step test
    (``tests/test_parallel.py::test_two_process_production_train_step``)."""

    def put(arrays: dict) -> dict:
        out = {}
        for k, v in arrays.items():
            if k in _BATCH_AXIS_KEYS:
                if shard_bag and k in ("patch_bag", "bag_mask") and v.ndim >= 2:
                    spec = P("dp", "mp")
                else:
                    spec = P("dp")
            else:
                spec = P()
            out[k] = host_to_global(v, NamedSharding(mesh, spec))
        return out

    # callers that must co-locate params with the sharded batches (serving
    # replication, elastic checkpoint restore in train/loop.py) read the mesh
    # back off the put function
    put.mesh = mesh
    put.shard_bag = shard_bag
    return put
