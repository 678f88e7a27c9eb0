"""Checkpointing: full train state via Orbax, saved asynchronously.

The reference persists model weights only (``torch.save(state_dict)`` best +
last, ``2_HistoPath_train.py:378-383``) — no optimizer state, no step counter,
no resume. Here the full train state (params, batch_stats, opt_state, step)
is checkpointed, which upgrades checkpoint/resume to first-class (SURVEY.md §5)
while keeping the reference's best/last naming convention
(``model_dict_best`` / ``model_last`` directories under
``<checkpoint_path>/models/<flag>/``).

Saves are **async**: ``save`` returns once the state is snapshotted off the
device (orbax ``AsyncCheckpointer``), and the disk write proceeds in a
background thread so the per-epoch save never blocks the epoch loop. The
write is awaited only where it must be: before a ``restore`` of a
possibly-in-flight path, and at ``wait()`` (called once at end of training).

Warm-start parity: ``restore_path`` / ``model_path`` configs accept either an
Orbax state directory or a torch ``.pt`` file (converted on the fly for
ResNet-bearing models via ``models/convert.py``).
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


class Checkpointer:
    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, path: str, state, *, block: bool = False) -> None:
        """Start an async save. Orbax itself serializes device arrays to host
        before returning; the disk commit runs in the background (a second
        ``save`` first waits on any in-flight commit)."""
        self._ckptr.save(_abs(path), args=ocp.args.StandardSave(state), force=True)
        if block:
            self._ckptr.wait_until_finished()

    def wait(self) -> None:
        """Block until every started save has committed to disk."""
        self._ckptr.wait_until_finished()

    def restore(self, path: str, template=None):
        self._ckptr.wait_until_finished()  # the path may still be in flight
        if template is not None:
            return self._ckptr.restore(
                _abs(path), args=ocp.args.StandardRestore(template)
            )
        return self._ckptr.restore(_abs(path))

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.isdir(_abs(path))


def as_abstract(tree):
    """Template tree of ShapeDtypeStructs for topology-safe restore."""
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(getattr(x, "shape", ()), x.dtype)
        if hasattr(x, "dtype")
        else x,
        tree,
    )
