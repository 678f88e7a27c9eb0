"""Generic config-driven train / eval loop — ONE implementation for all
pipelines (the reference carries five drifted copies; SURVEY.md §2.3).

Flow parity with the canonical driver (``2_HistoPath_train.py:282-437``):

- per epoch: dataset ``shuffle()`` (patch lists), jitted train steps over the
  epoch, ``bags/s`` throughput logging every ``log_interval`` steps, then a
  full evaluate on train and val;
- best checkpoint by val loss, only for ``epoch > 0`` (reference quirk at
  ``:378-381``, kept under parity);
- after training: save last, evaluate last+best on train/val/test, write
  ``{split}_output_{last,best}.csv`` frames (``:422-432``).

Tasks: ``survival_prediction`` (Cox), ``survival_bin`` (discrete NLL),
``classification`` (cross-entropy) — ``2_HistoPath_train.py:561-566``.

TPU-first: one compiled ``train_step``/``eval_step`` per shape signature;
host↔device traffic is uint8 patch bags in, scalar loss + (B, C) outputs out;
augmentation runs on device inside the step (``train/adapters.py``). The same
step functions run under a ``jax.sharding.Mesh`` when batches are placed with
a sharded layout (``parallel/``) — the Cox loss handles the cross-device risk
set (``ops/cox.py``).
"""

from __future__ import annotations

import os
import signal
import threading
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodalbrainsurvival_tpu.ops import cox_partial_likelihood_loss, nll_surv_loss
from multimodalbrainsurvival_tpu.ops import metrics as M
from multimodalbrainsurvival_tpu.train.checkpoint import Checkpointer


class TrainingPreempted(RuntimeError):
    """Raised after an emergency full-state checkpoint was committed in
    response to a preemption signal (SIGTERM) or the ``preempt_after_steps``
    test hook. The run resumes EXACTLY (same batches, same PRNG stream) with
    ``resume: true`` — the checkpoint records the mid-epoch position
    (``meta.epoch_step``). The reference has no failure-recovery story at all
    (SURVEY.md §5 "failure detection")."""

    def __init__(self, epoch: int, epoch_step: int, path: str):
        super().__init__(
            f"training preempted at epoch {epoch}, batch {epoch_step}; "
            f"full train state saved to {path} — rerun with resume: true"
        )
        self.epoch = epoch
        self.epoch_step = epoch_step
        self.path = path


@dataclass
class TrainSettings:
    num_epochs: int = 10
    task: str = "survival_prediction"
    num_classes: int = 1
    target_label: str = "vital_status"
    log_interval: int = 100
    save_dir: str | None = None
    output_dir: str | None = None
    reference_parity: bool = True
    seed: int = 1111
    batch_size: int = 128
    eval_splits_during_training: tuple = ("train", "val")
    device_put_fn: Callable | None = None  # parallel/: shard batches onto a mesh
    # first epoch eligible for the best-by-val-loss checkpoint. ONLY the
    # HistoPath reference driver skips epoch 0 (2_HistoPath_train.py:378
    # `and epoch > 0`); the RNA / EarlyFusion / JointFusion drivers save
    # best from epoch 0 (1_GeneExpress_train.py:196-199,
    # 2_EarlyFusion_train.py:195-199, 1_JointFusion_train.py:244-247), so
    # the histo CLI sets 1 and everything else keeps 0.
    best_from_epoch: int = 0
    extra_loader_kwargs: dict = field(default_factory=dict)
    # NaN guard: the reference drops into pdb on a NaN loss
    # (1_HistoPathology/models.py:107-109); here a hard error with context.
    check_numerics: bool = True
    # debug_checkify=True additionally instruments the forward+loss with
    # jax.experimental.checkify NaN/div checks, so the raised error names the
    # first offending primitive instead of just reporting a NaN loss
    # (SURVEY.md §5 "race detection / sanitizers" row). Slower; debug only.
    debug_checkify: bool = False
    # profile_steps > 0: capture a jax.profiler trace of that many train
    # steps (starting after warmup) into <profile_dir>.
    profile_steps: int = 0
    profile_dir: str = "/tmp/jax_trace"
    # resume=True restores the FULL train state (params + optimizer moments +
    # epoch/step/best-val bookkeeping) from <save_dir>/train_state and
    # continues — an upgrade over the reference, which only persists model
    # weights (2_HistoPath_train.py:378-383; SURVEY.md §5).
    resume: bool = False
    # Preemption / emergency checkpointing (SURVEY.md §5 "failure detection
    # / elastic recovery" — absent in the reference): while training with a
    # save_dir, SIGTERM triggers a blocking full-state save at the next step
    # boundary — including the mid-epoch batch position — then raises
    # TrainingPreempted. A rerun with resume=True skips the already-consumed
    # batches of the interrupted epoch and continues bitwise-exactly (the
    # PRNG stream is part of the state; tested in tests/test_preemption.py).
    emergency_checkpoint: bool = True
    # test/debug hook: behave as if SIGTERM arrived once the global step
    # counter reaches this value (0 = disabled)
    preempt_after_steps: int = 0
    # Multi-host preemption barrier: a SIGTERM usually reaches ONE host, but
    # the emergency save is a blocking collective — so between steps every
    # process all-gathers a 1-byte "preempt requested" flag and ALL enter
    # the save together at the same aligned check site (or none do).
    # preempt_sync_every = k runs the consensus at every k-th site (two
    # sites per batch). The consensus is not just a byte on the wire: the
    # process_allgather FETCHES a device value, which orders behind the
    # enqueued train step and so synchronizes host dispatch with device
    # compute — at k=1 that serializes the async-dispatch pipeline every
    # step. The default 8 (consensus every ~4 batches) keeps the pipeline
    # while bounding time-to-preemption at ~4 steps; schedulers' grace
    # periods (30-120 s) cover that easily. Set 1 for site-exact stops
    # (the deterministic tests do).
    preempt_sync_every: int = 8
    # Printed-trace parity knobs:
    # - pre_training_eval: EarlyFusion evaluates train+val once before the
    #   first epoch, logged as epoch -1 (2_EarlyFusion_train.py:311-312).
    # - running_loss_weight: GeneExpress/EarlyFusion weight the LOGGED running
    #   loss by the batch's event count `vital_status.sum()`
    #   (1_GeneExpress_train.py:166-171, 2_EarlyFusion_train.py:161-166);
    #   HistoPath/Joint weight by sample count (2_HistoPath_train.py:341-344).
    #   Logging-only — training dynamics are identical either way.
    pre_training_eval: bool = False
    running_loss_weight: str = "samples"  # "samples" | "events"
    # Gradient accumulation (TPU-native extension; the reference has none —
    # its effective batch IS its device batch, 2_HistoPath_train.py:308-364).
    # accumulate_steps=k splits each batch of size B into k microbatches of
    # B//k inside the jitted step (a lax.scan over the microbatch axis), runs
    # forward+backward per microbatch, accumulates gradients in f32, and
    # applies ONE optimizer update with the mean gradient. Peak activation
    # memory drops to one microbatch (composes with `remat`), so effective
    # batches (or full-slide bags) beyond one chip's HBM still train. Notes:
    #  - per-sample losses (NLLSurv / classification) are mean-of-microbatch
    #    -means; the Cox partial likelihood builds its risk set PER
    #    microbatch, exactly like torch-style gradient accumulation.
    #  - BatchNorm running statistics update once per microbatch,
    #    sequentially (again the torch-accumulation semantics).
    #  - microbatches interleave samples (i, i+k, i+2k, ...) so the
    #    device-batch axis stays sharded over dp without resharding.
    #  - requires batch_size % accumulate_steps == 0.
    accumulate_steps: int = 1
    # Early stopping (TPU-native extension; the reference always runs all
    # num_epochs): patience > 0 stops training once the val loss has not
    # improved by more than early_stop_min_delta for that many consecutive
    # epochs. Counting is independent of the best-checkpoint quirk
    # (best_from_epoch) — it tracks the raw minimum val loss seen — and the
    # post-training tail (last/best saves, final evals, CSV frames) runs
    # unchanged. Requires "val" in eval_splits_during_training and datasets;
    # counters restart on resume (the stop decision replays from the
    # resumed epoch's evals).
    early_stop_patience: int = 0
    early_stop_min_delta: float = 0.0
    # Buffer donation (TPU-native extension): the jitted step donates the
    # incoming params / batch_stats / opt_state buffers, so XLA aliases the
    # updated state onto them in place instead of double-buffering — peak
    # HBM drops by ~one full copy of (params + Adam moments), measured in
    # benchmarks/donate_audit.py. Batches and the PRNG key are NOT donated
    # (loaders may reuse device-cached batches across steps). train_model
    # protects caller-passed `variables` with a one-time jit-identity copy,
    # so the caller's arrays are never invalidated. checkify debug steps
    # never donate.
    donate_state: bool = True
    # Label tree from build_grouped_optimizer: leaves labeled "_frozen" are
    # stop_gradient'd inside the loss, so XLA dead-code-eliminates their
    # entire backward — the exact analog of the reference's
    # requires_grad=False freeze (2_HistoPath_train.py:544-551), where torch
    # never runs backward below the trained layers. Without this the step
    # computes the full-network backward and multiplies the frozen updates
    # by zero (measured 2.7x slower at the reference default
    # n_layers_to_train=2). Numerically identical either way.
    param_labels: Any = None


def make_loss_fn(settings: TrainSettings):
    task = settings.task
    if task == "survival_prediction":
        keys = ("survival_months", "vital_status")

        def loss_fn(out, arrays, mask):
            return cox_partial_likelihood_loss(
                out[:, 0],
                arrays["survival_months"],
                arrays["vital_status"],
                mask=mask,
                reference_parity=settings.reference_parity,
            )

    elif task == "survival_bin":
        keys = ("survival_bin", "vital_status")

        def loss_fn(out, arrays, mask):
            censoring = 1.0 - arrays["vital_status"].astype(jnp.float32)
            return nll_surv_loss(
                out, arrays["survival_bin"], censoring, mask=mask
            )

    elif task == "classification":
        keys = (settings.target_label,)

        def loss_fn(out, arrays, mask):
            labels = arrays[settings.target_label].astype(jnp.int32)
            ce = optax.softmax_cross_entropy_with_integer_labels(out, labels)
            m = mask.astype(jnp.float32)
            return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)

    else:
        raise ValueError(f"Unknown task: {task!r}")
    return loss_fn, keys


def _device_arrays(batch: dict, keys: tuple, device_put_fn=None) -> dict:
    if device_put_fn is not None:
        # hand the loader's host arrays straight to the placement function:
        # a jnp.asarray first would upload the FULL batch to the default
        # device only to re-place it (and under a multi-process mesh, pay a
        # blocking device→host sync of the whole batch before uploading the
        # local shard)
        return device_put_fn({k: batch[k] for k in keys})
    return {k: jnp.asarray(batch[k]) for k in keys}


def _drain_losses(pending, running_loss, seen, settings, epoch):
    """Fetch deferred device losses (ONE sync for the whole backlog — a
    per-entry float() was a separate device round-trip each, which cost
    several ms/step amortized on a remote-attached chip) and run the NaN
    guard (the reference drops into pdb — models.py:107-109)."""
    if not pending:
        return running_loss, seen
    first = pending[0][0]
    if getattr(first, "is_fully_addressable", True):
        values = np.asarray(jnp.stack([loss for loss, _, _ in pending]))
    else:
        # multi-host: step losses are process-spanning global arrays; eager
        # jnp.stack on them is illegal, but a JITTED stack is — so the whole
        # backlog still drains with ONE device sync, like the branch above
        from multimodalbrainsurvival_tpu.parallel.mesh import global_to_host

        values = global_to_host(
            jax.jit(jnp.stack)([loss for loss, _, _ in pending])
        )
    for value, (_, bsz, at_step) in zip(values, pending):
        value = float(value)
        if settings.check_numerics and not np.isfinite(value):
            raise FloatingPointError(
                f"non-finite loss {value} at epoch {epoch} step {at_step} "
                f"(task={settings.task}); check inputs/LR."
            )
        running_loss += value * bsz
        seen += bsz
    pending.clear()
    return running_loss, seen


def _collect_ids(batch: dict, mask: np.ndarray, id_keys: tuple) -> dict:
    return {k: [v for v, m in zip(batch[k], mask) if m] for k in id_keys if k in batch}


def evaluate(
    adapter,
    variables,
    dataset,
    settings: TrainSettings,
    *,
    split: str = "val",
    epoch: int = 0,
    writer=None,
    frame_level: str | None = None,
):
    """Full-split eval: mean batch loss + task metrics + the reference's
    per-id score frame (``2_HistoPath_train.py:54-148``). ``frame_level``
    ("wsi"/"case") overrides the per-task default grouping of the returned
    frame (see the comment at the frame-selection block)."""
    loss_fn, loss_keys = make_loss_fn(settings)
    all_keys = tuple(dict.fromkeys(adapter.array_keys + loss_keys))

    # cache the compiled step on the adapter — a fresh jit closure per
    # evaluate() call would recompile on every epoch × split
    cache_key = (
        settings.task,
        settings.num_classes,
        settings.reference_parity,
        settings.target_label,
    )
    cache = getattr(adapter, "_eval_step_cache", None)
    if cache is None:
        cache = {}
        adapter._eval_step_cache = cache
    if cache_key not in cache:

        @jax.jit
        def eval_step(variables, arrays):
            out, _ = adapter.apply(variables, arrays, train=False)
            loss = loss_fn(out, arrays, arrays[adapter.sample_mask_key])
            return out, loss

        cache[cache_key] = eval_step
    eval_step = cache[cache_key]

    # Device values (per-batch out/loss) are fetched ONCE after the loop:
    # a per-batch float(loss)/np.asarray(out) would block the next batch's
    # dispatch on a device round-trip, serializing eval at host-device
    # latency instead of pipelining it (the train loop defers its losses
    # for the same reason). Host-side metadata (masks via the loaders'
    # host_* mirrors, ids, label columns) is collected inline.
    outputs, losses, masks = [], [], []
    ids: dict[str, list] = {k: [] for k in adapter.id_keys}
    labels: dict[str, list] = {}
    for batch in dataset.batches(
        settings.batch_size, shuffle=False, **adapter.loader_kwargs,
        **settings.extra_loader_kwargs,
    ):
        arrays = _device_arrays(batch, all_keys, settings.device_put_fn)
        out, loss = eval_step(variables, arrays)
        losses.append(loss)
        mask = np.asarray(
            batch.get("host_sample_mask", batch[adapter.sample_mask_key])
        )
        masks.append(mask)
        outputs.append(out)
        for k, v in _collect_ids(batch, mask, adapter.id_keys).items():
            ids[k].extend(v)
        for k in (
            set(loss_keys)
            | {settings.target_label, "survival_months", "vital_status"}
        ):
            if k in batch:
                # prefer the loader's host_* numpy mirror (device-cached
                # datasets) over fetching the device-resident column
                col = batch.get("host_" + k, batch[k])
                labels.setdefault(k, []).extend(np.asarray(col)[mask].tolist())

    if not losses:
        # no batches at all (empty split) — nothing to score
        print(f"{split}  | epoch {epoch} | empty split, no evaluation")
        return float("nan"), None, {"loss": float("nan")}
    if getattr(losses[0], "is_fully_addressable", True):
        losses = np.asarray(jnp.stack(losses))
        outputs = np.asarray(jnp.concatenate(outputs, axis=0))
    else:
        # multi-host: per-batch losses are replicated global scalars and
        # outputs are dp-sharded across processes. Eager stack/concatenate
        # on non-addressable arrays is illegal, but JITTED ones are — so the
        # split still fetches with ONE local read (losses) plus ONE
        # process-symmetric allgather (outputs; every process runs this
        # same loop, which is what makes the collective legal)
        from multimodalbrainsurvival_tpu.parallel.mesh import global_to_host

        losses = global_to_host(jax.jit(jnp.stack)(losses))
        outputs = global_to_host(
            jax.jit(partial(jnp.concatenate, axis=0))(outputs)
        )
    if settings.check_numerics and not np.all(np.isfinite(losses)):
        # without this, a NaN batch loss would silently fold into val_loss
        # and corrupt best-checkpoint selection (np.nan < best is False, so
        # "best" would just freeze without any diagnostic)
        bad = int(np.flatnonzero(~np.isfinite(losses))[0])
        raise FloatingPointError(
            f"non-finite eval loss {float(losses[bad])} in split {split!r} "
            f"batch {bad} at epoch {epoch} (task={settings.task}); "
            f"best-checkpoint selection would be corrupted."
        )
    outputs = outputs[np.concatenate(masks)]
    # parity: unweighted mean over batch losses, exactly like the reference's
    # evaluate (2_HistoPath_train.py:148, `np.mean(loss_list)`) — the final
    # partial batch is overweighted there too (ours is padded+masked, which
    # yields the identical per-batch loss as torch's ragged final batch)
    val_loss = float(np.mean(losses))
    months = np.array(labels.get("survival_months", []))
    status = np.array(labels.get("vital_status", []))

    metrics: dict[str, float] = {"loss": val_loss}
    # The returned score frame's grouping level follows the reference, which
    # is INCONSISTENT across drivers and tasks: the histo TRAIN driver keeps
    # the WSI-level frame for classification/survival_prediction but the
    # CASE-level one for survival_bin (2_HistoPath_train.py:124/:132 vs
    # :140-141), while SAVESCORE always keeps the case level
    # (3_HistoPath_savescore.py:110-117) — callers that need the latter pass
    # ``frame_level="case"``. Table pipelines only have a case level either
    # way.
    frames: dict[str, Any] = {}
    if settings.task == "survival_prediction":
        for key in adapter.id_keys:
            if not ids.get(key):
                continue
            level = "wsi" if key == "WSI" else "case"
            ci, frames[level] = M.survival_ci(outputs, ids[key], months, status)
            metrics[f"{level}_CI"] = ci
            print(f"{split} {level}  | epoch {epoch} | CI {ci:.3f}")
    elif settings.task == "survival_bin":
        for key in adapter.id_keys:
            if not ids.get(key):
                continue
            level = "wsi" if key == "WSI" else "case"
            ci, frames[level] = M.nllsurv_ci(
                outputs, status, months, ids[key], settings.num_classes
            )
            metrics[f"{level}_CI"] = ci
            print(f"{split} {level}  | epoch {epoch} | CI {ci:.3f}")
    elif settings.task == "classification":
        y = np.array(labels[settings.target_label])
        for key in adapter.id_keys:
            if not ids.get(key):
                continue
            level = "wsi" if key == "WSI" else "case"
            acc, f1, auc, frames[level] = M.classification_scores(
                outputs, ids[key], y
            )
            metrics.update(
                {f"{level}_acc": acc, f"{level}_f1": f1, f"{level}_auc": auc}
            )
            print(
                f"{split} {level}  | epoch {epoch} | acc {acc:.3f} | f1 {f1:.3f} "
                f"| auc {auc:.3f}"
            )
    if writer is not None:
        for k, v in metrics.items():
            writer.scalar(f"{split}/{k}", v, epoch)
    default_level = {"survival_prediction": "wsi", "classification": "wsi"}
    want = frame_level or default_level.get(settings.task, "case")
    frame = frames.get(want, next(iter(frames.values()), None))
    return val_loss, frame, metrics


def build_train_step(settings: TrainSettings, tx, forward_loss):
    """Build the jitted training step ``train_model`` drives.

    ``forward_loss(params, batch_stats, arrays, step_rng) -> (loss,
    new_batch_stats)`` is the model+loss closure; the returned
    ``run_step(params, batch_stats, opt_state, arrays, rng)`` yields
    ``(params, batch_stats, opt_state, loss, rng)`` with the PRNG split
    traced INSIDE the step (zero host→device transfers per step — see the
    comment on the plain branch). Exposed at module level so the perf
    harnesses (``benchmarks/accum_audit.py``, ``donate_audit.py``) audit the
    EXACT production step, not a reimplementation.

    ``settings.donate_state`` donates the state arguments (params /
    batch_stats / opt_state) into the step: callers must thread the returned
    state forward and never touch the arrays passed in again (``train_model``
    rebinds every step, so this holds by construction; see
    TrainSettings.donate_state).
    """
    donate = (0, 1, 2) if settings.donate_state else ()
    if settings.debug_checkify:
        from jax.experimental import checkify

        checked = checkify.checkify(
            forward_loss, errors=checkify.float_checks
        )

        @jax.jit
        def train_step(params, batch_stats, opt_state, arrays, step_rng):
            err, (loss, new_stats) = checked(
                params, batch_stats, arrays, step_rng
            )
            return params, new_stats, opt_state, loss, err

        def run_step(params, batch_stats, opt_state, arrays, rng):
            # debug mode: forward-only with op-level NaN localization
            rng, step_rng = jax.random.split(rng)
            _, new_stats, _, loss, err = train_step(
                params, batch_stats, opt_state, arrays, step_rng
            )
            err.throw()
            return params, new_stats, opt_state, loss, rng

        return run_step

    if settings.accumulate_steps > 1:
        # Gradient accumulation (see TrainSettings.accumulate_steps): split
        # the batch into k interleaved microbatches, scan forward+backward
        # over them holding only one microbatch's activations live, then one
        # optimizer update with the f32-mean gradient.
        k = int(settings.accumulate_steps)
        if settings.batch_size % k != 0:
            raise ValueError(
                f"accumulate_steps={k} must divide batch_size="
                f"{settings.batch_size}"
            )

        def _microbatches(arrays):
            def split(x):
                mb = x.shape[0] // k
                # (B, ...) -> (mb, k, ...) -> (k, mb, ...): microbatch i is
                # samples (i, i+k, i+2k, ...). The row-major split keeps each
                # device's contiguous dp shard of the batch axis intact, so
                # under a dp mesh the moveaxis is a local transpose, not a
                # resharding collective.
                x = x.reshape((mb, k) + x.shape[1:])
                return jnp.moveaxis(x, 1, 0)

            return jax.tree.map(split, arrays)

        @partial(jax.jit, donate_argnums=donate)
        def accum_step(params, batch_stats, opt_state, arrays, rng):
            rng, step_rng = jax.random.split(rng)
            micro = _microbatches(arrays)
            mb_rngs = jax.random.split(step_rng, k)

            def body(carry, xs):
                stats, gacc, lacc = carry
                mb_arrays, mb_rng = xs
                (loss, new_stats), grads = jax.value_and_grad(
                    forward_loss, has_aux=True
                )(params, stats, mb_arrays, mb_rng)
                gacc = jax.tree.map(
                    lambda a, g: a + g.astype(a.dtype), gacc, grads
                )
                return (new_stats, gacc, lacc + loss), None

            gzero = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params
            )
            (new_stats, gsum, lsum), _ = jax.lax.scan(
                body, (batch_stats, gzero, jnp.float32(0.0)),
                (micro, mb_rngs),
            )
            grads = jax.tree.map(
                lambda g, p: (g / k).astype(p.dtype), gsum, params
            )
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_stats, new_opt_state, lsum / k, rng

        return accum_step

    # The PRNG split happens INSIDE the jitted step (same key stream —
    # jax.random.split is deterministic wherever it's traced): every
    # per-step input is then the device-resident output of the previous
    # dispatch, so driving the loop costs one async enqueue per step with
    # zero host→device transfers. Measured on the tunneled v5e: a
    # separate host-side split dispatch per step cost ~17% wall
    # (benchmarks/train_bench.py --method comparison).
    @partial(jax.jit, donate_argnums=donate)
    def train_step(params, batch_stats, opt_state, arrays, rng):
        rng, step_rng = jax.random.split(rng)
        (loss, new_stats), grads = jax.value_and_grad(
            forward_loss, has_aux=True
        )(params, batch_stats, arrays, step_rng)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt_state, loss, rng

    return train_step


def train_model(
    adapter,
    datasets: dict[str, Any],
    tx: optax.GradientTransformation,
    settings: TrainSettings,
    *,
    variables=None,
    writer=None,
    rng=None,
):
    """Returns (variables_last, variables_best, outputs dict of frames)."""
    loss_fn, loss_keys = make_loss_fn(settings)
    all_keys = tuple(dict.fromkeys(adapter.array_keys + loss_keys))
    if rng is None:
        rng = jax.random.PRNGKey(settings.seed)

    # init from a probe batch
    if variables is None:
        probe = next(
            datasets["train"].batches(
                settings.batch_size, **adapter.loader_kwargs,
                **settings.extra_loader_kwargs,
            )
        )
        rng, init_rng = jax.random.split(rng)
        variables = adapter.init(
            init_rng, _device_arrays(probe, all_keys, settings.device_put_fn)
        )
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    if settings.donate_state and not settings.debug_checkify:
        # The step donates its state buffers (TrainSettings.donate_state).
        # The caller keeps ownership of `variables` — a jit identity is a
        # true device-side deep copy (non-donated jit outputs never alias
        # inputs, and it preserves shardings), so the first step donates
        # OUR copy, never the caller's arrays. One-time cost, ~params size.
        _copy = jax.jit(lambda t: t)
        params = _copy(params)
        if batch_stats is not None:
            batch_stats = _copy(batch_stats)
    opt_state = tx.init(params)

    if settings.param_labels is not None:
        def _tie_off_frozen(params):
            return jax.tree.map(
                lambda p, lab: jax.lax.stop_gradient(p)
                if lab == "_frozen" else p,
                params, settings.param_labels,
            )
    else:
        def _tie_off_frozen(params):
            return params

    def _forward_loss(params, batch_stats, arrays, step_rng):
        v = {"params": _tie_off_frozen(params)}
        if batch_stats is not None:
            v["batch_stats"] = batch_stats
        out, new_stats = adapter.apply(v, arrays, train=True, rng=step_rng)
        loss = loss_fn(out, arrays, arrays[adapter.sample_mask_key])
        return loss, new_stats

    run_step = build_train_step(settings, tx, _forward_loss)

    ckpt = Checkpointer() if settings.save_dir else None
    if settings.save_dir:
        os.makedirs(settings.save_dir, exist_ok=True)

    best_val_loss = np.inf
    best_epoch = -1
    step = 0
    start_epoch = 0
    # (state_epoch, epoch_step) always describe COMPLETED work, so a state
    # snapshot is consistent at any Python-level point: (-1, 0) = nothing
    # done; (E, 0) = epoch E fully done (resume at E+1); (E, k>0) = k batches
    # of epoch E done (resume re-enters E, skipping k batches)
    state_epoch = -1
    epoch_step = 0
    skip_batches = 0  # batches of the resumed epoch already consumed pre-preemption
    skip_shuffle_once = False  # the interrupted run already shuffled that epoch
    running_loss, seen = 0.0, 0.0
    # logged-loss accumulators of a mid-epoch-resumed epoch (consumed once)
    resume_running_loss = resume_seen = 0.0
    # jax.profiler trace capture (profile_steps > 0): starts after a short
    # compile/warmup window (or immediately on a resumed run, which is
    # already warm), stops after profile_steps steps — or at the end of
    # training if the run is shorter, so a started trace always commits
    trace_active = trace_done = False
    profile_warmup = 5
    trace_stop_at = 0
    pending_losses: list = []

    def _full_state():
        # meta scalars are NUMPY, not jnp: orbax refuses host-local
        # single-device jax.Arrays in a multi-process (jax.distributed)
        # runtime, while host numpy values serialize in both modes (written
        # by the primary host) — and the on-disk tensorstore layout is
        # identical, so old checkpoints restore unchanged
        return {
            "params": params,
            "batch_stats": batch_stats if batch_stats is not None else {},
            "opt_state": opt_state,
            "meta": {
                "epoch": np.asarray(state_epoch, np.int32),
                "step": np.asarray(step, np.int32),
                "epoch_step": np.asarray(epoch_step, np.int32),
                "best_val_loss": np.asarray(
                    best_val_loss if np.isfinite(best_val_loss) else 1e30,
                    np.float32,
                ),
                "best_epoch": np.asarray(best_epoch, np.int32),
                # the PRNG stream is part of the train state: a resumed run
                # must consume the SAME dropout/augmentation keys an
                # uninterrupted run would (resume-exactness is tested)
                "rng": jax.random.key_data(rng)
                if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
                else rng,
                # the epoch's running logged-loss accumulators, so a mid-epoch
                # resume's "EPOCH Loss" line covers the WHOLE epoch (not just
                # post-resume batches) and matches an uninterrupted run
                "running_loss": np.asarray(running_loss, np.float32),
                "seen": np.asarray(seen, np.float32),
            },
        }

    state_path = (
        os.path.join(settings.save_dir, "train_state")
        if settings.save_dir
        else None
    )
    # Emergency (preemption) snapshots go to a SIBLING path: orbax's
    # force=True save deletes the destination before the fresh write commits
    # (tmp dir + rename), so saving the emergency state over `train_state` in
    # place would open a window where a SIGKILL (grace period expiry — the
    # exact scenario the feature targets) loses the ONLY recovery checkpoint.
    # Writing to `.preempt` never touches the boundary checkpoint; a resume
    # picks whichever committed state is newest.
    preempt_path = state_path + ".preempt" if state_path else None

    def _newest_state_path():
        cands = [
            p
            for p in (state_path, preempt_path)
            if p and Checkpointer.exists(p)
        ]
        return max(cands, key=os.path.getmtime) if cands else None

    restore_from = _newest_state_path() if settings.resume else None
    if restore_from:
        # checkpoints written before the PRNG stream / the mid-epoch position
        # / the running-loss accumulators joined the state lack the newer
        # meta keys; try the richest template first, then every combination
        # of absent optional-key groups (any subset can be missing — states
        # are also produced by tooling that strips individual keys)
        import itertools

        _optional_meta = (("rng",), ("epoch_step",), ("running_loss", "seen"))
        template = _full_state()
        restored = None
        for drop in (
            tuple(k for grp in combo for k in grp)
            for r in range(len(_optional_meta) + 1)
            for combo in itertools.combinations(_optional_meta, r)
        ):
            t = dict(template)
            t["meta"] = {
                k: v for k, v in template["meta"].items() if k not in drop
            }
            try:
                restored = ckpt.restore(restore_from, t)
                break
            except Exception:
                continue
        if restored is None:  # none matched — surface the real error
            restored = ckpt.restore(restore_from, template)
        params = restored["params"]
        if batch_stats is not None:
            batch_stats = restored["batch_stats"]
        opt_state = restored["opt_state"]
        # Elastic recovery: the checkpoint is topology-free, but orbax
        # restores arrays COMMITTED to the template's devices (device 0).
        # When this run trains over a mesh (settings.device_put_fn carries
        # it), committed single-device params would clash with the
        # dp-sharded batches inside jit — re-place the restored state
        # replicated over THIS run's mesh, whatever shape the mesh that
        # wrote the checkpoint had (tested: grow/shrink/appear in
        # tests/test_preemption.py::test_resume_is_elastic_across_mesh_shapes).
        mesh = getattr(settings.device_put_fn, "mesh", None)
        if mesh is not None:
            from multimodalbrainsurvival_tpu.parallel.mesh import (
                host_to_global,  # multi-host: no cross-host device_put; each
            )  # process re-places its shards from its (identical) restore
            from multimodalbrainsurvival_tpu.parallel.sharding import (
                replicated_shardings,
            )

            params, opt_state = jax.tree.map(
                host_to_global, (params, opt_state),
                replicated_shardings((params, opt_state), mesh),
            )
            if batch_stats is not None:
                batch_stats = jax.tree.map(
                    host_to_global, batch_stats,
                    replicated_shardings(batch_stats, mesh),
                )
        step = int(restored["meta"]["step"])
        best_val_loss = float(restored["meta"]["best_val_loss"])
        if best_val_loss >= 1e30:  # the _full_state sentinel for "no best yet"
            best_val_loss = float(np.inf)
        best_epoch = int(restored["meta"]["best_epoch"])
        restored_rng = restored["meta"].get("rng")
        if restored_rng is not None:
            rng = jnp.asarray(restored_rng)
            if mesh is not None:  # committed to device 0 by the restore, like
                from multimodalbrainsurvival_tpu.parallel.mesh import (
                    host_to_global,  # params above — re-place on the mesh
                )
                from multimodalbrainsurvival_tpu.parallel.sharding import (
                    replicated_shardings,
                )

                rng = host_to_global(rng, replicated_shardings(rng, mesh))
        resumed_epoch_step = int(restored["meta"].get("epoch_step", 0))
        if resumed_epoch_step > 0:
            # mid-epoch (preemption) checkpoint: re-enter the SAME epoch and
            # skip the batches the interrupted run already consumed; its
            # in-loop shuffle for that epoch already happened
            start_epoch = int(restored["meta"]["epoch"])
            state_epoch = start_epoch
            epoch_step = resumed_epoch_step
            skip_batches = resumed_epoch_step
            skip_shuffle_once = True
            shuffles_done = start_epoch + 1
            # carry the interrupted epoch's logged-loss accumulators so the
            # resumed epoch's "EPOCH Loss" covers all its batches
            resume_running_loss = float(restored["meta"].get("running_loss", 0.0))
            resume_seen = float(restored["meta"].get("seen", 0.0))
        else:
            start_epoch = int(restored["meta"]["epoch"]) + 1
            state_epoch = start_epoch - 1
            shuffles_done = start_epoch
            resume_running_loss = resume_seen = 0.0
        print(
            f"Resumed full train state from {restore_from}: epoch {start_epoch}"
            + (f" (batch {skip_batches})" if skip_batches else "")
            + f", step {step}, best_val_loss {best_val_loss:.4f}"
        )
        # resume-exactness for patch pipelines: the dataset's in-slide
        # permutation stream (reference models.py:269-272) advances once per
        # epoch; fast-forward the freshly constructed dataset to where the
        # uninterrupted run's stream would be
        if hasattr(datasets["train"], "shuffle"):
            for _ in range(shuffles_done):
                datasets["train"].shuffle()

    # parity: EarlyFusion runs a full train+val eval before the first epoch,
    # logged as epoch -1 (2_EarlyFusion_train.py:311-312) — logging only
    if settings.pre_training_eval and start_epoch == 0:
        for split in settings.eval_splits_during_training:
            if split in datasets:
                sl, _, _ = evaluate(
                    adapter, {"params": params, **(
                        {"batch_stats": batch_stats}
                        if batch_stats is not None else {}
                    )}, datasets[split], settings,
                    split=split, epoch=-1, writer=writer,
                )
                print(f"{split.upper()} Loss: {sl:.4f}")

    # Preemption watch (SURVEY.md §5 "failure detection"): SIGTERM requests an
    # emergency full-state checkpoint at the next step boundary. The handler
    # only sets a flag — the save itself runs in the loop, between steps, so
    # the state on disk is always a consistent post-optimizer-step snapshot.
    preempt_flag = threading.Event()
    prev_handler = None
    handler_installed = False
    # Coordinated multi-host preemption (round-4 verdict Next #2): the
    # emergency save is a blocking COLLECTIVE over jax.distributed, and a
    # SIGTERM usually reaches ONE host — entering the save alone would
    # deadlock against the peers' train-step collectives. Every process
    # therefore all-gathers its local "preempt requested" flag at the
    # ALIGNED between-step check sites (identical call sequence on every
    # host — same datasets, same steps) and they all enter the collective
    # save at the same site, or none do. The consensus itself is a 1-byte
    # process_allgather, safe at any aligned site by construction.
    preempt_consensus = (
        ckpt is not None
        and settings.emergency_checkpoint
        and jax.process_count() > 1
    )
    consensus_sites = 0
    if ckpt is not None and settings.emergency_checkpoint:
        def _on_preempt_signal(signum, frame):
            preempt_flag.set()
            print(
                "preemption signal received: checkpointing at the next step "
                "boundary...",
                flush=True,
            )
        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_preempt_signal)
            handler_installed = True
        except ValueError:
            pass  # not the main thread: signal-driven preemption unavailable
        if preempt_consensus:
            # NOTE: consensus participation must NOT depend on the local
            # handler install (main-thread-ness can differ across hosts —
            # a host that skipped the collective while its peers joined
            # would deadlock the runtime); a handler-less process still
            # all-gathers, contributing want=False
            print(
                "multi-host run: coordinated preemption enabled (flag "
                f"consensus every {settings.preempt_sync_every} check "
                "sites"
                + ("" if handler_installed
                   else "; local SIGTERM handler unavailable off the main "
                        "thread — this process joins peers' requests only")
                + ")"
            )

    def _maybe_preempt():
        """Between steps: if a preemption was requested (by consensus on a
        multi-host runtime), commit a blocking emergency checkpoint
        (mid-epoch position included) and abort."""
        nonlocal running_loss, seen, consensus_sites
        if ckpt is None:
            return
        want = preempt_flag.is_set() or bool(
            settings.preempt_after_steps
            and step >= settings.preempt_after_steps
        )
        if preempt_consensus:
            # the collective consensus must run on EVERY process whether or
            # not it locally wants to stop — a host that skipped it while a
            # peer joined would desynchronize the runtime
            consensus_sites += 1
            if consensus_sites % max(settings.preempt_sync_every, 1):
                return
            from jax.experimental import multihost_utils

            agreed = bool(
                np.asarray(
                    multihost_utils.process_allgather(
                        np.asarray([want], dtype=np.int32)
                    )
                ).any()
            )
            if not agreed:
                return
            if not want:
                print(
                    "peer host requested preemption: joining the collective "
                    "emergency checkpoint",
                    flush=True,
                )
        elif not want:
            return
        running_loss, seen = _drain_losses(
            pending_losses, running_loss, seen, settings, state_epoch
        )
        # sibling path, never in-place over `train_state`: see preempt_path
        ckpt.save(preempt_path, _full_state(), block=True)
        print(
            f"PREEMPTED: saved full train state (epoch {state_epoch}, batch "
            f"{epoch_step}, global step {step}) to {preempt_path}; rerun with "
            f"resume: true to continue exactly",
            flush=True,
        )
        raise TrainingPreempted(state_epoch, epoch_step, preempt_path)

    # early stopping (TrainSettings.early_stop_patience): raw min val loss
    # seen this run, independent of the best-checkpoint bookkeeping above
    es_best = np.inf
    es_stale = 0

    if settings.profile_steps:
        # the 5-step compile/warmup window shrinks when the whole run is
        # shorter than warmup + profile_steps, so tiny (test/--quick) runs
        # still capture a trace; step is GLOBAL, so a resumed run (step
        # already past warmup) starts tracing immediately — it is warm
        try:
            per_epoch = -(-len(datasets["train"]) // settings.batch_size)
            total = step + per_epoch * (settings.num_epochs - start_epoch)
            profile_warmup = max(step, min(5, total - settings.profile_steps))
        except TypeError:
            pass  # unsized dataset: keep the default warmup

    try:
        for epoch in range(start_epoch, settings.num_epochs):
            # a SIGTERM that landed during the previous epoch's eval (or
            # before the loop) checkpoints here, before any new work
            _maybe_preempt()
            print(f"Epoch {epoch}/{settings.num_epochs - 1}")
            print("-" * 10)
            if hasattr(datasets["train"], "shuffle"):
                if skip_shuffle_once:
                    skip_shuffle_once = False
                else:
                    datasets["train"].shuffle()

            this_epoch_skip, skip_batches = skip_batches, 0
            epoch_step = this_epoch_skip
            # a mid-epoch resume re-enters with the interrupted epoch's
            # accumulators so its EPOCH Loss line matches an uninterrupted run
            running_loss, seen = resume_running_loss, resume_seen
            resume_running_loss = resume_seen = 0.0
            last_running_loss, last_seen = running_loss, seen
            pending_losses: list = []
            t_last = time.time()
            steps_since_log = 0
            for batch in datasets["train"].batches(
                settings.batch_size,
                shuffle=True,
                seed=settings.seed + epoch,
                skip_batches=this_epoch_skip,
                **adapter.loader_kwargs,
                **settings.extra_loader_kwargs,
            ):
                # NOTE: rng is split inside run_step at step EXECUTION, so an
                # emergency snapshot's PRNG stream always matches the
                # executed-steps count (exactness tested).
                _maybe_preempt()
                arrays = _device_arrays(batch, all_keys, settings.device_put_fn)
                # logged-loss weight (host-side; defer device syncs — see
                # below). Loaders that assemble batches on device supply
                # ``host_*`` numpy mirrors so this never fetches a device
                # value (data/device_cache.py).
                mask_np = np.asarray(
                    batch.get("host_sample_mask",
                              batch[adapter.sample_mask_key])
                )
                vital_np = batch.get("host_vital_status",
                                     batch.get("vital_status"))
                if (
                    settings.running_loss_weight == "events"
                    and vital_np is not None
                ):
                    # parity: GeneExpress/EarlyFusion weight the logged loss by
                    # the event count (1_GeneExpress_train.py:166-171). The
                    # survival drivers always carry vital_status; other tasks
                    # fall through to sample weighting.
                    w = float(
                        (np.asarray(vital_np, np.float64) * mask_np).sum()
                    )
                else:
                    w = float(mask_np.sum())

                if (
                    settings.profile_steps
                    and not trace_done
                    and not trace_active
                    and step >= profile_warmup
                ):
                    jax.profiler.start_trace(settings.profile_dir)
                    trace_active = True
                    trace_stop_at = step + settings.profile_steps
                params, new_stats, opt_state, loss, rng = run_step(
                    params, batch_stats, opt_state, arrays, rng
                )
                if trace_active and step + 1 >= trace_stop_at:
                    jax.block_until_ready(loss)
                    jax.profiler.stop_trace()
                    trace_active, trace_done = False, True
                    print(f"wrote profiler trace to {settings.profile_dir}")
                step += 1
                epoch_step += 1
                state_epoch = epoch
                # defer host syncs: fetching float(loss) every step would
                # block dispatch of the next step; losses drain at
                # log_interval / epoch end, keeping dispatch async
                pending_losses.append((loss, w, step))
                if batch_stats is not None:
                    batch_stats = new_stats
                steps_since_log += 1
                if step % settings.log_interval == 0:
                    running_loss, seen = _drain_losses(
                        pending_losses, running_loss, seen, settings, epoch
                    )
                    # parity: the printed loss is a WINDOWED average over the
                    # batches since the last log line, not cumulative
                    # (2_HistoPath_train.py:346-358 resets inputs_seen per log)
                    window = running_loss - last_running_loss
                    window_seen = seen - last_seen
                    last_running_loss, last_seen = running_loss, seen
                    loss_to_log = window / max(window_seen, 1e-9)
                    speed = steps_since_log * settings.batch_size / (
                        time.time() - t_last
                    )
                    t_last = time.time()
                    steps_since_log = 0
                    print(
                        f"train | epoch {epoch} | step {step} | "
                        f"loss {loss_to_log:10.3f} |{speed:10.3f} bags/s"
                    )
                    if writer is not None:
                        writer.scalar("train/loss", loss_to_log, step)
                        writer.scalar("train/bags_per_s", speed, step)
                _maybe_preempt()

            running_loss, seen = _drain_losses(
                pending_losses, running_loss, seen, settings, epoch
            )
            print(f"EPOCH Loss: {running_loss / max(seen, 1e-9):.4f}")
            variables = {"params": params}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats

            for split in settings.eval_splits_during_training:
                if split not in datasets:
                    continue
                sl, _, _ = evaluate(
                    adapter, variables, datasets[split], settings,
                    split=split, epoch=epoch, writer=writer,
                )
                print(f"{split.upper()} Loss: {sl:.4f}")
                if split == "val":
                    if sl < es_best - settings.early_stop_min_delta:
                        es_best, es_stale = sl, 0
                    else:
                        es_stale += 1
                    # parity quirk: the histo driver only tracks best for
                    # epoch > 0 (2_HistoPath_train.py:378-381, via
                    # best_from_epoch=1); the other reference drivers save
                    # from epoch 0
                    if sl < best_val_loss and (
                        epoch >= settings.best_from_epoch
                        or not settings.reference_parity
                    ):
                        best_epoch = epoch
                        best_val_loss = sl
                        if ckpt is not None:
                            ckpt.save(
                                os.path.join(settings.save_dir, "model_dict_best"),
                                variables,
                            )
                # a SIGTERM during a long eval checkpoints here: the state is
                # still (epoch, full batch count), so the resume replays the
                # epoch-end evals + best-model bookkeeping deterministically
                _maybe_preempt()
            # epoch complete: the boundary save resumes at epoch+1
            state_epoch, epoch_step = epoch, 0
            if ckpt is not None:
                ckpt.save(state_path, _full_state())
            if (
                settings.early_stop_patience > 0
                and es_stale >= settings.early_stop_patience
            ):
                print(
                    f"Early stopping at epoch {epoch}: val loss has not "
                    f"improved by > {settings.early_stop_min_delta:g} for "
                    f"{es_stale} epochs (best {es_best:.4f})"
                )
                break
    finally:
        if trace_active:
            jax.profiler.stop_trace()
            trace_active, trace_done = False, True
            print(f"wrote profiler trace to {settings.profile_dir}")
        if handler_installed:
            # signal.signal() returns None for handlers installed by
            # non-Python code; restoring None raises, so fall back to SIG_DFL
            signal.signal(
                signal.SIGTERM,
                prev_handler if prev_handler is not None else signal.SIG_DFL,
            )

    epoch = settings.num_epochs - 1
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    if ckpt is not None:
        ckpt.save(os.path.join(settings.save_dir, "model_last"), variables)
        # saves are async (train/checkpoint.py); settle them before the final
        # evals so `model_dict_best` is definitely on disk for the restore
        ckpt.wait()
        # training completed: a leftover emergency snapshot is now stale
        # (the just-committed boundary state is newer) — drop it so nothing
        # ever resumes into the middle of a finished run
        if preempt_path and Checkpointer.exists(preempt_path):
            import shutil

            shutil.rmtree(preempt_path, ignore_errors=True)

    # final evals: last + best on train/val/test with CSV artifacts
    outputs: dict[str, Any] = {}
    candidates = [("last", variables)]
    best_path = (
        os.path.join(settings.save_dir, "model_dict_best")
        if settings.save_dir
        else None
    )
    if best_path and Checkpointer.exists(best_path):
        print(f"LOADING BEST MODEL, best epoch = {best_epoch}")
        best_vars = ckpt.restore(best_path, variables)
        candidates.append(("best", best_vars))
    else:
        best_vars = variables
        candidates.append(("best", variables))

    for tag, v in candidates:
        for split in ("train", "val", "test"):
            if split not in datasets:
                continue
            _, frame, mets = evaluate(
                adapter, v, datasets[split], settings,
                split=split, epoch=best_epoch if tag == "best" else
                settings.num_epochs - 1, writer=writer,
            )
            outputs[f"{split}_output_{tag}"] = frame
            outputs[f"{split}_metrics_{tag}"] = mets

    # multi-host: every process computes identical frames (evaluate gathers
    # globally) — only the primary writes them, avoiding shared-FS races
    if settings.output_dir and jax.process_index() == 0:
        os.makedirs(settings.output_dir, exist_ok=True)
        for name, frame in outputs.items():
            if name.endswith(("_last", "_best")) and frame is not None and not isinstance(frame, dict):
                frame.to_csv(
                    os.path.join(settings.output_dir, f"{name}.csv"), index=False
                )
        print(f"Wrote model output files to {settings.output_dir}")

    return variables, best_vars, outputs
