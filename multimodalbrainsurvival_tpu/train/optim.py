"""Optimizers: torch-semantics Adam, per-module LR groups, freeze ladders.

Reference semantics being matched:

- ``torch.optim.Adam(params, lr, weight_decay)`` adds ``wd * p`` to the
  gradient *before* the Adam moments (coupled L2, not AdamW) —
  ``torch_adam`` reproduces that ordering with optax primitives.
- Per-module parameter groups with separate LRs: ``{rna: lr_rna, mlp: lr_mlp}``
  (``1_GeneExpress_train.py:303-305``), ``{histo, rna, mlp}``
  (``1_JointFusion_train.py:413-416``).
- The layer-freezing ladder
  ``[fc, layer4, layer3, layer2, layer1, conv1][:n_layers_to_train] +
  [aggregator]`` (``2_HistoPath_train.py:544-551``): frozen params get no
  updates and no weight decay (requires_grad=False equivalent) — here
  ``optax.set_to_zero`` under ``optax.multi_transform``. NOTE the reference
  keeps frozen BatchNorm layers in train mode so their running statistics
  still update; that is a property of the train step (whole ``batch_stats``
  collection mutable), not of the optimizer.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util


def torch_adam(
    lr: float, weight_decay: float = 0.0, b1=0.9, b2=0.999, eps=1e-8
) -> optax.GradientTransformation:
    """Adam with torch's coupled L2 weight decay (grad += wd * param)."""
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    steps.append(optax.scale(-lr))
    return optax.chain(*steps)


PathMatch = Callable[[tuple[str, ...]], bool]


def path_prefix_match(*specs: str) -> PathMatch:
    """Matcher for '/'-joined path prefixes.

    A spec segment matches exactly, except the last segment which is a
    prefix match on that path segment — so ``"resnet/layer4"`` matches
    ``("resnet", "layer4_2", "conv1", "kernel")``.
    """
    parsed = [s.split("/") for s in specs]

    def match(path: tuple[str, ...]) -> bool:
        for seg in parsed:
            if len(path) < len(seg):
                continue
            head, last = seg[:-1], seg[-1]
            if tuple(path[: len(head)]) == tuple(head) and path[
                len(head)
            ].startswith(last):
                return True
        return False

    return match


def build_grouped_optimizer(
    params,
    groups: Sequence[tuple[str, PathMatch, optax.GradientTransformation]],
    *,
    default: optax.GradientTransformation | None = None,
) -> tuple[optax.GradientTransformation, dict]:
    """Label params by the first matching group; unmatched → frozen/default.

    Returns (optimizer, label_tree). ``groups`` order is priority order.
    """
    flat = traverse_util.flatten_dict(params)
    labels_flat = {}
    for path in flat:
        label = "_frozen"
        for name, match, _ in groups:
            if match(tuple(str(p) for p in path)):
                label = name
                break
        labels_flat[path] = label
    label_tree = traverse_util.unflatten_dict(labels_flat)
    transforms = {name: tx for name, _, tx in groups}
    transforms["_frozen"] = default if default is not None else optax.set_to_zero()
    return optax.multi_transform(transforms, label_tree), label_tree


def relative_lr_schedule(
    kind: str = "constant",
    *,
    total_steps: int,
    warmup_steps: int = 0,
    min_factor: float = 0.0,
    step_every: int = 0,
    step_gamma: float = 0.1,
) -> Callable:
    """Relative LR multiplier schedule: optimizer-step count → factor.

    TPU-native training extension (the reference trains at a constant Adam
    LR everywhere — e.g. ``2_HistoPath_train.py:552-559``): the factor ramps
    0→1 linearly over ``warmup_steps`` (factor at count c < w is (c+1)/w, so
    the first update is never exactly zero), then decays 1→``min_factor``
    over the remaining steps per ``kind``:

    - ``constant``: stays 1 (warmup-only)
    - ``cosine``:   min + (1-min) · ½(1+cos(π·progress))
    - ``linear``:   1 + (min-1) · progress
    - ``step``:     ``step_gamma ** floor(steps_past_warmup / step_every)``
      (torch ``StepLR`` shape), floored at ``min_factor``

    Returned callable is jnp-traceable, for ``optax.scale_by_schedule``; it is
    RELATIVE (base 1.0) so one schedule multiplies every parameter group's own
    base LR — the standard "all groups share the decay shape" semantics —
    without rebuilding the per-group transforms.
    """
    kinds = ("constant", "cosine", "linear", "step")
    if kind not in kinds:
        raise ValueError(f"lr_schedule={kind!r}: expected one of {kinds}")
    if kind == "step" and step_every <= 0:
        raise ValueError("lr_schedule='step' requires step_every > 0")
    if warmup_steps < 0 or total_steps <= 0:
        raise ValueError("need total_steps > 0 and warmup_steps >= 0")
    w, total = int(warmup_steps), int(total_steps)
    decay_span = max(total - w, 1)
    lo = float(min_factor)

    def schedule(count):
        c = jnp.asarray(count, jnp.float32)
        warm = (c + 1.0) / max(w, 1)
        progress = jnp.clip((c - w) / decay_span, 0.0, 1.0)
        if kind == "constant":
            decay = jnp.ones_like(progress)
        elif kind == "cosine":
            decay = lo + (1.0 - lo) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        elif kind == "linear":
            decay = 1.0 + (lo - 1.0) * progress
        else:  # step
            n = jnp.floor(jnp.maximum(c - w, 0.0) / step_every)
            decay = jnp.maximum(jnp.float32(step_gamma) ** n, lo)
        return jnp.where(c < w, warm, decay)

    return schedule


def wrap_optimizer(
    tx: optax.GradientTransformation,
    *,
    schedule: Callable | None = None,
    grad_clip_norm: float | None = None,
) -> optax.GradientTransformation:
    """Compose the whole-model training knobs around a (possibly grouped) tx.

    - ``grad_clip_norm``: global-norm clipping over the FULL gradient tree
      BEFORE any per-group transform — ``torch.nn.utils.clip_grad_norm_``
      semantics (one norm across all parameters; frozen leaves contribute
      zero because their gradients are stop_gradient'd in the loss).
    - ``schedule``: a relative factor (``relative_lr_schedule``) applied to
      the final update — every group's base LR times one decay shape.

    With neither knob the tx is returned untouched, so the optimizer state
    tree (and thus checkpoint layout) of plain runs is unchanged.
    """
    if schedule is None and grad_clip_norm is None:
        return tx
    steps: list[optax.GradientTransformation] = []
    if grad_clip_norm is not None:
        if grad_clip_norm <= 0:
            raise ValueError("grad_clip_norm must be > 0")
        steps.append(optax.clip_by_global_norm(float(grad_clip_norm)))
    steps.append(tx)
    if schedule is not None:
        steps.append(optax.scale_by_schedule(schedule))
    return optax.chain(*steps)


MIL_LADDER = ("fc", "resnet/layer4", "resnet/layer3", "resnet/layer2",
              "resnet/layer1", "resnet/conv1")


def mil_freeze_ladder(n_layers_to_train: int) -> PathMatch:
    """Trainable-path matcher for the reference freeze ladder
    (``2_HistoPath_train.py:544-551``): first ``n`` ladder entries + aggregator."""
    specs = list(MIL_LADDER[: max(0, n_layers_to_train)]) + ["aggregator"]
    return path_prefix_match(*specs)


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
