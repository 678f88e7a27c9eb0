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


MIL_LADDER = ("fc", "resnet/layer4", "resnet/layer3", "resnet/layer2",
              "resnet/layer1", "resnet/conv1")


def mil_freeze_ladder(n_layers_to_train: int) -> PathMatch:
    """Trainable-path matcher for the reference freeze ladder
    (``2_HistoPath_train.py:544-551``): first ``n`` ladder entries + aggregator."""
    specs = list(MIL_LADDER[: max(0, n_layers_to_train)]) + ["aggregator"]
    return path_prefix_match(*specs)


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
