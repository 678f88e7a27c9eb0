"""Sharding rules for model/bag parallelism.

``joint_param_shardings`` — tensor-parallel partition rules for the param
tree: the RNA MLP's hidden axis is sharded over ``mp``
(``Dense(12778→4096)`` kernel ``P(None, 'mp')``, ``Dense(4096→2048)``
kernel ``P('mp', None)`` — a Megatron column/row pair whose activation
all-reduce XLA inserts automatically), everything else replicated.

Bag/sequence parallelism (SURVEY.md §2.2's CP analog) is served by the
GSPMD path alone: ``batch_device_put(shard_bag=True)`` places the bag axis
on ``mp`` and XLA partitions the aggregator's softmax/mean. An explicit
``shard_map`` kernel (``sharded_attention_bag_mean``) existed through
round 2 as a parallel implementation; benchmarked head-to-head at the
full-slide shape (B=4, bag=2048, D=512, 8 virtual devices) it lowered to
the SAME collective pattern (all-gather + all-reduce) but ran 2.1x slower
(85.7 vs 41.6 ms/call), so it was deleted per the wire-or-delete review —
one bag-sharding implementation, the faster one (docs/DESIGN.md item 17).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flax import traverse_util


_DENSE_RE = re.compile(r"^dense_(\d+)$")


def joint_param_shardings(params, mesh: Mesh):
    """NamedSharding tree: TP over the RNA encoder hidden axis, rest replicated.

    Works for both ``RNAOnlyModel`` ({encoder: {dense_0, dense_1}}) and
    ``BagHistopathologyRNAModel`` ({rna_encoder: {...}}) param trees, at ANY
    encoder depth (``RNAEncoder(hidden_dims=...)`` is configurable): the
    ``dense_{i}`` stack alternates Megatron column-parallel (even ``i``: out
    axis sharded) / row-parallel (odd ``i``: in axis sharded), so each pair
    needs exactly one activation all-reduce, which XLA inserts. An odd-depth
    stack ends column-parallel; GSPMD all-gathers the final activation into
    the replicated head.
    """
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        spec = P()
        strs = [str(p) for p in path]
        if ("encoder" in strs[0] or "rna" in strs[0]) and strs[-1] == "kernel":
            m = next(
                (mt for s in strs if (mt := _DENSE_RE.match(s)) is not None),
                None,
            )
            if m is not None:
                if int(m.group(1)) % 2 == 0:
                    spec = P(None, "mp")  # column-parallel: hidden out axis
                else:
                    spec = P("mp", None)  # row-parallel: hidden in axis
        out[path] = NamedSharding(mesh, spec)
    return traverse_util.unflatten_dict(out)


def replicated_shardings(tree, mesh: Mesh):
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
