"""Sharding rules + explicit-collective kernels for model/bag parallelism.

Two pieces:

1. ``joint_param_shardings`` — tensor-parallel partition rules for the param
   tree: the RNA MLP's hidden axis is sharded over ``mp``
   (``Dense(12778→4096)`` kernel ``P(None, 'mp')``, ``Dense(4096→2048)``
   kernel ``P('mp', None)`` — a Megatron column/row pair whose activation
   all-reduce XLA inserts automatically), everything else replicated.

2. ``sharded_attention_bag_mean`` — the bag/sequence-parallel MIL
   aggregation (SURVEY.md §2.2: the workload's CP/ring-attention analog).
   One WSI's patches span devices along ``mp``; the gated tanh-attention
   softmax and the weighted mean are computed with explicit
   ``lax.psum``/``lax.pmax`` over the bag shards inside ``shard_map``, so a
   bag of thousands of patches never needs to be resident on one chip.
   Numerically identical to the single-device ``TanhAttention →
   masked_bag_mean`` composition (tested on the 8-device CPU mesh).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

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


def sharded_attention_bag_mean(
    x: jax.Array,
    mask: jax.Array,
    W: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "mp",
) -> jax.Array:
    """Bag-sharded gated tanh attention + weighted mean.

    Args:
      x: (B, bag, D) patch features, bag axis sharded over ``axis``.
      mask: (B, bag) validity mask, sharded like ``x``.
      W: (D, D) attention projection (replicated).
      v: (D,) attention vector (replicated).

    Returns (B, D): for each sample, ``Σ_t softmax_t(tanh(x W)·v) · x_t``
    over REAL patches — exactly ``TanhAttention`` + ``masked_bag_mean``
    (models/aggregators.py) on the gathered bag.
    """

    def local(x_blk, m_blk, W_, v_):
        # x_blk: (B, bag/k, D) local shard
        logits = jnp.einsum("btd,d->bt", jnp.tanh(x_blk @ W_), v_)
        neg = jnp.float32(-1e30)
        logits = jnp.where(m_blk, logits, neg)
        # global max over all bag shards (stability)
        gmax = jax.lax.pmax(jnp.max(logits, axis=1), axis)  # (B,)
        e = jnp.where(m_blk, jnp.exp(logits - gmax[:, None]), 0.0)
        denom = jax.lax.psum(jnp.sum(e, axis=1), axis)  # (B,)
        num = jax.lax.psum(
            jnp.einsum("bt,btd->bd", e, x_blk), axis
        )  # (B, D)
        return num / jnp.maximum(denom, 1e-30)[:, None]

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis), P(), P()),
        out_specs=P(),
        check_rep=False,
    )(x, mask, W, v)
