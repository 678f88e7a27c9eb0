"""BatchNorm folding for the inference/serving path.

Profiling the extract path on v5e showed the single most expensive device op
was a standalone BN(f32)+relu+convert elementwise pass (the stem bn1 over a
(B, 112, 112, 64) tensor): inference BN runs in f32 against bf16 convs, so
XLA cannot fuse it into the convolution and pays two dtype converts plus a
full HBM round trip per BN.

``fold_resnet_variables`` turns a trained variable tree (params +
batch_stats) into the parameter tree of the same ResNet built with
``fold_bn=True``: for every conv→BN pair,

    s       = gamma / sqrt(var + eps)
    kernel' = kernel * s            (broadcast over the output channel)
    bias'   = beta - mean * s

after which the BN disappears entirely (blocks use biased convs and identity
norms). Numerics match the unfolded eval path to fp32 rounding (tested).
"""

from __future__ import annotations

import jax.numpy as jnp

BN_EPS = 1e-5

# conv param name -> its BN partner, within any scope
_PAIRS = {
    "conv1": "bn1",
    "conv2": "bn2",
    "conv3": "bn3",
    "downsample_conv": "downsample_bn",
}


def _fold_pair(conv_params, bn_params, bn_stats):
    s = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + BN_EPS)
    kernel = conv_params["kernel"] * s  # (..., in, out) * (out,)
    bias = bn_params["bias"] - bn_stats["mean"] * s
    return {"kernel": kernel, "bias": bias}


def fold_resnet_variables(variables: dict) -> dict:
    """{'params', 'batch_stats'} of a stock ResNet → {'params'} for
    ``ResNet(..., fold_bn=True)``. Non-ResNet siblings (aggregator, fc
    heads, rna encoders) pass through untouched."""

    def fold_scope(params: dict, stats: dict) -> dict:
        out: dict = {}
        for key, value in params.items():
            if key in _PAIRS and _PAIRS[key] in params:
                out[key] = _fold_pair(value, params[_PAIRS[key]], stats[_PAIRS[key]])
            elif key in _PAIRS.values():
                continue  # absorbed into its conv
            elif isinstance(value, dict):
                out[key] = fold_scope(value, stats.get(key, {}))
            else:
                out[key] = value
        return out

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return {"params": fold_scope(params, stats)}
