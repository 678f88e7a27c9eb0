"""Kernel-accelerated serving forward for the folded ResNet-50 extract path.

``fused_folded_extract`` computes exactly what
``ResNet(..., fold_bn=True).apply(vars, x, method="extract")`` computes
(reference semantics: ``1_HistoPathology/resnet.py:151-165`` via
``models/folding.py``), but routes every stride-1 bottleneck chain through
the Pallas fused-stage kernel (``ops/pallas/fused_stage.py``) so the fat
early-stage activations never round-trip HBM between blocks. The remaining
ops (stem, stride-2 entry blocks, pooling) stay on XLA, which is already at
roofline for them.

Equality with the stock model is pinned by
``tests/test_pallas.py::test_fused_folded_extract_matches_stock``.

MEASURED OUTCOME (v5e-1, bf16, batch 256 — docs/DESIGN.md item 8): the
kernel path is numerically exact (0.0 rel err on-chip) but SLOWER than
stock XLA (9.1k/9.9k/8.1k vs 11.1k patches/s for layer1/layer2/both): the
HBM bandwidth saved is repaid in sub-128 channel-dim MXU work and im2col
staging. Kept as the recorded evidence that XLA's per-conv serving path is
at the hardware roofline; NOT wired into the serving CLIs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# stages whose stride-1 chains go through the Pallas kernel: the
# bandwidth-bound fat-activation stages (56x56 and 28x28). layer3/4 are
# compute-bound at these shapes — XLA's convs already run them well.
DEFAULT_FUSED_STAGES = ("layer1", "layer2")

_STAGE_SIZES = {"layer1": 3, "layer2": 4, "layer3": 6, "layer4": 3}


def _conv(x, p, *, stride=1, padding="SAME"):
    y = lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        (stride, stride),
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(y.dtype)


def _xla_block(x, bp, *, stride):
    """One folded bottleneck block via XLA convs (stride-2 entry blocks)."""
    y = jax.nn.relu(_conv(x, bp["conv1"]))
    y = jax.nn.relu(
        _conv(y, bp["conv2"], stride=stride, padding=((1, 1), (1, 1)))
    )
    y = _conv(y, bp["conv3"])
    if "downsample_conv" in bp:
        r = _conv(x, bp["downsample_conv"], stride=stride)
    else:
        r = x
    return jax.nn.relu(y + r.astype(y.dtype))


def _kernel_blocks(params, stage, start, n):
    blocks = []
    for j in range(start, start + n):
        bp = params[f"{stage}_{j}"]
        blk = {
            "w1": bp["conv1"]["kernel"], "b1": bp["conv1"]["bias"],
            "w2": bp["conv2"]["kernel"], "b2": bp["conv2"]["bias"],
            "w3": bp["conv3"]["kernel"], "b3": bp["conv3"]["bias"],
        }
        if "downsample_conv" in bp:
            blk["wd"] = bp["downsample_conv"]["kernel"]
            blk["bd"] = bp["downsample_conv"]["bias"]
        blocks.append(blk)
    return blocks


def fused_folded_extract(
    variables,
    x,
    *,
    fused_stages: tuple = DEFAULT_FUSED_STAGES,
    interpret: bool = False,
):
    """(B, 224, 224, 3) float input → (B, 2048) f32 embedding.

    ``variables``: the ``{'params': ...}`` tree of a folded ResNet-50
    (``fold_resnet_variables`` output). Matches the stock
    ``fold_bn=True`` ``extract`` to bf16 tolerance.
    """
    from multimodalbrainsurvival_tpu.ops.pallas.fused_stage import (
        fused_bottleneck_stage,
    )

    p = variables["params"]
    y = _conv(x, p["conv1"], stride=2, padding=((3, 3), (3, 3)))
    y = jax.nn.relu(y)
    y = lax.reduce_window(
        y, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )

    for stage in ("layer1", "layer2", "layer3", "layer4"):
        n_blocks = _STAGE_SIZES[stage]
        stride = 1 if stage == "layer1" else 2
        if stage in fused_stages:
            if stride == 1:
                # whole stage (incl. the projection block) in one kernel call
                y = fused_bottleneck_stage(
                    y, _kernel_blocks(p, stage, 0, n_blocks),
                    interpret=interpret,
                )
            else:
                # stride-2 entry block on XLA, the stride-1 tail fused
                y = _xla_block(y, p[f"{stage}_0"], stride=stride)
                y = fused_bottleneck_stage(
                    y, _kernel_blocks(p, stage, 1, n_blocks - 1),
                    interpret=interpret,
                )
        else:
            for j in range(n_blocks):
                y = _xla_block(
                    y, p[f"{stage}_{j}"], stride=stride if j == 0 else 1
                )

    return jnp.mean(y, axis=(1, 2)).astype(jnp.float32)
