"""Fused residual bottleneck stage (Pallas, serving path).

Motivation (profile, docs/DESIGN.md): after BN folding, the serving
bottleneck is HBM traffic of the fat early-stage activations — the
``(B, 56, 56, 256)`` tensors of layer1 alone cost ~4.6 ms/iter at batch 256
on v5e, at the measured 819 GB/s roofline, because every conv materializes
its input/output in HBM. This kernel runs a whole chain of stride-1
bottleneck blocks (reference ``1_HistoPathology/resnet.py:54-90``, folded
form: biased convs, no BN) with every intermediate — including the residual
stream between blocks — resident in VMEM. HBM traffic for an n-block stage
drops from ~n×4 tensors to exactly one read + one write.

Implementation notes:

- grid = (batch,): one image per program; a full 56×56×256 bf16 image is
  1.6 MB, well under the ~16 MB/core VMEM budget.
- 1×1 convs are straight MXU matmuls over the flattened spatial axis
  (M = H·W = 3136 keeps the systolic array busy; the 64-wide channel dims
  cap the ceiling at ~50% MXU utilization — the kernel wins on bandwidth,
  not FLOPs).
- the 3×3 conv is an in-VMEM im2col (nine shifted views concatenated on the
  channel axis) followed by one (H·W, 9·Cm) × (9·Cm, Cm) matmul.
- dots accumulate in f32 (``preferred_element_type``) and are cast back to
  bf16 at each op boundary, matching the stock XLA path's conv behavior.

Inference-only (the serving/extract path); training keeps the stock XLA
blocks. Opt-in via ``fused_stage`` in the serving config.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_step(x2d, H, W, wb, pad_ref, col_ref, compute_dtype):
    """One folded bottleneck block on a (H*W, C_in) VMEM-resident value.

    The 3x3 conv runs as an in-VMEM im2col: y1 is staged into ``pad_ref``, a
    3-D ``(H+2, W+2, Cm)`` zero-bordered buffer where a (dy, dx) spatial
    shift is a plain slice on the two leading dims — only leading-dim
    collapses/expands are used (Mosaic cannot lower lane-crossing reshapes
    or shifted-layout concatenates). The nine shifted views land in
    ``col_ref`` (H*W, 9*Cm), in (dy, dx, c) order matching the host-side
    (3, 3, Cm, Cm) -> (9*Cm, Cm) kernel reshape, then one matmul.
    """
    w1, b1, w2, b2, w3, b3, wd, bd = wb
    cm = w1.shape[1]

    y1 = jnp.dot(x2d, w1, preferred_element_type=jnp.float32) + b1
    y1 = jnp.maximum(y1, 0.0).astype(compute_dtype)

    pad_ref[1 : H + 1, 1 : W + 1, :] = y1.reshape(H, W, cm)
    for k, (dy, dx) in enumerate((dy, dx) for dy in range(3) for dx in range(3)):
        col_ref[:, k * cm : (k + 1) * cm] = (
            pad_ref[dy : dy + H, dx : dx + W, :].reshape(H * W, cm)
        )
    y2 = jnp.dot(col_ref[:, : 9 * cm], w2, preferred_element_type=jnp.float32)
    y2 = jnp.maximum(y2 + b2, 0.0).astype(compute_dtype)

    z = jnp.dot(y2, w3, preferred_element_type=jnp.float32) + b3
    if wd is not None:
        r = jnp.dot(x2d, wd, preferred_element_type=jnp.float32) + bd
    else:
        r = x2d.astype(jnp.float32)
    return jnp.maximum(z.astype(compute_dtype) + r.astype(compute_dtype), 0.0)


def _stage_kernel(
    x_ref, *rest, H, W, n_blocks, has_down, compute_dtype
):
    out_ref = rest[-3]
    pad_ref, col_ref = rest[-2], rest[-1]
    weight_refs = rest[:-3]
    x = x_ref[0].reshape(H * W, x_ref.shape[-1])

    # zero once: blocks overwrite the center; the border must stay zero
    pad_ref[:] = jnp.zeros(pad_ref.shape, pad_ref.dtype)

    i = 0
    for j in range(n_blocks):
        w1, b1, w2, b2, w3, b3 = (r[:] for r in weight_refs[i : i + 6])
        i += 6
        wd = bd = None
        if has_down[j]:
            wd, bd = weight_refs[i][:], weight_refs[i + 1][:]
            i += 2
        x = _block_step(
            x, H, W, (w1, b1, w2, b2, w3, b3, wd, bd),
            pad_ref, col_ref, compute_dtype,
        )
    out_ref[0] = x.reshape(H, W, out_ref.shape[-1])


def fused_bottleneck_stage(x, blocks, *, interpret: bool = False):
    """Run a chain of stride-1 folded bottleneck blocks on (B, H, W, C).

    ``blocks``: sequence of dicts with keys ``w1`` (Cin, Cm), ``b1`` (Cm,),
    ``w2`` (3, 3, Cm, Cm), ``b2`` (Cm,), ``w3`` (Cm, Cout), ``b3`` (Cout,)
    and optionally ``wd`` (Cin, Cout), ``bd`` (Cout,) for a projection
    residual (first block of a stage). Returns (B, H, W, Cout_last).
    """
    B, H, W, _ = x.shape
    compute_dtype = x.dtype
    flat_weights = []
    has_down = []
    def _2d(w):  # (1, 1, Cin, Cout) conv kernels -> (Cin, Cout) matmul form
        return w.reshape(w.shape[-2:]).astype(compute_dtype)

    def _row(b):  # biases as (1, C) rows (TPU prefers >=2-D VMEM refs)
        return b.reshape(1, -1).astype(jnp.float32)

    for blk in blocks:
        cm = blk["w1"].shape[-1]
        flat_weights += [
            _2d(blk["w1"]),
            _row(blk["b1"]),
            blk["w2"].reshape(9 * cm, cm).astype(compute_dtype),
            _row(blk["b2"]),
            _2d(blk["w3"]),
            _row(blk["b3"]),
        ]
        down = "wd" in blk and blk["wd"] is not None
        has_down.append(down)
        if down:
            flat_weights += [_2d(blk["wd"]), _row(blk["bd"])]
    cout = blocks[-1]["w3"].shape[-1]

    kernel = partial(
        _stage_kernel, H=H, W=W, n_blocks=len(blocks),
        has_down=tuple(has_down), compute_dtype=compute_dtype,
    )
    weight_specs = [
        pl.BlockSpec(
            w.shape, lambda b, n=w.ndim: (0,) * n, memory_space=pltpu.VMEM
        )
        for w in flat_weights
    ]
    cms = {blk["w1"].shape[-1] for blk in blocks}
    if len(cms) != 1:
        raise ValueError(
            f"all blocks in a fused stage must share the bottleneck width; "
            f"got {sorted(cms)}"
        )
    (cm_max,) = cms
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H, W, x.shape[-1]),
                lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, H, W, cout), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2, cm_max), compute_dtype),  # pad_ref
            pltpu.VMEM((H * W, 9 * cm_max), compute_dtype),     # col_ref
        ],
        interpret=interpret,
    )(x, *flat_weights)
