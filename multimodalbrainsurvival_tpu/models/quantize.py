"""int8 (W8A8) post-training quantization for the ResNet serving path.

The serving roofline audit (docs/DESIGN.md item 16) showed the bf16
``extract`` path is HBM-bandwidth-bound: ~52 MB of activation traffic per
patch at 77-86% of the v5e roofline. int8 activations halve that traffic
(and int8 weights quarter the weight stream), so a quantized forward is the
one lever left that moves the serving ceiling rather than chasing the last
~20% of the bf16 bound. It is also table stakes for production serving.

Scheme (standard PTQ, chosen for exact TPU MXU mapping):

- **weights**: symmetric int8, per-OUTPUT-CHANNEL scale (axes (0,1,2) of the
  HWIO kernel), computed from the BN-folded kernels (``models/folding.py``)
  so the BN affine is inside the quantized weights;
- **activations**: symmetric int8, per-tensor STATIC scales calibrated by
  running the float forward over representative batches and recording the
  abs-max at every conv-input site (stem input, each block's post-relu
  intermediates, each block output);
- **conv math**: int8 x int8 -> int32 accumulation
  (``preferred_element_type``), dequantized in the conv epilogue by the
  fused scale ``s_in * w_scale[c_out]``, bias added in f32, relu'd, and
  requantized to the next site's scale — XLA fuses the epilogue into the
  convolution, so only int8 tensors round-trip HBM between convs;
- the stem max-pool runs IN the int8 domain (requantization is monotone, so
  it commutes with max exactly — tested).

Semantics note: this is a DELIBERATE deviation from reference numerics
(opt-in via ``quantize: "int8"``); the float path remains the default and
the parity-tested one. Reference context: the quantized forward computes the
same function as ``forward_extract`` (``1_HistoPathology/resnet.py:151-165``)
under int8 rounding.

Works for the whole family (18/34 basic blocks, 50/101/152 bottleneck) and
any ``in_channels`` (the RNone/RNfour variants).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

STAGE_SIZES = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}
BASIC_ARCHS = ("resnet18", "resnet34")

_DN = ("NHWC", "HWIO", "NHWC")
_EPS = 1e-8  # scale floor: a dead channel/site must not divide by zero


# --- float reference forward with activation-range capture -------------------


def _fconv(x, p, *, stride=1, padding="SAME"):
    y = lax.conv_general_dilated(
        x, p["kernel"].astype(jnp.float32), (stride, stride), padding,
        dimension_numbers=_DN,
    )
    return y + p["bias"].astype(jnp.float32)


def float_extract_amax(variables: dict, x, *, arch: str = "resnet50"):
    """Folded-ResNet float forward that ALSO returns per-site abs-maxes.

    ``variables``: a ``fold_resnet_variables`` output (``{'params': ...}``).
    Returns ``(features (B, D) f32, {site: scalar amax})``. The forward is
    numerically the stock ``ResNet(fold_bn=True).extract`` in f32 (pinned by
    tests); the amax dict is what ``quantize_resnet`` calibrates from.
    """
    p = variables["params"]
    basic = arch in BASIC_ARCHS
    amax: dict[str, Any] = {"in": jnp.max(jnp.abs(x)).astype(jnp.float32)}
    x = x.astype(jnp.float32)
    y = _fconv(x, p["conv1"], stride=2, padding=((3, 3), (3, 3)))
    y = jax.nn.relu(y)
    amax["stem"] = jnp.max(y)
    y = lax.reduce_window(
        y, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for i, n_blocks in enumerate(STAGE_SIZES[arch]):
        for j in range(n_blocks):
            ln = f"layer{i + 1}_{j}"
            bp = p[ln]
            stride = 2 if (i > 0 and j == 0) else 1
            if basic:
                t = jax.nn.relu(
                    _fconv(y, bp["conv1"], stride=stride,
                           padding=((1, 1), (1, 1))))
                amax[f"{ln}.r1"] = jnp.max(t)
                t = _fconv(t, bp["conv2"], padding=((1, 1), (1, 1)))
            else:
                t = jax.nn.relu(_fconv(y, bp["conv1"]))
                amax[f"{ln}.r1"] = jnp.max(t)
                t = jax.nn.relu(
                    _fconv(t, bp["conv2"], stride=stride,
                           padding=((1, 1), (1, 1))))
                amax[f"{ln}.r2"] = jnp.max(t)
                t = _fconv(t, bp["conv3"])
            # branch sites: the PRE-activation residual tensors get their own
            # calibrated ranges so the int8 forward can store them as int8 at
            # honest scales (they are signed — calibrate |.|)
            amax[f"{ln}.t"] = jnp.max(jnp.abs(t))
            if "downsample_conv" in bp:
                r = _fconv(y, bp["downsample_conv"], stride=stride)
                amax[f"{ln}.skip"] = jnp.max(jnp.abs(r))
            else:
                r = y
            y = jax.nn.relu(t + r)
            amax[f"{ln}.out"] = jnp.max(y)
    return jnp.mean(y, axis=(1, 2)).astype(jnp.float32), amax


def merge_amax(dicts: list[dict]) -> dict:
    """Elementwise max over per-batch amax dicts (multi-batch calibration)."""
    out = dict(dicts[0])
    for d in dicts[1:]:
        for k, v in d.items():
            out[k] = np.maximum(out[k], v)
    return {k: np.float32(v) for k, v in out.items()}


# --- weight quantization -----------------------------------------------------


def _quantize_conv(p: dict) -> dict:
    k = np.asarray(p["kernel"], np.float32)
    ws = np.maximum(np.abs(k).max(axis=(0, 1, 2)), _EPS) / 127.0
    kq = np.clip(np.rint(k / ws), -127, 127).astype(np.int8)
    return {"k": kq, "ws": ws.astype(np.float32),
            "b": np.asarray(p["bias"], np.float32)}


def quantize_resnet(variables: dict, amax: dict, *,
                    arch: str = "resnet50") -> dict:
    """Folded variables + calibrated activation amaxes → int8 serving tree.

    The returned ``qtree`` holds per-conv ``{k int8, ws f32[out], b f32}``
    plus per-site scalar scales (``amax / 127``); feed it to
    ``quantized_extract``.
    """
    p = variables["params"]
    qt: dict[str, Any] = {"conv1": _quantize_conv(p["conv1"])}
    for i, n_blocks in enumerate(STAGE_SIZES[arch]):
        for j in range(n_blocks):
            ln = f"layer{i + 1}_{j}"
            qt[ln] = {name: _quantize_conv(cp)
                      for name, cp in p[ln].items()}
    qt["scales"] = {
        site: np.float32(max(float(v), _EPS) / 127.0)
        for site, v in amax.items()
    }
    return qt


# --- int8 forward ------------------------------------------------------------


def _requant(y, s):
    return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)


def _qconv_q(x_q, s_in, cp, s_out, *, stride=1, padding="SAME", relu=True):
    """int8 conv whose epilogue lands DIRECTLY back at an int8 tensor.

    The first int8 iteration dequantized every conv to an f32 tensor and
    requantized at the next conv's input; the roofline audit of that program
    (DESIGN items 18-19) showed 35 MB/patch HBM traffic — well above the
    ~26 MB a fully-int8-boundary network should touch, because the f32 conv
    epilogues and the f32 residual adds materialized 4-byte tensors at every
    fusion boundary. Folding dequant→(relu)→requant into ONE epilogue makes
    every conv's output buffer 1 byte: in-chain convs (``relu=True``) land
    at the next input site's calibrated scale, residual-branch convs
    (``relu=False``) at THEIR OWN calibrated pre-activation range
    (``.t`` / ``.skip`` sites — branch magnitudes routinely exceed the
    post-relu output amax, so they need their own scales, not the output's).

    Round-5 refinements (DESIGN item 30, measured on v5e-1 in-program):

    - stride-1 1×1 convs run as a reshape + int8 ``dot_general`` — XLA's
      dot emitter beats its conv emitter on the same s8×s8→s32 problem
      (+3-4% whole-program; the reshape is layout-free in NHWC);
    - the epilogue multiplies by the PRE-COMBINED per-channel scale
      ``s_in·ws/s_out`` and relu's after scaling (``relu(y)/s == max(y/s,0)``
      for ``s>0``), saving one full-tensor op (+2-3%).
    """
    k = cp["k"]
    kh, kw, kin, kout = k.shape
    if kh == 1 and kw == 1 and stride == 1:
        b, h, w, _ = x_q.shape
        y32 = lax.dot_general(
            x_q.reshape(b * h * w, kin), k.reshape(kin, kout),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        ).reshape(b, h, w, kout)
    else:
        y32 = lax.conv_general_dilated(
            x_q, k, (stride, stride), padding, dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
    y = y32.astype(jnp.float32) * ((s_in * cp["ws"]) / s_out) + cp["b"] / s_out
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def _residual_relu_q(t_q, s_t, r_q, s_r, s_out):
    """relu(t + r) from two int8 branches with independent scales: dequant
    each, add, relu, requant to the output site — one fused elementwise op
    whose inputs and output are all 1-byte tensors. Costs one rounding per
    branch vs the f32-domain add (within the int8 noise floor; cosine
    contract pinned by tests/test_quantize.py)."""
    y = t_q.astype(jnp.float32) * s_t + r_q.astype(jnp.float32) * s_r
    return _requant(jax.nn.relu(y), s_out)


def _quantized_stages(qtree: dict, x, *, stages: int, arch: str = "resnet50"):
    """int8 stem + first ``stages`` residual stages; returns ``(y_q, s_in)``
    — the int8 feature map and its scale. Shared by ``quantized_extract``
    (all stages + pool) and ``quantized_trunk`` (frozen-prefix training)."""
    basic = arch in BASIC_ARCHS
    s = qtree["scales"]
    # The stem runs in bf16 (round 5, DESIGN item 30): its K=3 input
    # channels pack 3/32 of an int8 MXU sublane tile, making the int8 stem
    # the single slowest conv in the program (~3.0 of 28.6 ms at batch 512,
    # ~5× its bandwidth bound); bf16 (16-packing) with the int8 kernel
    # dequantized once is ~1 ms faster in-program AND skips quantizing the
    # full-resolution input (the ``in`` site stays calibrated for
    # compatibility, unused here). Epilogue requants to the stem site, so
    # everything downstream is unchanged int8. An exactly-equivalent
    # space-to-depth int8 rewrite measured SLOWER in-program (item 21).
    cp = qtree["conv1"]
    kb = (cp["k"].astype(jnp.float32) * cp["ws"]).astype(jnp.bfloat16)
    y = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), kb, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=_DN, preferred_element_type=jnp.float32,
    )
    y_q = _requant(jnp.maximum(y + cp["b"], 0.0), s["stem"])
    # max-pool in the int8 domain (requant is monotone → commutes with max)
    y_q = lax.reduce_window(
        y_q, jnp.int8(-128), lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    s_in = s["stem"]
    for i, n_blocks in enumerate(STAGE_SIZES[arch][:stages]):
        for j in range(n_blocks):
            ln = f"layer{i + 1}_{j}"
            bq = qtree[ln]
            stride = 2 if (i > 0 and j == 0) else 1
            s_out = s[f"{ln}.out"]
            s_t = s[f"{ln}.t"]
            if basic:
                t_q = _qconv_q(y_q, s_in, bq["conv1"], s[f"{ln}.r1"],
                               stride=stride, padding=((1, 1), (1, 1)))
                t_q = _qconv_q(t_q, s[f"{ln}.r1"], bq["conv2"], s_t,
                               padding=((1, 1), (1, 1)), relu=False)
            else:
                t_q = _qconv_q(y_q, s_in, bq["conv1"], s[f"{ln}.r1"])
                t_q = _qconv_q(t_q, s[f"{ln}.r1"], bq["conv2"], s[f"{ln}.r2"],
                               stride=stride, padding=((1, 1), (1, 1)))
                t_q = _qconv_q(t_q, s[f"{ln}.r2"], bq["conv3"], s_t,
                               relu=False)
            if "downsample_conv" in bq:
                s_r = s[f"{ln}.skip"]
                r_q = _qconv_q(y_q, s_in, bq["downsample_conv"], s_r,
                               stride=stride, relu=False)
            else:
                # identity skip: the block input is ALREADY an int8 tensor
                # at s_in — read it directly, no rescale materialization
                s_r, r_q = s_in, y_q
            y_q = _residual_relu_q(t_q, s_t, r_q, s_r, s_out)
            s_in = s_out
    return y_q, s_in


def quantized_extract(qtree: dict, x, *, arch: str = "resnet50"):
    """(B, H, W, C) preprocessed float input → (B, D) f32 embedding, int8.

    Every inter-conv activation is an int8 tensor; dequant/requant live in
    the conv epilogues. Accuracy vs the float path is pinned by
    ``tests/test_quantize.py`` (cosine > 0.995 on calibrated data).
    """
    y_q, s_in = _quantized_stages(
        qtree, x, stages=len(STAGE_SIZES[arch]), arch=arch
    )
    # final dequant + global average pool
    return jnp.mean(y_q.astype(jnp.float32), axis=(1, 2)) * s_in


def quantized_trunk(qtree: dict, x, *, stages: int, arch: str = "resnet50",
                    dtype=jnp.float32):
    """Frozen-prefix int8 forward: stem + first ``stages`` residual stages,
    dequantized to a ``dtype`` feature map ``(B, h, w, c)``.

    This is the compute path of the opt-in ``quantize_trunk: "int8"``
    TRAINING mode: under the reference freeze ladder
    (``2_HistoPath_train.py:544-551``) the layers below the trained ones run
    forward-only every step — exactly the shape of work W8A8 serves fastest
    (docs/DESIGN.md items 18-20). The trainable tail continues in the float
    model from this feature map (``ResNet.extract_tail``); gradients stop
    here by construction. Deviations vs the float freeze path: int8 rounding
    in the frozen features, and the frozen stages' BN running stats no
    longer update (the reference quirk keeps updating them under freeze —
    SURVEY.md §7 "hard parts"; this mode is opt-in like ``quantize``)."""
    y_q, s_in = _quantized_stages(qtree, x, stages=stages, arch=arch)
    return (y_q.astype(jnp.float32) * s_in).astype(dtype)


def calibrate_and_quantize(variables: dict, batches, *,
                           arch: str = "resnet50") -> dict:
    """One-call calibration: run ``float_extract_amax`` over ``batches``
    (already-preprocessed float arrays) and build the int8 qtree."""
    fwd = jax.jit(lambda v, x: float_extract_amax(v, x, arch=arch)[1])
    dicts = [jax.device_get(fwd(variables, jnp.asarray(b))) for b in batches]
    return quantize_resnet(variables, merge_amax(dicts), arch=arch)


def quantize_trunk_for_training(variables: dict, patch_bags_u8, *,
                                arch: str = "resnet50",
                                submodule: str = "resnet",
                                augment: bool = True,
                                seed: int = 0) -> dict:
    """Fold + calibrate + quantize the ResNet inside a LIVE training model.

    ``variables``: the unfolded ``{'params', 'batch_stats'}`` tree of a MIL /
    joint model at training start (pretrained/restored weights — the frozen
    prefix keeps exactly these values for the whole run, which is what makes
    a one-shot quantization valid). The ResNet subtree is BN-folded with its
    CURRENT running stats, then calibrated on TRAIN-preprocessed pixels
    (augmentation on, deterministic keys) so the activation ranges cover the
    augmented input distribution the trunk will actually see each step.
    Returns the qtree for ``quantized_trunk``.
    """
    import jax.random as jrandom

    from multimodalbrainsurvival_tpu.models.folding import (
        fold_resnet_variables,
    )
    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches

    folded = fold_resnet_variables({
        "params": jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float32),
            variables["params"][submodule],
        ),
        "batch_stats": variables["batch_stats"][submodule],
    })
    fwd = jax.jit(lambda v, x: float_extract_amax(v, x, arch=arch)[1])
    key = jrandom.PRNGKey(seed)
    dicts = []
    for bag in patch_bags_u8:
        key, sub = jrandom.split(key)
        x = preprocess_patches(jnp.asarray(bag), train=augment,
                               key=sub if augment else None,
                               dtype=jnp.float32)
        x = x.reshape((-1,) + x.shape[-3:])
        dicts.append(jax.device_get(fwd(folded, x)))
    return quantize_resnet(folded, merge_amax(dicts), arch=arch)


# --- dense-stack (MLP) W8A8 quantization -------------------------------------
#
# The serving audit of the RNA path (docs/DESIGN.md item 7) showed the
# 12,778×4096 encoder matmul is WEIGHT-LOAD-bound: streaming the ~105 MB f32
# (52 MB bf16) kernel dominates at serving batch sizes, so int8 weights alone
# halve/quarter the HBM stream — the same lever int8 gave the ResNet.
# Weights are symmetric int8 with per-OUTPUT-CHANNEL scales (like the conv
# path); activations use DYNAMIC per-row scales computed in the epilogue
# (unlike the conv path's calibrated static scales): an MLP activation is
# one row per sample, so its abs-max is a single cheap VPU reduction, and
# dynamic scales make the scheme calibration-free with zero clipping —
# strictly tighter numerics for free on a weight-load-bound op. Matmuls run
# int8×int8→int32 with the dequant(+relu)+requant fused into the epilogue,
# so HBM sees int8 weights and int8 activations only. Covers any
# "Dense → relu → … → Dense" stack (``RNAEncoder``,
# ``2_GeneExpression/models.py:8-21``); the tiny Cox head stays float.


def _quantize_dense(p: dict) -> dict:
    k = np.asarray(p["kernel"], np.float32)  # flax Dense: (in, out)
    ws = np.maximum(np.abs(k).max(axis=0), _EPS) / 127.0
    kq = np.clip(np.rint(k / ws), -127, 127).astype(np.int8)
    return {"k": kq, "ws": ws.astype(np.float32),
            "b": np.asarray(p["bias"], np.float32)}


def _requant_rows(y):
    """Dynamic per-row symmetric int8: returns ``(y_q int8, s_row f32 (B,))``
    with ``y ≈ y_q * s_row[:, None]``. No calibration, no clipping (the
    scale IS the row's abs-max / 127)."""
    s = jnp.maximum(jnp.max(jnp.abs(y), axis=-1), _EPS) / 127.0
    y_q = jnp.clip(jnp.round(y / s[:, None]), -127, 127).astype(jnp.int8)
    return y_q, s


def quantize_mlp(layer_params: list) -> dict:
    """Float Dense params → int8 serving qtree:
    ``{"layers": [{k int8, ws f32[out], b f32}, ...]}`` (activation scales
    are dynamic — nothing to calibrate)."""
    return {"layers": [_quantize_dense(p) for p in layer_params]}


def quantized_mlp(qtree: dict, x):
    """(B, F) float input → (B, D) f32 output through the int8 stack.

    Every inter-layer activation is an int8 tensor with a per-row dynamic
    scale; quantize→matmul→dequant→relu→requantize fuses into the matmul
    epilogues, so HBM sees int8 weights + int8 activations only. The last
    layer dequantizes to f32 (it is the embedding consumers read)."""
    x_q, s_row = _requant_rows(x.astype(jnp.float32))
    y = x  # placate linters for the zero-layer degenerate case
    for i, lp in enumerate(qtree["layers"]):
        y32 = lax.dot_general(
            x_q, lp["k"], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (y32.astype(jnp.float32) * (s_row[:, None] * lp["ws"][None, :])
             + lp["b"])
        if i + 1 < len(qtree["layers"]):
            x_q, s_row = _requant_rows(jax.nn.relu(y))
    return y.astype(jnp.float32)


def quantize_rna_encoder(variables: dict, rna_batches=None, *,
                         submodule: str = "encoder") -> dict:
    """Quantize the RNA MLP encoder inside a live variable tree.

    ``variables``: the restored ``RNAOnlyModel`` / joint-model tree (the
    encoder's Dense params live under ``params.<submodule>.dense_{i}``).
    ``rna_batches`` is accepted for call-site symmetry with
    ``quantize_mil_resnet`` but unused — activation scales are dynamic.
    Returns the qtree for ``quantized_mlp``; the Cox head / fusion tail
    stays float (its weights are negligible)."""
    del rna_batches
    enc = variables["params"][submodule]
    names = sorted((k for k in enc if k.startswith("dense_")),
                   key=lambda s: int(s.split("_")[1]))
    return quantize_mlp([
        {"kernel": np.asarray(enc[n]["kernel"], np.float32),
         "bias": np.asarray(enc[n]["bias"], np.float32)}
        for n in names
    ])


def quantize_mil_resnet(variables: dict, patch_bags_u8, *,
                        arch: str = "resnet50",
                        submodule: str = "resnet") -> dict:
    """Calibrate + quantize the ResNet inside a folded MIL variable tree.

    ``variables``: the restored+folded tree of an ``AggregationModel`` /
    ``AggregationProjectModel`` (the ResNet subtree lives under
    ``params.<submodule>``). ``patch_bags_u8``: raw uint8 ``(B, bag, H, W, C)``
    (or ``(N, H, W, C)``) calibration batches exactly as the loader yields
    them — the eval preprocessing is applied here so the calibrated ranges
    see the true serving input distribution.
    """
    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches

    rv = {
        "params": jax.tree.map(
            lambda a: np.asarray(a, np.float32), variables["params"][submodule]
        )
    }
    fwd = jax.jit(lambda v, x: float_extract_amax(v, x, arch=arch)[1])
    dicts = []
    for bag in patch_bags_u8:
        x = preprocess_patches(jnp.asarray(bag), train=False,
                               dtype=jnp.float32)
        x = x.reshape((-1,) + x.shape[-3:])
        dicts.append(jax.device_get(fwd(rv, x)))
    return quantize_resnet(rv, merge_amax(dicts), arch=arch)
