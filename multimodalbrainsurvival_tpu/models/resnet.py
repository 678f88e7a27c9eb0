"""ResNet family, TPU-native (Flax linen, NHWC, bf16-friendly).

Capability parity with the reference's local ResNet fork
(``1_HistoPathology/resnet.py``, byte-duplicated at ``5_JointFusion/resnet.py``):

- depths 18/34/50/101/152 (constructors at ``resnet.py:340-453``),
- an ``extract``/``forward_extract`` path returning the pre-FC pooled
  embedding (``resnet.py:151-165``),
- 1-channel (``RNone``) and 4-channel (``RNfour``) input variants — here a
  single ``in_channels`` field; pretrained conv1 weight surgery lives in
  ``models/convert.py`` (reference does it at ``resnet.py:378-428``),
- ``ResNetProject``: a tanh projection head on the pooled embedding
  (``resnet.py:317-337``).

TPU-first design choices (deliberately NOT a torch translation):

- **NHWC layout** — XLA's native conv layout on TPU; channels-last keeps the
  128-lane dimension dense for the MXU.
- **compute dtype** is a field (use ``jnp.bfloat16`` on TPU); params/batch
  stats stay float32. BatchNorm runs in float32 for stable statistics.
- module names mirror the torch state_dict tree (``conv1``, ``bn1``,
  ``layer{i}_{j}`` with ``conv{k}``/``bn{k}``/``downsample_{conv,bn}``,
  ``fc``) so checkpoint conversion is a mechanical re-keying.
- BatchNorm semantics match torch defaults (momentum 0.1 ⇒ flax momentum 0.9,
  eps 1e-5). NOTE the reference trains with ALL BN layers in train mode even
  when their conv params are frozen (``2_HistoPath_train.py:547-551`` freezes
  params without ``eval()``), so frozen stages keep updating running stats —
  our train step replicates this by making the whole ``batch_stats``
  collection mutable during training.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any


class _Identity(nn.Module):
    @nn.compact
    def __call__(self, x, use_running_average=None):
        return x


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch ``_BatchNorm``'s EXACT semantics.

    torch normalizes by the biased batch variance but accumulates the
    UNBIASED one (``n/(n-1)``) into ``running_var``; ``flax.linen.BatchNorm``
    accumulates the biased variance, which drifts running_var by a factor
    n/(n-1) per update — a divergence caught by the HistoPath golden run
    (tests/test_golden_crossstack.py: layer4's 7x7x4-element reduction gives
    n/(n-1) = 1.005, visible after 3 steps). Collection/param names match
    flax's (``mean``/``var``/``scale``/``bias``), so checkpoints and the BN
    folding path are unaffected.
    """

    use_running_average: bool | None = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feats = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feats,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feats,), jnp.float32)
        )
        scale = self.param(
            "scale", nn.initializers.ones, (feats,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (feats,), jnp.float32
        )
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=axes)
            # E[x²]−E[x]² can round below -eps for a near-constant channel
            # with |mean| ≳ 10, and rsqrt would emit NaN; torch can never
            # produce a negative variance, so the clamp costs no parity
            # (flax.linen.BatchNorm clips the same way)
            var = jnp.maximum(
                jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean), 0.0
            )
            n = 1
            for a in axes:
                n *= x.shape[a]
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * (
                    var * (n / max(n - 1, 1))
                )
        # NOTE: rewriting this chain as a precomputed per-channel affine
        # (x*sf+off, the folding algebra) measured NEUTRAL on v5e —
        # 49.67 vs 49.73 ms/step on the full-backward flagship step — XLA
        # already folds the channel vectors out of the big-tensor chain, so
        # the simpler formulation (which matches torch's op order in f32)
        # stays (docs/DESIGN.md item 22).
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


def _make_norm(fold_bn: bool, train: bool, dtype: Any = jnp.float32,
               freeze_bn: bool = False):
    """BN factory; with fold_bn the affine lives inside the conv bias
    (``models/folding.py``) and the norm is the identity.

    ``dtype`` is the dtype the normalized activations are MATERIALIZED in —
    the model's compute dtype. Statistics and the normalize arithmetic stay
    float32 inside the fusion regardless; emitting f32 from every BN in a
    bf16 model doubled the bytes written+read at every BN/ReLU/residual
    boundary of the training path (the convs immediately cast back to bf16),
    which trace attribution showed dominating the full-backward step
    (docs/DESIGN.md training-attribution item).

    ``freeze_bn`` normalizes with the RUNNING statistics even in train mode
    (gamma/beta still train, stats never update) — the FrozenBatchNorm
    fine-tuning convention. Train-mode batch statistics cost 16-19% of the
    full-fine-tune step (docs/DESIGN.md item 26: the stat reductions plus
    BN backward's two extra reductions ≈ one extra pass over every
    activation), so this opt-in trades the reference's BN semantics for a
    measured ~1.2× step speedup."""
    if fold_bn:
        return lambda name=None: _Identity(name=name)
    return partial(
        TorchBatchNorm,
        use_running_average=(not train) or freeze_bn,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
    )


class StemConv(nn.Module):
    """The 7×7/2 stem conv, with an optional space-to-depth rewrite.

    With only ``in_channels`` (3) input channels the stem costs ~20% of
    ResNet-50 inference wall time for ~3% of the FLOPs (measured on v5e:
    5.68 of 28.97 ms/iter at batch 256). ``space_to_depth=True`` computes
    the SAME convolution as an exactly-equivalent 4×4/1 conv over a 2×2
    space-to-depth input (12 channels): the 7×7 kernel is zero-padded to 8×8
    and re-tiled, the input is padded ((3,5),(3,5)) and pixel-shuffled, and
    the 113×113 VALID output is cropped to 112×112. The parameter is the
    unchanged ``(7, 7, C, F)`` kernel — checkpoints are interchangeable and
    the flag can be flipped at serving time.

    Measured on v5e-1 (bf16, batch 256): 8.9k patches/s with s2d vs 9.1k
    without — XLA's native conv already handles the low-channel stem well on
    this toolchain, so the flag defaults to OFF; it is kept for generations/
    compilers where the stem is lane-bound.

    Falls back to the plain conv for odd spatial sizes.
    """

    features: int = 64
    dtype: Any = jnp.float32
    space_to_depth: bool = False
    use_bias: bool = False  # fold_bn mode: bn1's affine folded into a bias

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, x.shape[-1], self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        B, H, W, C = x.shape
        if not self.space_to_depth or H % 2 or W % 2:
            y = jax.lax.conv_general_dilated(
                x, kernel, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y if bias is None else y + bias.astype(y.dtype)
        # pad kernel 7→8 and re-tile to (4, 4, 4C, F)
        k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        k2 = k8.reshape(4, 2, 4, 2, C, self.features)
        k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C, self.features)
        # pad input ((3,5),(3,5)) and 2×2 space-to-depth
        xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
        Hp, Wp = H + 8, W + 8
        s = xp.reshape(B, Hp // 2, 2, Wp // 2, 2, C)
        s = s.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp // 2, Wp // 2, 4 * C)
        y = jax.lax.conv_general_dilated(
            s, k2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y[:, : H // 2, : W // 2, :]
        return y if bias is None else y + bias.astype(y.dtype)


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (ResNet-18/34). Expansion 1."""

    filters: int
    strides: int = 1
    dtype: Any = jnp.float32
    fold_bn: bool = False
    freeze_bn: bool = False
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = _make_norm(self.fold_bn, train, self.dtype, self.freeze_bn)
        conv = partial(nn.Conv, use_bias=self.fold_bn, dtype=self.dtype)
        residual = x
        y = conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                 padding=((1, 1), (1, 1)), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), padding=((1, 1), (1, 1)),
                 name="conv2")(y)
        y = norm(name="bn2")(y)
        if residual.shape[-1] != self.filters * self.expansion or self.strides != 1:
            residual = conv(self.filters * self.expansion, (1, 1),
                            strides=(self.strides, self.strides),
                            name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual.astype(y.dtype))


class Bottleneck(nn.Module):
    """1x1 → 3x3 → 1x1 residual block (ResNet-50/101/152). Expansion 4."""

    filters: int
    strides: int = 1
    dtype: Any = jnp.float32
    fold_bn: bool = False
    freeze_bn: bool = False
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = _make_norm(self.fold_bn, train, self.dtype, self.freeze_bn)
        conv = partial(nn.Conv, use_bias=self.fold_bn, dtype=self.dtype)
        residual = x
        y = conv(self.filters, (1, 1), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), strides=(self.strides, self.strides),
                 padding=((1, 1), (1, 1)), name="conv2")(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.filters * self.expansion, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)
        if residual.shape[-1] != self.filters * self.expansion or self.strides != 1:
            residual = conv(self.filters * self.expansion, (1, 1),
                            strides=(self.strides, self.strides),
                            name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual.astype(y.dtype))


class ResNet(nn.Module):
    """NHWC ResNet with a classification head and an ``extract`` embedding path.

    ``feature_dim`` = ``num_filters * 8 * expansion`` (2048 for ResNet-50).
    """

    stage_sizes: Sequence[int]
    block_cls: Callable
    num_classes: int = 1000
    in_channels: int = 3
    num_filters: int = 64
    dtype: Any = jnp.float32
    stem_space_to_depth: bool = False
    # fold_bn=True: inference-only variant with every BatchNorm folded into
    # the preceding conv's kernel+bias (models/folding.py produces the
    # variables). Removes all standalone BN elementwise passes and their
    # f32<->bf16 converts from the serving path.
    fold_bn: bool = False
    # remat_blocks=True: per-residual-block activation checkpointing
    # (jax.checkpoint via nn.remat). Backward recomputes each block's
    # intermediates from its input instead of holding every conv/BN/ReLU
    # activation of the whole network live — peak training memory drops from
    # O(all intermediates) to O(block inputs + one block), at ~1/3 extra
    # forward FLOPs. This is the lever that lets FULL-SLIDE bags
    # (thousands of patches/WSI, SURVEY §2.2's CP analog) fine-tune deep
    # stacks within one chip's HBM. Param tree and numerics are unchanged
    # (tests/test_models.py pins grads + batch_stats equality).
    # SELECTIVE form: a sequence of 1-based stage numbers (e.g. (1, 2))
    # remats only those stages — the early stages hold the fat
    # (56²/28²-resolution) activations, so rematting just them buys most
    # of the memory (and, on a bandwidth-bound backward, most of the
    # traffic cut) at a fraction of the recompute (config key
    # `remat: [1, 2]`).
    remat_blocks: Any = False
    # freeze_bn=True: FrozenBatchNorm fine-tuning (opt-in, TPU-native
    # extension): BN normalizes with the restored RUNNING stats even during
    # training; gamma/beta still receive gradients, the stats never update.
    # Removes the batch-statistic reductions and BN-backward's two extra
    # reductions from the train step (~1.2x full-fine-tune speedup,
    # docs/DESIGN.md item 26). Deviates from the reference's train-mode-BN
    # semantics (2_HistoPath_train.py:547-551), so it is opt-in like
    # quantize_trunk.
    freeze_bn: bool = False

    @property
    def feature_dim(self) -> int:
        return self.num_filters * 8 * self.block_cls.expansion

    def setup(self):
        self.conv1 = StemConv(
            features=self.num_filters,
            dtype=self.dtype,
            space_to_depth=self.stem_space_to_depth,
            use_bias=self.fold_bn,
            name="conv1",
        )
        self.bn1 = (
            _Identity(name="bn1")
            if self.fold_bn
            else TorchBatchNorm(
                momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn1"
            )
        )
        # args of block.__call__ are (self, x, train); train is static
        rb = self.remat_blocks
        all_stages = set(range(1, len(self.stage_sizes) + 1))
        if isinstance(rb, (bool, int)):
            # truthy scalar (True / 1, this repo's 0/1-as-bool convention)
            # = every stage, falsy = none
            remat_stages = all_stages if rb else set()
        elif isinstance(rb, str):
            raise ValueError(
                f"remat_blocks must be a bool or a list of stage numbers, "
                f"got the string {rb!r} (write remat: [1, 2], not \"12\")"
            )
        else:
            remat_stages = {int(s) for s in rb}
            bad = remat_stages - all_stages
            if bad:
                raise ValueError(
                    f"remat_blocks stages {sorted(bad)} out of range "
                    f"1..{len(self.stage_sizes)}"
                )
        remat_cls = nn.remat(self.block_cls, static_argnums=(2,))
        for i, n_blocks in enumerate(self.stage_sizes):
            block_cls = remat_cls if (i + 1) in remat_stages else self.block_cls
            blocks = []
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                blocks.append(
                    block_cls(
                        filters=self.num_filters * (2**i),
                        strides=strides,
                        dtype=self.dtype,
                        fold_bn=self.fold_bn,
                        freeze_bn=self.freeze_bn,
                    )
                )
            setattr(self, f"layer{i + 1}", blocks)
        self.fc = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")

    def extract(self, x, train: bool = False):
        """(B, H, W, C) → (B, feature_dim) pre-FC pooled embedding.

        Parity with ``forward_extract`` (reference ``resnet.py:151-165``).
        """
        # in_channels is a contract, not a suggestion: the RNfour/RNone
        # variants (reference resnet.py:167-315) hard-code their conv1 width,
        # and a silently-accepted wrong channel count would train a fresh
        # incompatible stem. Shapes are static under jit, so this is free.
        if x.shape[-1] != self.in_channels:
            raise ValueError(
                f"{type(self).__name__} was built for in_channels="
                f"{self.in_channels} but got input with {x.shape[-1]} "
                f"channels (shape {x.shape})"
            )
        x = x.astype(self.dtype)
        y = self.conv1(x)
        y = self.bn1(y, use_running_average=(not train) or self.freeze_bn)
        y = nn.relu(y)
        y = nn.max_pool(
            y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        # positional `train` in the blocks: static_argnums=(2,) under remat
        return self.extract_tail(y, train=train, from_stage=0)

    def extract_tail(self, y, train: bool = False, from_stage: int = 0):
        """Continue ``extract`` from the feature map after ``from_stage``
        residual stages (``from_stage=0`` expects the maxpooled stem output).

        The seam for the ``quantize_trunk: "int8"`` training mode
        (``models/quantize.quantized_trunk``): the frozen prefix of the
        freeze ladder (``2_HistoPath_train.py:544-551``) runs W8A8 outside
        flax, and the trainable stages + pool continue here on the
        dequantized map. BatchNorm in these stages trains normally.
        """
        y = y.astype(self.dtype)
        for i in range(from_stage, len(self.stage_sizes)):
            for block in getattr(self, f"layer{i + 1}"):
                y = block(y, train)
        y = jnp.mean(y, axis=(1, 2))
        return y.astype(jnp.float32)

    def __call__(self, x, train: bool = False):
        return self.fc(self.extract(x, train=train))


class ResNetProject(nn.Module):
    """ResNet embedding → Dense(hdim) → tanh projection.

    Parity with the reference's ``ResNetProject`` head (``resnet.py:317-337``).
    """

    resnet: ResNet
    hdim: int = 200

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.resnet.extract(x, train=train)
        return jnp.tanh(nn.Dense(self.hdim, name="project")(feats))


def resnet18(**kw) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock, **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), block_cls=Bottleneck, **kw)


def resnet152(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 8, 36, 3), block_cls=Bottleneck, **kw)


def rnfour(depth: str = "resnet50", **kw) -> ResNet:
    """4-channel input variant (reference ``RNfour``, resnet.py:167-240);
    pretrained conv1 surgery via ``convert.adapt_conv1_channels``."""
    return RESNET_CONSTRUCTORS[depth](in_channels=4, **kw)


def rnone(depth: str = "resnet50", **kw) -> ResNet:
    """1-channel input variant (reference ``RNone``, resnet.py:242-315)."""
    return RESNET_CONSTRUCTORS[depth](in_channels=1, **kw)


RESNET_CONSTRUCTORS = {
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnet101": resnet101,
    "resnet152": resnet152,
}
