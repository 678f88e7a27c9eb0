"""On-device batched image preprocessing (augmentation + normalization).

The reference preprocesses per patch on the CPU dataloader workers with
torchvision transforms: ``Resize + RandomHorizontalFlip + RandomVerticalFlip +
ColorJitter(64/255, 0.75, 0.25, 0.04) + ToTensor + Normalize(ImageNet)``
(``2_HistoPath_train.py:474-488``). On TPU that CPU work is the throughput
bottleneck, so here the host loader only decodes PNGs to uint8 and the whole
augmentation pipeline runs **on device, batched, inside jit**, fused by XLA
into a couple of elementwise kernels over the batch.

Semantics match torchvision per-op:

- flips: each image independently flipped H and/or V with p=0.5;
- brightness factor ~ U[1-b, 1+b]; ``img * f``;
- contrast  factor ~ U[1-c, 1+c]; blend with the mean of the grayscale image;
- saturation factor ~ U[1-s, 1+s]; blend with the per-pixel grayscale;
- hue delta ~ U[-h, h]; shift in HSV space;
- grayscale uses the ITU-R 601 weights torchvision uses (0.299/0.587/0.114);
- every op clamps to [0, 1].

Documented deviation: torchvision applies the four jitter ops in a *random
order* per call; we apply them in a fixed order (brightness → contrast →
saturation → hue) with per-image random factors. Training-statistical parity
only (C-index tolerance), per SURVEY.md §6; the eval path (resize+normalize)
is deterministic and bit-comparable.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# ITU-R 601 luma weights (torchvision rgb_to_grayscale). A plain tuple, NOT
# a module-level jnp.array: creating a device array at import time
# initializes the XLA backend, which breaks `jax.distributed.initialize`
# (multi-host CLIs must join the runtime before any backend touch).
_GRAY_W = (0.299, 0.587, 0.114)


def rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    """(..., 3) float RGB in [0,1] → HSV in [0,1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    safe_delta = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r,
        bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    """(..., 3) float HSV in [0,1] → RGB in [0,1]."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def _grayscale(img: jax.Array) -> jax.Array:
    return jnp.einsum(
        "...c,c->...", img, jnp.asarray(_GRAY_W, img.dtype)
    )


def color_jitter(
    key: jax.Array,
    img: jax.Array,
    brightness: float = 64.0 / 255.0,
    contrast: float = 0.75,
    saturation: float = 0.25,
    hue: float = 0.04,
) -> jax.Array:
    """Jitter a single (H, W, 3) float image in [0,1]."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    if brightness > 0:
        f = jax.random.uniform(
            kb, (), minval=max(0.0, 1.0 - brightness), maxval=1.0 + brightness
        )
        img = jnp.clip(img * f, 0.0, 1.0)
    if contrast > 0:
        f = jax.random.uniform(
            kc, (), minval=max(0.0, 1.0 - contrast), maxval=1.0 + contrast
        )
        mean = jnp.mean(_grayscale(img))
        img = jnp.clip(f * img + (1.0 - f) * mean, 0.0, 1.0)
    if saturation > 0:
        f = jax.random.uniform(
            ks, (), minval=max(0.0, 1.0 - saturation), maxval=1.0 + saturation
        )
        gray = _grayscale(img)[..., None]
        img = jnp.clip(f * img + (1.0 - f) * gray, 0.0, 1.0)
    if hue > 0:
        d = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
        hsv = rgb_to_hsv(img)
        hsv = hsv.at[..., 0].set((hsv[..., 0] + d) % 1.0)
        img = hsv_to_rgb(hsv)
    return img


def _random_flips(key: jax.Array, img: jax.Array) -> jax.Array:
    k1, k2 = jax.random.split(key)
    img = jnp.where(jax.random.bernoulli(k1), img[:, ::-1, :], img)
    img = jnp.where(jax.random.bernoulli(k2), img[::-1, :, :], img)
    return img


def normalize_imagenet(img: jax.Array) -> jax.Array:
    mean = jnp.asarray(IMAGENET_MEAN, img.dtype)
    std = jnp.asarray(IMAGENET_STD, img.dtype)
    return (img - mean) / std


def _hsv_to_rgb_arith(h, s, v):
    """Arithmetic HSV→RGB (no 6-way gather — fuses into one VPU pass)."""

    def channel(n):
        k = jnp.mod(n + h * 6.0, 6.0)
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([channel(5.0), channel(3.0), channel(1.0)], axis=-1)


def batched_color_jitter(
    key: jax.Array,
    imgs: jax.Array,
    brightness: float,
    contrast: float,
    saturation: float,
    hue: float,
) -> jax.Array:
    """Jitter (N, H, W, 3) float images with per-image factors, fully batched.

    One broadcasted elementwise pipeline instead of a vmap of per-image
    programs — the vmapped form cost 338 ms per 128×224² patches on v5e;
    this form fuses into a handful of VPU kernels.
    """
    N = imgs.shape[0]
    kb, kc, ks, kh, kf1, kf2 = jax.random.split(key, 6)
    shape4 = (N, 1, 1, 1)

    # factors are DRAWN in f32 (identical random stream regardless of the
    # image dtype) then cast, so a bf16 pipeline jitters with the same
    # factors an f32 one would
    def _factor(k, lo, hi):
        return jax.random.uniform(
            k, shape4, minval=lo, maxval=hi
        ).astype(imgs.dtype)

    # random H/V flips (per image)
    flip_h = jax.random.bernoulli(kf1, shape=shape4)
    flip_v = jax.random.bernoulli(kf2, shape=shape4)
    imgs = jnp.where(flip_h, imgs[:, :, ::-1, :], imgs)
    imgs = jnp.where(flip_v, imgs[:, ::-1, :, :], imgs)

    if brightness > 0:
        f = _factor(kb, max(0.0, 1.0 - brightness), 1.0 + brightness)
        imgs = jnp.clip(imgs * f, 0.0, 1.0)
    if contrast > 0:
        f = _factor(kc, max(0.0, 1.0 - contrast), 1.0 + contrast)
        mean = jnp.mean(_grayscale(imgs), axis=(1, 2), keepdims=True)[..., None]
        imgs = jnp.clip(f * imgs + (1.0 - f) * mean, 0.0, 1.0)
    if saturation > 0:
        f = _factor(ks, max(0.0, 1.0 - saturation), 1.0 + saturation)
        gray = _grayscale(imgs)[..., None]
        imgs = jnp.clip(f * imgs + (1.0 - f) * gray, 0.0, 1.0)
    if hue > 0:
        d = jax.random.uniform(
            kh, shape4[:3], minval=-hue, maxval=hue
        ).astype(imgs.dtype)
        hsv = rgb_to_hsv(imgs)
        imgs = _hsv_to_rgb_arith(
            (hsv[..., 0] + d) % 1.0, hsv[..., 1], hsv[..., 2]
        )
    return imgs


def preprocess_patches(
    images_uint8: jax.Array,
    *,
    train: bool,
    key: jax.Array | None = None,
    brightness: float = 64.0 / 255.0,
    contrast: float = 0.75,
    saturation: float = 0.25,
    hue: float = 0.04,
    dtype: Any = jnp.float32,
) -> jax.Array:
    """uint8 (..., H, W, 3) → normalized float (..., H, W, 3), jit-friendly.

    ``train=True`` applies per-image random flips + color jitter (requires
    ``key``); ``train=False`` is the deterministic eval path (ToTensor +
    Normalize only).
    """
    lead = images_uint8.shape[:-3]
    H, W, C = images_uint8.shape[-3:]
    # The whole chain runs in the model's compute dtype: in a bf16 model the
    # output is rounded to bf16 at the conv anyway, and the f32 jitter chain
    # measured ~1.7 ms/step of pure VPU work at b128x224^2 (hue HSV round
    # trip alone 0.9 ms — docs/DESIGN.md item 22's trace). Reductions inside
    # (contrast/saturation grayscale means) still accumulate f32 (jnp
    # upcasts half-precision reductions); eval and f32 models are unchanged.
    flat = images_uint8.reshape((-1, H, W, C)).astype(dtype) / jnp.asarray(
        255.0, dtype
    )
    if train:
        if key is None:
            raise ValueError("train=True requires a PRNG key")
        flat = batched_color_jitter(
            key, flat, brightness, contrast, saturation, hue
        )
    flat = normalize_imagenet(flat)
    return flat.reshape(lead + (H, W, C)).astype(dtype)
