"""Pallas TPU kernel: fused gated tanh-attention bag pooling.

Computes the whole MIL aggregation for the ``attention`` aggregator in one
kernel pass per sample:

    logits_t = tanh(x_t W) · v          (bag × D×D matmul on the MXU)
    w = softmax_bag(masked logits)
    out = Σ_t w_t x_t                   (attention-weighted bag mean)

— i.e. exactly ``TanhAttention`` followed by ``masked_bag_mean``
(``models/aggregators.py`` / ``models/mil.py``; reference semantics at
``1_HistoPathology/models.py:22-33`` + ``:56``). Stock XLA materializes the
(B, bag, D) projection, the tanh, and the rescaled (B, bag, D) product in
HBM; here the per-sample patch block ``x_i`` stays resident in VMEM while W
streams through in column tiles: one HBM read of x per sample, logits
accumulated in scratch, softmax + weighted sum computed in the final tile
step.

Grid ``(B, D/BJ)``: sample-major, projection-column tiles inner. The bag axis
is padded to a multiple of 8 (masked), D to a multiple of 128 (zero-padded —
zero columns contribute tanh(0)·v = 0).

Training-ready: ``fused_gated_attention_pool`` carries an analytic
``custom_vjp`` (masked-softmax + tanh-gate backward in stock jnp,
recomputing the cheap logits instead of storing kernel state), verified
against autodiff of the module composition.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BJ = 256  # projection-column tile


def _kernel(x_ref, w_ref, v_ref, mask_ref, out_ref, attn_ref, logits):
    # x_ref (1, bag, D); mask_ref (1, 1, bag); out_ref (1, 1, D);
    # attn_ref (1, 1, bag); logits scratch (1, bag). 3-D single-row blocks
    # keep the trailing two dims equal to full array dims (TPU block rule).
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    x = x_ref[0]  # (bag, D)
    # attention logits are softmax-amplified, so the projection runs at full
    # f32 MXU precision (TPU default bf16-multiply perturbs pooled outputs by
    # ~1e-2 — measured against a float64 golden; XLA has the same issue at
    # default precision)
    h = jnp.tanh(
        jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    )  # (bag, BJ)
    part = h @ v_ref[...].T  # (bag, 1)

    @pl.when(j == 0)
    def _():
        logits[...] = jnp.zeros_like(logits)

    logits[...] += part.T  # (1, bag)

    @pl.when(j == nj - 1)
    def _():
        m = mask_ref[0]  # (1, bag) bool
        l = jnp.where(m, logits[...], -1e30)
        lmax = jnp.max(l, axis=1, keepdims=True)
        e = jnp.where(m, jnp.exp(l - lmax), 0.0)  # (1, bag)
        denom = jnp.maximum(jnp.sum(e), 1e-30)
        weights = e / denom
        attn_ref[0] = weights
        out_ref[0] = jnp.dot(
            weights, x.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (1, D)


def _pool_forward(
    x: jax.Array,
    W: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    *,
    interpret: bool | None = None,
):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, bag, D = x.shape
    if mask is None:
        mask = jnp.ones((B, bag), bool)

    pad_bag = (-bag) % 8
    pad_d = (-D) % 128
    if pad_bag or pad_d:
        x = jnp.pad(x, ((0, 0), (0, pad_bag), (0, pad_d)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_bag)))
        W = jnp.pad(W, ((0, pad_d), (0, pad_d)))
        v = jnp.pad(v, ((0, pad_d),))
    bag_p, D_p = bag + pad_bag, D + pad_d
    nj = D_p // BJ if D_p % BJ == 0 else -(-D_p // BJ)
    # pad D_p up to a BJ multiple for clean tiling
    pad_j = nj * BJ - D_p
    if pad_j:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_j)))
        W = jnp.pad(W, ((0, pad_j), (0, pad_j)))
        v = jnp.pad(v, ((0, pad_j),))
        D_p += pad_j

    out, attn = pl.pallas_call(
        _kernel,
        grid=(B, D_p // BJ),
        in_specs=[
            pl.BlockSpec((1, bag_p, D_p), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((D_p, BJ), lambda i, j: (0, j)),
            pl.BlockSpec((1, BJ), lambda i, j: (0, j)),
            pl.BlockSpec((1, 1, bag_p), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, D_p), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, bag_p), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, D_p), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, bag_p), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, bag_p), jnp.float32)],
        interpret=interpret,
    )(x, W, v.reshape(1, -1), mask[:, None, :])
    return out[:, 0, :D], attn[:, 0, :bag]


@jax.custom_vjp
def fused_gated_attention_pool(x, W, v, mask=None):
    """(B, bag, D), (D, D), (D,), (B, bag) → ((B, D) pooled, (B, bag) weights).

    Pallas forward (see module docstring); analytic backward in stock jnp
    (recomputes the small logits from residuals — no kernel state stored), so
    the op composes with ``jax.grad`` for training on very large bags.
    """
    return _pool_forward(x, W, v, mask)


def _pool_fwd(x, W, v, mask):
    out, attn = _pool_forward(x, W, v, mask)
    return (out, attn), (x, W, v, mask, attn)


def _pool_bwd(residuals, cotangents):
    x, W, v, mask, w = residuals
    g_out, g_attn = cotangents
    x32 = x.astype(jnp.float32)
    # backward matmuls pinned to f32 like the forward kernel (default TPU
    # bf16-multiply perturbs these softmax-amplified quantities by ~1e-2)
    HI = jax.lax.Precision.HIGHEST
    h = jnp.einsum("btd,de->bte", x32, W.astype(jnp.float32), precision=HI)
    th = jnp.tanh(h)
    sech2 = 1.0 - th * th

    # dL/dw_t: direct path through out plus any explicit attn cotangent
    g_w = jnp.einsum("bd,btd->bt", g_out.astype(jnp.float32), x32)
    if g_attn is not None:
        g_w = g_w + g_attn.astype(jnp.float32)
    # masked-softmax backward: dl_t = w_t (g_w_t - Σ_s w_s g_w_s)
    dl = w * (g_w - jnp.sum(w * g_w, axis=1, keepdims=True))
    if mask is not None:
        dl = jnp.where(mask, dl, 0.0)

    vs = sech2 * v[None, None, :]           # (B, bag, D) — v ⊙ sech²(h)
    # dx: direct pooling path + logits path
    dx = w[..., None] * g_out[:, None, :].astype(jnp.float32)
    dx = dx + dl[..., None] * jnp.einsum(
        "de,bte->btd", W.astype(jnp.float32), vs, precision=HI
    )
    dW = jnp.einsum("btd,bt,bte->de", x32, dl, vs, precision=HI)
    dv = jnp.einsum("bt,btd->d", dl, th, precision=HI)
    return dx.astype(x.dtype), dW.astype(W.dtype), dv.astype(v.dtype), None


fused_gated_attention_pool.defvjp(_pool_fwd, _pool_bwd)
