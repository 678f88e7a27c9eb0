"""Pallas TPU kernel: matmul with dropout fused into the LHS load.

Motivation: the RNA encoder's hot path is ``dropout(x) @ W`` with
``W ∈ 12778×4096`` (``models/rna.py``; reference builds it at
``2_GeneExpression/1_GeneExpress_train.py:247-257``). Stock XLA materializes
the dropout mask (a ``(B, 12778)`` uint8/bool array) plus the masked ``x`` in
HBM before the matmul. This kernel generates the mask *inside* the matmul
tiles with a stateless counter-based hash (identical on TPU and in the CPU
interpreter) — zero extra HBM traffic, and the masked multiply rides the MXU
pipeline.

Determinism contract: the mask for LHS block ``(i, k)`` is a pure function of
``(seed, i, k)`` — independent of the N-tile index ``j``, so every output
column block sees the same mask, and independent of grid iteration order. The
same contract lets the backward pass *regenerate* the mask instead of storing
it:

    y = M ⊙ x @ W            (M = mask/keep, regenerated from seed)
    dx = M ⊙ (g @ Wᵀ)        (same seed → same M)
    dW = (M ⊙ x)ᵀ @ g

so ``dropout_matmul`` is a ``jax.custom_vjp`` whose residuals are just
``(x, W, seed)``.

Grid: ``(M/bm, N/bn, K/bk)`` with K innermost; the output block is revisited
across K and accumulated in f32 (MXU ``preferred_element_type``). Shapes are
zero-padded to block multiples in the wrapper (padded K rows are dropped by
the zero padding itself).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# block sizes shared by the matmul and mask-regeneration kernels — the mask
# determinism contract depends on these being identical everywhere.
# Large BN/BK cut the number of N-tiles (the mask is regenerated and the x
# block re-read once per N-tile) — measured 1.5x faster than 128/512 tiles.
BM, BN, BK = 128, 512, 2048


def _keep_threshold(p_drop: float) -> int:
    # keep iff bits >= threshold  (P(keep) = 1 - p)
    return min(int(p_drop * (1 << 32)), (1 << 32) - 1)


def _mask_block(shape, threshold: int, seed, i, k):
    """Stateless counter-based keep-mask for LHS block (i, k).

    A 32-bit finalizer hash of (seed, global element index) — identical on
    TPU and in the CPU interpreter (no pltpu PRNG state), and by construction
    independent of the N-tile index and of grid iteration order.
    """
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    gidx = (i.astype(jnp.uint32) * shape[0] + r) * jnp.uint32(1 << 16) + (
        k.astype(jnp.uint32) * shape[1] + c
    )
    h = gidx ^ (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B1))
    # murmur3-style finalizer
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h >= jnp.uint32(threshold)


def _dropout_matmul_kernel(seed_ref, x_ref, w_ref, out_ref, *, p_drop, nk):
    i = pl.program_id(0)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    x_blk = x_ref[...]
    if p_drop > 0.0:
        keep = _mask_block(
            x_blk.shape, _keep_threshold(p_drop), seed_ref[0], i, k
        )
        scale = 1.0 / (1.0 - p_drop)
        x_blk = jnp.where(keep, x_blk * scale, 0.0)
    out_ref[...] += jnp.dot(
        x_blk, w_ref[...], preferred_element_type=jnp.float32
    )


def _apply_dropout_kernel(seed_ref, x_ref, out_ref, *, p_drop, nk):
    i = pl.program_id(0)
    k = pl.program_id(1)
    x_blk = x_ref[...]
    keep = _mask_block(
        x_blk.shape, _keep_threshold(p_drop), seed_ref[0], i, k
    )
    scale = 1.0 / (1.0 - p_drop)
    out_ref[...] = jnp.where(keep, x_blk * scale, 0.0)


def _pad_to(x, m0, m1):
    p0 = (-x.shape[0]) % m0
    p1 = (-x.shape[1]) % m1
    if p0 or p1:
        x = jnp.pad(x, ((0, p0), (0, p1)))
    return x


def _cdiv(a, b):
    return -(-a // b)


def _resolve_interpret(interpret):
    # Pallas TPU kernels need the interpreter on CPU backends (tests, CPU dev)
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


@partial(jax.jit, static_argnames=("p_drop", "interpret"))
def apply_seeded_dropout(x, seed, *, p_drop: float, interpret: bool | None = None):
    """Standalone mask application with the SAME per-block mask as
    ``dropout_matmul`` (used by its backward pass)."""
    interpret = _resolve_interpret(interpret)
    if p_drop <= 0.0:
        return x
    M, K = x.shape
    xp = _pad_to(x, BM, BK)
    nk = _cdiv(K, BK)
    grid = (xp.shape[0] // BM, nk)
    out = pl.pallas_call(
        partial(_apply_dropout_kernel, p_drop=p_drop, nk=nk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BM, BK), lambda i, k, *_: (i, k)),
            ],
            out_specs=pl.BlockSpec((BM, BK), lambda i, k, *_: (i, k)),
        ),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), xp)
    return out[:M, :K]


def _forward(x, w, seed, p_drop: float, interpret: bool | None):
    interpret = _resolve_interpret(interpret)
    M, K = x.shape
    K2, N = w.shape
    assert K == K2, (x.shape, w.shape)
    xp = _pad_to(x, BM, BK)
    wp = _pad_to(w, BK, BN)
    nk = xp.shape[1] // BK
    grid = (xp.shape[0] // BM, wp.shape[1] // BN, nk)
    out = pl.pallas_call(
        partial(_dropout_matmul_kernel, p_drop=p_drop, nk=nk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BM, BK), lambda i, j, k, *_: (i, k)),
                pl.BlockSpec((BK, BN), lambda i, j, k, *_: (k, j)),
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda i, j, k, *_: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (xp.shape[0], wp.shape[1]), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * xp.shape[0] * xp.shape[1] * wp.shape[1],
            bytes_accessed=(
                xp.size * xp.dtype.itemsize
                + wp.size * wp.dtype.itemsize
                + xp.shape[0] * wp.shape[1] * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), xp, wp)
    return out[:M, :N]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def dropout_matmul(x, w, seed, p_drop: float = 0.5, interpret: bool | None = None):
    """``dropout(x, p_drop; seed) @ w`` with the mask fused into the matmul.

    Args:
      x: (M, K) activations.
      w: (K, N) weights.
      seed: int32 scalar; same seed → same mask (fully deterministic).
      p_drop: drop probability (0 disables dropout, exact matmul).
      interpret: run in the Pallas interpreter (CPU testing).
    Returns (M, N) float32.
    """
    return _forward(x, w, seed, p_drop, interpret)


def _fwd(x, w, seed, p_drop, interpret):
    return _forward(x, w, seed, p_drop, interpret), (x, w, seed)


def _bwd(p_drop, interpret, residuals, g):
    x, w, seed = residuals
    g = g.astype(jnp.float32)
    if p_drop > 0.0:
        masked_x = apply_seeded_dropout(x, seed, p_drop=p_drop,
                                        interpret=interpret)
        dx_raw = g @ w.astype(jnp.float32).T
        dx = apply_seeded_dropout(dx_raw, seed, p_drop=p_drop,
                                  interpret=interpret)
        dw = masked_x.astype(jnp.float32).T @ g
    else:
        dx = g @ w.astype(jnp.float32).T
        dw = x.astype(jnp.float32).T @ g
    return dx.astype(x.dtype), dw.astype(w.dtype), None


dropout_matmul.defvjp(_fwd, _bwd)
