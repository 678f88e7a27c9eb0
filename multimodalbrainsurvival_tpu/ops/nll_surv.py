"""Discrete-time survival negative log-likelihood (Zadeh & Schmid 2020).

Functional JAX implementation of the loss the reference exposes as
``NLLSurvLoss`` (``1_HistoPathology/models.py:121-232``, itself adapted from
mahmoodlab/PORPOISE). Semantics preserved:

- ``hazards = sigmoid(h)``; ``S = cumprod(1 - hazards)`` along the bin axis;
- ``S`` is left-padded with 1 so ``S_padded[y]`` is the survival *entering*
  bin ``y``;
- uncensored rows (``c == 0``) pay ``-(log S_padded[y] + log hazards[y])``,
  censored rows pay ``-(1 - alpha) * log S_padded[y + 1]``;
- all gathered probabilities are clamped at ``eps`` before the log.

Extended with a ``mask`` argument for statically padded batches (reference had
no padding; pads contribute 0 and are excluded from the mean).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nll_surv_loss(
    h: jax.Array,
    y: jax.Array,
    c: jax.Array,
    mask: jax.Array | None = None,
    *,
    alpha: float = 0.0,
    eps: float = 1e-7,
    reduction: str = "mean",
) -> jax.Array:
    """Negative log-likelihood for discrete time-to-event bins.

    Args:
      h: ``(B, K)`` raw logits; per-bin hazard is ``sigmoid(h)``.
      y: ``(B,)`` integer ground-truth bin index in ``[0, K)``.
      c: ``(B,)`` censoring indicator (1 = censored/alive, 0 = death observed).
      mask: optional ``(B,)`` validity mask (True = real row).
      alpha: down-weights the censored term by ``(1 - alpha)``.
      eps: clamp floor before taking logs.
      reduction: ``'mean'`` | ``'sum'`` | ``'none'``.
    """
    h = h.astype(jnp.float32)
    B = h.shape[0]
    y = y.reshape(B, 1).astype(jnp.int32)
    c = c.reshape(B, 1).astype(jnp.float32)

    hazards = jax.nn.sigmoid(h)
    S = jnp.cumprod(1.0 - hazards, axis=1)
    S_padded = jnp.concatenate([jnp.ones((B, 1), jnp.float32), S], axis=1)

    s_prev = jnp.clip(jnp.take_along_axis(S_padded, y, axis=1), min=eps)
    h_this = jnp.clip(jnp.take_along_axis(hazards, y, axis=1), min=eps)
    s_this = jnp.clip(jnp.take_along_axis(S_padded, y + 1, axis=1), min=eps)

    uncensored = -(1.0 - c) * (jnp.log(s_prev) + jnp.log(h_this))
    censored = -c * jnp.log(s_this)
    loss = (1.0 - alpha) * censored + uncensored  # (B, 1)
    loss = loss.reshape(B)

    if mask is not None:
        m = mask.reshape(B).astype(jnp.float32)
        loss = loss * m
        n = jnp.maximum(jnp.sum(m), 1.0)
    else:
        n = jnp.float32(B)

    if reduction == "mean":
        return jnp.sum(loss) / n
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "none":
        return loss
    raise ValueError(f"Bad reduction: {reduction!r}")
