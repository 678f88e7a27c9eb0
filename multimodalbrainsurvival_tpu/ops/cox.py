"""Cox proportional-hazards partial-likelihood loss, TPU-native.

The reference implements the batch-local Cox partial likelihood by sorting the
batch by descending event time and accumulating ``log(cumsum(exp(score)) + 1e-5)``
(reference ``1_HistoPathology/models.py:90-118``; duplicated in
``2_GeneExpression/models.py:24-45``, ``3_EarlyFusion/models.py:24-45`` and
``5_JointFusion/models.py:119-147``). Two semantically load-bearing quirks of
that implementation:

1. the ``+1e-5`` inside the log (a scale-dependent distortion after the
   max-subtraction), and
2. ``.mean()`` over the FULL batch — censored samples contribute 0 to the
   numerator but still count in the denominator.

Both are replicated exactly under ``reference_parity=True`` so risk scores /
losses can be compared against the reference bit-for-bit-ish. With
``reference_parity=False`` a numerically corrected variant is used: an exact
streaming ``logcumsumexp`` (associative scan — O(log n) depth, XLA-friendly)
and normalization by the number of observed events (the standard estimator).

TPU-first design notes
----------------------
- Everything is static-shape and jit-safe: padded batches are supported via a
  boolean ``mask``; padded rows are given time ``-inf`` so a stable argsort on
  ``-times`` places them last, their ``exp`` contribution is zeroed, and the
  mean divides by the real row count only.
- The risk set couples every sample in the **global** batch. Under a
  data-parallel ``Mesh`` the loss is simply computed on the logically-global
  arrays inside ``jit``; XLA inserts the (cheap — 3 scalars/row) all-gather of
  ``(score, time, event)`` before the sort. No hand-written collective is
  needed, and per-device semantics are identical to the reference's
  single-device batch. See ``parallel/sharding.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def logcumsumexp(x: jax.Array, axis: int = -1) -> jax.Array:
    """Numerically stable running log-sum-exp along ``axis``.

    Implemented as a ``jax.lax.associative_scan`` of the pairwise
    ``logaddexp`` combiner, giving O(log n) depth — the TPU-native equivalent
    of the reference's sequential ``log(cumsum(exp(x)))``.
    """
    return jax.lax.associative_scan(jnp.logaddexp, x, axis=axis)


def cox_partial_likelihood_loss(
    scores: jax.Array,
    times: jax.Array,
    events: jax.Array,
    mask: jax.Array | None = None,
    *,
    reference_parity: bool = True,
    eps: float = 1e-5,
) -> jax.Array:
    """Negative Cox partial log-likelihood of a batch of risk scores.

    Args:
      scores: ``(B,)`` predicted risk scores (higher = higher hazard).
      times: ``(B,)`` event-or-censoring times.
      events: ``(B,)`` event indicator (1 = death observed, 0 = censored).
      mask: optional ``(B,)`` validity mask for padded rows (True = real row).
      reference_parity: replicate the reference's exact semantics
        (``1_HistoPathology/models.py:90-118``): max-subtraction, plain
        ``log(cumsum(exp(.)) + eps)`` and mean over all (real) rows. When
        False, use exact ``logcumsumexp`` and normalize by the number of
        events.
      eps: the reference's ``1e-5`` additive constant (parity mode only).

    Returns:
      Scalar loss.
    """
    scores = scores.reshape(-1).astype(jnp.float32)
    times = times.reshape(-1).astype(jnp.float32)
    events = events.reshape(-1).astype(jnp.float32)
    if mask is None:
        valid = jnp.ones_like(scores, dtype=bool)
    else:
        valid = mask.reshape(-1).astype(bool)

    # Sort by descending time; padded rows (time -> -inf) land at the end so
    # they never enter a real row's risk-set cumsum. jnp.argsort is stable,
    # so tied times keep their batch order (the reference relies on
    # torch.sort's order for ties; distinct times are bit-identical).
    neg_inf = jnp.float32(-jnp.inf)
    sort_key = jnp.where(valid, -times, jnp.float32(jnp.inf))
    order = jnp.argsort(sort_key, stable=True)
    s = scores[order]
    e = events[order]
    v = valid[order]

    # Max over real rows only (pads must not shift the stabilizer).
    s_masked = jnp.where(v, s, neg_inf)
    s_max = jnp.max(s_masked)
    shifted = jnp.where(v, s - s_max, neg_inf)

    if reference_parity:
        exp_s = jnp.where(v, jnp.exp(shifted), 0.0)
        log_risk = jnp.log(jnp.cumsum(exp_s) + eps)
        ll = (shifted - log_risk) * e * v
        denom = jnp.maximum(jnp.sum(v.astype(jnp.float32)), 1.0)
        return -jnp.sum(ll) / denom
    else:
        log_risk = logcumsumexp(shifted)
        ll = jnp.where(v & (e > 0), shifted - log_risk, 0.0)
        n_events = jnp.sum(jnp.where(v, e, 0.0))
        return -jnp.sum(ll) / jnp.maximum(n_events, 1.0)
