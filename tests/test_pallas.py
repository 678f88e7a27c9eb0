"""Pallas fused dropout-matmul kernel (CPU interpreter mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodalbrainsurvival_tpu.ops.pallas import (
    apply_seeded_dropout,
    dropout_matmul,
)

RNG = np.random.default_rng(0)
X = jnp.asarray(RNG.normal(size=(100, 700)).astype(np.float32))
W = jnp.asarray(RNG.normal(size=(700, 300)).astype(np.float32))


def test_p0_is_exact_matmul():
    y = dropout_matmul(X, W, 0, 0.0, True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(X @ W), rtol=1e-4, atol=1e-3
    )


def test_mask_consistency_with_regeneration():
    """Fused result == (regenerated masked x) @ W — the backward-pass contract."""
    y = dropout_matmul(X, W, 123, 0.5, True)
    xm = apply_seeded_dropout(X, 123, p_drop=0.5, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(xm @ W), rtol=1e-4, atol=1e-3
    )


def test_keep_fraction_and_scaling():
    xm = apply_seeded_dropout(jnp.ones((256, 1024)), 9, p_drop=0.5,
                              interpret=True)
    kept = np.asarray(xm) != 0
    assert abs(kept.mean() - 0.5) < 0.02
    np.testing.assert_allclose(np.asarray(xm)[kept], 2.0, rtol=1e-6)


def test_deterministic_and_seed_sensitivity():
    a = dropout_matmul(X, W, 5, 0.5, True)
    b = dropout_matmul(X, W, 5, 0.5, True)
    c = dropout_matmul(X, W, 6, 0.5, True)
    assert bool(jnp.all(a == b))
    assert not bool(jnp.all(a == c))


def test_custom_vjp_grads():
    def loss(x, w):
        return dropout_matmul(x, w, 7, 0.5, True).sum()

    gx, gw = jax.grad(loss, argnums=(0, 1))(X, W)
    g = jnp.ones((X.shape[0], W.shape[1]))
    xm = apply_seeded_dropout(X, 7, p_drop=0.5, interpret=True)
    gx_want = apply_seeded_dropout(g @ W.T, 7, p_drop=0.5, interpret=True)
    gw_want = xm.T @ g
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_want), rtol=1e-5)


def test_fused_attention_pool_matches_module_composition():
    """fused kernel == TanhAttention + masked_bag_mean on ragged shapes."""
    from multimodalbrainsurvival_tpu.models.aggregators import TanhAttention
    from multimodalbrainsurvival_tpu.models.mil import masked_bag_mean
    from multimodalbrainsurvival_tpu.ops.pallas import fused_gated_attention_pool

    rng = np.random.default_rng(3)
    B, bag, D = 3, 13, 300  # deliberately unaligned
    x = jnp.asarray(rng.normal(size=(B, bag, D)).astype(np.float32))
    Wm = jnp.asarray((rng.normal(size=(D, D)) * 0.1).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(B, bag)) < 0.7).at[:, 0].set(True)

    agg = TanhAttention(dim=D)
    variables = {"params": {"vector": v, "linear": {"kernel": Wm}}}
    o_ref, w_ref = agg.apply(variables, x, mask=mask)
    want = masked_bag_mean(o_ref, mask)
    got, attn = fused_gated_attention_pool(x, Wm, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(w_ref), atol=1e-5)


def test_fused_attention_pool_grads_match_autodiff():
    """custom_vjp grads == jax.grad of the TanhAttention+mean composition."""
    from multimodalbrainsurvival_tpu.models.aggregators import TanhAttention
    from multimodalbrainsurvival_tpu.models.mil import masked_bag_mean
    from multimodalbrainsurvival_tpu.ops.pallas import fused_gated_attention_pool

    rng = np.random.default_rng(6)
    B, bag, D = 2, 9, 160
    x = jnp.asarray(rng.normal(size=(B, bag, D)).astype(np.float32))
    Wm = jnp.asarray((rng.normal(size=(D, D)) * 0.1).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(B, bag)) < 0.7).at[:, 0].set(True)
    agg = TanhAttention(dim=D)

    def ref_loss(x, Wm, v):
        o, _ = agg.apply(
            {"params": {"vector": v, "linear": {"kernel": Wm}}}, x, mask=mask
        )
        return (masked_bag_mean(o, mask) ** 2).sum()

    def ker_loss(x, Wm, v):
        out, _ = fused_gated_attention_pool(x, Wm, v, mask)
        return (out**2).sum()

    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(x, Wm, v)
    gk = jax.grad(ker_loss, argnums=(0, 1, 2))(x, Wm, v)
    for a, b in zip(gr, gk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_fused_attention_pool_no_mask():
    from multimodalbrainsurvival_tpu.ops.pallas import fused_gated_attention_pool

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 8, 128)).astype(np.float32))
    Wm = jnp.asarray((rng.normal(size=(128, 128)) * 0.1).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    out, attn = fused_gated_attention_pool(x, Wm, v)
    np.testing.assert_allclose(np.asarray(attn).sum(1), 1.0, rtol=1e-5)
    assert out.shape == (2, 128)


def test_unaligned_shapes_padded_correctly():
    x = jnp.asarray(RNG.normal(size=(7, 130)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(130, 17)).astype(np.float32))
    y = dropout_matmul(x, w, 0, 0.0, True)
    assert y.shape == (7, 17)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w), rtol=1e-4,
                               atol=1e-3)
