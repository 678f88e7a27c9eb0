"""Pallas kernels (CPU interpreter mode): attention pool + fused stage."""

import numpy as np
import jax
import jax.numpy as jnp

RNG = np.random.default_rng(0)


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


# ---------- fused bottleneck stage (serving path) ----------


def test_fused_bottleneck_stage_matches_xla_blocks():
    """Kernel math check on small shapes: chain of two folded bottleneck
    blocks (first with projection residual) vs plain jnp ops."""
    from multimodalbrainsurvival_tpu.ops.pallas.fused_stage import (
        fused_bottleneck_stage,
    )

    rng = np.random.default_rng(0)
    B, H, W, cin, cm, cout = 2, 8, 8, 16, 8, 32

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape, scale=0.2).astype(np.float32))

    blocks = []
    for j in range(2):
        blk = {
            "w1": mk((1, 1, cin if j == 0 else cout, cm)), "b1": mk((cm,)),
            "w2": mk((3, 3, cm, cm)), "b2": mk((cm,)),
            "w3": mk((1, 1, cm, cout)), "b3": mk((cout,)),
        }
        if j == 0:
            blk["wd"], blk["bd"] = mk((1, 1, cin, cout)), mk((cout,))
        blocks.append(blk)
    x = mk((B, H, W, cin))

    def conv(x, w, b, padding="SAME"):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y + b

    ref = x
    for j, blk in enumerate(blocks):
        y = jax.nn.relu(conv(ref, blk["w1"], blk["b1"]))
        y = jax.nn.relu(conv(y, blk["w2"], blk["b2"], ((1, 1), (1, 1))))
        y = conv(y, blk["w3"], blk["b3"])
        r = conv(ref, blk["wd"], blk["bd"]) if "wd" in blk else ref
        ref = jax.nn.relu(y + r)

    got = fused_bottleneck_stage(x, blocks, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_folded_extract_matches_stock():
    """The kernel-accelerated serving forward (models/serving.py) equals the
    stock folded ResNet-50 extract (f32, interpret mode; the bf16 on-chip
    check lives in the serving bench)."""
    from multimodalbrainsurvival_tpu.models import resnet50
    from multimodalbrainsurvival_tpu.models.folding import fold_resnet_variables
    from multimodalbrainsurvival_tpu.models.serving import fused_folded_extract

    stock = resnet50(dtype=jnp.float32)
    v = fold_resnet_variables(
        stock.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False
        )
    )
    model = resnet50(dtype=jnp.float32, fold_bn=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 224, 224, 3)).astype(np.float32))
    ref = model.apply(v, x, train=False, method="extract")
    got = fused_folded_extract(v, x, interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-6 * max(scale, 1.0)
    )
