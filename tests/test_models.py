"""Model-layer tests: shapes, masking invariance, torch-parity via converter."""

import sys
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodalbrainsurvival_tpu.models import (
    AggregationModel,
    AggregationProjectModel,
    BagHistopathologyRNAModel,
    EarlyFusionMLP,
    RNAEncoder,
    RNAOnlyModel,
    TanhAttention,
    make_aggregator,
    resnet18,
    resnet50,
)

RNG = jax.random.PRNGKey(0)
REFERENCE_DIR = "/root/reference/1_HistoPathology"


def test_resnet_feature_dims():
    assert resnet18().feature_dim == 512
    assert resnet50().feature_dim == 2048


def test_mil_padded_bag_equals_unpadded():
    """A bag padded with garbage patches + mask must equal the unpadded bag."""
    rn = resnet18()
    model = AggregationModel(
        resnet=rn, aggregator=make_aggregator("attention", dim=512), aggregator_dim=512
    )
    x = jax.random.normal(RNG, (2, 2, 32, 32, 3))
    variables = model.init(RNG, x, train=False)

    out_full, _ = model.apply(variables, x, train=False)

    pad = jnp.full((2, 2, 32, 32, 3), 99.0)
    x_padded = jnp.concatenate([x, pad], axis=1)
    mask = jnp.array([[True, True, False, False]] * 2)
    out_padded, attn = model.apply(variables, x_padded, mask=mask, train=False)

    np.testing.assert_allclose(
        np.asarray(out_full), np.asarray(out_padded), rtol=2e-4, atol=1e-5
    )
    # attention on padded slots must be exactly zero
    assert np.all(np.asarray(attn)[:, 2:] == 0)


def test_tanh_attention_matches_torch_formula():
    """TanhAttention == softmax(tanh(xW)·v) weighted sum semantics
    (1_HistoPathology/models.py:22-33 composed with the bag mean)."""
    import torch

    dim, B, bag = 16, 3, 5
    x = np.random.default_rng(0).normal(size=(B, bag, dim)).astype(np.float32)
    agg = TanhAttention(dim=dim)
    variables = agg.init(RNG, jnp.array(x))
    # plant non-zero weights
    W = np.random.default_rng(1).normal(size=(dim, dim)).astype(np.float32) * 0.1
    v = np.random.default_rng(2).normal(size=(dim,)).astype(np.float32)
    variables = {"params": {"vector": jnp.array(v), "linear": {"kernel": jnp.array(W)}}}

    out, weights = agg.apply(variables, jnp.array(x))
    ours_bagmean = np.asarray(out).mean(axis=1)  # what the MIL model computes

    xt = torch.tensor(x)
    logits = torch.tanh(xt @ torch.tensor(W)) @ torch.tensor(v)[:, None]
    wt = torch.softmax(logits, dim=1)
    want = (xt * wt * bag).mean(dim=1)  # reference scales by bag size
    np.testing.assert_allclose(ours_bagmean, want.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(weights), wt.squeeze(-1).numpy(), rtol=1e-5, atol=1e-6
    )


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference repo not mounted"
)
def test_resnet50_extract_parity_with_reference_torch():
    """Convert a randomly-initialized reference torch ResNet-50 state_dict and
    check forward_extract activations match ours (eval mode, running stats)."""
    import torch

    sys.path.insert(0, REFERENCE_DIR)
    try:
        import resnet as ref_resnet  # the reference's torch fork (read-only oracle)
    finally:
        sys.path.remove(REFERENCE_DIR)

    torch.manual_seed(0)
    tmodel = ref_resnet.resnet50(pretrained=False)
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from multimodalbrainsurvival_tpu.models.convert import torch_resnet_to_flax

    variables = jax.tree.map(jnp.asarray, torch_resnet_to_flax(state))

    x = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        # reference forward_extract pools with a fixed 7x7 avgpool at 224 input;
        # for small inputs compare the pre-pool conv trunk via adaptive pooling
        t = torch.tensor(x)
        y = tmodel.conv1(t)
        y = tmodel.bn1(y)
        y = tmodel.relu(y)
        y = tmodel.maxpool(y)
        y = tmodel.layer1(y)
        y = tmodel.layer2(y)
        y = tmodel.layer3(y)
        y = tmodel.layer4(y)
        want = y.mean(dim=(2, 3)).numpy()

    model = resnet50()
    got = model.apply(
        variables, jnp.array(np.transpose(x, (0, 2, 3, 1))), train=False,
        method="extract",
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_conv1_channel_surgery():
    from multimodalbrainsurvival_tpu.models.convert import adapt_conv1_channels

    k = np.random.default_rng(0).normal(size=(7, 7, 3, 64)).astype(np.float32)
    k1 = adapt_conv1_channels(k, 1)
    assert k1.shape == (7, 7, 1, 64)
    np.testing.assert_allclose(k1[..., 0, :], k.mean(axis=2), rtol=1e-6)
    k4 = adapt_conv1_channels(k, 4)
    assert k4.shape == (7, 7, 4, 64)
    np.testing.assert_allclose(k4[..., :3, :], k, rtol=1e-6)
    noise = k4[..., 3, :]
    assert abs(noise.mean()) < 3e-4 and abs(noise.std() - 0.001) < 3e-4


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference repo not mounted"
)
def test_conv1_surgery_matches_reference_pretrained_branches():
    """Oracle: run the reference's OWN pretrained surgery
    (resnet50_1channel / resnet50_4channel, resnet.py:378-428) with
    model_zoo.load_url monkeypatched to a synthetic resnet50 state dict, and
    check adapt_conv1_channels reproduces the resulting conv1 weights —
    exactly for the 1-channel mean, exactly for the RGB slice of the
    4-channel variant, statistically (N(0, 0.001)) for its noise channel."""
    import torch

    sys.path.insert(0, REFERENCE_DIR)
    try:
        import resnet as ref_resnet
    finally:
        sys.path.remove(REFERENCE_DIR)

    torch.manual_seed(0)
    synthetic = ref_resnet.resnet50(pretrained=False).state_dict()
    orig_load_url = ref_resnet.model_zoo.load_url
    ref_resnet.model_zoo.load_url = lambda *a, **k: synthetic
    try:
        torch.manual_seed(7)
        one = ref_resnet.resnet50_1channel(pretrained=True)
        torch.manual_seed(7)
        four = ref_resnet.resnet50_4channel(pretrained=True)
    finally:
        ref_resnet.model_zoo.load_url = orig_load_url

    from multimodalbrainsurvival_tpu.models.convert import (
        _convert_conv,
        adapt_conv1_channels,
    )

    k_hwio = _convert_conv(synthetic["conv1.weight"].numpy())

    want1 = _convert_conv(one.conv1.weight.detach().numpy())
    np.testing.assert_allclose(
        adapt_conv1_channels(k_hwio, 1), want1, rtol=1e-6, atol=1e-7
    )

    want4 = _convert_conv(four.conv1.weight.detach().numpy())
    got4 = adapt_conv1_channels(k_hwio, 4)
    np.testing.assert_allclose(got4[..., :3, :], want4[..., :3, :],
                               rtol=1e-6, atol=1e-7)
    # 4th channel: reference draws from torch's global RNG; ours from a numpy
    # Generator — statistical parity (same N(0, 0.001) distribution)
    for noise in (want4[..., 3, :], got4[..., 3, :]):
        assert abs(noise.mean()) < 3e-4 and abs(noise.std() - 0.001) < 3e-4

    # every non-conv1 weight is the pretrained one, byte-identical, in BOTH
    # variants (resnet.py:392-396 filters only conv1.weight)
    for name in ("layer1.0.conv1.weight", "fc.weight", "bn1.running_mean"):
        np.testing.assert_array_equal(
            one.state_dict()[name].numpy(), synthetic[name].numpy()
        )
        np.testing.assert_array_equal(
            four.state_dict()[name].numpy(), synthetic[name].numpy()
        )


def test_rna_model_shapes_and_extract():
    model = RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(64, 32)))
    x = jnp.ones((4, 100))
    variables = model.init(RNG, x)
    assert model.apply(variables, x).shape == (4, 1)
    assert model.apply(variables, x, method="extract").shape == (4, 32)
    # dropout active in train mode
    a = model.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    b = model.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_early_fusion_structure():
    model = EarlyFusionMLP()
    x = jnp.ones((2, 4096))
    variables = model.init(RNG, x)
    assert model.apply(variables, x).shape == (2, 1)
    kernels = variables["params"]
    assert kernels["dense_0"]["kernel"].shape == (4096, 2048)
    assert kernels["dense_1"]["kernel"].shape == (2048, 200)
    assert kernels["head"]["kernel"].shape == (200, 1)


def test_joint_model_bimodal_gradients():
    """Gradients must reach both encoders (end-to-end joint training)."""
    rn = resnet18()
    model = BagHistopathologyRNAModel(
        resnet=rn, rna_encoder=RNAEncoder(hidden_dims=(32, 512))
    )
    x = jax.random.normal(RNG, (2, 2, 32, 32, 3))
    rna = jax.random.normal(RNG, (2, 50))
    variables = model.init(RNG, x, rna)

    def loss(params):
        out = model.apply({**variables, "params": params}, x, rna)
        return jnp.sum(out**2)

    grads = jax.grad(loss)(variables["params"])
    g_resnet = jax.tree_util.tree_leaves(grads["resnet"])
    g_rna = jax.tree_util.tree_leaves(grads["rna_encoder"])
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in g_resnet)
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in g_rna)


def test_project_model():
    rn = resnet18()
    model = AggregationProjectModel(
        resnet=rn,
        aggregator=make_aggregator("identity"),
        aggregator_dim=512,
        hdim=16,
    )
    x = jax.random.normal(RNG, (2, 2, 32, 32, 3))
    variables = model.init(RNG, x)
    out, _ = model.apply(variables, x)
    assert out.shape == (2, 1)
    feats, _ = model.apply(variables, x, method="extract")
    assert feats.shape == (2, 16)
    assert np.all(np.abs(np.asarray(feats)) <= 1.0)  # tanh-bounded


def test_bn_folding_matches_eval_path():
    """fold_bn variables + model == stock eval forward (f32, realistic stats)."""
    from flax import traverse_util

    from multimodalbrainsurvival_tpu.models.folding import fold_resnet_variables

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    m = resnet18()
    v = m.init(RNG, x[:1], train=False)
    flat = traverse_util.flatten_dict(v["batch_stats"])
    key = jax.random.PRNGKey(2)
    for k in flat:
        key, sub = jax.random.split(key)
        if k[-1] == "mean":
            flat[k] = flat[k] + 0.1 * jax.random.normal(sub, flat[k].shape)
        else:
            flat[k] = flat[k] * jnp.exp(0.2 * jax.random.normal(sub, flat[k].shape))
    v = {"params": v["params"], "batch_stats": traverse_util.unflatten_dict(flat)}

    want = m.apply(v, x, train=False, method="extract")
    folded = fold_resnet_variables(v)
    assert "batch_stats" not in folded
    got = resnet18(fold_bn=True).apply(folded, x, train=False, method="extract")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_in_channels_is_enforced():
    """rnone/rnfour (reference resnet.py:167-315) must reject inputs whose
    channel count contradicts the variant — a wrong count would silently
    train a fresh incompatible stem (VERDICT r1 weak item 7)."""
    from multimodalbrainsurvival_tpu.models.resnet import rnfour, rnone

    m = rnone("resnet18")
    with pytest.raises(ValueError, match="in_channels=1"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), train=False)
    m4 = rnfour("resnet18")
    with pytest.raises(ValueError, match="in_channels=4"):
        m4.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)


def test_remat_blocks_is_numerically_identical():
    """remat_blocks=True (per-block jax.checkpoint, the full-slide memory
    lever) must change NOTHING numerically: same param/batch_stats tree,
    same forward, bitwise-same grads and BN running-stat updates — it only
    changes what the backward pass rematerializes."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    plain = resnet18()
    remat = resnet18(remat_blocks=True)
    v = plain.init(jax.random.PRNGKey(4), x, train=False)
    assert (
        jax.tree_util.tree_structure(v)
        == jax.tree_util.tree_structure(
            remat.init(jax.random.PRNGKey(4), x, train=False)
        )
    )

    def loss_fn(model, params):
        out, upd = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out**2), upd["batch_stats"]

    (l0, bs0), g0 = jax.jit(
        jax.value_and_grad(lambda p: loss_fn(plain, p), has_aux=True)
    )(v["params"])
    (l1, bs1), g1 = jax.jit(
        jax.value_and_grad(lambda p: loss_fn(remat, p), has_aux=True)
    )(v["params"])
    assert float(l0) == float(l1)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        (g0, bs0), (g1, bs1),
    )


def test_selective_stage_remat_is_numerically_identical():
    """remat_blocks=[1, 2] (selective per-stage checkpointing, the
    backward-traffic lever for the fat early-stage activations) must be
    numerically identical to the plain model, like full remat."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    plain = resnet18()
    remat = resnet18(remat_blocks=[1, 2])
    v = plain.init(jax.random.PRNGKey(4), x, train=False)
    assert (
        jax.tree_util.tree_structure(v)
        == jax.tree_util.tree_structure(
            remat.init(jax.random.PRNGKey(4), x, train=False)
        )
    )

    def loss_fn(model, params):
        out, upd = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out**2), upd["batch_stats"]

    (l0, bs0), g0 = jax.jit(
        jax.value_and_grad(lambda p: loss_fn(plain, p), has_aux=True)
    )(v["params"])
    (l1, bs1), g1 = jax.jit(
        jax.value_and_grad(lambda p: loss_fn(remat, p), has_aux=True)
    )(v["params"])
    assert float(l0) == float(l1)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        (g0, bs0), (g1, bs1),
    )


def test_remat_blocks_scalar_and_malformed_values():
    """Code-review regression: truthy scalars (the repo's 0/1-as-bool
    convention, e.g. `"remat": 1`) mean full remat; strings and
    out-of-range stage numbers fail loudly instead of silently."""
    x = jnp.zeros((1, 32, 32, 3))
    # 1 behaves like True (init succeeds, same tree as plain)
    v1 = resnet18(remat_blocks=1).init(jax.random.PRNGKey(0), x, train=False)
    v0 = resnet18().init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v1)
            == jax.tree_util.tree_structure(v0))
    with pytest.raises(ValueError, match="string"):
        resnet18(remat_blocks="12").init(jax.random.PRNGKey(0), x,
                                         train=False)
    with pytest.raises(ValueError, match="out of range"):
        resnet18(remat_blocks=[5]).init(jax.random.PRNGKey(0), x,
                                        train=False)


def test_batchnorm_near_constant_channel_is_nan_free():
    """E[x2]-E[x]2 rounds below zero for a near-constant channel with a
    large mean; the train-mode variance clamp keeps rsqrt finite (torch can
    never produce a negative batch variance)."""
    from multimodalbrainsurvival_tpu.models.resnet import TorchBatchNorm

    bn = TorchBatchNorm(use_running_average=False)
    # constant 33.3 per channel: f32 E[x^2] - (E[x])^2 lands at ~-1e-4
    x = jnp.full((4, 7, 7, 8), 33.3, jnp.float32)
    v = bn.init(jax.random.PRNGKey(0), x)
    y, upd = bn.apply(v, x, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(y)).all()
    assert np.isfinite(np.asarray(upd["batch_stats"]["var"])).all()
    assert (np.asarray(upd["batch_stats"]["var"]) >= 0).all()


def test_preprocess_runs_in_model_compute_dtype():
    """The augmentation/normalize chain materializes in the model's compute
    dtype (bf16 models stop paying an f32 jitter chain the conv rounds
    away); f32 models and the int8 adapters (calibrated on f32 pixels) are
    unchanged. docs/DESIGN.md item 22."""
    from types import SimpleNamespace

    from multimodalbrainsurvival_tpu.models import resnet as R
    from multimodalbrainsurvival_tpu.ops.image import preprocess_patches
    from multimodalbrainsurvival_tpu.train.adapters import (
        MILAdapter,
        QuantTrunkMILAdapter,
        QuantizedMILAdapter,
    )

    u8 = np.random.default_rng(0).integers(0, 255, (2, 8, 8, 3), np.uint8)
    assert preprocess_patches(jnp.asarray(u8), train=False).dtype == jnp.float32
    out = preprocess_patches(
        jnp.asarray(u8), train=True, key=jax.random.PRNGKey(0),
        dtype=jnp.bfloat16,
    )
    assert out.dtype == jnp.bfloat16

    def mk(dtype):
        # the adapters read only model.resnet.dtype for this decision
        return SimpleNamespace(resnet=R.resnet18(dtype=dtype))

    assert MILAdapter(model=mk(jnp.bfloat16))._preprocess_dtype() == jnp.bfloat16
    assert MILAdapter(model=mk(jnp.float32))._preprocess_dtype() == jnp.float32
    # quantized adapters pin f32: their scales were calibrated on f32 pixels
    assert (QuantizedMILAdapter(model=mk(jnp.bfloat16))._preprocess_dtype()
            == jnp.float32)
    assert (QuantTrunkMILAdapter(model=mk(jnp.bfloat16))._preprocess_dtype()
            == jnp.float32)


def test_freeze_bn_semantics():
    """`freeze_bn: true` (FrozenBatchNorm fine-tuning, opt-in — DESIGN item
    26): in train mode BN normalizes with the RUNNING stats (train forward
    == eval forward), the stats never update, gamma/beta still receive
    gradients, and the result differs from train-mode batch-stat BN."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    from multimodalbrainsurvival_tpu.models import resnet18

    m = resnet18(freeze_bn=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    # perturb running stats away from init so "uses running stats" is visible
    v = {"params": v["params"],
         "batch_stats": jax.tree.map(lambda a: a + 0.1, v["batch_stats"])}

    def loss(p, bs):
        out, upd = m.apply({"params": p, "batch_stats": bs}, x, train=True,
                           mutable=["batch_stats"], method="extract")
        return out.sum(), upd["batch_stats"]

    (_, new_stats), grads = jax.value_and_grad(loss, has_aux=True)(
        v["params"], v["batch_stats"]
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(v["batch_stats"]),
        jax.tree_util.tree_leaves_with_path(new_stats),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"stats updated: {jax.tree_util.keystr(pa)}",
        )
    assert float(np.abs(np.asarray(grads["bn1"]["scale"])).sum()) > 0
    assert float(np.abs(np.asarray(grads["bn1"]["bias"])).sum()) > 0

    # train forward IS the eval forward under freeze_bn ...
    out_train, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                           method="extract")
    out_eval = m.apply(v, x, train=False, method="extract")
    np.testing.assert_array_equal(np.asarray(out_train), np.asarray(out_eval))
    # ... and differs from the reference's train-mode batch-stat BN
    out_ref, _ = resnet18().apply(v, x, train=True, mutable=["batch_stats"],
                                  method="extract")
    assert not np.allclose(np.asarray(out_train), np.asarray(out_ref))
