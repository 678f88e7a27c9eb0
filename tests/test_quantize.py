"""int8 (W8A8) post-training quantization of the ResNet serving path.

Pins, for ``models/quantize.py``:

- the calibration forward (``float_extract_amax``) IS the folded float
  extract — bit-identical features, so the calibrated ranges see exactly
  the serving numerics;
- requantization commutes with the int8 stem max-pool (monotonicity);
- the quantized embedding tracks the float one (per-sample cosine) on both
  calibration and held-out data, across bottleneck (resnet50) and basic
  (resnet18) archs and the 1-channel RNone variant;
- ``quantize_mil_resnet`` + ``QuantizedMILAdapter`` compose on a real MIL
  model (uint8 bags, masks, eval preprocessing);
- the adapter refuses train mode (the int8 path is serving-only).

The numeric deviation from reference semantics
(``1_HistoPathology/resnet.py:151-165``) is deliberate and opt-in; these
thresholds are the contract the ``quantize: "int8"`` config key promises.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from multimodalbrainsurvival_tpu.models.folding import fold_resnet_variables
from multimodalbrainsurvival_tpu.models.quantize import (
    float_extract_amax,
    merge_amax,
    quantize_mil_resnet,
    quantize_resnet,
    quantized_extract,
)
from multimodalbrainsurvival_tpu.models.resnet import RESNET_CONSTRUCTORS


def _folded_variables(arch, in_ch=3, size=32, fold_bn=False):
    """Random-init stock ResNet with realistic (randomized) BN stats,
    folded for serving. Returns (folded_variables, fold_bn_model)."""
    model = RESNET_CONSTRUCTORS[arch](in_channels=in_ch)
    v = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, in_ch)), train=False
    )
    flat = traverse_util.flatten_dict(v["batch_stats"])
    key = jax.random.PRNGKey(2)
    for k in flat:
        key, sub = jax.random.split(key)
        if k[-1] == "mean":
            flat[k] = flat[k] + 0.1 * jax.random.normal(sub, flat[k].shape)
        else:
            flat[k] = flat[k] * jnp.exp(
                0.2 * jax.random.normal(sub, flat[k].shape)
            )
    v = {
        "params": v["params"],
        "batch_stats": traverse_util.unflatten_dict(flat),
    }
    return (
        fold_resnet_variables(v),
        RESNET_CONSTRUCTORS[arch](in_channels=in_ch, fold_bn=True),
    )


def _cosines(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    num = np.sum(a * b, axis=-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / np.maximum(den, 1e-30)


@pytest.mark.parametrize("arch", ["resnet18", "resnet50"])
def test_float_extract_amax_is_the_folded_extract(arch):
    """The calibration forward must be numerically the serving forward —
    otherwise the recorded activation ranges calibrate the wrong network."""
    fv, fold_model = _folded_variables(arch)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 32, 32, 3)).astype(np.float32))
    feats, amax = float_extract_amax(fv, x, arch=arch)
    want = fold_model.apply(fv, x, train=False, method="extract")
    np.testing.assert_array_equal(np.asarray(feats), np.asarray(want))
    # one range per conv-input site (stem input, post-relu intermediates,
    # every block output) PLUS the pre-activation residual-branch sites
    # (.t per block, .skip per downsample block) the narrow-boundary int8
    # forward stores at their own scales
    amax = jax.device_get(amax)
    assert "in" in amax and "stem" in amax
    n_blocks = sum(
        (2, 2, 2, 2) if arch == "resnet18" else (3, 4, 6, 3)
    )
    per_block = 3 if arch == "resnet18" else 4  # r1[,r2],t,out
    n_downsample = 3 if arch == "resnet18" else 4  # resnet50: layer1_0 too
    assert len(amax) == 2 + per_block * n_blocks + n_downsample
    assert all(np.asarray(v) > 0 for v in amax.values())


def test_requant_commutes_with_int8_maxpool():
    """The stem max-pool runs in the int8 domain; valid because requant
    (scale + round + clip) is monotone non-decreasing."""
    from multimodalbrainsurvival_tpu.models.quantize import _requant
    from jax import lax

    rng = np.random.default_rng(1)
    # post-relu range, including values beyond the clip point 127*s
    y = jnp.asarray(rng.uniform(0.0, 3.0, size=(2, 8, 8, 4)).astype(np.float32))
    s = np.float32(2.0 / 127.0)

    def maxpool(t, init):
        return lax.reduce_window(
            t, init, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )

    pool_then_q = _requant(maxpool(y, -jnp.inf), s)
    q_then_pool = maxpool(_requant(y, s), jnp.int8(-128))
    np.testing.assert_array_equal(
        np.asarray(pool_then_q), np.asarray(q_then_pool)
    )


@pytest.mark.parametrize(
    "arch,in_ch", [("resnet18", 3), ("resnet34", 3), ("resnet50", 3),
                   ("resnet50", 1), ("resnet101", 4)]
)
def test_quantized_extract_tracks_float(arch, in_ch):
    """W8A8 embedding vs float embedding: per-sample cosine > 0.995 on
    calibration data AND held-out data from the same distribution
    (measured ~0.999 — see models/quantize.py)."""
    fv, _ = _folded_variables(arch, in_ch=in_ch)
    rng = np.random.default_rng(0)
    x_cal = jnp.asarray(rng.normal(size=(4, 32, 32, in_ch)).astype(np.float32))
    ref_cal, amax = float_extract_amax(fv, x_cal, arch=arch)
    qt = quantize_resnet(fv, merge_amax([jax.device_get(amax)]), arch=arch)

    q_cal = quantized_extract(qt, x_cal, arch=arch)
    assert _cosines(q_cal, ref_cal).min() > 0.995

    x_new = jnp.asarray(rng.normal(size=(4, 32, 32, in_ch)).astype(np.float32))
    ref_new, _ = float_extract_amax(fv, x_new, arch=arch)
    q_new = quantized_extract(qt, x_new, arch=arch)
    assert _cosines(q_new, ref_new).min() > 0.995

    # the inter-conv tensors really are int8 (the whole point: halved HBM
    # traffic) — weights int8, per-out-channel scales f32
    assert qt["conv1"]["k"].dtype == np.int8
    assert qt["conv1"]["ws"].shape == (64,)


def test_quantized_mil_adapter_matches_float_extract():
    """quantize_mil_resnet + QuantizedMILAdapter vs the float MILAdapter on
    a real AggregationModel: same aggregator tail, quantized patch encoder;
    bag embeddings agree to cosine > 0.995 from uint8 bags end-to-end."""
    from multimodalbrainsurvival_tpu.models.aggregators import make_aggregator
    from multimodalbrainsurvival_tpu.models.mil import AggregationModel
    from multimodalbrainsurvival_tpu.train.adapters import (
        MILAdapter,
        QuantizedMILAdapter,
    )

    def build(fold_bn):
        rn = RESNET_CONSTRUCTORS["resnet18"](fold_bn=fold_bn)
        return AggregationModel(
            resnet=rn,
            aggregator=make_aggregator("attention", dim=512, hdim=32),
            aggregator_dim=512,
        )

    rng = np.random.default_rng(3)
    bag = rng.integers(0, 256, size=(2, 3, 32, 32, 3), dtype=np.uint8)
    arrays = {
        "patch_bag": jnp.asarray(bag),
        "bag_mask": jnp.ones((2, 3), np.float32),
        "sample_mask": jnp.ones((2,), bool),
    }
    stock = MILAdapter(model=build(False))
    v = stock.init(jax.random.PRNGKey(0), arrays)
    flat = traverse_util.flatten_dict(v["batch_stats"])
    key = jax.random.PRNGKey(5)
    for k in flat:
        key, sub = jax.random.split(key)
        if k[-1] == "mean":
            flat[k] = flat[k] + 0.1 * jax.random.normal(sub, flat[k].shape)
        else:
            flat[k] = flat[k] * jnp.exp(
                0.2 * jax.random.normal(sub, flat[k].shape)
            )
    v = {
        "params": v["params"],
        "batch_stats": traverse_util.unflatten_dict(flat),
    }
    folded = fold_resnet_variables(v)

    float_adapter = MILAdapter(model=build(True))
    want = float_adapter.extract(folded, arrays)

    qtree = quantize_mil_resnet(folded, [bag], arch="resnet18")
    qv = dict(folded)
    qv["qtree"] = jax.device_put(qtree)
    qadapter = QuantizedMILAdapter(model=build(True), arch="resnet18")
    got = qadapter.extract(qv, arrays)
    assert got.shape == want.shape
    assert _cosines(got, want).min() > 0.995

    # apply() (the savescore path) runs the same encoder through the fc head
    out, stats = qadapter.apply(qv, arrays, train=False)
    assert out.shape == (2, 1) and stats is None
    with pytest.raises(ValueError, match="eval-only"):
        qadapter.apply(qv, arrays, train=True, rng=jax.random.PRNGKey(0))


def test_quant_trunk_training_adapter():
    """QuantTrunkMILAdapter (``quantize_trunk: "int8"`` TRAINING mode): the
    frozen prefix (stem + 3 stages here) runs int8, the trainable tail
    (layer4 + aggregator + fc) stays float.

    Pins the mode's contract: (a) eval embeddings track the float path
    (cosine > 0.995); (b) gradients are EXACTLY zero for every frozen-trunk
    param and flow to the tail; (c) a train-mode apply leaves frozen-stage
    BN running stats bit-identical while updating the trainable stages';
    (d) the batch_stats tree keeps its full layout (checkpoint-compatible
    with a float run).
    """
    from flax.traverse_util import flatten_dict

    from multimodalbrainsurvival_tpu.models.aggregators import make_aggregator
    from multimodalbrainsurvival_tpu.models.mil import AggregationModel
    from multimodalbrainsurvival_tpu.models.quantize import (
        quantize_trunk_for_training,
    )
    from multimodalbrainsurvival_tpu.train.adapters import (
        MILAdapter,
        QuantTrunkMILAdapter,
    )

    model = AggregationModel(
        resnet=RESNET_CONSTRUCTORS["resnet18"](),
        aggregator=make_aggregator("attention", dim=512, hdim=32),
        aggregator_dim=512,
    )
    rng = np.random.default_rng(3)
    bag = rng.integers(0, 256, size=(2, 3, 32, 32, 3), dtype=np.uint8)
    arrays = {
        "patch_bag": jnp.asarray(bag),
        "bag_mask": jnp.ones((2, 3), np.float32),
        "sample_mask": jnp.ones((2,), bool),
    }
    stock = MILAdapter(model=model, augment=False)
    v = stock.init(jax.random.PRNGKey(0), arrays)
    # non-trivial BN running stats so trunk folding actually moves values
    flat = traverse_util.flatten_dict(v["batch_stats"])
    key = jax.random.PRNGKey(5)
    for k in flat:
        key, sub = jax.random.split(key)
        if k[-1] == "mean":
            flat[k] = flat[k] + 0.1 * jax.random.normal(sub, flat[k].shape)
        else:
            flat[k] = flat[k] * jnp.exp(
                0.2 * jax.random.normal(sub, flat[k].shape)
            )
    v = {"params": v["params"],
         "batch_stats": traverse_util.unflatten_dict(flat)}

    qtree = quantize_trunk_for_training(v, [bag], arch="resnet18",
                                        augment=False)
    adapter = QuantTrunkMILAdapter(
        model=model, arch="resnet18", trunk_stages=3,
        qtree=jax.device_put(qtree), augment=False,
    )

    # (a) eval embedding tracks the float adapter
    emb_q = adapter.extract(v, arrays)
    emb_f = stock.extract(v, arrays)
    assert emb_q.shape == emb_f.shape
    assert _cosines(emb_q, emb_f).min() > 0.995
    out, stats = adapter.apply(v, arrays, train=False)
    assert out.shape == (2, 1) and stats is None

    # (b) gradients: exactly zero on the frozen trunk, flowing in the tail
    def loss(params):
        o, _ = adapter.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            arrays, train=True, rng=jax.random.PRNGKey(2),
        )
        return jnp.sum(o ** 2)

    g = flatten_dict(jax.grad(loss)(v["params"]))
    trunk_prefixes = ("conv1", "bn1", "layer1", "layer2", "layer3")
    trunk, tail = [], []
    for path, a in g.items():
        is_trunk = (path[0] == "resnet"
                    and str(path[1]).startswith(trunk_prefixes))
        (trunk if is_trunk else tail).append(float(jnp.abs(a).max()))
    assert trunk and max(trunk) == 0.0
    assert any(m > 0 for m in tail)

    # (c)+(d) train apply: full batch_stats layout, frozen stages untouched
    _, new_stats = adapter.apply(v, arrays, train=True,
                                 rng=jax.random.PRNGKey(1))
    old_flat = traverse_util.flatten_dict(v["batch_stats"])
    new_flat = traverse_util.flatten_dict(new_stats)
    assert set(old_flat) == set(new_flat)
    frozen_changed, tail_changed = [], []
    for k in old_flat:
        same = np.array_equal(np.asarray(old_flat[k]),
                              np.asarray(new_flat[k]))
        is_trunk = str(k[1]).startswith(trunk_prefixes)
        if not same:
            (frozen_changed if is_trunk else tail_changed).append(k)
    assert not frozen_changed
    assert tail_changed  # layer4 BN stats did update


def test_quantized_joint_adapter_matches_float():
    """QuantizedJointAdapter: int8 patch encoder under the bimodal fusion
    (float RNA encoder + head); scores track the float JointAdapter."""
    from multimodalbrainsurvival_tpu.models.fusion import (
        BagHistopathologyRNAModel,
    )
    from multimodalbrainsurvival_tpu.models.rna import RNAEncoder
    from multimodalbrainsurvival_tpu.train.adapters import (
        JointAdapter,
        QuantizedJointAdapter,
    )

    def build(fold_bn):
        return BagHistopathologyRNAModel(
            resnet=RESNET_CONSTRUCTORS["resnet18"](fold_bn=fold_bn),
            rna_encoder=RNAEncoder(hidden_dims=(32, 16), dropout=0.0),
        )

    rng = np.random.default_rng(7)
    arrays = {
        "patch_bag": jnp.asarray(
            rng.integers(0, 256, size=(2, 3, 32, 32, 3), dtype=np.uint8)
        ),
        "bag_mask": jnp.ones((2, 3), np.float32),
        "sample_mask": jnp.ones((2,), bool),
        "rna_data": jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32)),
    }
    stock = JointAdapter(model=build(False))
    v = stock.init(jax.random.PRNGKey(0), arrays)
    folded = fold_resnet_variables(
        {"params": v["params"], "batch_stats": v["batch_stats"]}
    )

    float_adapter = JointAdapter(model=build(True))
    want, _ = float_adapter.apply(folded, arrays, train=False)
    want_emb = float_adapter.extract(folded, arrays)

    qtree = quantize_mil_resnet(
        folded, [np.asarray(arrays["patch_bag"])], arch="resnet18"
    )
    qv = dict(folded)
    qv["qtree"] = jax.device_put(qtree)
    qadapter = QuantizedJointAdapter(model=build(True), arch="resnet18")
    got, stats = qadapter.apply(qv, arrays, train=False)
    assert stats is None
    # scores pass through the fusion head's f32 matmuls, so the int8
    # embedding noise is amplified by the (random-init) head weights; 0.06
    # absolute on a random model bounds the per-branch-scale grid (the
    # production contract is the cosine below, matching the MIL test)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=0.06
    )
    got_emb = qadapter.extract(qv, arrays)
    assert got_emb.shape == want_emb.shape == (2, 512 + 16)
    # the RNA half passes through the float encoder untouched
    np.testing.assert_array_equal(
        np.asarray(got_emb)[:, 512:], np.asarray(want_emb)[:, 512:]
    )
    assert _cosines(got_emb[:, :512], want_emb[:, :512]).min() > 0.995


# --- RNA / dense-stack int8 ---------------------------------------------------


def _rna_setup(rng_seed=11, in_dim=512, hidden=(128, 64), n=32):
    """Random-init RNAOnlyModel + standardized expression-like data.

    Dims are scaled-down but not TINY: per-sample cosine of an int8
    approximation concentrates with embedding width (at 24-d a single
    sample's cosine wanders to ~0.98 from rounding alone; at the real
    2048-d it is far tighter), so the contract is tested at widths where
    the production threshold is meaningful."""
    from multimodalbrainsurvival_tpu.models.rna import RNAEncoder, RNAOnlyModel

    model = RNAOnlyModel(encoder=RNAEncoder(hidden_dims=hidden, dropout=0.0))
    rng = np.random.default_rng(rng_seed)
    cal = rng.normal(size=(n, in_dim)).astype(np.float32)
    held = rng.normal(size=(n, in_dim)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(cal),
                           train=False)
    return model, variables, cal, held


def test_quantized_mlp_tracks_float():
    """W8A8 Dense stack vs the float encoder: per-sample cosine > 0.995 on
    the embedding, on calibration AND held-out data; the float head over the
    int8 embedding stays close to the float scores."""
    from multimodalbrainsurvival_tpu.models.quantize import (
        quantize_rna_encoder,
        quantized_mlp,
    )

    model, variables, cal, held = _rna_setup()
    qtree = quantize_rna_encoder(variables, [cal])
    for x in (cal, held):
        want = np.asarray(
            model.apply(variables, jnp.asarray(x), train=False,
                        method="extract")
        )
        got = np.asarray(quantized_mlp(qtree, jnp.asarray(x)))
        assert got.shape == want.shape
        assert _cosines(got, want).min() > 0.995
    # scores: float head over int8 embedding vs full float forward
    want_s = np.asarray(model.apply(variables, jnp.asarray(held),
                                    train=False))
    got_s = np.asarray(model.apply(
        {"params": variables["params"]},
        quantized_mlp(qtree, jnp.asarray(held)), method="from_embedding",
    ))
    scale = max(1e-3, float(np.abs(want_s).max()))
    assert np.abs(got_s - want_s).max() / scale < 0.05


def test_quantized_mlp_weight_tree_is_int8():
    """The serving qtree actually stores int8 kernels (the bandwidth claim)
    with per-output-channel scales, one entry per encoder Dense layer."""
    from multimodalbrainsurvival_tpu.models.quantize import (
        quantize_rna_encoder,
    )

    model, variables, cal, _ = _rna_setup()
    qtree = quantize_rna_encoder(variables, [cal])
    assert len(qtree["layers"]) == 2
    assert set(qtree) == {"layers"}  # activation scales are dynamic
    for lp, out_dim in zip(qtree["layers"], (128, 64)):
        assert lp["k"].dtype == np.int8
        assert lp["ws"].shape == (out_dim,)
        assert np.abs(lp["k"]).max() <= 127


def test_quantized_table_adapter_matches_float():
    """QuantizedTableAdapter vs TableAdapter on the same restored tree:
    eval-only, embedding cosine > 0.995, scores close; refuses train."""
    from multimodalbrainsurvival_tpu.models.quantize import (
        quantize_rna_encoder,
    )
    from multimodalbrainsurvival_tpu.train.adapters import (
        QuantizedTableAdapter,
        TableAdapter,
    )

    model, variables, cal, held = _rna_setup()
    float_adapter = TableAdapter(model=model)
    arrays = {"data": jnp.asarray(held), "mask": jnp.ones((len(held),), bool)}
    want, _ = float_adapter.apply(variables, arrays, train=False)
    want_emb = float_adapter.extract(variables, arrays)

    qv = {"params": variables["params"],
          "qtree": jax.device_put(quantize_rna_encoder(variables, [cal]))}
    qadapter = QuantizedTableAdapter(model=model)
    got, stats = qadapter.apply(qv, arrays, train=False)
    assert stats is None
    got_emb = qadapter.extract(qv, arrays)
    assert _cosines(np.asarray(got_emb), np.asarray(want_emb)).min() > 0.995
    scale = max(1e-3, float(np.abs(np.asarray(want)).max()))
    assert np.abs(np.asarray(got) - np.asarray(want)).max() / scale < 0.05
    with pytest.raises(ValueError):
        qadapter.apply(qv, arrays, train=True)


def test_quantized_joint_adapter_int8_rna():
    """QuantizedJointAdapter with BOTH qtrees: the RNA half of the bimodal
    embedding now comes from the int8 encoder (cosine-close, not equal),
    and scores still track the float adapter."""
    from multimodalbrainsurvival_tpu.models.fusion import (
        BagHistopathologyRNAModel,
    )
    from multimodalbrainsurvival_tpu.models.quantize import (
        quantize_rna_encoder,
    )
    from multimodalbrainsurvival_tpu.models.rna import RNAEncoder
    from multimodalbrainsurvival_tpu.train.adapters import (
        JointAdapter,
        QuantizedJointAdapter,
    )

    def build(fold_bn):
        return BagHistopathologyRNAModel(
            resnet=RESNET_CONSTRUCTORS["resnet18"](fold_bn=fold_bn),
            rna_encoder=RNAEncoder(hidden_dims=(32, 16), dropout=0.0),
        )

    rng = np.random.default_rng(7)
    arrays = {
        "patch_bag": jnp.asarray(
            rng.integers(0, 256, size=(2, 3, 32, 32, 3), dtype=np.uint8)
        ),
        "bag_mask": jnp.ones((2, 3), np.float32),
        "sample_mask": jnp.ones((2,), bool),
        "rna_data": jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32)),
    }
    stock = JointAdapter(model=build(False))
    v = stock.init(jax.random.PRNGKey(0), arrays)
    folded = fold_resnet_variables(
        {"params": v["params"], "batch_stats": v["batch_stats"]}
    )
    float_adapter = JointAdapter(model=build(True))
    want, _ = float_adapter.apply(folded, arrays, train=False)
    want_emb = float_adapter.extract(folded, arrays)

    qv = dict(folded)
    qv["qtree"] = jax.device_put(quantize_mil_resnet(
        folded, [np.asarray(arrays["patch_bag"])], arch="resnet18"
    ))
    qv["qtree_rna"] = jax.device_put(quantize_rna_encoder(
        folded, [np.asarray(arrays["rna_data"])], submodule="rna_encoder"
    ))
    qadapter = QuantizedJointAdapter(model=build(True), arch="resnet18")
    got, stats = qadapter.apply(qv, arrays, train=False)
    assert stats is None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.06)
    got_emb = qadapter.extract(qv, arrays)
    assert got_emb.shape == want_emb.shape == (2, 512 + 16)
    # both halves are now int8 approximations — cosine-close, NOT equal
    assert _cosines(got_emb[:, :512], want_emb[:, :512]).min() > 0.995
    assert _cosines(got_emb[:, 512:], want_emb[:, 512:]).min() > 0.995
    assert not np.array_equal(np.asarray(got_emb)[:, 512:],
                              np.asarray(want_emb)[:, 512:])
