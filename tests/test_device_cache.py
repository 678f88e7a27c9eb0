"""Device-resident patch cache: content-identical batches, index-only H2D.

The cache (data/device_cache.py) must reproduce the base PatchBagDataset's
batches exactly at wrap time (same bag composition, pixels, labels, masks)
and keep the reference's per-epoch in-slide shuffle semantics."""

import numpy as np
import pytest

from tests.helpers import make_patch_dir, make_survival_csv

from multimodalbrainsurvival_tpu.data import PatchBagDataset, PatchBagRNADataset
from multimodalbrainsurvival_tpu.data.device_cache import (
    DeviceCachedPatchBags,
    cache_fits,
    maybe_cache_on_device,
)


@pytest.fixture
def cohort(tmp_path):
    root = tmp_path / "patches"
    for i, w in enumerate(["A", "B", "C"]):
        make_patch_dir(str(root), w, 5 + 2 * i, img_size=16, seed=i)
    csv = tmp_path / "ffpe.csv"
    make_survival_csv(
        str(csv), ["c1", "c2", "c3"], wsi_names=["A.svs", "B.svs", "C.svs"]
    )
    return str(root), str(csv)


def _collect(ds, batch_size, **kw):
    return list(ds.batches(batch_size, **kw))


def test_cached_batches_match_base(cohort):
    root, csv = cohort
    base = PatchBagDataset(root, csv, img_size=16, bag_size=2,
                           max_patches_total=100)
    cached = DeviceCachedPatchBags(base)
    assert len(cached) == len(base)

    for shuffle, seed in [(False, None), (True, 11)]:
        got = _collect(cached, 3, shuffle=shuffle, seed=seed)
        want = _collect(base, 3, shuffle=shuffle, seed=seed, num_threads=1)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g["patch_bag"]),
                                          w["patch_bag"])
            np.testing.assert_array_equal(g["bag_mask"], w["bag_mask"])
            np.testing.assert_array_equal(g["sample_mask"], w["sample_mask"])
            assert g["WSI"] == w["WSI"] and g["case"] == w["case"]
            np.testing.assert_array_equal(g["survival_months"],
                                          w["survival_months"])
            np.testing.assert_array_equal(g["vital_status"], w["vital_status"])


def test_cached_skip_batches_matches_suffix(cohort):
    """skip_batches (mid-epoch preemption resume) on the device cache yields
    exactly the suffix of the same deterministic epoch order."""
    root, csv = cohort
    base = PatchBagDataset(root, csv, img_size=16, bag_size=2,
                           max_patches_total=100)
    cached = DeviceCachedPatchBags(base)
    full = _collect(cached, 3, shuffle=True, seed=11)
    tail = _collect(cached, 3, shuffle=True, seed=11, skip_batches=2)
    assert len(tail) == len(full) - 2
    for f, t in zip(full[2:], tail):
        np.testing.assert_array_equal(np.asarray(f["patch_bag"]),
                                      np.asarray(t["patch_bag"]))
        assert f["WSI"] == t["WSI"]


def test_cached_shuffle_repermutes_within_slides(cohort):
    root, csv = cohort
    base = PatchBagDataset(root, csv, img_size=16, bag_size=2,
                           max_patches_total=100)
    cached = DeviceCachedPatchBags(base)
    before = {w: ids.copy() for w, ids in cached.ids.items()}
    cached.shuffle()
    changed = any(
        not np.array_equal(before[w], cached.ids[w]) for w in before
    )
    assert changed
    for w in before:  # same patch set per slide, new order
        assert sorted(before[w]) == sorted(cached.ids[w])


def test_cached_joint_dataset_carries_rna(cohort, tmp_path):
    root, _ = cohort
    csv = tmp_path / "joint.csv"
    make_survival_csv(str(csv), ["c1", "c2", "c3"],
                      wsi_names=["A.svs", "B.svs", "C.svs"], n_rna=8)
    base = PatchBagRNADataset(root, str(csv), img_size=16, bag_size=2,
                              max_patches_total=100)
    cached = DeviceCachedPatchBags(base)
    g = next(cached.batches(3))
    w = next(base.batches(3, num_threads=1))
    np.testing.assert_array_equal(np.asarray(g["patch_bag"]), w["patch_bag"])
    np.testing.assert_array_equal(g["rna_data"], w["rna_data"])


def test_cached_scalar_keys_union_across_slides(cohort):
    """A label column absent from the FIRST slide but present on later ones
    must still appear in cached batches (keys are unioned across all slides,
    defaulting missing entries to 0) — the per-batch host assembly picks up
    whatever each item carries, so the cache must too."""
    root, csv = cohort
    base = PatchBagDataset(root, csv, img_size=16, bag_size=2,
                           max_patches_total=100)
    wsis = list(base.data.keys())
    # heterogeneous rows: only the later slides carry survival_bin
    for w in wsis[1:]:
        base.data[w]["survival_bin"] = 3
    cached = DeviceCachedPatchBags(base)
    assert "survival_bin" in cached._scalar_keys
    got = {}
    for batch in cached.batches(3):
        for wsi, sb, m in zip(batch["WSI"], np.asarray(batch["survival_bin"]),
                              np.asarray(batch["sample_mask"])):
            if m:
                got.setdefault(wsi, set()).add(int(sb))
    first_wsi = base.data[wsis[0]]["WSI"]
    for wsi, vals in got.items():
        assert vals == ({0} if wsi == first_wsi else {3})


def test_maybe_cache_falls_back_when_too_large(cohort, capsys):
    root, csv = cohort
    base = PatchBagDataset(root, csv, img_size=16, bag_size=2,
                           max_patches_total=100)
    assert cache_fits(base, 1 << 30)
    assert not cache_fits(base, 100)
    same = maybe_cache_on_device(base, True, max_bytes=100)
    assert same is base
    assert "falling back" in capsys.readouterr().out
    wrapped = maybe_cache_on_device(base, True, max_bytes=1 << 30)
    assert isinstance(wrapped, DeviceCachedPatchBags)
    assert maybe_cache_on_device(base, False) is base


def test_cached_batches_compose_with_mesh_sharding(cohort):
    """Cache + dp mesh: gathered device arrays re-place onto a NamedSharding
    (device-to-device) and a sharded train step runs over them."""
    import jax
    import jax.numpy as jnp
    import optax

    from multimodalbrainsurvival_tpu.models import (
        AggregationModel, make_aggregator, resnet18,
    )
    from multimodalbrainsurvival_tpu.ops import cox_partial_likelihood_loss
    from multimodalbrainsurvival_tpu.parallel import batch_device_put, make_mesh
    from multimodalbrainsurvival_tpu.train.adapters import MILAdapter
    from multimodalbrainsurvival_tpu.train.loop import TrainSettings, train_model

    root, csv = cohort
    base = PatchBagDataset(root, csv, img_size=16, bag_size=2,
                           max_patches_total=4)
    cached = DeviceCachedPatchBags(base)
    mesh = make_mesh(dp=2, mp=1)

    model = AggregationModel(
        resnet=resnet18(), aggregator=make_aggregator("identity", dim=512),
        aggregator_dim=512, out_features=1,
    )
    adapter = MILAdapter(model=model)
    settings = TrainSettings(
        num_epochs=1, batch_size=4, log_interval=100, seed=0,
        eval_splits_during_training=(),
        device_put_fn=batch_device_put(mesh),
    )
    probe = next(cached.batches(4))
    variables = adapter.init(
        jax.random.PRNGKey(0),
        {k: jnp.asarray(probe[k]) for k in adapter.array_keys},
    )
    with mesh:
        out_vars, _, outputs = train_model(
            adapter, {"train": cached, "val": cached},
            optax.adam(1e-4), settings, variables=variables,
        )
    assert np.isfinite(outputs["val_metrics_last"]["loss"])


def test_cached_padding_matches_host_loader_zeros(cohort):
    """Partial batches and remainder bags must be zero-filled exactly like
    the host loader (index-0 pixels would poison train-mode BN stats)."""
    root, csv = cohort
    # bag_size 3 over 5/7/9 patches with keep_remainder -> remainder bags;
    # batch 3 over 8 bags -> a partial final batch
    base = PatchBagDataset(root, csv, img_size=16, bag_size=3,
                           max_patches_total=100, keep_remainder=True)
    cached = DeviceCachedPatchBags(base)
    got = list(cached.batches(3))
    want = list(base.batches(3, num_threads=1))
    assert len(got) == len(want)
    saw_partial_bag = saw_partial_batch = False
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g["patch_bag"]),
                                      w["patch_bag"])
        saw_partial_bag |= bool((~g["bag_mask"][g["sample_mask"]]).any())
        saw_partial_batch |= bool((~g["sample_mask"]).any())
    assert saw_partial_bag and saw_partial_batch  # the fixture must exercise both


def test_maybe_cache_datasets_shared_budget(cohort, capsys):
    """The HBM fit check is on the AGGREGATE of all splits; when only the
    train split fits, only it is cached."""
    root, csv = cohort

    def mk():
        return PatchBagDataset(root, csv, img_size=16, bag_size=2,
                               max_patches_total=100)

    from multimodalbrainsurvival_tpu.data.device_cache import (
        cache_bytes,
        maybe_cache_datasets,
    )

    datasets = {"train": mk(), "val": mk(), "test": mk()}
    per_split = cache_bytes(datasets["train"])

    all_cached = maybe_cache_datasets(dict(datasets), True,
                                      max_bytes=3 * per_split)
    assert all(isinstance(d, DeviceCachedPatchBags)
               for d in all_cached.values())

    train_only = maybe_cache_datasets(dict(datasets), True,
                                      max_bytes=2 * per_split)
    assert isinstance(train_only["train"], DeviceCachedPatchBags)
    assert train_only["val"] is datasets["val"]
    assert "caching only 'train'" in capsys.readouterr().out

    none = maybe_cache_datasets(dict(datasets), True, max_bytes=10)
    assert none["train"] is datasets["train"]

    assert maybe_cache_datasets(dict(datasets), False) == datasets


def test_cached_batches_match_base_unaligned_row(tmp_path):
    """img sizes whose H*W*3 is not a 128 multiple exercise the cache's
    row zero-padding (3-D tile-aligned storage — device_cache.__init__);
    batches must stay byte-identical to the host loader."""
    root = tmp_path / "p10"
    for i, w in enumerate(["A", "B"]):
        make_patch_dir(str(root), w, 5, img_size=10, seed=i)
    csv = tmp_path / "c10.csv"
    make_survival_csv(str(csv), ["c1", "c2"], wsi_names=["A.svs", "B.svs"])
    base = PatchBagDataset(str(root), str(csv), img_size=10, bag_size=2,
                           max_patches_total=5)
    assert (10 * 10 * 3) % 128 != 0
    cached = DeviceCachedPatchBags(base)
    for g, w in zip(_collect(cached, 3), _collect(base, 3, num_threads=1)):
        np.testing.assert_array_equal(np.asarray(g["patch_bag"]),
                                      w["patch_bag"])
        np.testing.assert_array_equal(np.asarray(g["bag_mask"]), w["bag_mask"])


# ---------------------------------------------------------------------------
# Mesh-sharded cache (VERDICT r2 next-round #1): rows block-sharded over all
# mesh devices — aggregate budget n_devices x per-chip HBM — with shard_map
# assembly whose outputs land pre-sharded (samples over dp, bag over mp).


def _assert_batches_equal(got, want, keys=("patch_bag", "bag_mask",
                                           "sample_mask", "survival_months",
                                           "vital_status")):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for k in keys:
            np.testing.assert_array_equal(
                np.asarray(g[k]), np.asarray(w[k]), err_msg=k
            )
        assert g["WSI"] == w["WSI"] and g["case"] == w["case"]


def test_mesh_sharded_cache_batches_match_host_loader(cohort):
    """dp=8: every device holds ~1/8 of the cohort's rows, batches are
    content-identical to the host loader, and every output already carries
    the dp sharding the sharded train step consumes — per-step pixel H2D is
    zero by construction (only the int32 `sel` is uploaded; no host copy of
    the pixels survives wrap time)."""
    from jax.sharding import PartitionSpec as P

    from multimodalbrainsurvival_tpu.parallel import make_mesh

    root, csv = cohort
    base = PatchBagDataset(root, csv, img_size=16, bag_size=2,
                           max_patches_total=100)
    mesh = make_mesh(dp=8, mp=1)
    cached = DeviceCachedPatchBags(base, mesh=mesh)

    # block-sharded rows: 8 equal shards, each a fraction of the cohort
    shard_shapes = {s.data.shape for s in cached._cache.addressable_shards}
    assert len(shard_shapes) == 1
    (rows_local, _, _) = shard_shapes.pop()
    assert rows_local == cached._cache.shape[0] // 8

    host = PatchBagDataset(root, csv, img_size=16, bag_size=2,
                           max_patches_total=100)
    for shuffle, seed in [(False, None), (True, 11)]:
        got = _collect(cached, 8, shuffle=shuffle, seed=seed)
        want = _collect(host, 8, shuffle=shuffle, seed=seed, num_threads=1)
        _assert_batches_equal(got, want)
        for g in got:
            assert g["patch_bag"].sharding.spec == P("dp")
            assert g["sample_mask"].sharding.spec == P("dp")
            assert g["survival_months"].sharding.spec == P("dp")


def test_mesh_sharded_cache_epoch_shuffle_matches_host(cohort):
    """Per-epoch in-slide shuffle() parity under the sharded cache: only the
    replicated KB-scale id permutation is re-uploaded, and the next epoch's
    batches equal the (identically seeded) host loader's."""
    from multimodalbrainsurvival_tpu.parallel import make_mesh

    root, csv = cohort
    base = PatchBagDataset(root, csv, img_size=16, bag_size=2,
                           max_patches_total=100)
    cached = DeviceCachedPatchBags(base, mesh=make_mesh(dp=4, mp=2))
    host = PatchBagDataset(root, csv, img_size=16, bag_size=2,
                           max_patches_total=100)
    host_cached = DeviceCachedPatchBags(host)  # same default_rng(0) stream
    for _ in range(2):
        cached.shuffle()
        host_cached.shuffle()
        _assert_batches_equal(
            _collect(cached, 8, shuffle=True, seed=3),
            _collect(host_cached, 8, shuffle=True, seed=3),
        )


def test_mesh_sharded_cache_shard_bag_layout(cohort):
    """dp=4 x mp=2 with shard_bag: the bag axis lands mp-sharded
    (P('dp','mp')) and content still matches the host loader."""
    from jax.sharding import PartitionSpec as P

    from multimodalbrainsurvival_tpu.parallel import make_mesh

    root, csv = cohort
    base = PatchBagDataset(root, csv, img_size=16, bag_size=2,
                           max_patches_total=100)
    cached = DeviceCachedPatchBags(base, mesh=make_mesh(dp=4, mp=2),
                                   shard_bag=True)
    host = PatchBagDataset(root, csv, img_size=16, bag_size=2,
                           max_patches_total=100)
    got = _collect(cached, 8)
    _assert_batches_equal(got, _collect(host, 8, num_threads=1))
    for g in got:
        assert g["patch_bag"].sharding.spec == P("dp", "mp")
        assert g["bag_mask"].sharding.spec == P("dp", "mp")

    with pytest.raises(ValueError, match="divisible"):
        DeviceCachedPatchBags(
            PatchBagDataset(root, csv, img_size=16, bag_size=3,
                            max_patches_total=100),
            mesh=make_mesh(dp=4, mp=2), shard_bag=True,
        )
    with pytest.raises(ValueError, match="divisible"):
        next(cached.batches(6))  # 6 % dp=4 != 0


def test_mesh_multiplies_cache_budget(cohort, capsys):
    """maybe_cache_on_device: a cohort too large for ONE device's budget fits
    when the mesh's 8 devices pool theirs (n_devices x max_bytes)."""
    from multimodalbrainsurvival_tpu.data.device_cache import cache_bytes
    from multimodalbrainsurvival_tpu.parallel import make_mesh

    root, csv = cohort
    base = PatchBagDataset(root, csv, img_size=16, bag_size=2,
                           max_patches_total=100)
    per_chip = cache_bytes(base) // 4  # fits 8 chips, not 1
    assert maybe_cache_on_device(base, True, max_bytes=per_chip) is base
    assert "falling back" in capsys.readouterr().out
    mesh = make_mesh(dp=8, mp=1)
    cached = maybe_cache_on_device(base, True, max_bytes=per_chip, mesh=mesh)
    assert isinstance(cached, DeviceCachedPatchBags)
    assert cached.mesh is mesh


def test_mesh_sharded_cache_trains_end_to_end(cohort):
    """Sharded cache + sharded train step: one epoch of MIL training at dp=8
    where the pixels only ever exist as the sharded device cache."""
    import jax
    import jax.numpy as jnp
    import optax

    from multimodalbrainsurvival_tpu.models import (
        AggregationModel, make_aggregator, resnet18,
    )
    from multimodalbrainsurvival_tpu.parallel import batch_device_put, make_mesh
    from multimodalbrainsurvival_tpu.train.adapters import MILAdapter
    from multimodalbrainsurvival_tpu.train.loop import TrainSettings, train_model

    root, csv = cohort
    mesh = make_mesh(dp=8, mp=1)
    base = PatchBagDataset(root, csv, img_size=16, bag_size=2,
                           max_patches_total=4)
    cached = DeviceCachedPatchBags(base, mesh=mesh)

    model = AggregationModel(
        resnet=resnet18(), aggregator=make_aggregator("identity", dim=512),
        aggregator_dim=512, out_features=1,
    )
    adapter = MILAdapter(model=model)
    settings = TrainSettings(
        num_epochs=1, batch_size=8, log_interval=100, seed=0,
        eval_splits_during_training=(),
        device_put_fn=batch_device_put(mesh),
    )
    probe = next(cached.batches(8))
    variables = adapter.init(
        jax.random.PRNGKey(0),
        {k: jnp.asarray(probe[k]) for k in adapter.array_keys},
    )
    with mesh:
        _, _, outputs = train_model(
            adapter, {"train": cached, "val": cached},
            optax.adam(1e-4), settings, variables=variables,
        )
    assert np.isfinite(outputs["val_metrics_last"]["loss"])
