"""Data layer: tables, patch bags, on-device preprocessing, tiler round-trip."""

import colorsys
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.helpers import make_patch_dir, make_survival_csv

from multimodalbrainsurvival_tpu.data import (
    FeatureTableDataset,
    PatchBagDataset,
    PatchBagRNADataset,
    RNATableDataset,
)
from multimodalbrainsurvival_tpu.ops.image import (
    hsv_to_rgb,
    normalize_imagenet,
    preprocess_patches,
    rgb_to_hsv,
)


# ---------- image ops ----------


def test_rgb_hsv_roundtrip_vs_colorsys():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(size=(50, 3)).astype(np.float32)
    hsv = np.asarray(rgb_to_hsv(jnp.array(rgb)))
    want = np.array([colorsys.rgb_to_hsv(*p) for p in rgb])
    np.testing.assert_allclose(hsv, want, atol=1e-5)
    back = np.asarray(hsv_to_rgb(jnp.array(hsv)))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_preprocess_eval_path_deterministic():
    img = np.random.default_rng(0).integers(0, 255, (2, 3, 8, 8, 3), dtype=np.uint8)
    a = preprocess_patches(jnp.array(img), train=False)
    b = preprocess_patches(jnp.array(img), train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    want = normalize_imagenet(img.astype(np.float32) / 255.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(want), atol=1e-6)


def test_preprocess_train_randomizes_but_is_seeded():
    img = np.random.default_rng(0).integers(0, 255, (4, 8, 8, 3), dtype=np.uint8)
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    a = preprocess_patches(jnp.array(img), train=True, key=k1)
    a2 = preprocess_patches(jnp.array(img), train=True, key=k1)
    b = preprocess_patches(jnp.array(img), train=True, key=k2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()


def test_preprocess_bf16_matches_f32_stream_and_stays_close():
    """The train-mode augmentation chain runs in the model's compute dtype
    (the f32 chain measured ~1.7 ms/step of pure VPU work at b128×224² —
    DESIGN.md item 22). Contract: the RANDOM STREAM is dtype-independent
    (factors drawn in f32, then cast) and the bf16 output tracks the f32 one
    to rounding (hue-boundary pixels may shift a few 8-bit levels; cosine
    stays ~1). The f32 path itself is bitwise-unchanged by the dtype plumb."""
    img = np.random.default_rng(3).integers(0, 255, (8, 16, 16, 3),
                                            dtype=np.uint8)
    k = jax.random.PRNGKey(7)
    a = np.asarray(preprocess_patches(jnp.array(img), train=True, key=k,
                                      dtype=jnp.float32), np.float32)
    b = np.asarray(preprocess_patches(jnp.array(img), train=True, key=k,
                                      dtype=jnp.bfloat16), np.float32)
    # same flips/factors: gross structure identical, only rounding differs
    assert np.abs(a - b).mean() < 0.05  # normalized units (std ~0.22)
    assert np.abs(a - b).max() < 0.5
    cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999


def test_preprocess_requires_key_in_train():
    img = jnp.zeros((1, 4, 4, 3), jnp.uint8)
    with pytest.raises(ValueError):
        preprocess_patches(img, train=True)


# ---------- tables ----------


def test_rna_table_dataset(tmp_path):
    csv = tmp_path / "rna.csv"
    make_survival_csv(str(csv), [f"c{i}" for i in range(7)], n_rna=20)
    ds = RNATableDataset(str(csv))
    assert ds.feature_dim == 20
    assert len(ds) == 7
    batches = list(ds.batches(4))
    assert len(batches) == 2
    b = batches[1]
    assert b["data"].shape == (4, 20)
    assert b["mask"].tolist() == [True, True, True, False]
    assert b["case"][3] == ""
    assert b["survival_months"].dtype == np.float32


def test_feature_table_missing_prefix_raises(tmp_path):
    csv = tmp_path / "x.csv"
    make_survival_csv(str(csv), ["a"], n_rna=3)
    with pytest.raises(ValueError):
        FeatureTableDataset(str(csv))


def test_table_shuffle_is_seeded(tmp_path):
    csv = tmp_path / "rna.csv"
    make_survival_csv(str(csv), [f"c{i}" for i in range(16)], n_rna=4)
    ds = RNATableDataset(str(csv))
    a = [b["case"] for b in ds.batches(8, shuffle=True, seed=3)]
    b = [b["case"] for b in ds.batches(8, shuffle=True, seed=3)]
    c = [b["case"] for b in ds.batches(8, shuffle=True, seed=4)]
    assert a == b and a != c


# ---------- patch bags ----------


@pytest.fixture
def patch_root(tmp_path):
    root = tmp_path / "patches"
    make_patch_dir(str(root), "W1", 7)
    make_patch_dir(str(root), "W2", 4)
    csv = tmp_path / "ffpe.csv"
    make_survival_csv(
        str(csv), ["c1", "c2"], wsi_names=["W1.svs", "W2.svs"]
    )
    return str(root), str(csv)


def test_patch_bag_index_drops_remainder(patch_root):
    root, csv = patch_root
    ds = PatchBagDataset(root, csv, img_size=32, bag_size=3, max_patches_total=100)
    # W1: 7//3 = 2 bags, W2: 4//3 = 1 bag (reference models.py:266-267)
    assert len(ds) == 3
    ds_keep = PatchBagDataset(
        root, csv, img_size=32, bag_size=3, max_patches_total=100, keep_remainder=True
    )
    assert len(ds_keep) == 5


def test_patch_bag_batches_shapes_and_masks(patch_root):
    root, csv = patch_root
    ds = PatchBagDataset(
        root, csv, img_size=32, bag_size=3, max_patches_total=100, keep_remainder=True
    )
    batches = list(ds.batches(2, num_threads=2))
    assert len(batches) == 3
    b0 = batches[0]
    assert b0["patch_bag"].shape == (2, 3, 32, 32, 3)
    assert b0["patch_bag"].dtype == np.uint8
    assert b0["sample_mask"].all()
    # last batch padded
    b2 = batches[2]
    assert b2["sample_mask"].tolist() == [True, False]
    # remainder bags masked: W1 has a 1-patch bag, W2 a 1-patch bag
    total_real = sum(b["bag_mask"].sum() for b in batches)
    assert total_real == 7 + 4


def test_patch_bag_max_patches_cap(patch_root):
    root, csv = patch_root
    ds = PatchBagDataset(root, csv, img_size=32, bag_size=2, max_patches_total=4)
    assert len(ds) == 4  # both slides capped at 4 patches → 2 bags each


def test_patch_bag_shuffle_permutes_within_slide(patch_root):
    root, csv = patch_root
    ds = PatchBagDataset(root, csv, img_size=32, bag_size=3)
    before = list(ds.data["W1"]["images"])
    ds.shuffle()
    after = list(ds.data["W1"]["images"])
    assert sorted(before) == sorted(after) and before != after


def test_patch_bag_rna(tmp_path):
    root = tmp_path / "patches"
    make_patch_dir(str(root), "W1", 4)
    csv = tmp_path / "joint.csv"
    make_survival_csv(str(csv), ["c1"], wsi_names=["W1.svs"], n_rna=12)
    ds = PatchBagRNADataset(str(root), str(csv), img_size=32, bag_size=2)
    assert ds.rna_dim == 12
    b = next(ds.batches(2, num_threads=1))
    assert b["rna_data"].shape == (2, 12)
    assert np.abs(b["rna_data"][:2]).sum() > 0


def test_packed_shard_path(patch_root):
    """pack_patch_dir → dataset auto-uses the mmap shard, bytes identical."""
    import os as _os

    from multimodalbrainsurvival_tpu.data.tiler import pack_patch_dir

    root, csv = patch_root
    ds_png = PatchBagDataset(root, csv, img_size=32, bag_size=2,
                             prefer_packed=False)
    for w in ("W1", "W2"):
        n = pack_patch_dir(_os.path.join(root, w))
        assert _os.path.isfile(_os.path.join(root, w, "patches.npy"))
        assert n > 0
    ds_packed = PatchBagDataset(root, csv, img_size=32, bag_size=2)
    assert ds_packed.data["W1"]["packed_path"] is not None
    a = next(ds_png.batches(4, num_threads=1))
    b = next(ds_packed.batches(4, num_threads=1))
    np.testing.assert_array_equal(a["patch_bag"], b["patch_bag"])
    # resize path from packed rows
    ds_rs = PatchBagDataset(root, csv, img_size=24, bag_size=2)
    r = next(ds_rs.batches(2, num_threads=1))
    assert r["patch_bag"].shape == (2, 2, 24, 24, 3)
    # shuffle still permutes (indices now)
    ds_packed.shuffle()
    assert sorted(ds_packed.data["W1"]["images"]) == list(
        range(ds_packed.data["W1"]["n_images"])
    )


def test_native_batch_assembler_matches_python_path(tmp_path):
    """The whole-batch C++ assembler (native.assemble_patch_batch via
    PatchBagDataset._load_batch) must produce byte-identical batches to the
    per-bag Python path across: PNG dirs, packed shards (memcpy), packed
    shards needing a resize (cv2 fallback slot), and the RNA-joint subclass
    (per-item extras through _bag_meta)."""
    from multimodalbrainsurvival_tpu.data.tiler import pack_patch_dir
    from multimodalbrainsurvival_tpu.utils import native

    if not native.available():
        pytest.skip("native loader unavailable")

    root = tmp_path / "patches"
    make_patch_dir(str(root), "W1", 7)
    make_patch_dir(str(root), "W2", 5)
    csv = tmp_path / "joint.csv"
    make_survival_csv(str(csv), ["c1", "c2"], wsi_names=["W1.svs", "W2.svs"],
                      n_rna=6)

    def compare(make_ds, batch_size):
        a_ds = make_ds("cv2")      # per-bag Python path
        b_ds = make_ds("native")   # whole-batch C++ assembler
        got_any = False
        for a, b in zip(a_ds.batches(batch_size, num_threads=2),
                        b_ds.batches(batch_size, num_threads=2)):
            got_any = True
            assert a.keys() == b.keys()
            for k in a:
                if isinstance(a[k], list):
                    assert a[k] == b[k], k
                else:
                    np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        assert got_any

    # PNG decode path (odd batch → padded slots stay zero)
    compare(lambda d: PatchBagDataset(str(root), str(csv), img_size=32,
                                      bag_size=2, keep_remainder=True,
                                      decoder=d), 3)
    # packed shards: memcpy path + resize-slot path
    for w in ("W1", "W2"):
        pack_patch_dir(os.path.join(str(root), w))
    compare(lambda d: PatchBagDataset(str(root), str(csv), img_size=32,
                                      bag_size=2, decoder=d), 3)
    compare(lambda d: PatchBagDataset(str(root), str(csv), img_size=24,
                                      bag_size=2, decoder=d), 2)
    # joint subclass: rna_data flows through _bag_meta identically
    compare(lambda d: PatchBagRNADataset(str(root), str(csv), img_size=32,
                                         bag_size=2, decoder=d), 2)


def test_patch_bag_corrupt_png_raises_not_hangs(patch_root):
    """A decode failure in the producer thread must propagate, not deadlock."""
    root, csv = patch_root
    ds = PatchBagDataset(root, csv, img_size=32, bag_size=2)
    with open(os.path.join(root, "W1", "W1_patch_1.png"), "wb") as f:
        f.write(b"not a png")
    with pytest.raises(FileNotFoundError):
        for _ in ds.batches(2, num_threads=2):
            pass


# ---------- tiler round-trip ----------


def test_tiler_roundtrip(tmp_path):
    from multimodalbrainsurvival_tpu.data.tiler import TileConfig, extract_patches

    # synthetic slide: white background with a pink "tissue" blob
    import cv2

    rng = np.random.default_rng(0)
    slide = np.full((512, 512, 3), 255, np.uint8)
    noise = rng.integers(0, 60, size=(256, 320, 3), dtype=np.uint8)
    slide[128:384, 64:384] = np.array([200, 120, 160], np.uint8) - noise // 2
    slide_path = str(tmp_path / "S1.png")
    cv2.imwrite(slide_path, slide[:, :, ::-1])

    patch_path = str(tmp_path / "patches")
    mask_path = str(tmp_path / "masks")
    cfg = TileConfig(patch_size=64, max_patches_per_slide=100)
    n = extract_patches(slide_path, patch_path, mask_path, cfg)
    assert n > 0

    # artifact contract
    loc = os.path.join(patch_path, "S1", "loc.txt")
    lines = open(loc).read().splitlines()
    assert lines[0] == "slide_id S1"
    assert lines[1].startswith("id x y")
    assert len(lines) - 2 == n
    assert os.path.isfile(os.path.join(mask_path, "S1", "mask.npy"))
    # every patch lands in the blob region
    for ln in lines[2:]:
        parts = ln.split()
        x, y = int(parts[1]), int(parts[2])
        assert 0 <= x < 512 and 64 <= y
    # idempotent mask cache: second run reuses mask.npy
    n2 = extract_patches(slide_path, patch_path, mask_path, cfg)
    assert n2 == n

    # downstream integration: PatchBagDataset reads the tiler's artifacts
    csv = tmp_path / "ffpe.csv"
    make_survival_csv(str(csv), ["c1"], wsi_names=["S1.svs"])
    ds = PatchBagDataset(str(patch_path), str(csv), img_size=64, bag_size=1)
    assert len(ds) == n
    b = next(ds.batches(1, num_threads=1))
    assert b["patch_bag"].shape == (1, 1, 64, 64, 3)


def test_tiler_dotted_slide_ids_do_not_collide(tmp_path):
    """TCGA names embed a UUID after a dot; the reference's get_slide_id
    (1_WSI2Patches.py:135-136, split('.')[0]) collapses two scans of one
    case onto one patch dir. Unconditional fix (SURVEY §2.4): only a known
    slide extension is stripped, so the ids stay distinct."""
    from multimodalbrainsurvival_tpu.data.tiler import (
        TileConfig,
        extract_patches,
        slide_id_for,
    )
    import cv2

    assert slide_id_for("CASE-DX1.83fce43e.svs") == "CASE-DX1.83fce43e"
    assert slide_id_for("/x/CASE-DX1.83fce43e") == "CASE-DX1.83fce43e"
    assert slide_id_for("plain.png") == "plain"

    rng = np.random.default_rng(1)
    cfg = TileConfig(patch_size=64, max_patches_per_slide=4)
    patch_path, mask_path = str(tmp_path / "p"), str(tmp_path / "m")
    ids = []
    for uuid in ("aaaa1111", "bbbb2222"):
        slide = np.full((256, 256, 3), 255, np.uint8)
        blob = rng.integers(0, 60, size=(128, 128, 3), dtype=np.uint8)
        slide[64:192, 64:192] = np.array([200, 120, 160], np.uint8) - blob // 2
        path = str(tmp_path / f"CASE-DX1.{uuid}.png")
        cv2.imwrite(path, slide[:, :, ::-1])
        assert extract_patches(path, patch_path, mask_path, cfg) > 0
        ids.append(f"CASE-DX1.{uuid}")
    # both scans tiled into their OWN directories, nothing overwritten
    for sid in ids:
        lines = open(os.path.join(patch_path, sid, "loc.txt")).read().splitlines()
        assert lines[0] == f"slide_id {sid}"
        assert len(lines) > 2


def test_abandoned_batches_generator_releases_producer(patch_root):
    """Dropping a batches() generator (probe pattern) must not leak the
    producer thread or keep prefetched batches pinned."""
    import gc
    import threading
    import time as _time

    root, csv = patch_root
    ds = PatchBagDataset(root, csv, img_size=32, bag_size=2)
    before = {t.ident for t in threading.enumerate()}
    gen = ds.batches(2, num_threads=2, prefetch=1)
    next(gen)
    del gen
    gc.collect()
    _time.sleep(1.0)
    leaked = [
        t for t in threading.enumerate()
        if t.ident not in before and t.is_alive()
    ]
    assert leaked == []


# ---------- pyramidal TIFF (.svs-style) tiling with AppMag resize ----------


def _write_pyramid_tiff(path, full, app_mag):
    """2-level pyramidal TIFF with an Aperio-style ImageDescription, the
    structure of a real .svs (1_WSI2Patches.py:70,98-104)."""
    from PIL import Image

    desc = (
        f"Aperio Image Library v12.0.15\n{full.shape[1]}x{full.shape[0]} "
        f"| AppMag = {app_mag}|MPP = 0.2498|"
    )
    Image.fromarray(full).save(
        path, format="TIFF", save_all=True,
        append_images=[Image.fromarray(np.ascontiguousarray(full[::4, ::4]))],
        description=desc,
    )


def _pyramid_slide(tmp_path, app_mag):
    rng = np.random.default_rng(1)
    full = np.full((768, 1024, 3), 255, np.uint8)
    noise = rng.integers(0, 60, size=(512, 768, 3), dtype=np.uint8)
    full[128:640, 128:896] = np.array([200, 120, 160], np.uint8) - noise // 2
    path = str(tmp_path / "P1.svs")
    _write_pyramid_tiff(path, full, app_mag)
    return path, full


def test_pyramid_tiff_slide_reader(tmp_path):
    from multimodalbrainsurvival_tpu.data.tiler import (
        NativeTiffSlide,
        PyramidTiffSlide,
        open_slide,
    )
    from multimodalbrainsurvival_tpu.utils import native_tiff

    path, full = _pyramid_slide(tmp_path, app_mag=40)
    slide = open_slide(path)
    # openslide absent here; the lazy libtiff reader is preferred when it
    # builds, the eager PIL reader is the fallback — identical API either way
    want = NativeTiffSlide if native_tiff.available() else PyramidTiffSlide
    assert isinstance(slide, want)
    assert slide.level_dimensions == [(1024, 768), (256, 192)]
    assert slide.properties["aperio.AppMag"] == "40"
    # openslide read_region semantics: level-0 coords, level-local size
    np.testing.assert_array_equal(
        slide.read_region((128, 256), 0, (64, 64)),
        full[256:320, 128:192],
    )
    np.testing.assert_array_equal(
        slide.read_region((128, 256), 1, (16, 16)),
        full[::4, ::4][64:80, 32:48],
    )
    # edge reads zero-pad like openslide
    edge = slide.read_region((1024 - 32, 768 - 32), 0, (64, 64))
    assert edge[:32, :32].any() and not edge[32:, 32:].any()


def test_pyramid_tiling_appmag40_resizes(tmp_path):
    """The AppMag-40 path (1_WSI2Patches.py:98-121): stride and read size are
    resize_factor*patch_size at level 0; outputs are resized to patch_size."""
    import cv2

    from multimodalbrainsurvival_tpu.data.tiler import TileConfig, extract_patches

    path, full = _pyramid_slide(tmp_path, app_mag=40)
    patch_path, mask_path = str(tmp_path / "p"), str(tmp_path / "m")
    cfg = TileConfig(patch_size=64, max_patches_per_slide=50)
    n = extract_patches(path, patch_path, mask_path, cfg)
    assert n > 0

    # mask computed from the LOW-RES pyramid level, stored x-major
    mask = np.load(os.path.join(mask_path, "P1", "mask.npy"))
    assert mask.shape == (256, 192)

    lines = open(os.path.join(patch_path, "P1", "loc.txt")).read().splitlines()
    for ln in lines[2:]:
        i, x, y, level, size_read, size_out = (int(v) for v in ln.split())
        # resize_factor = 40/20 = 2 → read 128 at level 0, grid stride 128
        assert level == 0 and size_read == 128 and size_out == 128
        assert x % 128 == 0 and y % 128 == 0
        png = cv2.imread(
            os.path.join(patch_path, "P1", f"P1_patch_{i}.png")
        )[:, :, ::-1]
        assert png.shape == (64, 64, 3)
        # the written patch IS the level-0 region resized 2× down
        expected = cv2.resize(
            full[y : y + 128, x : x + 128], (64, 64),
            interpolation=cv2.INTER_LINEAR,
        )
        np.testing.assert_array_equal(png, expected)


def test_pyramid_tiling_dezoom_cancels_appmag(tmp_path):
    """dezoom_factor=0.5 at AppMag 40 → resize_factor 1: native-size reads,
    no resize (1_WSI2Patches.py:99-104,120-121)."""
    import cv2

    from multimodalbrainsurvival_tpu.data.tiler import TileConfig, extract_patches

    path, full = _pyramid_slide(tmp_path, app_mag=40)
    patch_path, mask_path = str(tmp_path / "p2"), str(tmp_path / "m2")
    cfg = TileConfig(patch_size=64, max_patches_per_slide=10, dezoom_factor=0.5)
    n = extract_patches(path, patch_path, mask_path, cfg)
    assert n > 0
    lines = open(os.path.join(patch_path, "P1", "loc.txt")).read().splitlines()
    i, x, y, level, size_read, _ = (int(v) for v in lines[2].split())
    assert size_read == 64 and x % 64 == 0
    png = cv2.imread(
        os.path.join(patch_path, "P1", f"P1_patch_{i}.png")
    )[:, :, ::-1]
    np.testing.assert_array_equal(png, full[y : y + 64, x : x + 64])


def test_pyramid_reader_refuses_oversized_slides(tmp_path):
    """The PIL-based pyramid reader is eager; full-size vendor slides must
    fail with guidance (install OpenSlide) instead of OOM-ing."""
    from multimodalbrainsurvival_tpu.data.tiler import PyramidTiffSlide

    path, _ = _pyramid_slide(tmp_path, app_mag=20)
    with pytest.raises(MemoryError, match="OpenSlide"):
        PyramidTiffSlide(path, max_pixels=1000)
    # default budget admits the synthetic fixture
    assert len(PyramidTiffSlide(path).level_dimensions) == 2
