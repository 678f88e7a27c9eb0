"""Native libtiff slide reader (`native/tiff_slide.cc`).

Covers the OpenSlide-capability rebuild for vendor-style slides: lazy
region reads on tiled(-JPEG) and stripped pyramidal TIFFs — fixtures are
fabricated by the library's own test writer (real `.svs` files are
environment-blocked; the tiled-JPEG fixture matches their structure:
`1_WSI2Patches.py:70,112` reads Aperio slides through exactly this API).
"""

from __future__ import annotations

import numpy as np
import pytest

from multimodalbrainsurvival_tpu.utils import native_tiff

pytestmark = pytest.mark.skipif(
    not native_tiff.available(), reason="libtiff/g++ unavailable"
)


@pytest.fixture()
def pyramid(tmp_path):
    rng = np.random.default_rng(0)
    full = rng.integers(0, 256, size=(300, 500, 3), dtype=np.uint8)
    return full, full[::4, ::4], tmp_path


def test_tiled_regions_exact_with_edge_zero_pad(pyramid):
    full, thumb, tmp = pyramid
    path = str(tmp / "t.svs")
    native_tiff.write_test_pyramid(path, [full, thumb], tile=64,
                                   description="Aperio|AppMag = 40|")
    h = native_tiff.NativeSlideHandle(path)
    assert h.level_dimensions == [(500, 300), (125, 75)]
    np.testing.assert_array_equal(
        h.read_region_level(0, 10, 20, 100, 50), full[20:70, 10:110]
    )
    # thumbnail level, level-local coordinates
    np.testing.assert_array_equal(
        h.read_region_level(1, 5, 7, 40, 30), thumb[7:37, 5:45]
    )
    # edge read: valid area exact, out-of-image area zero (openslide style)
    e = h.read_region_level(0, 450, 270, 100, 64)
    np.testing.assert_array_equal(e[:30, :50], full[270:300, 450:500])
    assert not e[30:, :].any() and not e[:, 50:].any()
    h.close()


def test_stripped_regions_exact(pyramid):
    full, thumb, tmp = pyramid
    path = str(tmp / "s.tif")
    native_tiff.write_test_pyramid(path, [full, thumb], tile=0)
    h = native_tiff.NativeSlideHandle(path)
    np.testing.assert_array_equal(
        h.read_region_level(0, 33, 41, 200, 123), full[41:164, 33:233]
    )
    e = h.read_region_level(0, 450, 290, 100, 30)
    np.testing.assert_array_equal(e[:10, :50], full[290:300, 450:500])
    assert not e[10:, :].any()
    h.close()


def test_jpeg_tiles_decode_through_rgba_path(pyramid):
    """Tiled-JPEG is what scanners actually write; lossy → tolerance."""
    _, _, tmp = pyramid
    smooth = np.zeros((300, 500, 3), np.uint8)
    smooth[...] = np.linspace(0, 255, 500).astype(np.uint8)[None, :, None]
    path = str(tmp / "j.svs")
    native_tiff.write_test_pyramid(path, [smooth], tile=64,
                                   compression="jpeg")
    h = native_tiff.NativeSlideHandle(path)
    got = h.read_region_level(0, 100, 100, 128, 96).astype(int)
    want = smooth[100:196, 100:228].astype(int)
    assert np.abs(got - want).max() <= 2
    h.close()


def test_open_slide_prefers_native_reader_and_matches_pil(pyramid):
    from multimodalbrainsurvival_tpu.data.tiler import (
        NativeTiffSlide,
        PyramidTiffSlide,
        open_slide,
    )
    from tests.test_golden_tiler import _write_pyramid_tiff

    full, thumb, tmp = pyramid
    tiled = str(tmp / "n.svs")
    native_tiff.write_test_pyramid(
        tiled, [full, thumb], tile=64,
        description="Aperio Image Library\n500x300 | AppMag = 40|MPP = 0.25|",
    )
    slide = open_slide(tiled)
    assert isinstance(slide, NativeTiffSlide)
    assert slide.properties["aperio.AppMag"] == "40"

    pil = str(tmp / "p.svs")
    _write_pyramid_tiff(pil, full, app_mag=40)
    ref = PyramidTiffSlide(pil)
    assert ref.level_dimensions == slide.level_dimensions
    # openslide read_region semantics on BOTH readers: level-0 (x, y)
    for xy, level, size in (((128, 64), 0, (96, 80)), ((128, 64), 1, (20, 16)),
                            ((480, 288), 0, (64, 64))):
        np.testing.assert_array_equal(
            slide.read_region(xy, level, size),
            ref.read_region(xy, level, size),
            err_msg=f"{xy} level={level}",
        )


def _j2k_tiles(img: np.ndarray, tile: int) -> list[bytes]:
    """Encode `img` as per-tile raw JPEG 2000 codestreams (row-major grid),
    lossless, no MCT — the byte format inside Aperio 33003/33005 tiles."""
    import io

    from PIL import Image

    h, w = img.shape[:2]
    out = []
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            block = np.zeros((tile, tile, 3), np.uint8)
            sub = img[ty:ty + tile, tx:tx + tile]
            block[: sub.shape[0], : sub.shape[1]] = sub
            buf = io.BytesIO()
            Image.fromarray(block).save(buf, format="JPEG2000",
                                        no_jp2=True, mct=0)
            out.append(buf.getvalue())
    return out


def test_aperio_j2k_33005_rgb_tiles_decode_exact(tmp_path):
    """Compression 33005 (Aperio J2K, RGB components): raw tiles round-trip
    losslessly through the Pillow/OpenJPEG escape hatch."""
    from multimodalbrainsurvival_tpu.data.tiler import NativeTiffSlide

    rng = np.random.default_rng(3)
    full = rng.integers(0, 256, size=(160, 224, 3), dtype=np.uint8)
    thumb = full[::4, ::4]
    path = str(tmp_path / "j2k.svs")
    b = native_tiff.SlideBuilder(path)
    b.add_raw_tiled_dir(224, 160, 64, _j2k_tiles(full, 64), 33005,
                        "Aperio Image Library\n224x160 | AppMag = 40|")
    b.add_raw_tiled_dir(56, 40, 64, _j2k_tiles(thumb, 64), 33005)
    b.close()
    slide = NativeTiffSlide(path)
    assert slide.level_dimensions == [(224, 160), (56, 40)]
    assert slide.properties["aperio.AppMag"] == "40"
    np.testing.assert_array_equal(
        slide.read_region((30, 20), 0, (128, 96)), full[20:116, 30:158]
    )
    # crosses tile boundaries + image edge (zero pad beyond)
    e = slide.read_region((192, 128), 0, (64, 64))
    np.testing.assert_array_equal(e[:32, :32], full[128:160, 192:224])
    assert not e[32:, :].any() and not e[:, 32:].any()
    # downsampled level: level-0 coords in, level coords for size
    np.testing.assert_array_equal(
        slide.read_region((40, 16), 1, (20, 12)), thumb[4:16, 10:30]
    )


def test_aperio_j2k_33003_ycbcr_tiles_convert(tmp_path):
    """Compression 33003 stores YCbCr planes with no MCT; the reader must
    apply the YCbCr→RGB transform itself (OpenSlide aperio driver
    behavior)."""
    from PIL import Image

    from multimodalbrainsurvival_tpu.data.tiler import NativeTiffSlide

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(128, 128, 3), dtype=np.uint8)
    ycc = np.asarray(Image.fromarray(rgb).convert("YCbCr"))
    # what a correct decode of the YCbCr planes converts back to
    want = np.asarray(Image.fromarray(ycc, mode="YCbCr").convert("RGB"))
    path = str(tmp_path / "ycc.svs")
    b = native_tiff.SlideBuilder(path)
    b.add_raw_tiled_dir(128, 128, 64, _j2k_tiles(ycc, 64), 33003,
                        "Aperio|AppMag = 20|")
    b.add_rgb_dir(rgb[::2, ::2], tile=64)
    b.close()
    slide = NativeTiffSlide(path)
    np.testing.assert_array_equal(
        slide.read_region((0, 0), 0, (128, 128)), want
    )
    np.testing.assert_array_equal(
        slide.read_region((32, 48), 0, (80, 64)), want[48:112, 32:112]
    )


def test_associated_images_thumbnail_label_macro(tmp_path):
    """Stripped directories of a tiled slide surface as OpenSlide-style
    associated images, named by the Aperio description keywords."""
    from multimodalbrainsurvival_tpu.data.tiler import NativeTiffSlide

    rng = np.random.default_rng(11)
    full = rng.integers(0, 256, size=(128, 192, 3), dtype=np.uint8)
    thumb = full[::2, ::2]
    label = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    macro = rng.integers(0, 256, size=(30, 60, 3), dtype=np.uint8)
    path = str(tmp_path / "full.svs")
    b = native_tiff.SlideBuilder(path)
    b.add_rgb_dir(full, tile=64,
                  description="Aperio Image Library\n192x128 | AppMag = 40|")
    b.add_rgb_dir(thumb, tile=0)  # dir 1: thumbnail (no keyword)
    b.add_rgb_dir(full[::2, ::2], tile=64)  # pyramid level 1
    b.add_rgb_dir(label, tile=0, description="label 42x42")
    b.add_rgb_dir(macro, tile=0, description="macro on slide")
    b.close()
    slide = NativeTiffSlide(path)
    # stripped dirs are NOT levels
    assert slide.level_dimensions == [(192, 128), (96, 64)]
    assoc = slide.associated_images
    assert set(assoc) == {"thumbnail", "label", "macro"}
    np.testing.assert_array_equal(np.asarray(assoc["thumbnail"]), thumb)
    np.testing.assert_array_equal(np.asarray(assoc["label"]), label)
    np.testing.assert_array_equal(np.asarray(assoc["macro"]), macro)


def test_tiler_artifacts_identical_j2k_vs_uncompressed(tmp_path):
    """extract_patches produces byte-identical artifacts whether the same
    pixels sit in Aperio-J2K (33005) tiles or uncompressed ones."""
    import os

    import cv2

    from multimodalbrainsurvival_tpu.data.tiler import (
        PyramidTiffSlide,
        TileConfig,
        extract_patches,
    )
    from tests.test_golden_tiler import _make_slide

    _make_slide(str(tmp_path / "A.svs"), app_mag=20, seed=13)
    pil = PyramidTiffSlide(str(tmp_path / "A.svs"))
    b = native_tiff.SlideBuilder(str(tmp_path / "B.svs"))
    for i, lvl in enumerate(pil._levels):
        b.add_raw_tiled_dir(
            lvl.shape[1], lvl.shape[0], 64, _j2k_tiles(lvl, 64), 33005,
            "Aperio|AppMag = 20|" if i == 0 else "")
    b.close()
    cfg = TileConfig(patch_size=64, max_patches_per_slide=6)
    n_a = extract_patches(str(tmp_path / "A.svs"), str(tmp_path / "pa"),
                          str(tmp_path / "ma"), cfg)
    n_b = extract_patches(str(tmp_path / "B.svs"), str(tmp_path / "pb"),
                          str(tmp_path / "mb"), cfg)
    assert n_a == n_b > 0
    np.testing.assert_array_equal(
        np.load(tmp_path / "ma/A/mask.npy"), np.load(tmp_path / "mb/B/mask.npy")
    )
    loc_a = (tmp_path / "pa/A/loc.txt").read_text().splitlines()
    loc_b = (tmp_path / "pb/B/loc.txt").read_text().splitlines()
    assert loc_a[2:] == loc_b[2:]
    for i in range(n_a):
        a = cv2.imread(os.path.join(tmp_path, "pa/A", f"A_patch_{i}.png"))
        bb = cv2.imread(os.path.join(tmp_path, "pb/B", f"B_patch_{i}.png"))
        np.testing.assert_array_equal(a, bb, err_msg=str(i))


def test_tiling_artifacts_identical_tiled_vs_stripped_container(tmp_path):
    """extract_patches produces byte-identical artifacts whether the same
    pixels live in a tiled (native-read) or PIL-written stripped pyramid."""
    import os

    import cv2

    from multimodalbrainsurvival_tpu.data.tiler import TileConfig, extract_patches
    from tests.test_golden_tiler import _make_slide

    _make_slide(str(tmp_path / "A.svs"), app_mag=20, seed=9)
    from multimodalbrainsurvival_tpu.data.tiler import PyramidTiffSlide

    pil = PyramidTiffSlide(str(tmp_path / "A.svs"))
    native_tiff.write_test_pyramid(
        str(tmp_path / "B.svs"), pil._levels, tile=64,
        description="Aperio|AppMag = 20|",
    )
    cfg = TileConfig(patch_size=64, max_patches_per_slide=6)
    n_a = extract_patches(str(tmp_path / "A.svs"), str(tmp_path / "pa"),
                          str(tmp_path / "ma"), cfg)
    n_b = extract_patches(str(tmp_path / "B.svs"), str(tmp_path / "pb"),
                          str(tmp_path / "mb"), cfg)
    assert n_a == n_b > 0
    np.testing.assert_array_equal(
        np.load(tmp_path / "ma/A/mask.npy"), np.load(tmp_path / "mb/B/mask.npy")
    )
    loc_a = (tmp_path / "pa/A/loc.txt").read_text().splitlines()
    loc_b = (tmp_path / "pb/B/loc.txt").read_text().splitlines()
    assert loc_a[2:] == loc_b[2:]  # rows identical (slide_id line differs)
    for i in range(n_a):
        a = cv2.imread(os.path.join(tmp_path, "pa/A", f"A_patch_{i}.png"))
        b = cv2.imread(os.path.join(tmp_path, "pb/B", f"B_patch_{i}.png"))
        np.testing.assert_array_equal(a, b, err_msg=str(i))
