"""Cross-stack golden run of the reference TILER (`1_WSI2Patches.py`).

The reference preprocessing driver executes end-to-end as a subprocess oracle
on synthetic 2-level Aperio-style pyramidal TIFFs, and its artifacts —
``mask.npy``, ``loc.txt`` and every patch PNG — are compared against our
``wsi2patches`` CLI on the same slides. This pins the driver's control flow
at execution level: the candidate grid (x-major, stride = resized patch
size), the seed-5 shuffle (`1_WSI2Patches.py:105-106`), the low-res mask
build + its x-major transpose + dilate×3/erode×3 + on-disk cache, the
per-patch acceptance rule (mask hit → 20% tissue after dilate×3 → contrast),
the AppMag-40 resize arithmetic, the artifact naming, and the Pool fan-out.

Environment stubs (zero-egress image lacks openslide + skimage):
- ``openslide.OpenSlide`` → our `PyramidTiffSlide` wrapped to return PIL
  images. Both stacks therefore share the region-read backend; what the
  oracle run exercises is everything the DRIVER does with the regions.
- ``skimage`` primitives (`threshold_otsu`, `rgb2hsv` saturation,
  `is_low_contrast`, `imsave`) → our native equivalents from `data/tiler.py`
  / cv2. The primitive-level parity claims live in their own unit tests
  (`test_data.py`); sharing them here isolates the control-flow comparison.

Documented divergence: on the AppMag-40 resize path the reference uses PIL
bicubic (`patch.resize`, :121) while we use cv2 INTER_LINEAR — patch GEOMETRY
(loc.txt) is compared for the 40× slide, pixel content only for the 20× one.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import cv2

from tests.test_golden_crossstack import REFERENCE_DIR

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference repo not mounted"
)

_TILER_STUBS = {
    "openslide/__init__.py": """
import numpy as np
from PIL import Image

from multimodalbrainsurvival_tpu.data.tiler import PyramidTiffSlide


class OpenSlide:
    def __init__(self, path):
        self._slide = PyramidTiffSlide(path)
        self.level_dimensions = self._slide.level_dimensions
        self.properties = self._slide.properties

    def read_region(self, xy, level, size):
        return Image.fromarray(self._slide.read_region(xy, level, size))
""",
    "skimage/__init__.py": "",
    "skimage/color.py": """
import numpy as np

from multimodalbrainsurvival_tpu.data.tiler import rgb_to_saturation


def rgb2hsv(img):
    # the tiler reads only the saturation channel (1_WSI2Patches.py:45)
    img = np.asarray(img)
    out = np.zeros(img.shape[:2] + (3,), np.float64)
    out[..., 1] = rgb_to_saturation(img)
    out[..., 2] = img.astype(np.float64).max(axis=-1) / 255.0
    return out
""",
    "skimage/filters.py": (
        "from multimodalbrainsurvival_tpu.data.tiler import "
        "otsu_threshold as threshold_otsu\n"
    ),
    "skimage/io.py": """
import numpy as np
import cv2


def imsave(path, arr):
    assert cv2.imwrite(path, np.asarray(arr)[:, :, ::-1]), path


def imread(path):
    return cv2.imread(path, cv2.IMREAD_COLOR)[:, :, ::-1]
""",
    "skimage/exposure/__init__.py": "from . import exposure\n",
    "skimage/exposure/exposure.py": """
import numpy as np

from multimodalbrainsurvival_tpu.data.tiler import is_low_contrast as _ours


def is_low_contrast(img, fraction_threshold=0.05):
    return _ours(np.asarray(img), fraction_threshold)
""",
    "skimage/transform.py": (
        "def resize(*a, **k):\n"
        "    raise NotImplementedError('unused by the tiler')\n"
    ),
}

_RUNNER = """
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {stubs!r})
import runpy
sys.argv = ["1_WSI2Patches.py",
            "--wsi_path", {wsi!r}, "--patch_path", {patches!r},
            "--mask_path", {masks!r}, "--patch_size", "64",
            "--max_patches_per_slide", "8", "--num_process", "2",
            "--dezoom_factor", "1.0"]
runpy.run_path({driver!r}, run_name="__main__")
"""


def _write_pyramid_tiff(path, full, app_mag):
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


def _make_slide(path, app_mag, seed):
    """White background + noisy tissue blobs: Otsu accepts the blobs, the
    contrast check passes inside them, background patches are rejected."""
    rng = np.random.default_rng(seed)
    full = np.full((768, 1024, 3), 255, np.uint8)
    noise = rng.integers(0, 60, size=(512, 768, 3), dtype=np.uint8)
    full[128:640, 128:896] = np.array([200, 120, 160], np.uint8) - noise // 2
    _write_pyramid_tiff(path, full, app_mag)


def test_tiler_golden_run_matches_reference(tmp_path):
    wsi = tmp_path / "wsi"
    wsi.mkdir()
    _make_slide(str(wsi / "G0.svs"), app_mag=20, seed=3)
    _make_slide(str(wsi / "G1.svs"), app_mag=40, seed=4)

    # --- oracle: the reference tiler, Pool fan-out and all
    stubs = tmp_path / "stubs"
    for rel, body in _TILER_STUBS.items():
        p = stubs / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(textwrap.dedent(body))
    runner = tmp_path / "runner.py"
    runner.write_text(
        _RUNNER.format(
            repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            stubs=str(stubs),
            wsi=str(wsi),
            patches=str(tmp_path / "ref_patches"),
            masks=str(tmp_path / "ref_masks"),
            driver=os.path.join(REFERENCE_DIR,
                                "1_HistoPathology/1_WSI2Patches.py"),
        )
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run([sys.executable, str(runner)],
                          capture_output=True, text=True, timeout=600,
                          env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    # the tiler swallows per-slide exceptions (:131-133); an error line in
    # stdout means the oracle silently produced truncated artifacts
    assert "error with slide" not in proc.stdout, proc.stdout

    # --- ours: the wsi2patches CLI on the same slides
    from multimodalbrainsurvival_tpu.cli import wsi2patches

    wsi2patches.main([
        "--wsi_path", str(wsi),
        "--patch_path", str(tmp_path / "our_patches"),
        "--mask_path", str(tmp_path / "our_masks"),
        "--patch_size", "64", "--max_patches_per_slide", "8",
        "--num_process", "2", "--dezoom_factor", "1.0",
    ])

    for slide, compare_pixels in (("G0", True), ("G1", False)):
        ref_mask = np.load(tmp_path / "ref_masks" / slide / "mask.npy")
        our_mask = np.load(tmp_path / "our_masks" / slide / "mask.npy")
        np.testing.assert_array_equal(our_mask, ref_mask, err_msg=slide)

        ref_loc = (tmp_path / "ref_patches" / slide / "loc.txt").read_text()
        our_loc = (tmp_path / "our_patches" / slide / "loc.txt").read_text()
        assert our_loc == ref_loc, slide
        n = len(ref_loc.splitlines()) - 2
        assert n > 0, f"{slide}: oracle extracted no patches"

        if not compare_pixels:
            continue  # AppMag-40: PIL-bicubic vs cv2-linear resize divergence
        for i in range(n):
            name = f"{slide}_patch_{i}.png"
            ref_png = cv2.imread(str(tmp_path / "ref_patches" / slide / name))
            our_png = cv2.imread(str(tmp_path / "our_patches" / slide / name))
            assert ref_png is not None and our_png is not None, name
            np.testing.assert_array_equal(our_png, ref_png, err_msg=name)
