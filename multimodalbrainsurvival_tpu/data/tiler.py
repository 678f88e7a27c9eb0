"""WSI → patch tiling with Otsu tissue segmentation.

Capability parity with ``1_HistoPathology/1_WSI2Patches.py`` including its
artifact contract, so downstream consumers (``PatchBagDataset``) are
interchangeable:

- per-slide directory ``<patch_path>/<slide_id>/`` with
  ``<slide_id>_patch_<i>.png`` patches;
- ``loc.txt``: ``slide_id <id>`` line, a header line, then
  ``i x y patch_level patch_size_read patch_size_output`` rows
  (``1_WSI2Patches.py:88-90,122-124``);
- ``<mask_path>/<slide_id>/mask.npy``: the (transposed, x-major) boolean
  tissue mask at the lowest pyramid level, dilated×3 then eroded×3
  (``1_WSI2Patches.py:75-78``).

Mask recipe (``get_mask_image``, ``1_WSI2Patches.py:37-51``): per-channel RGB
Otsu background removal ∧ HSV-saturation Otsu ∧ RGB > 50. Otsu thresholding,
binary morphology and the low-contrast check are implemented natively
(numpy/scipy) — the reference's skimage/openslide stack is not a dependency.

The reference fans out per-slide with ``multiprocessing.Pool``
(``1_WSI2Patches.py:181-182``); here slides fan out across processes
(``tile_slides``) and the per-patch candidate loop is vectorized: candidate
grid positions are pre-filtered against the low-res mask in one numpy gather
(the reference checks one Python ``if`` per candidate).

OpenSlide is optional: ``.svs`` pyramids use it when importable; otherwise
the native lazy libtiff reader (``native/tiff_slide.cc``) serves tiled/
stripped pyramids at any size, the eager PIL reader covers TIFFs libtiff
can't parse, and plain images (PNG/JPEG) fall back to a single-level
in-memory pyramid — so the tiler and its tests run without OpenSlide.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from dataclasses import dataclass
from multiprocessing import Pool

import numpy as np
from scipy import ndimage

import cv2


def otsu_threshold(values: np.ndarray) -> float:
    """Otsu's method on a 256-bin histogram (skimage-compatible for uint8)."""
    values = np.asarray(values)
    if values.dtype == np.uint8:
        hist = np.bincount(values.reshape(-1), minlength=256).astype(np.float64)
        centers = np.arange(256, dtype=np.float64)
    else:
        hist, edges = np.histogram(values.reshape(-1), bins=256)
        hist = hist.astype(np.float64)
        centers = (edges[:-1] + edges[1:]) / 2.0
    w0 = np.cumsum(hist)
    w1 = w0[-1] - w0
    mu_cum = np.cumsum(hist * centers)
    mu0 = np.where(w0 > 0, mu_cum / np.maximum(w0, 1e-12), 0.0)
    mu1 = np.where(
        w1 > 0, (mu_cum[-1] - mu_cum) / np.maximum(w1, 1e-12), 0.0
    )
    between = w0[:-1] * w1[:-1] * (mu0[:-1] - mu1[:-1]) ** 2
    return float(centers[np.argmax(between)])


def rgb_to_saturation(img_rgb: np.ndarray) -> np.ndarray:
    rgb = img_rgb.astype(np.float64)
    maxc = rgb.max(axis=-1)
    minc = rgb.min(axis=-1)
    return np.where(maxc > 0, (maxc - minc) / np.maximum(maxc, 1e-12), 0.0)


def tissue_mask(img_rgb: np.ndarray, rgb_min: int = 50) -> np.ndarray:
    """Reference mask recipe (``get_mask_image``, 1_WSI2Patches.py:37-51)."""
    r, g, b = img_rgb[..., 0], img_rgb[..., 1], img_rgb[..., 2]
    background = (
        (r > otsu_threshold(r)) & (g > otsu_threshold(g)) & (b > otsu_threshold(b))
    )
    sat = rgb_to_saturation(img_rgb)
    tissue_s = sat > otsu_threshold(sat)
    return (
        ~background
        & tissue_s
        & (r > rgb_min)
        & (g > rgb_min)
        & (b > rgb_min)
    )


def is_low_contrast(img_rgb: np.ndarray, fraction_threshold: float = 0.05) -> bool:
    """skimage-equivalent: intensity range below 5% of the dtype range."""
    gray = cv2.cvtColor(img_rgb, cv2.COLOR_RGB2GRAY)
    lo, hi = np.percentile(gray, [1, 99])
    return (hi - lo) / 255.0 < fraction_threshold


class ImageSlide:
    """Single-level fallback pyramid for plain images (no OpenSlide)."""

    def __init__(self, path: str, thumb_max: int = 1024):
        bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        if bgr is None:
            raise FileNotFoundError(path)
        self.img = bgr[:, :, ::-1]
        h, w = self.img.shape[:2]
        scale = max(1, int(np.ceil(max(h, w) / thumb_max)))
        self.thumb = self.img[::scale, ::scale]
        # (width, height) per level, openslide convention
        self.level_dimensions = [
            (w, h),
            (self.thumb.shape[1], self.thumb.shape[0]),
        ]
        self.properties: dict = {}

    def read_region(self, xy, level, size):
        x, y = xy
        w, h = size
        src = self.img if level == 0 else self.thumb
        out = np.zeros((h, w, 3), np.uint8)
        ys, xs = src.shape[:2]
        y1, x1 = min(y + h, ys), min(x + w, xs)
        if y < ys and x < xs:
            out[: y1 - y, : x1 - x] = src[y:y1, x:x1]
        return out


class PyramidTiffSlide:
    """OpenSlide-compatible reader for multi-page pyramidal TIFFs via PIL.

    Covers the reference's real input class — Aperio ``.svs`` files are
    pyramidal TIFFs — when the OpenSlide C library is absent. Implements the
    subset of the OpenSlide API the tiler uses (``1_WSI2Patches.py:70,98-104``):

    - ``level_dimensions``: per-page ``(width, height)``, page 0 = full res;
    - ``properties['aperio.AppMag']`` parsed from the Aperio-style
      ImageDescription tag (``|AppMag = 40|`` fields);
    - ``read_region((x, y), level, (w, h))`` with **level-0 coordinates** for
      ``(x, y)`` and level coordinates for the size, zero-padded at edges —
      OpenSlide semantics exactly.

    LIMITATION: PIL's TIFF plugin decodes whole pages, so every level is
    held in RAM. That is fine for moderate pyramids but NOT for full-size
    vendor slides (level 0 of a 40× Aperio scan is tens of GB decompressed)
    — ``max_pixels`` refuses those with an actionable error instead of
    OOM-ing; install OpenSlide for lazy region reads on real slides.
    """

    # ~1.5 GB of RGB across all levels by default
    def __init__(self, path: str, max_pixels: int = 512_000_000):
        from PIL import Image

        self._levels: list[np.ndarray] = []
        description = ""
        with Image.open(path) as im:
            n = getattr(im, "n_frames", 1)
            description = str(im.tag_v2.get(270, "")) if hasattr(im, "tag_v2") else ""
            total = 0
            for page in range(n):
                im.seek(page)
                total += im.width * im.height
            if total > max_pixels:
                raise MemoryError(
                    f"{path}: pyramid holds {total:,} pixels; the PIL-based "
                    f"reader decodes whole levels into RAM (limit "
                    f"{max_pixels:,}). Install OpenSlide for lazy region "
                    f"reads of full-size slides."
                )
            for page in range(n):
                im.seek(page)
                self._levels.append(np.asarray(im.convert("RGB")))
        # pages sorted full-res first (openslide guarantees this ordering)
        self._levels.sort(key=lambda a: -a.shape[0] * a.shape[1])
        self.level_dimensions = [
            (lvl.shape[1], lvl.shape[0]) for lvl in self._levels
        ]
        self.properties = self._parse_aperio(description)

    @staticmethod
    def _parse_aperio(description: str) -> dict:
        props: dict = {}
        for field in description.split("|"):
            if "=" in field:
                k, _, v = field.partition("=")
                props[f"aperio.{k.strip()}"] = v.strip()
        return props

    def read_region(self, xy, level, size):
        x0, y0 = xy  # level-0 coordinates (openslide convention)
        w, h = size  # level coordinates
        lvl = self._levels[level]
        ds_x = self.level_dimensions[0][0] / self.level_dimensions[level][0]
        ds_y = self.level_dimensions[0][1] / self.level_dimensions[level][1]
        x, y = int(x0 / ds_x), int(y0 / ds_y)
        out = np.zeros((h, w, 3), np.uint8)
        ys, xs = lvl.shape[:2]
        if y < ys and x < xs:
            y1, x1 = min(y + h, ys), min(x + w, xs)
            out[: y1 - y, : x1 - x] = lvl[y:y1, x:x1]
        return out


class NativeTiffSlide:
    """Lazy pyramidal-TIFF reader via libtiff (``native/tiff_slide.cc``).

    The production path for vendor-scale slides: Aperio ``.svs`` files are
    tiled(-JPEG) pyramidal TIFFs, and this reader decodes ONLY the
    tiles/strips a ``read_region`` touches — constant memory regardless of
    slide size, unlike the eager PIL reader above. Same OpenSlide API subset
    as :class:`PyramidTiffSlide` (level-0 coordinates for ``(x, y)``).

    Vendor-codec coverage beyond what libtiff decodes itself:

    - **Aperio JPEG 2000 compression (33003 YCbCr / 33005 RGB)** — tiles
      are bare J2K codestreams; they are pulled raw off the file and decoded
      through Pillow's OpenJPEG binding, with the 33003 YCbCr→RGB transform
      applied exactly as OpenSlide's aperio driver does (the codestreams
      carry no MCT, so the components come back untransformed).
    - **Associated images** — the stripped directories of a tiled slide
      (thumbnail / label / macro) are exposed as
      ``associated_images[name]`` PIL Images, OpenSlide-style, named by
      their ImageDescription keywords per the Aperio convention.
    """

    _APERIO_J2K = (33003, 33005)
    _TILE_CACHE = 16  # decoded-tile LRU per slide (J2K path)

    def __init__(self, path: str):
        from multimodalbrainsurvival_tpu.utils.native_tiff import (
            NativeSlideHandle,
        )

        self._h = NativeSlideHandle(path)
        self.level_dimensions = self._h.level_dimensions
        self.properties = PyramidTiffSlide._parse_aperio(self._h.description)
        self._level_info: dict[int, tuple[int, int, int]] = {}
        self._tile_cache: "OrderedDict[tuple, np.ndarray]" = OrderedDict()
        self._associated: dict | None = None

    def _info(self, level: int) -> tuple[int, int, int]:
        if level not in self._level_info:
            self._level_info[level] = self._h.level_info(level)
        return self._level_info[level]

    def _decode_j2k_tile(self, level: int, tx: int, ty: int,
                         compression: int) -> np.ndarray:
        key = (level, tx, ty)
        cached = self._tile_cache.get(key)
        if cached is not None:
            self._tile_cache.move_to_end(key)
            return cached
        import io

        from PIL import Image

        raw = self._h.read_raw_tile(level, tx, ty)
        img = Image.open(io.BytesIO(raw))
        if compression == 33003:
            # Aperio 33003 stores YCbCr planes with no MCT signalled; the
            # decoder hands the components back verbatim, so reinterpret +
            # convert (same as OpenSlide's aperio vendor driver).
            arr = np.asarray(img)
            if arr.ndim == 3 and arr.shape[2] == 3:
                img = Image.fromarray(arr, mode="YCbCr").convert("RGB")
        arr = np.asarray(img.convert("RGB"))
        self._tile_cache[key] = arr
        if len(self._tile_cache) > self._TILE_CACHE:
            self._tile_cache.popitem(last=False)
        return arr

    def _read_region_j2k(self, level, x, y, w, h, compression, tw, th):
        out = np.zeros((h, w, 3), np.uint8)
        img_w, img_h = self.level_dimensions[level]
        x0, y0 = max(x, 0), max(y, 0)
        x1, y1 = min(x + w, img_w), min(y + h, img_h)
        if x0 >= x1 or y0 >= y1:
            return out
        for ty in range((y0 // th) * th, y1, th):
            for tx in range((x0 // tw) * tw, x1, tw):
                tile = self._decode_j2k_tile(level, tx, ty, compression)
                rx0, ry0 = max(x0, tx), max(y0, ty)
                rx1 = min(x1, tx + tile.shape[1])
                ry1 = min(y1, ty + tile.shape[0])
                if rx0 >= rx1 or ry0 >= ry1:
                    continue
                out[ry0 - y:ry1 - y, rx0 - x:rx1 - x] = tile[
                    ry0 - ty:ry1 - ty, rx0 - tx:rx1 - tx]
        return out

    def read_region(self, xy, level, size):
        x0, y0 = xy  # level-0 coordinates (openslide convention)
        w, h = size  # level coordinates
        ds_x = self.level_dimensions[0][0] / self.level_dimensions[level][0]
        ds_y = self.level_dimensions[0][1] / self.level_dimensions[level][1]
        x, y = int(x0 / ds_x), int(y0 / ds_y)
        compression, tw, th = self._info(level)
        if compression in self._APERIO_J2K and tw > 0:
            return self._read_region_j2k(level, x, y, w, h, compression,
                                         tw, th)
        return self._h.read_region_level(level, x, y, w, h)

    @property
    def associated_images(self) -> dict:
        """name → PIL Image, per the Aperio layout: the first stripped
        directory is the thumbnail; later stripped dirs are named by the
        'label' / 'macro' keyword in their ImageDescription."""
        if self._associated is None:
            from PIL import Image

            out = {}
            for i, (w, h, desc) in enumerate(self._h.associated()):
                low = desc.lower()
                if "label" in low:
                    name = "label"
                elif "macro" in low:
                    name = "macro"
                elif i == 0:
                    name = "thumbnail"
                else:
                    name = f"associated_{i}"
                out[name] = Image.fromarray(self._h.read_associated(i, w, h))
            self._associated = out
        return self._associated


SLIDE_EXTS = (".svs", ".png", ".tif", ".tiff", ".jpg", ".jpeg", ".ndpi")


def slide_id_for(name: str) -> str:
    """Slide id from a slide file name: strip ONLY a known slide extension.

    The reference's ``get_slide_id`` (``1_WSI2Patches.py:135-136``) is
    ``split('.')[0]``, which truncates real TCGA names — they embed a UUID
    after a dot (``...-DX1.83fce43e-....svs``) — colliding two scans of one
    case onto a single patch directory (the second silently overwrites the
    first's loc.txt and PNGs). Unconditional bug fix (SURVEY §2.4): strip a
    recognized extension only, keep every other dot."""
    base = os.path.basename(name)
    stem, ext = os.path.splitext(base)
    return stem if ext.lower() in SLIDE_EXTS else base


def open_slide(path: str):
    if path.lower().endswith((".svs", ".ndpi", ".mrxs", ".tiff", ".tif")):
        try:
            from openslide import OpenSlide

            return OpenSlide(path)
        except ImportError:
            pass
        from multimodalbrainsurvival_tpu.utils import native_tiff

        if native_tiff.available():
            try:
                slide = NativeTiffSlide(path)
                if len(slide.level_dimensions) > 1:
                    return slide  # lazy reads, any slide size
            except OSError:
                pass  # not a TIFF libtiff groks; try the PIL reader
        try:
            slide = PyramidTiffSlide(path)
            if len(slide.level_dimensions) > 1:
                return slide  # real pyramid: keep openslide-like levels
        except MemoryError:
            raise  # too big for the eager reader — surface the guidance
        except Exception as e:  # not a TIFF PIL can read; try cv2
            print(f"PyramidTiffSlide could not read {path} ({e!r}); "
                  f"falling back to single-level cv2 reader")
    return ImageSlide(path)


def _region_rgb(slide, xy, level, size) -> np.ndarray:
    region = slide.read_region(xy, level, size)
    if isinstance(region, np.ndarray):
        return region
    return np.array(region.convert("RGB"))


@dataclass
class TileConfig:
    patch_size: int = 224
    max_patches_per_slide: int = 2000
    dezoom_factor: float = 1.0
    background_threshold: float = 0.2
    rgb_min: int = 50
    seed: int = 5  # the reference's fixed shuffle seed (1_WSI2Patches.py:105)
    # also write <slide>/patches.npy — a packed (N, P, P, 3) uint8 shard the
    # loader mmaps with ZERO per-patch decode (additive artifact alongside
    # the reference PNG contract; SURVEY.md §7 "host input pipeline")
    pack: bool = False


def pack_patch_dir(patch_dir: str) -> int:
    """Repack an existing per-slide PNG patch directory into patches.npy.

    Returns the number of patches packed. Idempotent: skips when the shard
    is newer than loc.txt."""
    loc = os.path.join(patch_dir, "loc.txt")
    out = os.path.join(patch_dir, "patches.npy")
    with open(loc) as f:
        n = sum(1 for _ in f) - 2
    if n <= 0:
        return 0
    if os.path.isfile(out) and os.path.getmtime(out) >= os.path.getmtime(loc):
        return n
    slide_id = os.path.basename(os.path.normpath(patch_dir))

    def _read(i: int) -> np.ndarray:
        path = os.path.join(patch_dir, f"{slide_id}_patch_{i}.png")
        img = cv2.imread(path)
        if img is None:  # loc.txt count out of sync with files on disk
            raise FileNotFoundError(path)
        return img[:, :, ::-1]

    first = _read(0)
    P = first.shape[0]
    packed = np.zeros((n, P, P, 3), np.uint8)
    packed[0] = first
    for i in range(1, n):
        packed[i] = _read(i)
    np.save(out, packed)
    return n


def compute_tissue_mask(slide, config: TileConfig = TileConfig()) -> np.ndarray:
    """Low-res tissue mask at the lowest pyramid level: transposed (x-major),
    dilated×3 then eroded×3 (``1_WSI2Patches.py:58-60,75-78``)."""
    mask_level = len(slide.level_dimensions) - 1
    thumb = _region_rgb(
        slide, (0, 0), mask_level, slide.level_dimensions[mask_level]
    )
    mask = tissue_mask(np.transpose(thumb, (1, 0, 2)), config.rgb_min)
    mask = ndimage.binary_dilation(mask, iterations=3)
    mask = ndimage.binary_erosion(mask, iterations=3)
    return mask


def read_size_for(slide, config: TileConfig) -> int:
    """Level-0 read size for one output patch: AppMag-40 slides read 2× and
    downscale (``1_WSI2Patches.py:98-104``)."""
    app_mag = float(slide.properties.get("aperio.AppMag", 20))
    return int((app_mag / 20.0) * config.dezoom_factor * config.patch_size)


def candidate_positions(slide, mask: np.ndarray, config: TileConfig) -> np.ndarray:
    """Seed-shuffled level-0 grid positions pre-filtered by the low-res mask
    (vectorized form of the reference's per-candidate ``if``; same seed-5
    shuffle, ``1_WSI2Patches.py:105``). Returns an (M, 2) int array."""
    xmax, ymax = slide.level_dimensions[0]
    mask_level = len(slide.level_dimensions) - 1
    mx, my = slide.level_dimensions[mask_level]
    ratio_x = xmax / mx
    ratio_y = ymax / my
    read_size = read_size_for(slide, config)

    xs = np.arange(0, xmax, read_size)
    ys = np.arange(0, ymax, read_size)
    grid = np.stack(np.meshgrid(xs, ys, indexing="ij"), axis=-1).reshape(-1, 2)
    rng = np.random.RandomState(config.seed)
    rng.shuffle(grid)
    mask_ix = np.minimum((grid[:, 0] / ratio_x).astype(int), mask.shape[0] - 1)
    mask_iy = np.minimum((grid[:, 1] / ratio_y).astype(int), mask.shape[1] - 1)
    return grid[mask[mask_ix, mask_iy]]


def iter_tissue_patches(slide, config: TileConfig = TileConfig(), mask=None):
    """Stream accepted tissue tiles off an open slide: yields
    ``(index, x, y, patch)`` with ``patch`` a ``(patch_size, patch_size, 3)``
    uint8 RGB array, in exactly the order/selection ``extract_patches``
    writes them (reference acceptance rule: ≥``background_threshold``
    dilated-tissue fraction ∧ not low-contrast, ``1_WSI2Patches.py:106-121``).

    This is the zero-artifact core shared by the tiling CLI (which writes the
    PNG/loc.txt contract) and the streaming slide→features serving path
    (``cli/slide_extractfeatures.py``), which feeds the tiles straight to the
    TPU without touching disk."""
    if mask is None:
        mask = compute_tissue_mask(slide, config)
    read_size = read_size_for(slide, config)
    i = 0
    for x, y in candidate_positions(slide, mask, config):
        patch = _region_rgb(slide, (int(x), int(y)), 0, (read_size, read_size))
        m = ndimage.binary_dilation(
            tissue_mask(patch, config.rgb_min), iterations=3
        )
        if m.sum() > config.background_threshold * m.size and not is_low_contrast(
            patch
        ):
            if read_size != config.patch_size:
                patch = cv2.resize(
                    patch,
                    (config.patch_size, config.patch_size),
                    interpolation=cv2.INTER_LINEAR,
                )
            yield i, x, y, patch
            i += 1
        if i >= config.max_patches_per_slide:
            return


def extract_patches(
    slide_path: str,
    patch_path: str,
    mask_path: str,
    config: TileConfig = TileConfig(),
    slide_id: str | None = None,
) -> int:
    """Tile one slide; returns the number of patches written."""
    if slide_id is None:
        slide_id = slide_id_for(slide_path)
    patch_dir = os.path.join(patch_path, slide_id)
    mask_dir = os.path.join(mask_path, slide_id)
    os.makedirs(patch_dir, exist_ok=True)

    slide = open_slide(slide_path)

    mask_file = os.path.join(mask_dir, "mask.npy")
    if os.path.isfile(mask_file):  # idempotent mask cache (1_WSI2Patches.py:73-80)
        mask = np.load(mask_file)
    else:
        os.makedirs(mask_dir, exist_ok=True)
        mask = compute_tissue_mask(slide, config)
        np.save(mask_file, mask)

    read_size = read_size_for(slide, config)
    n = 0
    with open(os.path.join(patch_dir, "loc.txt"), "w") as loc:
        loc.write(f"slide_id {slide_id}\n")
        loc.write("id x y patch_level patch_size_read patch_size_output\n")
        for i, x, y, patch in iter_tissue_patches(slide, config, mask=mask):
            loc.write(f"{i} {x} {y} 0 {read_size} {read_size}\n")
            cv2.imwrite(
                os.path.join(patch_dir, f"{slide_id}_patch_{i}.png"),
                patch[:, :, ::-1],
            )
            n = i + 1
    if n == 0:
        print(f"no patch extracted for slide {slide_id}")
    elif config.pack:
        pack_patch_dir(patch_dir)
    return n


def _tile_one(args) -> int:
    return extract_patches(*args)


def tile_slides(
    slide_paths: list[str],
    patch_path: str,
    mask_path: str,
    config: TileConfig = TileConfig(),
    num_processes: int = 10,
) -> list[int]:
    """Fan slides out over processes (reference Pool, 1_WSI2Patches.py:181-182)."""
    jobs = [(p, patch_path, mask_path, config) for p in slide_paths]
    if num_processes <= 1:
        return [_tile_one(j) for j in jobs]
    with Pool(num_processes) as pool:
        return pool.map(_tile_one, jobs)
