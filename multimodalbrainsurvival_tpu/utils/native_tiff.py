"""ctypes binding + on-demand build of the native libtiff slide reader.

``native/tiff_slide.cc`` provides lazy region reads on pyramidal TIFFs —
the OpenSlide capability the reference's tiler depends on
(``1_WSI2Patches.py:70,112``) — decoding only the tiles/strips a region
touches, so vendor-scale slides (tiled-JPEG ``.svs`` pyramids whose level 0
is tens of GB decompressed) stream through the tiler in constant memory.
Falls back gracefully (``available()`` False) when libtiff or g++ is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")
)
_SRC = os.path.join(_REPO_ROOT, "native", "tiff_slide.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libtiffslide.so")

_lock = threading.Lock()
_lib = None
_load_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", _LIB, "-ltiff",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        print(f"native tiff slide build failed ({e}); using PIL fallback")
        return False


def get_library():
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.isfile(_SRC):
            _load_failed = True
            return None
        if not os.path.isfile(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.tiff_slide_open.restype = ctypes.c_void_p
            lib.tiff_slide_open.argtypes = [ctypes.c_char_p]
            lib.tiff_slide_close.argtypes = [ctypes.c_void_p]
            lib.tiff_slide_n_levels.restype = ctypes.c_int
            lib.tiff_slide_n_levels.argtypes = [ctypes.c_void_p]
            lib.tiff_slide_level_size.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.tiff_slide_description.restype = ctypes.c_int
            lib.tiff_slide_description.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ]
            lib.tiff_slide_read_region.restype = ctypes.c_int
            lib.tiff_slide_read_region.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.tiff_slide_write_test.restype = ctypes.c_int
            lib.tiff_slide_write_test.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
            ]
            lib.tiff_slide_level_info.restype = ctypes.c_int
            lib.tiff_slide_level_info.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.tiff_slide_read_raw_tile.restype = ctypes.c_int64
            lib.tiff_slide_read_raw_tile.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
            ]
            lib.tiff_slide_n_associated.restype = ctypes.c_int
            lib.tiff_slide_n_associated.argtypes = [ctypes.c_void_p]
            lib.tiff_slide_associated_info.restype = ctypes.c_int
            lib.tiff_slide_associated_info.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_char_p, ctypes.c_int,
            ]
            lib.tiff_slide_read_associated.restype = ctypes.c_int
            lib.tiff_slide_read_associated.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.tiff_builder_open.restype = ctypes.c_void_p
            lib.tiff_builder_open.argtypes = [ctypes.c_char_p]
            lib.tiff_builder_dir_begin.restype = ctypes.c_int
            lib.tiff_builder_dir_begin.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_char_p,
            ]
            lib.tiff_builder_write_raw_tile.restype = ctypes.c_int
            lib.tiff_builder_write_raw_tile.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ]
            lib.tiff_builder_write_rgb.restype = ctypes.c_int
            lib.tiff_builder_write_rgb.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.tiff_builder_dir_end.restype = ctypes.c_int
            lib.tiff_builder_dir_end.argtypes = [ctypes.c_void_p]
            lib.tiff_builder_close.argtypes = [ctypes.c_void_p]
            _lib = lib
        except (OSError, AttributeError) as e:
            print(f"native tiff slide load failed ({e}); using PIL fallback")
            _load_failed = True
        return _lib


def available() -> bool:
    return get_library() is not None


class NativeSlideHandle:
    """RAII wrapper over the C slide handle."""

    def __init__(self, path: str):
        lib = get_library()
        if lib is None:
            raise RuntimeError("native tiff slide unavailable")
        self._lib = lib
        self._h = lib.tiff_slide_open(path.encode())
        if not self._h:
            raise OSError(f"libtiff could not open {path}")
        n = lib.tiff_slide_n_levels(self._h)
        self.level_dimensions = []
        for i in range(n):
            w, h = ctypes.c_int(), ctypes.c_int()
            lib.tiff_slide_level_size(self._h, i, ctypes.byref(w),
                                      ctypes.byref(h))
            self.level_dimensions.append((w.value, h.value))
        size = lib.tiff_slide_description(self._h, None, 0)
        buf = ctypes.create_string_buffer(size + 1)
        lib.tiff_slide_description(self._h, buf, size + 1)
        self.description = buf.value.decode("utf-8", errors="replace")

    def read_region_level(self, level: int, x: int, y: int,
                          w: int, h: int) -> np.ndarray:
        """(x, y) in LEVEL coordinates; returns (h, w, 3) uint8 RGB."""
        out = np.zeros((h, w, 3), np.uint8)
        rc = self._lib.tiff_slide_read_region(
            self._h, level, x, y, w, h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            raise OSError(f"tiff_slide_read_region failed (code {rc})")
        return out

    def level_info(self, level: int) -> tuple[int, int, int]:
        """(compression_tag, tile_w, tile_h) — tile dims 0 when stripped."""
        comp, tw, th = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
        rc = self._lib.tiff_slide_level_info(
            self._h, level, ctypes.byref(comp), ctypes.byref(tw),
            ctypes.byref(th),
        )
        if rc != 0:
            raise OSError(f"tiff_slide_level_info failed (code {rc})")
        return comp.value, tw.value, th.value

    def read_raw_tile(self, level: int, x: int, y: int) -> bytes:
        """Still-compressed bytes of the tile containing level-coord (x, y).

        The escape hatch for codecs libtiff can't decode: Aperio 33003/33005
        tiles are bare JPEG 2000 codestreams."""
        need = self._lib.tiff_slide_read_raw_tile(
            self._h, level, x, y, None, 0)
        if need < 0:
            raise OSError(f"tiff_slide_read_raw_tile failed (code {need})")
        buf = (ctypes.c_uint8 * need)()
        got = self._lib.tiff_slide_read_raw_tile(
            self._h, level, x, y, buf, need)
        if got < 0:
            raise OSError(f"tiff_slide_read_raw_tile failed (code {got})")
        return bytes(buf[:got])

    def associated(self) -> list[tuple[int, int, str]]:
        """[(w, h, description), ...] for each stripped associated image."""
        out = []
        for i in range(self._lib.tiff_slide_n_associated(self._h)):
            w, h = ctypes.c_int(), ctypes.c_int()
            desc = ctypes.create_string_buffer(4096)
            rc = self._lib.tiff_slide_associated_info(
                self._h, i, ctypes.byref(w), ctypes.byref(h), desc, 4096)
            if rc != 0:
                raise OSError(f"tiff_slide_associated_info failed ({rc})")
            out.append((w.value, h.value,
                        desc.value.decode("utf-8", errors="replace")))
        return out

    def read_associated(self, i: int, w: int, h: int) -> np.ndarray:
        out = np.zeros((h, w, 3), np.uint8)
        rc = self._lib.tiff_slide_read_associated(
            self._h, i, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise OSError(f"tiff_slide_read_associated failed (code {rc})")
        return out

    def close(self):
        if self._h:
            self._lib.tiff_slide_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_test_pyramid(path: str, levels: list[np.ndarray], tile: int,
                       compression: str = "none",
                       description: str = "") -> None:
    """Test fixture writer: scanner-style pyramidal TIFF from RGB arrays.

    ``tile > 0`` writes tiled directories (like real .svs levels); 0 writes
    strips. ``compression``: 'none' or 'jpeg' (quality 90, lossy)."""
    lib = get_library()
    if lib is None:
        raise RuntimeError("native tiff slide unavailable")
    comp = {"none": 1, "jpeg": 7}[compression]
    levels = [np.ascontiguousarray(lvl, dtype=np.uint8) for lvl in levels]
    ptrs = (ctypes.c_char_p * len(levels))(
        *[lvl.ctypes.data_as(ctypes.c_char_p) for lvl in levels]
    )
    ws = (ctypes.c_int * len(levels))(*[lvl.shape[1] for lvl in levels])
    hs = (ctypes.c_int * len(levels))(*[lvl.shape[0] for lvl in levels])
    rc = lib.tiff_slide_write_test(
        path.encode(), ptrs, ws, hs, len(levels), tile, comp,
        description.encode(),
    )
    if rc != 0:
        raise OSError(f"tiff_slide_write_test failed (code {rc})")


class SlideBuilder:
    """Test-fixture writer for faithful ``.svs`` layouts.

    Drives the native directory-at-a-time builder so tests can fabricate
    what Aperio scanners actually write: tiled pyramid levels (optionally
    raw pre-encoded JPEG 2000 tiles under compression 33003/33005, which
    libtiff cannot encode) interleaved with stripped associated images
    (thumbnail / label / macro) carrying identifying descriptions."""

    def __init__(self, path: str):
        lib = get_library()
        if lib is None:
            raise RuntimeError("native tiff slide unavailable")
        self._lib = lib
        self._b = lib.tiff_builder_open(path.encode())
        if not self._b:
            raise OSError(f"could not open {path} for writing")

    def add_rgb_dir(self, img: np.ndarray, tile: int = 0,
                    compression: int = 1, description: str = "") -> None:
        """One directory encoded by libtiff itself (tile=0 → stripped)."""
        img = np.ascontiguousarray(img, dtype=np.uint8)
        h, w = img.shape[:2]
        if self._lib.tiff_builder_dir_begin(
                self._b, w, h, tile, compression, description.encode()):
            raise OSError("tiff_builder_dir_begin failed")
        if self._lib.tiff_builder_write_rgb(
                self._b, img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                w, h, tile):
            raise OSError("tiff_builder_write_rgb failed")
        if self._lib.tiff_builder_dir_end(self._b):
            raise OSError("tiff_builder_dir_end failed")

    def add_raw_tiled_dir(self, w: int, h: int, tile: int,
                          tiles: list[bytes], compression: int,
                          description: str = "") -> None:
        """One tiled directory from pre-encoded per-tile byte strings,
        row-major over the ceil(w/tile) x ceil(h/tile) grid."""
        if self._lib.tiff_builder_dir_begin(
                self._b, w, h, tile, compression, description.encode()):
            raise OSError("tiff_builder_dir_begin failed")
        for idx, data in enumerate(tiles):
            buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
            if self._lib.tiff_builder_write_raw_tile(
                    self._b, idx, buf, len(data)):
                raise OSError(f"tiff_builder_write_raw_tile failed ({idx})")
        if self._lib.tiff_builder_dir_end(self._b):
            raise OSError("tiff_builder_dir_end failed")

    def close(self) -> None:
        if self._b:
            self._lib.tiff_builder_close(self._b)
            self._b = None
