"""ctypes binding + on-demand build of the native C++ patch loader.

``native/patch_loader.cc`` is the GIL-free host input runtime: a C++ thread
pool decoding PNG batches straight into the numpy buffer that feeds
``jax.device_put``. This module compiles it on first use (g++, cached next to
the source), exposes ``decode_patch_batch``, and reports availability so the
data layer can fall back to the cv2 thread-pool path (decode failures on
individual files — exotic PNG variants — are also retried via cv2).
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
_SRC = os.path.join(_REPO_ROOT, "native", "patch_loader.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libpatchloader.so")

_lock = threading.Lock()
_lib = None
_load_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", _LIB, "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        print(f"native patch loader build failed ({e}); using cv2 fallback")
        return False


def get_library():
    """Returns the loaded ctypes library, building it if needed, or None."""
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
            lib.decode_patch_batch.restype = ctypes.c_int
            lib.decode_patch_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.assemble_patch_batch.restype = ctypes.c_int
            lib.assemble_patch_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),   # paths (NULL-able)
                ctypes.POINTER(ctypes.c_void_p),   # raw RGB srcs (NULL-able)
                ctypes.POINTER(ctypes.c_int),      # src_h
                ctypes.POINTER(ctypes.c_int),      # src_w
                ctypes.c_int,                      # n slots
                ctypes.POINTER(ctypes.c_uint8),    # out (n, h, w, 3)
                ctypes.c_int,                      # h
                ctypes.c_int,                      # w
                ctypes.c_int,                      # num_threads
                ctypes.POINTER(ctypes.c_int),      # codes
            ]
            _lib = lib
        except (OSError, AttributeError) as e:
            # AttributeError: a stale .so missing a newer symbol (e.g. an
            # mtime-preserving copy of a pre-assembler build) must also fall
            # back to cv2 instead of crashing dataset construction
            print(f"native patch loader load failed ({e}); using cv2 fallback")
            _load_failed = True
        return _lib


def available() -> bool:
    return get_library() is not None


def decode_patch_batch(
    paths: list[str], out: np.ndarray, num_threads: int = 8
) -> np.ndarray:
    """Decode PNGs at ``paths`` into ``out`` (n, h, w, 3) uint8 (C-contiguous).

    Returns an int32 array of per-file status codes (0 = ok); non-zero rows
    are zero-filled and should be retried with the caller's fallback decoder.
    """
    lib = get_library()
    if lib is None:
        raise RuntimeError("native patch loader unavailable")
    n, h, w, c = out.shape
    assert c == 3 and out.dtype == np.uint8 and out.flags.c_contiguous
    assert len(paths) == n
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    codes = np.zeros(n, np.int32)
    lib.decode_patch_batch(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        num_threads,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return codes


def assemble_patch_batch(
    paths: list[str | None],
    srcs: np.ndarray,
    src_h: np.ndarray,
    src_w: np.ndarray,
    out: np.ndarray,
    num_threads: int = 8,
) -> np.ndarray:
    """Fill ``out`` (n, h, w, 3) uint8 in ONE native call: slot i comes from a
    raw RGB pointer (``srcs[i] != 0`` — a packed-shard row, memcpy'd) or a PNG
    path (decoded), else stays zero (padding). The call runs with the GIL
    released on a C++ thread pool.

    Returns per-slot int32 codes: 0 ok, 200 = shard-row size mismatch (caller
    resizes that slot), other = PNG decode failure (caller retries via cv2).
    """
    lib = get_library()
    if lib is None:
        raise RuntimeError("native patch loader unavailable")
    n, h, w, c = out.shape
    assert c == 3 and out.dtype == np.uint8 and out.flags.c_contiguous
    assert len(paths) == n and srcs.shape == (n,)
    path_arr = (ctypes.c_char_p * n)(
        *[p.encode() if p is not None else None for p in paths]
    )
    srcs = np.ascontiguousarray(srcs, dtype=np.uintp)
    src_h = np.ascontiguousarray(src_h, dtype=np.int32)
    src_w = np.ascontiguousarray(src_w, dtype=np.int32)
    codes = np.zeros(n, np.int32)
    lib.assemble_patch_batch(
        path_arr,
        srcs.ctypes.data_as(ctypes.POINTER(ctypes.c_void_p)),
        src_h.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        src_w.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        num_threads,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return codes
