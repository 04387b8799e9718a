"""ctypes bridge to the native quad extractor (builds on demand).

The native stage handles the irregular work (CCL/contours/poly fit); see
``ccrs_tpu/native/quadproc.cpp``.  The library is compiled once per
environment with g++ and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "quadproc.cpp")
_SO = os.path.join(_NATIVE_DIR, "libquadproc.so")

_lock = threading.Lock()
_lib = None

MAX_QUADS = 160
MIN_AREA = 25
MIN_FILL = 0.6


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
        _SRC, "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.quadproc_extract_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),  # bins
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # B H W
            ctypes.POINTER(ctypes.c_float),  # quads
            ctypes.POINTER(ctypes.c_int),  # counts
            ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ]
        lib.quadproc_extract_batch.restype = None
        lib.refine_corners_native.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # imgs
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # B H W
            ctypes.POINTER(ctypes.c_float),  # corners (n,2) in/out
            ctypes.POINTER(ctypes.c_int32),  # img_idx (n,)
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # n, win, iters
        ]
        lib.refine_corners_native.restype = None
        lib.refine_corners_patches.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # patches (n,P,P)
            ctypes.c_int, ctypes.c_int,  # n, P
            ctypes.POINTER(ctypes.c_float),  # corners_local (n,2) in/out
            ctypes.c_int, ctypes.c_int,  # win, iters
        ]
        lib.refine_corners_patches.restype = None
        _lib = lib
        return lib


def extract_quads_batch(
    binary: np.ndarray,
    max_quads: int = MAX_QUADS,
    min_area: int = MIN_AREA,
    min_fill: float = MIN_FILL,
):
    """Extract candidate dark quads from a batch of binary images.

    Args:
      binary: (B, H, W) uint8, 1 = white, 0 = black.

    Returns:
      quads: (B, max_quads, 4, 2) float32 corner coords (x, y), clockwise
        in image coordinates; rows past counts[b] are undefined.
      counts: (B,) int32 number of quads per image.
    """
    lib = _load()
    binary = np.ascontiguousarray(binary, dtype=np.uint8)
    B, H, W = binary.shape
    quads = np.zeros((B, max_quads, 8), np.float32)
    counts = np.zeros(B, np.int32)
    lib.quadproc_extract_batch(
        binary.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        B, H, W,
        quads.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        max_quads, min_area, ctypes.c_float(min_fill),
    )
    return quads.reshape(B, max_quads, 4, 2), counts


def refine_corners_native(
    images: np.ndarray,
    corners: np.ndarray,
    win: int = 4,
    iters: int = 6,
    counts: np.ndarray = None,
    group: int = 1,
) -> np.ndarray:
    """Native cornerSubPix-style refinement (math mirrors detect/refine.py,
    which is the reference implementation; this one runs the scattered tiny
    gathers where they belong — on the host cores, OpenMP over corners).

    Args:
      images: (B, H, W) float32 grayscale.
      corners: (B, M, 2) float32 initial positions.
      counts: optional (B,) — only the first counts[b]*group rows of image
        b are real; padding rows are skipped (the detector's quad buffers
        are heavily padded, and this host stage runs on few cores).
      group: corners per counted unit (4 for quads).

    Returns refined (B, M, 2) float32.
    """
    lib = _load()
    images = np.ascontiguousarray(images, dtype=np.float32)
    B, H, W = images.shape
    M = corners.shape[1]
    out = np.ascontiguousarray(corners, dtype=np.float32).copy()
    if counts is None:
        flat = out.reshape(-1, 2)
        idx = np.repeat(np.arange(B, dtype=np.int32), M)
    else:
        n_real = np.minimum(np.asarray(counts) * group, M)
        sel_b = np.repeat(np.arange(B), n_real)
        sel_m = np.concatenate([np.arange(n) for n in n_real]).astype(np.int64)
        flat = np.ascontiguousarray(out[sel_b, sel_m], dtype=np.float32)
        idx = sel_b.astype(np.int32)
    if flat.shape[0]:
        lib.refine_corners_native(
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            B, H, W,
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            flat.shape[0], win, iters,
        )
    if counts is None:
        return flat.reshape(B, M, 2)
    out[sel_b, sel_m] = flat
    return out


def refine_corners_patches_native(
    patches: np.ndarray, local: np.ndarray, win: int = 4, iters: int = 6
) -> np.ndarray:
    """Refine patch-local corner coordinates (patches extracted on device;
    see detect.patches).  patches: (n, P, P) f32; local: (n, 2) f32."""
    lib = _load()
    patches = np.ascontiguousarray(patches, dtype=np.float32)
    out = np.ascontiguousarray(local, dtype=np.float32).copy()
    n, P, _ = patches.shape
    if n:
        lib.refine_corners_patches(
            patches.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, P,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            win, iters,
        )
    return out
