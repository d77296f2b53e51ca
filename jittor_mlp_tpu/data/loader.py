"""Host-side batch loader backed by the native C++ preprocessing extension.

Builds data/native/fastloader.cpp with g++ on first use (cached .so next to
the source), binds it via ctypes, and falls back to numpy when no compiler is
available. ``HostLoader`` assembles model-ready NCHW float batches from uint8
HWC images with zero per-pixel Python work; pair with data.make_preprocess for
the fully on-device alternative.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "native", "fastloader.cpp")
_SO = os.path.join(os.path.dirname(__file__), "native", "_fastloader.so")


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-o", _SO, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        # retry without openmp
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True,
        )


def _lib():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.normalize_u8_nhwc_to_nchw_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.resize_bilinear_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available():
    return _lib() is not None


_DECODE_SRC = os.path.join(os.path.dirname(__file__), "native", "decode.cpp")
_DECODE_SO = os.path.join(os.path.dirname(__file__), "native", "_decode.so")
_DECODE_LIB = None
_DECODE_TRIED = False


def _decode_lib():
    global _DECODE_LIB, _DECODE_TRIED
    with _LOCK:
        if _DECODE_LIB is not None or _DECODE_TRIED:
            return _DECODE_LIB
        _DECODE_TRIED = True
        try:
            if (not os.path.exists(_DECODE_SO)
                    or os.path.getmtime(_DECODE_SO) < os.path.getmtime(_DECODE_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _DECODE_SO,
                     _DECODE_SRC, "-ljpeg", "-lpng", "-lpthread"],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_DECODE_SO)
            lib.decode_batch_to_square_rgb.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p,
            ]
            _DECODE_LIB = lib
        except Exception:
            _DECODE_LIB = None
        return _DECODE_LIB


def decode_available():
    return _decode_lib() is not None


def decode_batch(buffers, size, threads=None):
    """Decode a list of encoded image byte strings (JPEG/PNG) to a
    (n, size, size, 3) uint8 batch — shorter-side resize + center crop,
    the ImageFolderDataset.get geometry — on a native thread pool.

    Returns (batch, fail) where fail[i] is True for images the native path
    could not handle (other containers, CMYK, corrupt data); the caller
    falls back to PIL for those. Raises RuntimeError if the native library
    is unavailable — gate on decode_available().
    """
    lib = _decode_lib()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(buffers)
    blob = b"".join(buffers)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(b) for b in buffers], out=offsets[1:])
    out = np.empty((n, size, size, 3), np.uint8)
    fail = np.zeros(n, np.uint8)
    if threads is None:
        threads = min(8, os.cpu_count() or 1)
    blob_arr = np.frombuffer(blob, np.uint8) if blob else np.zeros(1, np.uint8)
    lib.decode_batch_to_square_rgb(
        blob_arr.ctypes.data, offsets.ctypes.data, n,
        out.ctypes.data, size, threads, fail.ctypes.data,
    )
    return out, fail.astype(bool)


def normalize_batch(images_u8, mean, std):
    """(N, H, W, C) uint8 → (N, C, H, W) float32 standardized."""
    images_u8 = np.ascontiguousarray(images_u8, dtype=np.uint8)
    n, h, w, c = images_u8.shape
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    lib = _lib()
    if lib is None:
        x = images_u8.astype(np.float32) / 255.0
        x = (x - mean) / std
        return np.ascontiguousarray(x.transpose(0, 3, 1, 2))
    out = np.empty((n, c, h, w), np.float32)
    lib.normalize_u8_nhwc_to_nchw_f32(
        images_u8.ctypes.data, out.ctypes.data, n, h, w, c,
        mean.ctypes.data, std.ctypes.data,
    )
    return out


def resize_batch(images_u8, size):
    """(N, H, W, C) uint8 → (N, size, size, C) uint8, bilinear half-pixel."""
    images_u8 = np.ascontiguousarray(images_u8, dtype=np.uint8)
    n, h, w, c = images_u8.shape
    oh, ow = (size, size) if isinstance(size, int) else size
    lib = _lib()
    if lib is None:
        import jax
        import jax.numpy as jnp

        out = jax.image.resize(
            jnp.asarray(images_u8, jnp.float32), (n, oh, ow, c), "bilinear"
        )
        return np.asarray(jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8))
    out = np.empty((n, oh, ow, c), np.uint8)
    lib.resize_bilinear_u8(
        images_u8.ctypes.data, out.ctypes.data, n, h, w, c, oh, ow
    )
    return out


class HostLoader:
    """Assemble model-ready batches from uint8 HWC images on the host."""

    def __init__(self, image_size=224, mean=(0.485, 0.456, 0.406),
                 std=(0.229, 0.224, 0.225)):
        self.image_size = image_size
        self.mean = mean
        self.std = std

    def __call__(self, images_u8):
        x = np.asarray(images_u8)
        if x.shape[1] != self.image_size or x.shape[2] != self.image_size:
            x = resize_batch(x, self.image_size)
        return normalize_batch(x, self.mean, self.std)
