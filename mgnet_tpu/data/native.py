"""ctypes bindings for the native image pipeline (native/src/image_ops.cpp).

The loader auto-builds the shared library on first use when a compiler is
available and falls back to PIL/cv2 otherwise — the Python pipeline stays
fully functional without the native path, which exists for throughput
(the reference's equivalent work runs in torch DataLoader C workers).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["native_available", "decode_image", "resize_bilinear",
           "resize_nearest", "normalize", "adjust_hue", "adjust_saturation",
           "apply_lut", "gray_mean_round"]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "src", "image_ops.cpp")
_SO = os.path.join(_ROOT, "native", "build", "libmgnet_image_ops.so")


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    # -ffp-contract=off: the jitter ops' f32 blends must round exactly
    # like numpy/Pillow (an FMA contraction would change the low bit)
    cmd = [
        "g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
        "-fPIC", "-std=c++17", _SRC, "-o", _SO, "-lpng", "-ljpeg", "-lz",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        if not os.path.exists(_SRC) or not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    intp = ctypes.POINTER(ctypes.c_int)
    lib.mg_png_info.argtypes = [u8p, ctypes.c_size_t, intp, intp, intp, intp]
    lib.mg_png_decode.argtypes = [u8p, ctypes.c_size_t, u8p,
                               ctypes.c_int, ctypes.c_int]
    lib.mg_jpeg_info.argtypes = [u8p, ctypes.c_size_t, intp, intp, intp]
    lib.mg_jpeg_decode.argtypes = [u8p, ctypes.c_size_t, u8p]
    lib.resize_bilinear_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_int,
    ]
    lib.resize_nearest_u8.argtypes = lib.resize_bilinear_u8.argtypes
    lib.normalize_u8_to_f32.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
    ]
    if not hasattr(lib, "mg_apply_lut"):  # newest symbol
        # stale .so from an older source revision: rebuild once
        if _build():
            try:
                lib = ctypes.CDLL(_SO)
            except OSError:
                return None
    if hasattr(lib, "mg_adjust_hue"):
        lib.mg_adjust_hue.argtypes = [u8p, ctypes.c_int64, ctypes.c_int, u8p]
        lib.mg_adjust_saturation.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_float, u8p]
    if hasattr(lib, "mg_apply_lut"):
        lib.mg_apply_lut.argtypes = [u8p, ctypes.c_int64, u8p, u8p]
        lib.mg_gray_mean_round.argtypes = [u8p, ctypes.c_int64]
        lib.mg_gray_mean_round.restype = ctypes.c_int
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_image(path: str) -> np.ndarray:
    """Decode a PNG/JPEG file to RGB uint8 [H, W, 3]."""
    lib = _load()
    with open(path, "rb") as f:
        raw = np.frombuffer(f.read(), np.uint8)
    if lib is None:
        from PIL import Image
        import io

        with Image.open(io.BytesIO(raw.tobytes())) as img:
            return np.asarray(img.convert("RGB"))

    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    bd = ctypes.c_int()
    if lib.mg_png_info(_u8p(raw), raw.size, ctypes.byref(h), ctypes.byref(w),
                    ctypes.byref(c), ctypes.byref(bd)) == 0:
        out = np.empty((h.value, w.value, 3), np.uint8)
        rc = lib.mg_png_decode(_u8p(raw), raw.size, _u8p(out), 3, 8)
        if rc == 0:
            return out
    if lib.mg_jpeg_info(_u8p(raw), raw.size, ctypes.byref(h), ctypes.byref(w),
                     ctypes.byref(c)) == 0:
        out = np.empty((h.value, w.value, 3), np.uint8)
        if lib.mg_jpeg_decode(_u8p(raw), raw.size, _u8p(out)) == 0:
            return out
    from PIL import Image
    import io

    with Image.open(io.BytesIO(raw.tobytes())) as img:
        return np.asarray(img.convert("RGB"))


def resize_bilinear(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img)
    if lib is None or img.dtype != np.uint8:
        import cv2

        return cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    out = np.empty((oh, ow, c) if img.ndim == 3 else (oh, ow), np.uint8)
    lib.resize_bilinear_u8(_u8p(img), h, w, c, _u8p(out), oh, ow)
    return out


def resize_nearest(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img)
    if lib is None or img.dtype != np.uint8:
        import cv2

        return cv2.resize(img, (ow, oh), interpolation=cv2.INTER_NEAREST)
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    out = np.empty((oh, ow, c) if img.ndim == 3 else (oh, ow), np.uint8)
    lib.resize_nearest_u8(_u8p(img), h, w, c, _u8p(out), oh, ow)
    return out


def adjust_hue(img: np.ndarray, shift: int) -> Optional[np.ndarray]:
    """PIL-exact hue shift (RGB->HSV->+shift (uint8 wrap)->RGB) in one
    native pass, or None when the native library is unavailable (the
    caller falls back to the vectorized numpy replica in
    data/transforms.py — both bit-exact vs Pillow)."""
    lib = _load()
    if lib is None or not hasattr(lib, "mg_adjust_hue"):
        return None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty_like(img)
    lib.mg_adjust_hue(_u8p(img), img.size // 3, int(shift) % 256, _u8p(out))
    return out


def adjust_saturation(img: np.ndarray, factor: float) -> Optional[np.ndarray]:
    """PIL ImageEnhance.Color-exact saturation blend in one native pass,
    or None when unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "mg_adjust_saturation"):
        return None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty_like(img)
    lib.mg_adjust_saturation(_u8p(img), img.size // 3, float(factor),
                             _u8p(out))
    return out


def apply_lut(img: np.ndarray, lut: np.ndarray) -> Optional[np.ndarray]:
    """out[i] = lut[img[i]] over uint8 (the brightness/contrast jitters),
    or None when the native library is unavailable (caller indexes in
    numpy — identical bytes either way)."""
    lib = _load()
    if lib is None or not hasattr(lib, "mg_apply_lut"):
        return None
    img = np.ascontiguousarray(img, np.uint8)
    lut = np.ascontiguousarray(lut, np.uint8)
    out = np.empty_like(img)
    lib.mg_apply_lut(_u8p(img), img.size, _u8p(lut), _u8p(out))
    return out


def gray_mean_round(img: np.ndarray) -> Optional[int]:
    """ImageEnhance.Contrast's scalar degenerate int(mean(L) + 0.5) in one
    native pass over RGB uint8, or None when unavailable. Exact: the
    uint64 sum and numpy's pairwise f64 mean agree bit-for-bit on
    integer-valued data."""
    lib = _load()
    if lib is None or not hasattr(lib, "mg_gray_mean_round"):
        return None
    img = np.ascontiguousarray(img, np.uint8)
    return int(lib.mg_gray_mean_round(_u8p(img), img.size // 3))


def normalize(img_u8: np.ndarray, mean, std) -> np.ndarray:
    lib = _load()
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    c = img_u8.shape[-1]
    if lib is None:
        return ((img_u8.astype(np.float32) / 255.0
                 - np.asarray(mean, np.float32))
                / np.asarray(std, np.float32))
    out = np.empty(img_u8.shape, np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.normalize_u8_to_f32(
        _u8p(img_u8), img_u8.size // c, c,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
