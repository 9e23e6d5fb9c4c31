"""ctypes bridge to the native RLE codec (native/rle.cpp).

Auto-builds librle.so with make on first import if a toolchain is present;
falls back silently to the NumPy implementations in data/rle.py otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librle.so")

_lib = None


def _try_load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=60)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64 = ctypes.c_int64
    lib.rle_decode_string.restype = i64
    lib.rle_decode_string.argtypes = [
        ctypes.c_char_p, i64, ctypes.POINTER(i64), i64]
    lib.rle_encode_string.restype = i64
    lib.rle_encode_string.argtypes = [
        ctypes.POINTER(i64), i64, ctypes.c_char_p, i64]
    lib.rle_counts_to_mask.restype = i64
    lib.rle_counts_to_mask.argtypes = [
        ctypes.POINTER(i64), i64, ctypes.POINTER(ctypes.c_uint8), i64]
    lib.rle_mask_to_counts.restype = i64
    lib.rle_mask_to_counts.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), i64, ctypes.POINTER(i64), i64]
    lib.rle_area_bbox.restype = None
    lib.rle_area_bbox.argtypes = [
        ctypes.POINTER(i64), i64, i64, ctypes.POINTER(ctypes.c_double)]
    lib.bb_iou.restype = None
    lib.bb_iou.argtypes = [
        ctypes.POINTER(ctypes.c_double), i64,
        ctypes.POINTER(ctypes.c_double), i64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return lib


def available() -> bool:
    return _try_load() is not None


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def decode_string(s: str) -> list[int]:
    lib = _try_load()
    raw = s.encode("ascii")
    out = np.empty(len(raw) + 4, np.int64)
    n = lib.rle_decode_string(raw, len(raw), _i64p(out), out.size)
    if n < 0:
        raise ValueError("malformed RLE string")
    return out[:n].tolist()


def encode_string(counts) -> str:
    lib = _try_load()
    c = np.asarray(counts, np.int64)
    cap = 16 * max(len(c), 1)
    buf = ctypes.create_string_buffer(cap)
    n = lib.rle_encode_string(_i64p(c), len(c), buf, cap)
    if n < 0:
        raise ValueError("encode buffer overflow")
    return buf.raw[:n].decode("ascii")


def counts_to_mask(counts, size) -> np.ndarray:
    lib = _try_load()
    h, w = size
    c = np.asarray(counts, np.int64)
    mask = np.empty(h * w, np.uint8)
    rc = lib.rle_counts_to_mask(
        _i64p(c), len(c), mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h * w)
    if rc != 0:
        raise ValueError(f"RLE does not cover {h}x{w}")
    return mask.reshape((h, w), order="F")


def mask_to_counts(mask: np.ndarray) -> list[int]:
    lib = _try_load()
    flat = np.asfortranarray(mask.astype(np.uint8)).reshape(-1, order="F")
    flat = np.ascontiguousarray(flat)
    out = np.empty(flat.size + 2, np.int64)
    n = lib.rle_mask_to_counts(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), flat.size,
        _i64p(out), out.size)
    if n < 0:
        raise ValueError("counts buffer overflow")
    return out[:n].tolist()


def area_bbox(counts, h: int):
    lib = _try_load()
    c = np.asarray(counts, np.int64)
    out = np.empty(5, np.float64)
    lib.rle_area_bbox(_i64p(c), len(c), h,
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return int(out[0]), out[1:].astype(np.float32)


def box_iou_xywh(dt: np.ndarray, gt: np.ndarray,
                 iscrowd: np.ndarray) -> np.ndarray:
    lib = _try_load()
    dt = np.ascontiguousarray(dt, np.float64)
    gt = np.ascontiguousarray(gt, np.float64)
    ic = np.ascontiguousarray(iscrowd, np.uint8)
    out = np.empty((len(dt), len(gt)), np.float64)
    if out.size:
        lib.bb_iou(
            dt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(dt),
            gt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(gt),
            ic.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
