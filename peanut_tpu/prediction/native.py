"""ctypes binding for the native (C++/OpenMP) data-pipeline kernels.

Builds native/libmap_pipeline.so on first use (cc -O3 -fopenmp); all entry
points gracefully return None when the toolchain or library is unavailable,
and the pure-python pipeline takes over.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "map_pipeline.cc")
_LIB = os.path.join(_REPO, "native", "libmap_pipeline.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SRC):
        return None
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["cc", "-O3", "-fopenmp", "-shared", "-fPIC", "-lstdc++",
                 _SRC, "-o", _LIB],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        fp = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.augment_sample.argtypes = [
            fp, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, fp, fp]
        lib.extract_timestep.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, fp, fp]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def augment_sample(img: np.ndarray, gt: np.ndarray, crop: int,
                   crop_y: int, crop_x: int, flip: bool, angle_deg: float,
                   pad_val: float = 0.0
                   ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Fused pad+crop+flip+rotate; None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    gt = np.ascontiguousarray(gt, np.float32)
    h, w, c_img = img.shape
    c_gt = gt.shape[2]
    img_out = np.empty((crop, crop, c_img), np.float32)
    gt_out = np.empty((crop, crop, c_gt), np.float32)
    lib.augment_sample(_fptr(img), _fptr(gt), h, w, c_img, c_gt,
                       crop, crop_y, crop_x, int(flip),
                       ctypes.c_float(angle_deg), ctypes.c_float(pad_val),
                       _fptr(img_out), _fptr(gt_out))
    return img_out, gt_out


def extract_timestep(maps: np.ndarray, t_idx: int, goal_lo: int = 4,
                     goal_hi: int = 10
                     ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """uint8 (T, C, H, W) -> (img (H,W,C)/255, gt (H,W,6) masked); native."""
    lib = _load()
    if lib is None:
        return None
    maps = np.ascontiguousarray(maps, np.uint8)
    t, c, h, w = maps.shape
    img = np.empty((h, w, c), np.float32)
    gt = np.empty((h, w, goal_hi - goal_lo), np.float32)
    lib.extract_timestep(
        maps.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t, c, h, w, t_idx, goal_lo, goal_hi, _fptr(img), _fptr(gt))
    return img, gt
