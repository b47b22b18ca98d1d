"""ctypes bindings for the native (C++) data-plane.

Builds `native/libuformer_augment.so` on first use if the toolchain is
available; all callers fall back to the numpy path when the library can't
be built/loaded, so the framework stays pure-Python-capable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libuformer_augment.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not os.path.exists(_SO_PATH):
            subprocess.run(["bash", os.path.join(_NATIVE_DIR, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO_PATH)
        lib.augment_pair_batch.restype = None
        lib.augment_pair.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def augment_pair_batch(gt_imgs: Sequence[np.ndarray],
                       noisy_imgs: Sequence[np.ndarray],
                       ps: int, rows: np.ndarray, cols: np.ndarray,
                       ks: np.ndarray, num_threads: int = 4
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Fused crop+dihedral+normalize over a batch of uint8 HWC pairs.

    Returns float32 (B, ps, ps, C) gt and noisy batches in [0,1].
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    B = len(gt_imgs)
    C = gt_imgs[0].shape[2]
    gts = [np.ascontiguousarray(g) for g in gt_imgs]
    nys = [np.ascontiguousarray(n) for n in noisy_imgs]
    PtrArr = ctypes.POINTER(ctypes.c_uint8) * B
    gt_ptrs = PtrArr(*[g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
                       for g in gts])
    ny_ptrs = PtrArr(*[n.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
                       for n in nys])
    heights = np.asarray([g.shape[0] for g in gts], np.int32)
    widths = np.asarray([g.shape[1] for g in gts], np.int32)
    gt_out = np.empty((B, ps, ps, C), np.float32)
    ny_out = np.empty((B, ps, ps, C), np.float32)

    i32 = lambda a: np.ascontiguousarray(a, np.int32)  # noqa: E731
    rows, cols, ks = i32(rows), i32(cols), i32(ks)

    lib.augment_pair_batch(
        gt_ptrs, ny_ptrs,
        heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(C), ctypes.c_int32(B), ctypes.c_int32(ps),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        gt_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ny_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int32(num_threads),
    )
    return gt_out, ny_out
