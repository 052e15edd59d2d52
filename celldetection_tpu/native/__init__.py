"""Native (C++) host-side components, built on demand and loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; these components accelerate the
*host* side of the pipeline where the reference leaned on C++ through
cv2/torchvision — here compiled from sources in this package (g++, cached
under ``~/.cache/celldetection_tpu``). Pure-Python fallbacks keep everything
working without a toolchain.
"""
import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ['available', 'rasterize_labels_native', 'contours2labels_native']

_LIB = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'rasterize.cpp')
    try:
        with open(src, 'rb') as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache_dir = os.path.join(os.path.expanduser('~'), '.cache', 'celldetection_tpu')
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f'rasterize_{digest}.so')
        if not os.path.isfile(so_path):
            tmp = so_path + '.tmp'
            subprocess.run(['g++', '-O3', '-shared', '-fPIC', '-std=c++17', '-pthread',
                            src, '-o', tmp], check=True, capture_output=True)
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.rasterize_labels.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
        lib.rasterize_labels_mt.argtypes = lib.rasterize_labels.argtypes + [ctypes.c_int32]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def rasterize_labels_native(contours, size, num_threads: int = 0) -> Optional[np.ndarray]:
    """Fill contours into an int32 label image (label = index + 1).

    Args:
        contours: Sequence of (num_points, 2) xy arrays (ragged ok).
        size: (height, width).
        num_threads: 0 = auto (cpu count, any-wins overlap), 1 = sequential
            deterministic last-wins.

    Returns:
        ``Array[height, width]`` int32, or None when the native lib is
        unavailable.
    """
    lib = _build_and_load()
    if lib is None:
        return None
    # reshape first, count from the reshaped rows: for flat (2n,) inputs
    # len(c) != point count and the C++ fill would read past the buffer
    arrs = [np.asarray(c, np.float64).reshape(-1, 2) for c in contours]
    counts = np.asarray([len(a) for a in arrs], np.int64)
    offsets = np.zeros(len(arrs), np.int64)
    if len(arrs) > 1:
        offsets[1:] = np.cumsum(counts)[:-1]
    flat = np.concatenate(arrs) if arrs else np.zeros((0, 2))
    flat = np.ascontiguousarray(flat, np.float64)
    out = np.zeros(tuple(size), np.int32)
    if num_threads == 0:
        num_threads = min(os.cpu_count() or 1, 16)
    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    lib.rasterize_labels_mt(p(flat, ctypes.c_double), p(offsets, ctypes.c_int64),
                            p(counts, ctypes.c_int64), len(contours), size[0], size[1],
                            p(out, ctypes.c_int32), num_threads)
    return out


def contours2labels_native(contours, size, fallback=True) -> np.ndarray:
    """Fast flat label image from contours (native scanline fill).

    Unlike :func:`celldetection_tpu.data.cpn.contours2labels` this produces a
    channel-free image directly (overlaps resolved by paint order).
    """
    out = rasterize_labels_native(contours, size, num_threads=1)
    if out is not None:
        return out
    if not fallback:
        raise RuntimeError('native rasterizer unavailable')
    from ..data.cpn import contours2labels, resolve_label_channels
    return resolve_label_channels(contours2labels(list(contours), tuple(size)))
