"""ctypes bindings for the native post-processing library.

``native/postproc.cc`` is the exact host-side counterpart of the
reference's OpenCV box extraction (``det_utils.py:35-94``); see its
header comment.  The on-device path (:mod:`ops.detection`) is the
production route — this is the bit-faithful fallback/oracle, and the
piece a CPU-only deployment uses.

The shared library is built on demand with ``make`` (g++ is in the
image); import degrades gracefully when a toolchain is absent.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpostproc.so")
_lock = threading.Lock()
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load_library():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.isfile(_LIB_PATH) and not _build():
            raise NativeUnavailable(
                "libpostproc.so missing and `make -C native` failed"
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.lor_det_boxes.restype = ctypes.c_int
        lib.lor_det_boxes.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.lor_label_components.restype = ctypes.c_int
        lib.lor_label_components.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return lib


def available() -> bool:
    try:
        load_library()
        return True
    except NativeUnavailable:
        return False


def det_boxes(
    textmap: np.ndarray,
    linkmap: np.ndarray,
    text_threshold: float = 0.7,
    link_threshold: float = 0.4,
    low_text: float = 0.4,
    max_boxes: int = 256,
) -> np.ndarray:
    """-> [N, 4, 2] float32 boxes (heatmap coords, clockwise from
    min-sum corner)."""
    lib = load_library()
    textmap = np.ascontiguousarray(textmap, dtype=np.float32)
    linkmap = np.ascontiguousarray(linkmap, dtype=np.float32)
    if textmap.shape != linkmap.shape or textmap.ndim != 2:
        raise ValueError("textmap/linkmap must be equal-shape 2D arrays")
    H, W = textmap.shape
    out = np.zeros((max_boxes, 8), np.float32)
    n = lib.lor_det_boxes(
        textmap.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        linkmap.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        H,
        W,
        float(text_threshold),
        float(link_threshold),
        float(low_text),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(max_boxes),
    )
    return out[:n].reshape(n, 4, 2)


def label_components(mask: np.ndarray) -> tuple[int, np.ndarray]:
    """cv2.connectedComponents(connectivity=4) parity: (n_labels, labels)."""
    lib = load_library()
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    H, W = mask.shape
    labels = np.zeros((H, W), np.int32)
    n = lib.lor_label_components(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        H,
        W,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return n, labels
