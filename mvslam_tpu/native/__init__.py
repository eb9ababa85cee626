"""ctypes bindings for the native (C++) host data-plane.

The TPU compute path stays in JAX/XLA/Pallas; this package provides the
native runtime pieces around it — image decode and the multithreaded
in-order frame loader (see ``src/mvslam_native.cc``). It replaces the
reference's cv2.imread + Python thread-pool decode stage
(reference ``ingestion_pipeline.py`` / ``frame_stream.py``) with C++.

Everything degrades gracefully: if the compiler or libpng is missing,
``native_available()`` returns False and callers fall back to the Python
decode path, so no test or runtime surface hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import threading
from pathlib import Path
from typing import Iterator, NamedTuple, Optional, Sequence

import numpy as np

from mvslam_tpu.native.build import build

_DECODE_ERRORS = {
    -1: "open_failed",
    -2: "unknown_format",
    -3: "exceeds_capacity",
    -4: "corrupt",
}

_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    """Build (if needed) and dlopen the library; cached process-wide."""
    global _lib, _lib_failed
    with _lib_lock:
        if _lib is not None or _lib_failed:
            return _lib
        path = build()
        if path is None:
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError:
            _lib_failed = True
            return None
        lib.mvn_abi_version.restype = ctypes.c_int32
        if lib.mvn_abi_version() != 1:
            _lib_failed = True
            return None
        lib.mvn_decode_gray.restype = ctypes.c_int32
        lib.mvn_decode_gray.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mvn_decode_gray_buffer.restype = ctypes.c_int32
        lib.mvn_decode_gray_buffer.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mvn_loader_create.restype = ctypes.c_void_p
        lib.mvn_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.mvn_loader_next.restype = ctypes.c_int32
        lib.mvn_loader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mvn_loader_stats.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mvn_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.mvn_hamming_match.restype = None
        lib.mvn_hamming_match.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    """True when the C++ library compiled and loaded on this host."""
    return _load() is not None


def hamming_match(
    desc_a: np.ndarray,
    valid_a: np.ndarray,
    desc_b: np.ndarray,
    valid_b: np.ndarray,
):
    """Brute-force packed-Hamming match (C++; see mvn_hamming_match).

    Inputs: (N, 8) uint32 packed descriptors + (N,) bool masks. Returns
    ``(best_idx i32 (Na,), best f32, second f32, col_best i32 (Nb,))``
    with semantics bitwise-identical to the XLA matcher
    (``ops/hamming.py::match_descriptors`` — parity: tests/test_native.py).
    Returns None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    desc_a = np.ascontiguousarray(desc_a, np.uint32)
    desc_b = np.ascontiguousarray(desc_b, np.uint32)
    va = np.ascontiguousarray(valid_a, np.uint8)
    vb = np.ascontiguousarray(valid_b, np.uint8)
    na, nb = desc_a.shape[0], desc_b.shape[0]
    if desc_a.shape != (na, 8) or desc_b.shape != (nb, 8) or va.shape != (na,) or vb.shape != (nb,):
        raise ValueError("hamming_match expects (N, 8) uint32 descriptors and (N,) masks")
    best_idx = np.empty(na, np.int32)
    best = np.empty(na, np.float32)
    second = np.empty(na, np.float32)
    col_best = np.empty(nb, np.int32)
    lib.mvn_hamming_match(
        desc_a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        va.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.int32(na),
        desc_b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        vb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.int32(nb),
        best_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        best.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        second.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        col_best.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return best_idx, best, second, col_best


# Default capacity bounds: generous for KITTI (1242x376) / TUM (640x480)
# while keeping per-slot buffers ~2 MB.
DEFAULT_MAX_H = 1216
DEFAULT_MAX_W = 2048


def decode_gray(
    path: Path | str, max_h: int = DEFAULT_MAX_H, max_w: int = DEFAULT_MAX_W
) -> Optional[np.ndarray]:
    """Decode PNG/PGM to an (H, W) uint8 array; None on failure.

    Drop-in for the reference's ``cv2.imread(path, IMREAD_GRAYSCALE)``
    (RGB→gray uses the same BT.601 coefficients).
    """
    lib = _load()
    if lib is None:
        return None
    # Rows are written packed at stride `w` into a flat buffer.
    buf = np.empty(max_h * max_w, dtype=np.uint8)
    h = ctypes.c_int32(0)
    w = ctypes.c_int32(0)
    rc = lib.mvn_decode_gray(
        str(path).encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_h,
        max_w,
        ctypes.byref(h),
        ctypes.byref(w),
    )
    if rc != 0:
        return None
    return buf[: h.value * w.value].reshape(h.value, w.value).copy()


def native_read_fn(path: Path) -> Optional[np.ndarray]:
    """``read_fn``-compatible decode (FrameStream / AsyncIngestionPipeline)."""
    return decode_gray(path)


class NativeLoaderStats(NamedTuple):
    decoded: int
    failed: int
    consumer_wait_s: float
    worker_wait_s: float


class LoadedFrame(NamedTuple):
    index: int
    frame: Optional[np.ndarray]  # None when decode failed
    status: str  # "ok" or a decode error name


class NativeFrameLoader:
    """C++ decode pool with strict in-order delivery and backpressure.

    Native counterpart of the reference's decode pipeline (producer → N
    workers → deterministic reorder buffer): worker threads live in C++,
    frames arrive in sequence order regardless of decode completion order,
    and at most ``capacity`` frames are buffered (slot ring, allocated once).

    Usage::

        with NativeFrameLoader(paths, workers=4) as loader:
            for item in loader:   # LoadedFrame, in path order
                ...
    """

    def __init__(
        self,
        paths: Sequence[Path | str],
        workers: int = 4,
        capacity: int = 16,
        max_h: int = DEFAULT_MAX_H,
        max_w: int = DEFAULT_MAX_W,
    ) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable (no compiler or libpng)")
        if capacity <= 0 or workers <= 0:
            raise ValueError("workers and capacity must be positive")
        self._lib = lib
        self._paths = [str(p) for p in paths]
        self._max_h = int(max_h)
        self._max_w = int(max_w)
        encoded = [p.encode() for p in self._paths]
        arr = (ctypes.c_char_p * len(encoded))(*encoded) if encoded else (ctypes.c_char_p * 1)()
        self._handle = lib.mvn_loader_create(
            arr, len(encoded), int(workers), int(capacity), self._max_h, self._max_w
        )
        if not self._handle:
            raise RuntimeError("mvn_loader_create failed")
        # Delivery buffer; frames arrive packed at stride w (flat layout).
        self._out = np.empty(self._max_h * self._max_w, dtype=np.uint8)
        self._closed = False

    def __enter__(self) -> "NativeFrameLoader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def close(self) -> None:
        if not self._closed:
            self._lib.mvn_loader_destroy(self._handle)
            self._closed = True

    def __del__(self) -> None:  # belt and braces; context manager preferred
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self) -> Iterator[LoadedFrame]:
        index = ctypes.c_int32(0)
        h = ctypes.c_int32(0)
        w = ctypes.c_int32(0)
        status = ctypes.c_int32(0)
        out_ptr = self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        while True:
            if self._closed:
                return
            rc = self._lib.mvn_loader_next(
                self._handle,
                out_ptr,
                ctypes.byref(index),
                ctypes.byref(h),
                ctypes.byref(w),
                ctypes.byref(status),
            )
            if rc == 0:
                return
            if status.value == 0:
                frame = self._out[: h.value * w.value].reshape(h.value, w.value).copy()
                yield LoadedFrame(index=index.value, frame=frame, status="ok")
            else:
                yield LoadedFrame(
                    index=index.value,
                    frame=None,
                    status=_DECODE_ERRORS.get(status.value, "unknown_error"),
                )

    def stats(self) -> NativeLoaderStats:
        decoded = ctypes.c_int64(0)
        failed = ctypes.c_int64(0)
        cw = ctypes.c_int64(0)
        ww = ctypes.c_int64(0)
        self._lib.mvn_loader_stats(
            self._handle,
            ctypes.byref(decoded),
            ctypes.byref(failed),
            ctypes.byref(cw),
            ctypes.byref(ww),
        )
        return NativeLoaderStats(
            decoded=decoded.value,
            failed=failed.value,
            consumer_wait_s=cw.value / 1e9,
            worker_wait_s=ww.value / 1e9,
        )


__all__ = [
    "native_available",
    "decode_gray",
    "native_read_fn",
    "NativeFrameLoader",
    "NativeLoaderStats",
    "LoadedFrame",
    "DEFAULT_MAX_H",
    "DEFAULT_MAX_W",
]
