"""ctypes bindings for the native data loader (tools_cpp/msml_loader.cpp):
mmap'd MXNet IndexedRecordIO + threaded libjpeg batch decode.

The reference reads training data through mxnet's C++ recordio reader and
OpenCV's JPEG decode behind a torch DataLoader (`datasets/load_dataset.py:
39-48`, `train.py:96-99`). This is the TPU-host equivalent: one mmap of the
.rec, a C++ thread pool decoding a whole batch per call — no GIL, no
per-sample Python objects, no multiprocess pickling of decoded frames.

Decode parity: libjpeg is pinned to the islow IDCT + fancy upsampling, the
same defaults cv2's bundled libjpeg-turbo uses, so pixels are bit-identical
to `recordio.imdecode` (verified in tests/test_native_loader.py).

Build: python -m msml_tpu.tools.native --build   (cmake + system libjpeg;
the loader is optional — everything falls back to the Python path).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                          "..", ".."))
_LIB_PATHS = [
    os.path.join(_REPO_ROOT, "tools_cpp", "build", "lib",
                 "libmsml_loader.so"),
    os.path.join(_REPO_ROOT, "tools_cpp", "build", "libmsml_loader.so"),
]

_lib: Optional[ctypes.CDLL] = None
_lib_checked = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    for p in _LIB_PATHS:
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            try:
                abi = int(lib.msml_loader_abi_version())
            except AttributeError:
                abi = 1
            if abi < 2:
                import logging
                logging.getLogger(__name__).warning(
                    "stale libmsml_loader.so at %s (ABI %d < 2): rebuild "
                    "with `python -m msml_tpu.tools.native --build`; "
                    "native loader disabled", p, abi)
                continue
            lib.msml_loader_open.restype = ctypes.c_void_p
            lib.msml_loader_open.argtypes = [ctypes.c_char_p,
                                             ctypes.c_char_p, ctypes.c_int]
            lib.msml_loader_close.argtypes = [ctypes.c_void_p]
            lib.msml_loader_num_keys.restype = ctypes.c_int64
            lib.msml_loader_num_keys.argtypes = [ctypes.c_void_p]
            lib.msml_loader_keys.argtypes = [ctypes.c_void_p, _i64p]
            lib.msml_loader_decode_batch_v2.restype = ctypes.c_int
            lib.msml_loader_decode_batch_v2.argtypes = [
                ctypes.c_void_p, _i64p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, _u8p, _f32p, _i64p]
            lib.msml_decode_jpeg.restype = ctypes.c_int
            lib.msml_decode_jpeg.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, _u8p, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            _lib = lib
            return lib
    return None


def available() -> bool:
    """True when the native loader library is built and loadable."""
    return _load() is not None


def decode_jpeg(data: bytes, max_side: int = 4096) -> Optional[np.ndarray]:
    """Decode one JPEG to RGB uint8 via libjpeg (bit-identical to the cv2
    path); None when the library is absent or the data is not a JPEG."""
    lib = _load()
    if lib is None:
        return None
    buf = np.empty((max_side * max_side * 3,), np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.msml_decode_jpeg(data, len(data), buf, max_side, max_side,
                              ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    return buf[:h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


class NativeRecordReader:
    """Batch-decoding IndexedRecordIO reader on the C++ thread pool.

    decode_batch(keys, (H, W)) -> (uint8 [n, H, W, 3], float32 labels [n]).
    Records whose decoded size differs from (H, W) are bilinearly resized
    (half-pixel centers). Raises on unreadable records by default.
    """

    def __init__(self, idx_path: str, rec_path: str,
                 nthreads: Optional[int] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native loader not built: run "
                "`python -m msml_tpu.tools.native --build`")
        self._lib = lib
        nthreads = nthreads or min(os.cpu_count() or 1, 16)
        self._h = lib.msml_loader_open(idx_path.encode(), rec_path.encode(),
                                       int(nthreads))
        if not self._h:
            raise FileNotFoundError(f"cannot open {idx_path} / {rec_path}")

    @property
    def keys(self) -> np.ndarray:
        n = self._lib.msml_loader_num_keys(self._h)
        out = np.empty((n,), np.int64)
        self._lib.msml_loader_keys(self._h, out)
        return out

    def decode_batch(self, keys: Sequence[int], out_size: Tuple[int, int],
                     strict: bool = True
                     ) -> Tuple[np.ndarray, np.ndarray]:
        imgs, labels, bad = self.decode_batch_partial(keys, out_size,
                                                      exact=False)
        if len(bad) and strict:
            raise IOError(f"{len(bad)} records failed to decode: keys "
                          f"{bad[:8].tolist()}"
                          + ("..." if len(bad) > 8 else ""))
        return imgs, labels

    def decode_batch_partial(self, keys: Sequence[int],
                             out_size: Tuple[int, int], exact: bool = True
                             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Like decode_batch, but returns (imgs, labels, bad_keys) instead
        of raising. With exact=True, records whose decoded size differs
        from out_size are reported in bad_keys (zero-filled slots) rather
        than C++-resized — the caller decodes those through a parity-exact
        path (MXFaceDataset falls back to PIL per record)."""
        keys = np.ascontiguousarray(keys, np.int64)
        n = len(keys)
        h, w = int(out_size[0]), int(out_size[1])
        imgs = np.empty((n, h, w, 3), np.uint8)
        labels = np.empty((n,), np.float32)
        errs = np.empty((n,), np.int64)
        nerr = self._lib.msml_loader_decode_batch_v2(
            self._h, keys, n, h, w, int(exact), imgs, labels, errs)
        return imgs, labels, errs[:min(nerr, n)].copy()

    def close(self):
        if getattr(self, "_h", None):
            self._lib.msml_loader_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
