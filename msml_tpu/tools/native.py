"""ctypes bindings for the C++ host-tool library (tools_cpp/msml_native.cpp)
with pure-numpy fallbacks.

Capability parity with the reference's native components (SURVEY.md §2.5):
  * similar_transform — `datasets/3d_tools/cpp_align/face_align.h:82-142`
    (Umeyama similarity transform for 5-pt face alignment)
  * nms — `eval/preprocess/.../nms/cpu_nms.pyx` (greedy IoU suppression;
    the reference's own py_cpu_nms.py confirms the numpy fallback semantics)
  * bbox_overlaps — `datasets/benchmarks/RetinaFace/rcnn/cython/bbox.pyx`

Build once with:  cmake -S tools_cpp -B tools_cpp/build && \
                  cmake --build tools_cpp/build
(or python -m msml_tpu.tools.native --build)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                          "..", ".."))
_LIB_PATHS = [
    os.path.join(_REPO_ROOT, "tools_cpp", "build", "lib",
                 "libmsml_native.so"),
    os.path.join(_REPO_ROOT, "tools_cpp", "build", "libmsml_native.so"),
]

_lib: Optional[ctypes.CDLL] = None


def build(verbose: bool = False) -> str:
    """Compile the native library with cmake + the system toolchain."""
    src = os.path.join(_REPO_ROOT, "tools_cpp")
    bld = os.path.join(src, "build")
    kw = {} if verbose else {"stdout": subprocess.DEVNULL,
                             "stderr": subprocess.STDOUT}
    subprocess.run(["cmake", "-S", src, "-B", bld], check=True, **kw)
    subprocess.run(["cmake", "--build", bld, "-j"], check=True, **kw)
    return _LIB_PATHS[0]


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.similar_transform_2d.restype = ctypes.c_int
            lib.nms.restype = ctypes.c_int
            _lib = lib
            return lib
    return None


def have_native() -> bool:
    return _load() is not None


# ------------------------------------------------------------------ umeyama
def similar_transform(src: np.ndarray, dst: np.ndarray,
                      force_numpy: bool = False) -> np.ndarray:
    """Umeyama similarity transform: 3x3 T with dst ~ T @ [src; 1]."""
    src = np.ascontiguousarray(src, np.float32)
    dst = np.ascontiguousarray(dst, np.float32)
    assert src.shape == dst.shape and src.shape[1] == 2
    lib = None if force_numpy else _load()
    if lib is not None:
        out = np.zeros(9, np.float32)
        ret = lib.similar_transform_2d(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(src.shape[0]),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if ret == 0:
            return out.reshape(3, 3)
    return _umeyama_np(src, dst)


def _umeyama_np(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Pure-numpy Umeyama (same math as skimage.transform.SimilarityTransform
    used at eval/preprocess/alignment.py:76-118)."""
    n, dim = src.shape
    src_mean = src.mean(0)
    dst_mean = dst.mean(0)
    src_d = src - src_mean
    dst_d = dst - dst_mean
    A = dst_d.T @ src_d / n
    d = np.ones(dim)
    if np.linalg.det(A) < 0:
        d[-1] = -1
    U, S, Vt = np.linalg.svd(A)
    rank = np.linalg.matrix_rank(A)
    T = np.eye(dim + 1)
    if rank == dim - 1:
        if np.linalg.det(U) * np.linalg.det(Vt) > 0:
            T[:dim, :dim] = U @ Vt
        else:
            s = d[-1]
            d[-1] = -1
            T[:dim, :dim] = U @ np.diag(d) @ Vt
            d[-1] = s
    else:
        T[:dim, :dim] = U @ np.diag(d) @ Vt
    scale = (S @ d) / src_d.var(0).sum()
    T[:dim, dim] = dst_mean - scale * (T[:dim, :dim] @ src_mean)
    T[:dim, :dim] *= scale
    return T.astype(np.float32)


# ---------------------------------------------------------------------- nms
def nms(dets: np.ndarray, thresh: float,
        force_numpy: bool = False) -> np.ndarray:
    """Greedy NMS over (n, 5) [x1, y1, x2, y2, score]; returns kept indices
    in score order (py_cpu_nms.py / cpu_nms.pyx parity)."""
    dets = np.ascontiguousarray(dets, np.float32)
    lib = None if force_numpy else _load()
    if lib is not None:
        keep = np.zeros(len(dets), np.int32)
        n = lib.nms(dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    ctypes.c_int(len(dets)), ctypes.c_float(thresh),
                    keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return keep[:n].copy()
    return _nms_np(dets, thresh)


def _nms_np(dets: np.ndarray, thresh: float) -> np.ndarray:
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], \
        dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    # descending, lowest-index-first on ties — matches the C++ path's
    # stable_sort so kept boxes don't depend on whether the .so is built
    # (py_cpu_nms's argsort()[::-1] leaves tie order unspecified)
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thresh]
    return np.asarray(keep, np.int32)


def bbox_overlaps(boxes: np.ndarray, query: np.ndarray,
                  force_numpy: bool = False) -> np.ndarray:
    """(n,4) x (k,4) -> (n,k) IoU matrix."""
    boxes = np.ascontiguousarray(boxes, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    lib = None if force_numpy else _load()
    if lib is not None:
        out = np.zeros((len(boxes), len(query)), np.float32)
        lib.bbox_overlaps(
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(len(boxes)),
            query.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(len(query)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    n, k = len(boxes), len(query)
    out = np.zeros((n, k), np.float32)
    for j in range(k):
        qa = (query[j, 2] - query[j, 0] + 1) * (query[j, 3] - query[j, 1] + 1)
        iw = (np.minimum(boxes[:, 2], query[j, 2])
              - np.maximum(boxes[:, 0], query[j, 0]) + 1)
        ih = (np.minimum(boxes[:, 3], query[j, 3])
              - np.maximum(boxes[:, 1], query[j, 1]) + 1)
        valid = (iw > 0) & (ih > 0)
        ba = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
        inter = iw * ih
        out[:, j] = np.where(valid, inter / (ba + qa - inter), 0.0)
    return out


# ------------------------------------------------------------------ anchors
def anchor_grid(height: int, width: int, stride: int,
                base_anchors: np.ndarray) -> np.ndarray:
    """Anchor plane for detector tooling
    (`datasets/benchmarks/RetinaFace/rcnn/cython/anchors.pyx` parity):
    (H, W, A, 4) anchors = base anchors shifted by the stride grid."""
    base = np.asarray(base_anchors, np.float32)
    sw = (np.arange(width, dtype=np.float32) * stride)[None, :, None]
    sh = (np.arange(height, dtype=np.float32) * stride)[:, None, None]
    out = np.zeros((height, width, base.shape[0], 4), np.float32)
    out[..., 0] = base[None, None, :, 0] + sw
    out[..., 1] = base[None, None, :, 1] + sh
    out[..., 2] = base[None, None, :, 2] + sw
    out[..., 3] = base[None, None, :, 3] + sh
    return out


# ---------------------------------------------------------------------- rle
def rle_encode(mask: np.ndarray, force_numpy: bool = False) -> dict:
    """COCO-style RLE of a binary mask (h, w) — column-major counts starting
    with zeros (pycocotools maskApi.c parity). Returns {'size', 'counts'}."""
    h, w = mask.shape
    flat = np.asfortranarray(mask.astype(np.uint8)).ravel(order="F")
    flat = np.ascontiguousarray(flat)
    lib = None if force_numpy else _load()
    if lib is not None and hasattr(lib, "rle_encode"):
        counts = np.zeros(h * w + 1, np.uint32)
        n = lib.rle_encode(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int(h), ctypes.c_int(w),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
        return {"size": (h, w), "counts": counts[:n].tolist()}
    # numpy fallback
    changes = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], changes, [flat.size]])
    runs = np.diff(bounds).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    return {"size": (h, w), "counts": runs}


def rle_decode(rle: dict, force_numpy: bool = False) -> np.ndarray:
    h, w = rle["size"]
    counts = np.asarray(rle["counts"], np.uint32)
    lib = None if force_numpy else _load()
    if lib is not None and hasattr(lib, "rle_decode"):
        out = np.zeros(h * w, np.uint8)
        lib.rle_decode(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.c_int(len(counts)), ctypes.c_int(h), ctypes.c_int(w),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.reshape((h, w), order="F")
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    return np.repeat(vals, counts).reshape((h, w), order="F")


def rle_area(rle: dict) -> int:
    return int(np.asarray(rle["counts"][1::2], np.int64).sum())


# --------------------------------------------------------------- face align
ARCFACE_DST = np.array(
    [[38.2946, 51.6963], [73.5318, 51.5014], [56.0252, 71.7366],
     [41.5493, 92.3655], [70.7299, 92.2041]], dtype=np.float32)
"""The canonical 112x112 ArcFace 5-landmark template
(eval/preprocess/alignment.py arcface_src)."""


def norm_crop(img: np.ndarray, landmarks: np.ndarray,
              image_size: int = 112) -> np.ndarray:
    """Align a face to the ArcFace template (alignment.py norm_crop parity)."""
    import cv2
    dst = ARCFACE_DST * (image_size / 112.0)
    T = similar_transform(landmarks.astype(np.float32), dst)
    return cv2.warpAffine(img, T[:2], (image_size, image_size),
                          borderValue=0.0)


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--build", action="store_true")
    a = p.parse_args()
    if a.build:
        print("built:", build(verbose=True))
        print("loaded:", have_native())
