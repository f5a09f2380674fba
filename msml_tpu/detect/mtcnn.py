"""MTCNN face detector, JAX-native.

Parity target: the reference's vendored MTCNN
(`eval/preprocess/mtcnn.py:1-274`, `eval/preprocess/mtcnn_pytorch/src/
{get_nets,first_stage,box_utils}.py`) used by `eval/align_dataset.py:19-77`
to align raw folders. Re-designed for JAX: the three cascade nets
(PNet/RNet/ONet) are pure functions over parameter dicts (NHWC, VALID convs,
ceil-mode maxpool), jitted per input shape; the pyramid/NMS/box arithmetic
stays in numpy on the host (offline preprocessing is host work — SURVEY §2.5).

Weights: the standard public MTCNN release (`pnet.npy`/`rnet.npy`/`onet.npy`
dicts of torch-named arrays, e.g. `features.conv1.weight`) loaded at runtime
from a user-supplied directory — the same importer contract as the torch
checkpoint tools (`tools/import_torch.py`). Conv kernels transpose
OIHW -> HWIO; the Linear layers after the torch Flatten expect the
(C, W, H)-flattened order (get_nets.py:22 transposes W and H before view),
reproduced exactly.

Cascade protocol (mtcnn.py:160-274):
  pyramid scales m * 0.707^k down to 12 px; PNet per scale -> threshold ->
  per-scale NMS(0.5) -> global NMS(0.7) -> calibrate -> square; RNet on 24x24
  crops -> threshold/NMS/calibrate/square; ONet on 48x48 crops -> threshold,
  landmark de-normalisation, calibrate, NMS(mode='min').
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image


# --------------------------------------------------------------------- nets

def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _conv_valid(x, w, b, stride=1):
    """x: NHWC, w: HWIO, VALID padding (torch Conv2d padding=0)."""
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


def _maxpool_ceil(x, k, s):
    """torch MaxPool2d(k, s, ceil_mode=True): pad right/bottom with -inf so
    partial windows count."""
    n, h, w, c = x.shape
    oh = math.ceil((h - k) / s) + 1
    ow = math.ceil((w - k) / s) + 1
    ph = max((oh - 1) * s + k - h, 0)
    pw = max((ow - 1) * s + k - w, 0)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (0, ph), (0, pw), (0, 0)))


def _flatten_torch(x):
    """get_nets.py Flatten: transpose(3, 2) then view -> (C, W, H) order.
    From NHWC: (B, H, W, C) -> (B, C, W, H) -> flat."""
    return jnp.transpose(x, (0, 3, 2, 1)).reshape(x.shape[0], -1)


def pnet_apply(p: Dict[str, np.ndarray], x: jnp.ndarray):
    """x: (1, H, W, 3) preprocessed. Returns (offsets (1,h,w,4),
    probs (1,h,w,2))."""
    x = _prelu(_conv_valid(x, p["conv1.w"], p["conv1.b"]), p["prelu1"])
    x = _maxpool_ceil(x, 2, 2)
    x = _prelu(_conv_valid(x, p["conv2.w"], p["conv2.b"]), p["prelu2"])
    x = _prelu(_conv_valid(x, p["conv3.w"], p["conv3.b"]), p["prelu3"])
    a = _conv_valid(x, p["conv4_1.w"], p["conv4_1.b"])
    b = _conv_valid(x, p["conv4_2.w"], p["conv4_2.b"])
    # QUIRK REPLICATED: the reference softmaxes over dim=-1 of the NCHW
    # tensor (get_nets.py:71) — i.e. over image WIDTH, not the 2 classes.
    # It acts as a sharp per-row competition that the vendored pipeline's
    # thresholds are tuned against; switching to the conventional channel
    # softmax changes the PNet candidate set enough to alter detections
    # (verified empirically), so width-softmax is kept for candidate-set
    # parity. In NHWC the width axis is 2.
    a = jax.nn.softmax(a, axis=2)
    return b, a


def rnet_apply(p: Dict[str, np.ndarray], x: jnp.ndarray):
    x = _prelu(_conv_valid(x, p["conv1.w"], p["conv1.b"]), p["prelu1"])
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(_conv_valid(x, p["conv2.w"], p["conv2.b"]), p["prelu2"])
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(_conv_valid(x, p["conv3.w"], p["conv3.b"]), p["prelu3"])
    x = _flatten_torch(x)
    x = _prelu(x @ p["fc4.w"] + p["fc4.b"], p["prelu4"])
    a = jax.nn.softmax(x @ p["fc5_1.w"] + p["fc5_1.b"], axis=-1)
    b = x @ p["fc5_2.w"] + p["fc5_2.b"]
    return b, a


def onet_apply(p: Dict[str, np.ndarray], x: jnp.ndarray):
    x = _prelu(_conv_valid(x, p["conv1.w"], p["conv1.b"]), p["prelu1"])
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(_conv_valid(x, p["conv2.w"], p["conv2.b"]), p["prelu2"])
    x = _maxpool_ceil(x, 3, 2)
    x = _prelu(_conv_valid(x, p["conv3.w"], p["conv3.b"]), p["prelu3"])
    x = _maxpool_ceil(x, 2, 2)
    x = _prelu(_conv_valid(x, p["conv4.w"], p["conv4.b"]), p["prelu4"])
    x = _flatten_torch(x)
    x = _prelu(x @ p["fc5.w"] + p["fc5.b"], p["prelu5"])  # eval: no dropout
    a = jax.nn.softmax(x @ p["fc6_1.w"] + p["fc6_1.b"], axis=-1)
    b = x @ p["fc6_2.w"] + p["fc6_2.b"]
    c = x @ p["fc6_3.w"] + p["fc6_3.b"]
    return c, b, a


def _cvt_conv(w):
    return np.transpose(w, (2, 3, 1, 0)).astype(np.float32)  # OIHW -> HWIO


def load_mtcnn_weights(weights_dir: str) -> Tuple[dict, dict, dict]:
    """Load the public pnet/rnet/onet .npy dicts (torch names) into the
    NHWC layouts the apply functions expect."""

    def load(name):
        return np.load(os.path.join(weights_dir, name),
                       allow_pickle=True)[()]

    pw = load("pnet.npy")
    pnet = {}
    for i in (1, 2, 3):
        pnet[f"conv{i}.w"] = _cvt_conv(pw[f"features.conv{i}.weight"])
        pnet[f"conv{i}.b"] = pw[f"features.conv{i}.bias"].astype(np.float32)
        pnet[f"prelu{i}"] = pw[f"features.prelu{i}.weight"].astype(np.float32)
    for h in ("conv4_1", "conv4_2"):
        pnet[f"{h}.w"] = _cvt_conv(pw[f"{h}.weight"])
        pnet[f"{h}.b"] = pw[f"{h}.bias"].astype(np.float32)

    rw = load("rnet.npy")
    rnet = {}
    for i in (1, 2, 3):
        rnet[f"conv{i}.w"] = _cvt_conv(rw[f"features.conv{i}.weight"])
        rnet[f"conv{i}.b"] = rw[f"features.conv{i}.bias"].astype(np.float32)
        rnet[f"prelu{i}"] = rw[f"features.prelu{i}.weight"].astype(np.float32)
    rnet["fc4.w"] = rw["features.conv4.weight"].T.astype(np.float32)
    rnet["fc4.b"] = rw["features.conv4.bias"].astype(np.float32)
    rnet["prelu4"] = rw["features.prelu4.weight"].astype(np.float32)
    for h, t in (("fc5_1", "conv5_1"), ("fc5_2", "conv5_2")):
        rnet[f"{h}.w"] = rw[f"{t}.weight"].T.astype(np.float32)
        rnet[f"{h}.b"] = rw[f"{t}.bias"].astype(np.float32)

    ow = load("onet.npy")
    onet = {}
    for i in (1, 2, 3, 4):
        onet[f"conv{i}.w"] = _cvt_conv(ow[f"features.conv{i}.weight"])
        onet[f"conv{i}.b"] = ow[f"features.conv{i}.bias"].astype(np.float32)
        onet[f"prelu{i}"] = ow[f"features.prelu{i}.weight"].astype(np.float32)
    onet["fc5.w"] = ow["features.conv5.weight"].T.astype(np.float32)
    onet["fc5.b"] = ow["features.conv5.bias"].astype(np.float32)
    onet["prelu5"] = ow["features.prelu5.weight"].astype(np.float32)
    for h, t in (("fc6_1", "conv6_1"), ("fc6_2", "conv6_2"),
                 ("fc6_3", "conv6_3")):
        onet[f"{h}.w"] = ow[f"{t}.weight"].T.astype(np.float32)
        onet[f"{h}.b"] = ow[f"{t}.bias"].astype(np.float32)
    return pnet, rnet, onet


# ------------------------------------------------------------- box utilities
# Standard public MTCNN box arithmetic (box_utils.py semantics), vectorised.

def nms(boxes: np.ndarray, thresh: float, mode: str = "union") -> List[int]:
    if len(boxes) == 0:
        return []
    x1, y1, x2, y2, score = boxes[:, 0], boxes[:, 1], boxes[:, 2], \
        boxes[:, 3], boxes[:, 4]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    ids = np.argsort(score)
    pick = []
    while len(ids) > 0:
        i = ids[-1]
        pick.append(int(i))
        rest = ids[:-1]
        w = np.maximum(0.0, np.minimum(x2[i], x2[rest])
                       - np.maximum(x1[i], x1[rest]) + 1.0)
        h = np.maximum(0.0, np.minimum(y2[i], y2[rest])
                       - np.maximum(y1[i], y1[rest]) + 1.0)
        inter = w * h
        if mode == "min":
            overlap = inter / np.minimum(area[i], area[rest])
        else:
            overlap = inter / (area[i] + area[rest] - inter)
        ids = rest[overlap <= thresh]
    return pick


def calibrate_box(bboxes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    w = (bboxes[:, 2] - bboxes[:, 0] + 1.0)[:, None]
    h = (bboxes[:, 3] - bboxes[:, 1] + 1.0)[:, None]
    bboxes = bboxes.copy()
    bboxes[:, 0:4] += np.hstack([w, h, w, h]) * offsets
    return bboxes


def convert_to_square(bboxes: np.ndarray) -> np.ndarray:
    sq = bboxes.copy()
    w = bboxes[:, 2] - bboxes[:, 0] + 1.0
    h = bboxes[:, 3] - bboxes[:, 1] + 1.0
    side = np.maximum(w, h)
    sq[:, 0] = bboxes[:, 0] + w * 0.5 - side * 0.5
    sq[:, 1] = bboxes[:, 1] + h * 0.5 - side * 0.5
    sq[:, 2] = sq[:, 0] + side - 1.0
    sq[:, 3] = sq[:, 1] + side - 1.0
    return sq


def _crop_boxes(bboxes: np.ndarray, img: Image.Image, size: int
                ) -> np.ndarray:
    """Cut (clipped, zero-padded) square crops and resize to size x size;
    returns (n, size, size, 3) preprocessed NHWC."""
    arr = np.asarray(img, np.uint8)
    height, width = arr.shape[0], arr.shape[1]
    n = len(bboxes)
    # degenerate boxes (w/h <= 0) stay as preprocessed-BLACK crops, like
    # the reference which preprocesses every (blank) crop — raw 0.0 rows
    # would read as mid-gray (pixel 127.5) and could survive RNet/ONet
    out = np.full((n, size, size, 3), (0.0 - 127.5) * 0.0078125, np.float32)
    for i in range(n):
        x1, y1, x2, y2 = [int(v) for v in bboxes[i, :4]]
        w, h = x2 - x1 + 1, y2 - y1 + 1
        if w <= 0 or h <= 0:
            continue
        box = np.zeros((h, w, 3), np.uint8)
        sx1, sy1 = max(x1, 0), max(y1, 0)
        sx2, sy2 = min(x2, width - 1), min(y2, height - 1)
        if sx2 >= sx1 and sy2 >= sy1:
            box[sy1 - y1:sy2 - y1 + 1, sx1 - x1:sx2 - x1 + 1] = \
                arr[sy1:sy2 + 1, sx1:sx2 + 1]
        box = np.asarray(Image.fromarray(box).resize((size, size),
                                                     Image.BILINEAR),
                         np.float32)
        out[i] = (box - 127.5) * 0.0078125
    return out


def _next_bucket(n: int, base: int = 16) -> int:
    b = base
    while b < n:
        b *= 2
    return b


# ------------------------------------------------------------------ detector

class MTCNN:
    """detect_faces / align on raw images.

    weights_dir must contain pnet.npy / rnet.npy / onet.npy (the public
    MTCNN release the reference vendors at
    eval/preprocess/mtcnn_pytorch/src/weights/)."""

    def __init__(self, weights_dir: str):
        self.pnet_p, self.rnet_p, self.onet_p = load_mtcnn_weights(
            weights_dir)
        self._pnet = jax.jit(pnet_apply)
        self._rnet = jax.jit(rnet_apply)
        self._onet = jax.jit(onet_apply)

    # stage 1 -------------------------------------------------------------
    def _run_pnet_scale(self, image: Image.Image, scale: float,
                        threshold: float) -> Optional[np.ndarray]:
        width, height = image.size
        sw, sh = math.ceil(width * scale), math.ceil(height * scale)
        img = image.resize((sw, sh), Image.BILINEAR)
        x = (np.asarray(img, np.float32) - 127.5) * 0.0078125
        offsets, probs = self._pnet(self.pnet_p, jnp.asarray(x[None]))
        probs = np.asarray(probs)[0, :, :, 1]
        offsets = np.asarray(offsets)[0]  # (h, w, 4)
        iy, ix = np.where(probs > threshold)
        if iy.size == 0:
            return None
        stride, cell = 2, 12
        off = offsets[iy, ix]  # (k, 4) tx1 ty1 tx2 ty2
        boxes = np.stack([
            np.round((stride * ix + 1.0) / scale),
            np.round((stride * iy + 1.0) / scale),
            np.round((stride * ix + 1.0 + cell) / scale),
            np.round((stride * iy + 1.0 + cell) / scale),
            probs[iy, ix],
            off[:, 0], off[:, 1], off[:, 2], off[:, 3]], axis=1)
        keep = nms(boxes[:, 0:5], 0.5)
        return boxes[keep]

    def detect_faces(self, image: Image.Image, min_face_size: float = 64.0,
                     thresholds=(0.6, 0.7, 0.8),
                     nms_thresholds=(0.7, 0.7, 0.7), factor: float = 0.707):
        """mtcnn.py:160-274 protocol. Returns (boxes (n,5), landmarks
        (n,10) [x1..x5, y1..y5])."""
        width, height = image.size
        min_length = min(height, width)
        m = 12.0 / min_face_size
        min_length *= m
        scales = []
        k = 0
        while min_length > 12.0:
            scales.append(m * factor ** k)
            min_length *= factor
            k += 1

        candidates = [self._run_pnet_scale(image, s, thresholds[0])
                      for s in scales]
        candidates = [c for c in candidates if c is not None and len(c)]
        if not candidates:
            return np.zeros([0, 5]), np.zeros([0, 10])
        boxes = np.vstack(candidates)
        keep = nms(boxes[:, 0:5], nms_thresholds[0])
        boxes = boxes[keep]
        boxes = calibrate_box(boxes[:, 0:5], boxes[:, 5:])
        boxes = convert_to_square(boxes)
        boxes[:, 0:4] = np.round(boxes[:, 0:4])

        # stage 2
        crops = _crop_boxes(boxes, image, 24)
        n = len(crops)
        bucket = _next_bucket(n)
        padded = np.zeros((bucket,) + crops.shape[1:], np.float32)
        padded[:n] = crops
        off, prob = self._rnet(self.rnet_p, jnp.asarray(padded))
        off = np.asarray(off)[:n]
        prob = np.asarray(prob)[:n]
        keep = np.where(prob[:, 1] > thresholds[1])[0]
        boxes = boxes[keep]
        if len(boxes) == 0:
            return np.zeros([0, 5]), np.zeros([0, 10])
        boxes[:, 4] = prob[keep, 1]
        off = off[keep]
        keep = nms(boxes, nms_thresholds[1])
        boxes = calibrate_box(boxes[keep], off[keep])
        boxes = convert_to_square(boxes)
        boxes[:, 0:4] = np.round(boxes[:, 0:4])

        # stage 3
        crops = _crop_boxes(boxes, image, 48)
        if len(crops) == 0:
            return np.zeros([0, 5]), np.zeros([0, 10])
        n = len(crops)
        bucket = _next_bucket(n)
        padded = np.zeros((bucket,) + crops.shape[1:], np.float32)
        padded[:n] = crops
        lmk, off, prob = self._onet(self.onet_p, jnp.asarray(padded))
        lmk = np.asarray(lmk)[:n]
        off = np.asarray(off)[:n]
        prob = np.asarray(prob)[:n]
        keep = np.where(prob[:, 1] > thresholds[2])[0]
        boxes = boxes[keep]
        if len(boxes) == 0:
            return np.zeros([0, 5]), np.zeros([0, 10])
        boxes[:, 4] = prob[keep, 1]
        off = off[keep]
        lmk = lmk[keep]
        w = (boxes[:, 2] - boxes[:, 0] + 1.0)[:, None]
        h = (boxes[:, 3] - boxes[:, 1] + 1.0)[:, None]
        lmk = lmk.copy()
        lmk[:, 0:5] = boxes[:, 0:1] + w * lmk[:, 0:5]
        lmk[:, 5:10] = boxes[:, 1:2] + h * lmk[:, 5:10]
        boxes = calibrate_box(boxes, off)
        keep = nms(boxes, nms_thresholds[2], mode="min")
        return boxes[keep], lmk[keep]

    # alignment -----------------------------------------------------------
    def landmarks5(self, image: Image.Image, **kw) -> Optional[np.ndarray]:
        """Best-face 5-pt landmarks as (5, 2) [[x, y], ...] or None."""
        boxes, lmk = self.detect_faces(image, **kw)
        if len(lmk) == 0:
            return None
        best = int(np.argmax(boxes[:, 4]))
        return np.stack([lmk[best, 0:5], lmk[best, 5:10]], axis=1) \
            .astype(np.float32)

    def align(self, image: Image.Image, size: int = 112, **kw
              ) -> Optional[Image.Image]:
        """Detect + ArcFace norm_crop (tools/native umeyama — the same
        alignment the eval stack golden-tests against estimate_norm;
        deviation: the reference MTCNN wrapper uses cp2tform with its own
        96x112-derived template, mtcnn.py:24-38)."""
        lmk = self.landmarks5(image, **kw)
        if lmk is None:
            return None
        from msml_tpu.tools.native import norm_crop
        arr = np.asarray(image.convert("RGB"))
        return Image.fromarray(norm_crop(arr, lmk, size))
