"""RetinaFace detector: anchors + decode + NMS around an inference graph.

Parity target: `datasets/benchmarks/RetinaFace/retinaface.py` (the MXNet
runtime the reference vendors to align PKU-Masked-Face,
`iterate_pku.py:36-38`) and its anchor machinery
(`rcnn/processing/generate_anchor.py:16-87`, `rcnn/cython/anchors.pyx`).

The network itself comes from the checkpoint's symbol graph, executed by
`msml_tpu.detect.mxnet_graph.MXGraph` (JAX, jitted per input shape); this
module reimplements the surrounding protocol: FPN anchor generation,
score slicing, bbox/landmark delta decoding, threshold + flip + multi-scale
handling, cross-level NMS, and the center-face picker used for alignment.

`model` is any callable returning the graph head outputs as NCHW arrays in
the reference's order per stride: [cls_score, bbox_pred, landmark_pred] x
strides (landmarks optional) — so tests can drive the protocol with
synthetic heads and real checkpoints drop in via MXGraph.load(prefix).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from msml_tpu.tools import native


# ----------------------------------------------------------------- anchors

def _whctrs(anchor):
    w = anchor[2] - anchor[0] + 1
    h = anchor[3] - anchor[1] + 1
    return w, h, anchor[0] + 0.5 * (w - 1), anchor[1] + 0.5 * (h - 1)


def _mkanchors(ws, hs, x_ctr, y_ctr):
    ws, hs = ws[:, None], hs[:, None]
    return np.hstack((x_ctr - 0.5 * (ws - 1), y_ctr - 0.5 * (hs - 1),
                      x_ctr + 0.5 * (ws - 1), y_ctr + 0.5 * (hs - 1)))


def generate_anchors(base_size=16, ratios=(1.0,), scales=(8,)):
    """Classic Faster-RCNN base anchors wrt the (0,0,15,15) window
    (`generate_anchor.py:16-38`, ratio then scale enumeration)."""
    base = np.array([1, 1, base_size, base_size], np.float64) - 1
    w, h, x, y = _whctrs(base)
    size_ratios = (w * h) / np.asarray(ratios, np.float64)
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * np.asarray(ratios))
    ratio_anchors = _mkanchors(ws, hs, x, y)
    out = []
    for ra in ratio_anchors:
        w, h, x, y = _whctrs(ra)
        ws = w * np.asarray(scales, np.float64)
        hs = h * np.asarray(scales, np.float64)
        out.append(_mkanchors(ws, hs, x, y))
    return np.vstack(out)


def anchor_cfg_for(network: str = "net3") -> Tuple[List[int], Dict]:
    """The reference's per-network FPN anchor configs
    (`retinaface.py:42-187`). net3 (strides 32/16/8) is what the released
    RetinaFace-R50 uses."""
    ratio = (1.0, 1.5) if network.endswith("a") else (1.0,)
    base = network.rstrip("a")
    fmc = {"net3": 3, "x3": 3, "net4": 4, "net5": 5, "x5": 5,
           "net6": 6}.get(base)
    if fmc is None:
        raise ValueError(f"unknown network '{network}'")
    if fmc == 3:
        strides = [32, 16, 8]
        scales = {32: (32, 16), 16: (8, 4), 8: (2, 1)}
    elif fmc == 4:
        strides = [32, 16, 8, 4]
        scales = {32: (32, 16), 16: (8, 4), 8: (2, 1), 4: (1,)}
    elif fmc == 5:
        strides = [64, 32, 16, 8, 4]
        scales, s = {}, 1.0
        for st in [4, 8, 16, 32, 64]:
            tier = []
            for _ in range(3):
                tier.append(s)
                s *= 2.0 ** (1.0 / 3)
            scales[st] = tuple(tier)
    else:
        raise NotImplementedError("net6")
    cfg = {s: {"BASE_SIZE": 16, "RATIOS": ratio, "SCALES": scales[s],
               "ALLOWED_BORDER": 9999} for s in strides}
    return strides, cfg


def bbox_pred(boxes: np.ndarray, deltas: np.ndarray) -> np.ndarray:
    """`retinaface.py:727-768` (+1-width box convention)."""
    if boxes.shape[0] == 0:
        return np.zeros((0, deltas.shape[1]))
    boxes = boxes.astype(np.float64, copy=False)
    widths = boxes[:, 2] - boxes[:, 0] + 1.0
    heights = boxes[:, 3] - boxes[:, 1] + 1.0
    ctr_x = boxes[:, 0] + 0.5 * (widths - 1.0)
    ctr_y = boxes[:, 1] + 0.5 * (heights - 1.0)
    dx, dy = deltas[:, 0:1], deltas[:, 1:2]
    dw, dh = deltas[:, 2:3], deltas[:, 3:4]
    pcx = dx * widths[:, None] + ctr_x[:, None]
    pcy = dy * heights[:, None] + ctr_y[:, None]
    pw = np.exp(dw) * widths[:, None]
    ph = np.exp(dh) * heights[:, None]
    pred = np.zeros(deltas.shape)
    pred[:, 0:1] = pcx - 0.5 * (pw - 1.0)
    pred[:, 1:2] = pcy - 0.5 * (ph - 1.0)
    pred[:, 2:3] = pcx + 0.5 * (pw - 1.0)
    pred[:, 3:4] = pcy + 0.5 * (ph - 1.0)
    if deltas.shape[1] > 4:
        pred[:, 4:] = deltas[:, 4:]
    return pred


def landmark_pred(boxes: np.ndarray, deltas: np.ndarray) -> np.ndarray:
    """`retinaface.py:770-782`: deltas (N, 5, 2) in box-size units."""
    if boxes.shape[0] == 0:
        return np.zeros((0, deltas.shape[1], 2))
    boxes = boxes.astype(np.float64, copy=False)
    widths = boxes[:, 2] - boxes[:, 0] + 1.0
    heights = boxes[:, 3] - boxes[:, 1] + 1.0
    ctr_x = boxes[:, 0] + 0.5 * (widths - 1.0)
    ctr_y = boxes[:, 1] + 0.5 * (heights - 1.0)
    pred = deltas.copy()
    for i in range(5):
        pred[:, i, 0] = deltas[:, i, 0] * widths + ctr_x
        pred[:, i, 1] = deltas[:, i, 1] * heights + ctr_y
    return pred


def clip_boxes(boxes: np.ndarray, im_shape) -> np.ndarray:
    boxes[:, 0::4] = np.clip(boxes[:, 0::4], 0, im_shape[1] - 1)
    boxes[:, 1::4] = np.clip(boxes[:, 1::4], 0, im_shape[0] - 1)
    boxes[:, 2::4] = np.clip(boxes[:, 2::4], 0, im_shape[1] - 1)
    boxes[:, 3::4] = np.clip(boxes[:, 3::4], 0, im_shape[0] - 1)
    return boxes


class RetinaFace:
    """Decode/NMS protocol around a graph callable (see module docstring).

    `model(img_nhwc_float32[1, H, W, 3]) -> [NCHW ndarray, ...]` with the
    reference head ordering. Use `RetinaFace.from_checkpoint(prefix)` for a
    real mxnet checkpoint."""

    def __init__(self, model: Callable, network: str = "net3",
                 nms_threshold: float = 0.4, use_landmarks: bool = True,
                 decay4: float = 0.5,
                 pixel_means=(0.0, 0.0, 0.0), pixel_stds=(1.0, 1.0, 1.0),
                 pixel_scale: float = 1.0):
        self.model = model
        self.nms_threshold = nms_threshold
        self.use_landmarks = use_landmarks
        self.decay4 = decay4
        self.pixel_means = np.asarray(pixel_means, np.float32)  # BGR order
        self.pixel_stds = np.asarray(pixel_stds, np.float32)
        self.pixel_scale = float(pixel_scale)
        self._feat_stride_fpn, cfg = anchor_cfg_for(network)
        self._anchors_fpn = {
            s: generate_anchors(cfg[s]["BASE_SIZE"], cfg[s]["RATIOS"],
                                cfg[s]["SCALES"]).astype(np.float32)
            for s in self._feat_stride_fpn}
        self._num_anchors = {s: a.shape[0]
                             for s, a in self._anchors_fpn.items()}
        self.bbox_stds = [1.0, 1.0, 1.0, 1.0]
        self.landmark_std = 1.0

    @classmethod
    def from_checkpoint(cls, prefix: str, epoch: int = 0, **kw) -> "RetinaFace":
        from msml_tpu.detect.mxnet_graph import MXGraph
        graph = MXGraph.load(prefix, epoch)
        n_heads = len(graph.heads)
        # Reference rule (retinaface.py:102): use_landmarks iff the graph has
        # 3 heads per stride (cls, bbox, landmark). A plain cls+bbox net3
        # checkpoint has 6 heads, so `n_heads % 3 == 0` would misclassify it.
        strides, _ = anchor_cfg_for(kw.get("network", "net3"))
        kw.setdefault("use_landmarks", n_heads // len(strides) == 3)
        return cls(graph, **kw)

    # ------------------------------------------------------------- protocol
    def _preprocess(self, im: np.ndarray) -> np.ndarray:
        """BGR HWC uint8/float -> normalized NHWC float32 in the
        reference's RGB-reversed channel order (`retinaface.py:250-258`)."""
        im = im.astype(np.float32)
        chans = [(im[:, :, 2 - i] / self.pixel_scale - self.pixel_means[2 - i])
                 / self.pixel_stds[2 - i] for i in range(3)]
        return np.stack(chans, axis=-1)[None]  # (1, H, W, 3); C = RGB

    def detect(self, img: np.ndarray, threshold: float = 0.5,
               scales: Sequence[float] = (1.0,), do_flip: bool = False
               ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """`retinaface.py:264-596`: multi-scale/flip sweep, per-stride
        decode, global score sort + NMS. Returns (det (N, 5), landmarks
        (N, 5, 2) or None)."""
        proposals_list, scores_list, landmarks_list = [], [], []
        flips = (0, 1) if do_flip else (0,)
        for im_scale in scales:
            for flip in flips:
                if im_scale != 1.0:
                    import cv2
                    im = cv2.resize(img, None, fx=im_scale, fy=im_scale,
                                    interpolation=cv2.INTER_LINEAR)
                else:
                    im = img.copy()
                if flip:
                    im = im[:, ::-1, :]
                net_out = self.model(self._preprocess(im))
                self._decode_one(im, im_scale, flip, net_out, threshold,
                                 proposals_list, scores_list, landmarks_list)

        if not proposals_list or not sum(p.shape[0] for p in proposals_list):
            lmk = np.zeros((0, 5, 2)) if self.use_landmarks else None
            return np.zeros((0, 5)), lmk
        proposals = np.vstack(proposals_list)
        scores = np.vstack(scores_list)
        order = scores.ravel().argsort()[::-1]
        proposals, scores = proposals[order], scores[order]
        landmarks = None
        if self.use_landmarks:
            landmarks = np.vstack(landmarks_list)[order].astype(
                np.float32, copy=False)
        pre_det = np.hstack((proposals[:, :4], scores)).astype(
            np.float32, copy=False)
        if self.nms_threshold > 0:
            keep = native.nms(pre_det, self.nms_threshold)
            det = pre_det[keep]
            if landmarks is not None:
                landmarks = landmarks[keep]
        else:
            det = pre_det
        return det, landmarks

    def _decode_one(self, im, im_scale, flip, net_out, threshold,
                    proposals_list, scores_list, landmarks_list):
        sym_idx = 0
        for s in self._feat_stride_fpn:
            A = self._num_anchors[s]
            scores = np.asarray(net_out[sym_idx])[:, A:, :, :]
            bbox_deltas = np.asarray(net_out[sym_idx + 1])
            height, width = bbox_deltas.shape[2], bbox_deltas.shape[3]
            anchors = native.anchor_grid(height, width, s,
                                         self._anchors_fpn[s])
            anchors = anchors.reshape((height * width * A, 4))
            scores = scores.transpose((0, 2, 3, 1)).reshape((-1, 1))
            bbox_deltas = bbox_deltas.transpose((0, 2, 3, 1))
            bl = bbox_deltas.shape[3] // A
            bbox_deltas = bbox_deltas.reshape((-1, bl)).copy()
            for i in range(4):
                bbox_deltas[:, i::4] *= self.bbox_stds[i]
            proposals = bbox_pred(anchors, bbox_deltas)
            proposals = clip_boxes(proposals, im.shape[:2])
            if s == 4 and self.decay4 < 1.0:
                scores = scores * self.decay4
            order = np.where(scores.ravel() >= threshold)[0]
            proposals, scores = proposals[order], scores[order]
            if flip:
                oldx1, oldx2 = proposals[:, 0].copy(), proposals[:, 2].copy()
                proposals[:, 0] = im.shape[1] - oldx2 - 1
                proposals[:, 2] = im.shape[1] - oldx1 - 1
            proposals[:, 0:4] /= im_scale
            proposals_list.append(proposals)
            scores_list.append(scores)
            if self.use_landmarks:
                lmk_deltas = np.asarray(net_out[sym_idx + 2])
                ll = lmk_deltas.shape[1] // A
                lmk = lmk_deltas.transpose((0, 2, 3, 1)).reshape(
                    (-1, 5, ll // 5)).copy()
                lmk *= self.landmark_std
                lmk = landmark_pred(anchors, lmk)[order]
                if flip:
                    lmk[:, :, 0] = im.shape[1] - lmk[:, :, 0] - 1
                    lmk = lmk[:, [1, 0, 2, 4, 3], :]
                lmk[:, :, 0:2] /= im_scale
                landmarks_list.append(lmk)
            sym_idx += 3 if self.use_landmarks else 2

    def detect_center(self, img, threshold: float = 0.5,
                      scales=(1.0,), do_flip: bool = False):
        """Biggest-and-most-central face (`retinaface.py:598-621`)."""
        det, landmarks = self.detect(img, threshold, scales, do_flip)
        if det.shape[0] == 0:
            return None, None
        bindex = 0
        if det.shape[0] > 1:
            img_size = np.asarray(img.shape)[:2]
            area = (det[:, 2] - det[:, 0]) * (det[:, 3] - det[:, 1])
            center = img_size / 2
            offs = np.vstack([(det[:, 0] + det[:, 2]) / 2 - center[1],
                              (det[:, 1] + det[:, 3]) / 2 - center[0]])
            bindex = np.argmax(area - np.sum(offs ** 2, 0) * 2.0)
        lmk = landmarks[bindex] if landmarks is not None else None
        return det[bindex], lmk
