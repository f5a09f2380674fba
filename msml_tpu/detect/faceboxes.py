"""FaceBoxesV2 face detector, JAX-native.

Parity target: the reference's vendored FaceBoxesV2
(`eval/preprocess/PIPNet/FaceBoxesV2/{faceboxes_detector.py,
utils/{faceboxes,prior_box,box_utils,config}.py}`) — the detector behind the
PIPNet alignment path (`eval/align_dataset.py:60-61`; note the reference's
`PIPNet/lib` landmark model is NOT vendored upstream, so FaceBoxesV2 boxes
are the complete vendored capability).

Design: the net is a pure function over a parameter dict imported from the
public `FaceBoxesV2.pth` release (user-supplied path, `module.`-prefixed
state dict — same importer contract as tools/import_torch). NHWC, eval-mode
BN folded to scale/shift. Anchor generation / box decode / NMS run on the
host in numpy (offline preprocessing; NMS routes through the C++-backed
tools/native.nms, py_cpu_nms parity — the reference builds the same NMS from
cpu_nms.pyx).
"""

from __future__ import annotations

from itertools import product
from math import ceil
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CFG = {
    "min_sizes": [[32, 64, 128], [256], [512]],
    "steps": [32, 64, 128],
    "variance": [0.1, 0.2],
    "clip": False,
}


# ---------------------------------------------------------------------- net

def _bn_fold(w, b, mean, var, eps=1e-5):
    scale = w / np.sqrt(var + eps)
    return scale.astype(np.float32), (b - mean * scale).astype(np.float32)


def _basic_conv(x, p, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(out * p["scale"] + p["bias"])


def _inception(x, p):
    b1 = _basic_conv(x, p["branch1x1"], 1, 0)
    pool = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0))) / 9.0
    b2 = _basic_conv(pool, p["branch1x1_2"], 1, 0)
    b3 = _basic_conv(_basic_conv(x, p["branch3x3_reduce"], 1, 0),
                     p["branch3x3"], 1, 1)
    b4 = _basic_conv(
        _basic_conv(_basic_conv(x, p["branch3x3_reduce_2"], 1, 0),
                    p["branch3x3_2"], 1, 1), p["branch3x3_3"], 1, 1)
    return jnp.concatenate([b1, b2, b3, b4], axis=-1)


def _head_conv(x, p):
    out = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"]


def faceboxes_apply(params: Dict, x: jnp.ndarray):
    """x: (1, H, W, 3) BGR float (int-truncated mean already subtracted).
    Returns (loc (1, n, 4), conf (1, n, 2) softmaxed) — the torch
    permute(0,2,3,1)+flatten order is NHWC's natural flatten."""
    for i in range(1, 6):
        x = _basic_conv(x, params[f"conv{i}"], 2, 1)
    x = _inception(x, params["inception1"])
    x = _inception(x, params["inception2"])
    x = _inception(x, params["inception3"])
    s1 = x
    x = _basic_conv(x, params["conv6_1"], 1, 0)
    x = _basic_conv(x, params["conv6_2"], 2, 1)
    s2 = x
    x = _basic_conv(x, params["conv7_1"], 1, 0)
    x = _basic_conv(x, params["conv7_2"], 2, 1)
    s3 = x

    locs, confs = [], []
    for i, s in enumerate((s1, s2, s3)):
        b = s.shape[0]
        locs.append(_head_conv(s, params[f"loc{i}"]).reshape(b, -1))
        confs.append(_head_conv(s, params[f"conf{i}"]).reshape(b, -1))
    loc = jnp.concatenate(locs, axis=1).reshape(b, -1, 4)
    conf = jnp.concatenate(confs, axis=1).reshape(b, -1, 2)
    return loc, jax.nn.softmax(conf, axis=-1)


def load_faceboxes_weights(path: str) -> Dict:
    """Import the public FaceBoxesV2.pth (module.-prefixed torch state dict)
    into the NHWC folded-BN layout."""
    import torch
    sd = torch.load(path, map_location="cpu")
    sd = {(k[7:] if k.startswith("module.") else k): v.numpy()
          for k, v in sd.items()}

    def basic(prefix):
        scale, bias = _bn_fold(sd[f"{prefix}.bn.weight"],
                               sd[f"{prefix}.bn.bias"],
                               sd[f"{prefix}.bn.running_mean"],
                               sd[f"{prefix}.bn.running_var"])
        return {"w": np.transpose(sd[f"{prefix}.conv.weight"],
                                  (2, 3, 1, 0)).astype(np.float32),
                "scale": scale, "bias": bias}

    params: Dict = {}
    for i in range(1, 6):
        params[f"conv{i}"] = basic(f"conv{i}")
    for j in (1, 2, 3):
        params[f"inception{j}"] = {
            br: basic(f"inception{j}.{br}")
            for br in ("branch1x1", "branch1x1_2", "branch3x3_reduce",
                       "branch3x3", "branch3x3_reduce_2", "branch3x3_2",
                       "branch3x3_3")}
    params["conv6_1"] = basic("conv6_1")
    params["conv6_2"] = basic("conv6_2")
    params["conv7_1"] = basic("conv7_1")
    params["conv7_2"] = basic("conv7_2")
    for i in range(3):
        params[f"loc{i}"] = {
            "w": np.transpose(sd[f"loc.{i}.weight"],
                              (2, 3, 1, 0)).astype(np.float32),
            "bias": sd[f"loc.{i}.bias"].astype(np.float32)}
        params[f"conf{i}"] = {
            "w": np.transpose(sd[f"conf.{i}.weight"],
                              (2, 3, 1, 0)).astype(np.float32),
            "bias": sd[f"conf.{i}.bias"].astype(np.float32)}
    return params


# ------------------------------------------------------------ priors/decode

def prior_boxes(image_size: Tuple[int, int]) -> np.ndarray:
    """prior_box.py parity: (n, 4) [cx, cy, sx, sy] normalised anchors with
    the 4x/2x dense grids for min_size 32/64."""
    h, w = image_size
    anchors: List[float] = []
    feature_maps = [[ceil(h / s), ceil(w / s)] for s in CFG["steps"]]
    for k, f in enumerate(feature_maps):
        step = CFG["steps"][k]
        for i, j in product(range(f[0]), range(f[1])):
            for min_size in CFG["min_sizes"][k]:
                s_kx = min_size / w
                s_ky = min_size / h
                if min_size == 32:
                    cxs = [(j + o) * step / w for o in (0, 0.25, 0.5, 0.75)]
                    cys = [(i + o) * step / h for o in (0, 0.25, 0.5, 0.75)]
                    for cy, cx in product(cys, cxs):
                        anchors += [cx, cy, s_kx, s_ky]
                elif min_size == 64:
                    cxs = [(j + o) * step / w for o in (0, 0.5)]
                    cys = [(i + o) * step / h for o in (0, 0.5)]
                    for cy, cx in product(cys, cxs):
                        anchors += [cx, cy, s_kx, s_ky]
                else:
                    anchors += [(j + 0.5) * step / w, (i + 0.5) * step / h,
                                s_kx, s_ky]
    return np.asarray(anchors, np.float32).reshape(-1, 4)


def decode(loc: np.ndarray, priors: np.ndarray,
           variances=(0.1, 0.2)) -> np.ndarray:
    """box_utils.py:175-193 SSD decode -> (n, 4) [x1, y1, x2, y2]."""
    boxes = np.concatenate([
        priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:],
        priors[:, 2:] * np.exp(loc[:, 2:] * variances[1])], axis=1)
    boxes[:, :2] -= boxes[:, 2:] / 2
    boxes[:, 2:] += boxes[:, :2]
    return boxes


# ------------------------------------------------------------------ detector

class FaceBoxesDetector:
    """faceboxes_detector.py protocol: auto-rescale so min side <= 600,
    integer BGR mean subtraction (104, 117, 123 — the truncation is part of
    the vendored behavior), decode + threshold + top-5000 + NMS(0.3) +
    cap 750, boxes mapped back to the original scale as
    ["face", score, x, y, w, h]."""

    def __init__(self, weights_path: str):
        self.params = load_faceboxes_weights(weights_path)
        self._net = jax.jit(faceboxes_apply)

    def detect(self, image_bgr: np.ndarray, thresh: float = 0.6,
               im_scale: Optional[float] = None, bucket: int = 128):
        """bucket > 0 pads the resized image up to a multiple of `bucket`
        so heterogeneous resolutions share jit executables (one compile per
        bucket instead of per exact shape — compiles cost seconds through
        the remote-TPU tunnel). Black padding scores below any threshold;
        deep-layer borders can differ marginally from the exact unpadded
        geometry, so pass bucket=0 for bit-parity with the vendored
        pipeline."""
        import cv2
        from msml_tpu.tools.native import nms

        if im_scale is None:
            height, width = image_bgr.shape[:2]
            im_scale = 600.0 / min(height, width) \
                if min(height, width) > 600 else 1.0
        img = cv2.resize(image_bgr, None, fx=im_scale, fy=im_scale,
                         interpolation=cv2.INTER_LINEAR)
        # pad to `bucket`-px buckets (128 = the coarsest prior stride); box
        # coordinates are identical in padded and original pixel space
        h, w = img.shape[:2]
        b = max(int(bucket), 1)
        hp, wp = -(-h // b) * b, -(-w // b) * b
        if (hp, wp) != (h, w):
            img = np.pad(img, ((0, hp - h), (0, wp - w), (0, 0)))
        x = img.astype(np.int32) - np.array([104, 117, 123], np.int32)
        loc, conf = self._net(self.params,
                              jnp.asarray(x[None], jnp.float32))
        loc = np.asarray(loc)[0]
        scores = np.asarray(conf)[0][:, 1]
        priors = prior_boxes((hp, wp))
        boxes = decode(loc, priors, CFG["variance"])
        boxes *= np.array([wp, hp, wp, hp], np.float32)

        inds = np.where(scores > thresh)[0]
        boxes, scores = boxes[inds], scores[inds]
        order = scores.argsort()[::-1][:5000]
        boxes, scores = boxes[order], scores[order]
        dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
        keep = nms(dets, 0.3)
        dets = dets[keep][:750]
        return map_detections(dets, im_scale), im_scale


def map_detections(dets: np.ndarray, im_scale: float) -> list:
    """Reference integer mapping (faceboxes_detector.py:100-120): truncate
    corners FIRST, width/height from the truncated corners, then truncate
    again after the im_scale division — both truncations shift boxes by a
    pixel vs dividing the raw floats once."""
    out = []
    for x1, y1, x2, y2, s in dets:
        xmin, ymin = int(x1), int(y1)
        width, height = int(x2) - xmin, int(y2) - ymin
        out.append(["face", float(s), int(xmin / im_scale),
                    int(ymin / im_scale), int(width / im_scale),
                    int(height / im_scale)])
    return out
