"""Align raw face folders to 112x112 ArcFace crops.

Parity target: `eval/align_dataset.py:10-92` (MTCNN / PIPNet detection +
norm_crop) and the RetinaFace-based PKU alignment
(`datasets/benchmarks/iterate_pku.py:36-38`). The landmark->crop math is the
same Umeyama similarity transform (tools/native.norm_crop, C++-backed).

Detector sources (the reference's MTCNN/PIPNet/RetinaFace are all external
model zoos; none ship in this image):
  * --landmarks FILE: precomputed 5-pt landmarks, one line per image:
      <relative/path.jpg> x1 y1 x2 y2 x3 y3 x4 y4 x5 y5
  * --mtcnn-weights DIR: the bundled JAX MTCNN cascade.
  * --retinaface-prefix PREFIX: an mxnet RetinaFace checkpoint
    (PREFIX-symbol.json + PREFIX-0000.params, e.g. the public R50
    release), executed by the bundled JAX mxnet-graph runtime — the
    center-face protocol of `iterate_pku.py`.
  * --yunet MODEL.onnx: OpenCV FaceDetectorYN (returns exactly the 5
    landmarks: eyes, nose, mouth corners) when you supply the model file.

Usage:
  python -m msml_tpu.tools.align_dataset --src raw/ --out aligned/ \
      --landmarks lmk.txt [--size 112]
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import numpy as np


def load_landmark_file(path: str) -> Dict[str, np.ndarray]:
    lmk = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 11:
                continue
            lmk[parts[0]] = np.asarray(
                list(map(float, parts[1:])), np.float32).reshape(5, 2)
    return lmk


class MTCNNDetector:
    """Bundled MTCNN cascade (detect/mtcnn.py) -> best-face 5-pt landmarks.
    Takes the public pnet/rnet/onet .npy weight directory (the reference
    vendors it at eval/preprocess/mtcnn_pytorch/src/weights)."""

    def __init__(self, weights_dir: str, min_face_size: float = 20.0,
                 thresholds=(0.6, 0.7, 0.8)):
        from msml_tpu.detect.mtcnn import MTCNN
        self.det = MTCNN(weights_dir)
        self.min_face_size = min_face_size
        self.thresholds = tuple(thresholds)

    def __call__(self, img_bgr: np.ndarray) -> Optional[np.ndarray]:
        from PIL import Image
        pil = Image.fromarray(img_bgr[:, :, ::-1])  # detector wants RGB
        return self.det.landmarks5(pil, min_face_size=self.min_face_size,
                                   thresholds=self.thresholds)


class RetinaFaceDetector:
    """RetinaFace mxnet checkpoint (detect/retinaface.py + the JAX
    mxnet-graph runtime) -> center-face 5-pt landmarks, the protocol
    `iterate_pku.py:155-164` uses to align PKU-Masked-Face."""

    def __init__(self, prefix: str, epoch: int = 0, threshold: float = 0.5,
                 network: str = "net3"):
        from msml_tpu.detect.retinaface import RetinaFace
        self.det = RetinaFace.from_checkpoint(prefix, epoch, network=network)
        self.threshold = threshold

    def __call__(self, img_bgr: np.ndarray) -> Optional[np.ndarray]:
        _, lmk = self.det.detect_center(img_bgr, threshold=self.threshold)
        return None if lmk is None else lmk.astype(np.float32)


class YuNetDetector:
    """cv2.FaceDetectorYN wrapper -> best-face 5-pt landmarks."""

    def __init__(self, model_path: str, score_thresh: float = 0.6):
        import cv2
        self.det = cv2.FaceDetectorYN_create(model_path, "", (320, 320),
                                             score_thresh)

    def __call__(self, img_bgr: np.ndarray) -> Optional[np.ndarray]:
        import cv2  # noqa: F401
        h, w = img_bgr.shape[:2]
        self.det.setInputSize((w, h))
        _, faces = self.det.detect(img_bgr)
        if faces is None or len(faces) == 0:
            return None
        best = faces[np.argmax(faces[:, -1])]
        return best[4:14].reshape(5, 2).astype(np.float32)


def align_folder(src: str, out: str, size: int = 112,
                 landmarks: Optional[Dict[str, np.ndarray]] = None,
                 detector: Optional[YuNetDetector] = None) -> dict:
    import cv2
    from msml_tpu.tools.native import norm_crop

    counts = {"aligned": 0, "skipped": 0}
    for root, _, files in os.walk(src):
        for f in sorted(files):
            if not f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")):
                continue
            rel = os.path.relpath(os.path.join(root, f), src)
            img = cv2.imread(os.path.join(src, rel), cv2.IMREAD_COLOR)
            if img is None:
                counts["skipped"] += 1
                continue
            lmk = None
            if landmarks is not None:
                lmk = landmarks.get(rel)
            elif detector is not None:
                lmk = detector(img)
            if lmk is None:
                counts["skipped"] += 1
                continue
            crop = norm_crop(img, lmk, size)
            dst = os.path.join(out, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            cv2.imwrite(dst, crop)
            counts["aligned"] += 1
    print(f"align_folder: {counts}")
    return counts


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=112)
    p.add_argument("--landmarks", type=str, default="")
    p.add_argument("--yunet", type=str, default="",
                   help="path to a YuNet face detection onnx model")
    p.add_argument("--mtcnn-weights", type=str, default="",
                   help="directory with the public MTCNN pnet/rnet/onet "
                        ".npy weights (bundled JAX cascade)")
    p.add_argument("--retinaface-prefix", type=str, default="",
                   help="mxnet checkpoint prefix (PREFIX-symbol.json + "
                        "PREFIX-0000.params) for the RetinaFace detector, "
                        "e.g. the public R50 release the reference uses "
                        "for PKU-Masked-Face")
    p.add_argument("--retinaface-epoch", type=int, default=0)
    p.add_argument("--min-face-size", type=float, default=20.0)
    p.add_argument("--thresholds", type=float, nargs=3,
                   default=[0.6, 0.7, 0.8],
                   help="MTCNN stage thresholds (mtcnn.py:161)")
    p.add_argument("--platform", type=str, default="cpu",
                   help="jax platform for the detector nets (tiny; cpu "
                        "default keeps the TPU free for training)")
    a = p.parse_args()
    if a.platform:
        import jax
        jax.config.update("jax_platforms", a.platform)
    lmk = load_landmark_file(a.landmarks) if a.landmarks else None
    det = None
    if a.mtcnn_weights:
        det = MTCNNDetector(a.mtcnn_weights, a.min_face_size,
                            tuple(a.thresholds))
    elif a.retinaface_prefix:
        det = RetinaFaceDetector(a.retinaface_prefix, a.retinaface_epoch)
    elif a.yunet:
        det = YuNetDetector(a.yunet)
    if lmk is None and det is None:
        raise SystemExit("provide --landmarks, --mtcnn-weights, or --yunet")
    align_folder(a.src, a.out, a.size, lmk, det)
