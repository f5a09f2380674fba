"""Verification-set `.bin` loader (lfw.bin / cfp_fp.bin / agedb_30.bin).

Parity target: `eval/verification.py:201-236` `load_bin` and
`datasets/load_dataset.py:416-467` `ReadMXNet.load_bin`: a pickled
(bins, issame_list) pair where bins are encoded JPEGs; each image is decoded,
kept at (H, W, 3) RGB, and a horizontally flipped copy is produced
(flip along width == mx.ndarray.flip(axis=2) on CHW).

Returns numpy NHWC uint8-scale float arrays ready for
eval/verification.extract_embeddings; PIL-image output is available for the
occlusion-sweep CLI which composes PIL transforms
(`eval/qeval_mxnet.py:512-547`).
"""

from __future__ import annotations

import pickle
from typing import List, Tuple

import numpy as np

from msml_tpu.data.recordio import imdecode


def load_bin(path: str, image_size=(112, 112)
             ) -> Tuple[List[np.ndarray], List[bool]]:
    """-> ([orig (N,H,W,3) f32 0..255, flipped ...], issame)."""
    with open(path, "rb") as f:
        try:
            bins, issame_list = pickle.load(f)
        except UnicodeDecodeError:
            f.seek(0)
            bins, issame_list = pickle.load(f, encoding="bytes")
    n = len(issame_list) * 2
    data = np.empty((n, image_size[0], image_size[1], 3), np.float32)
    for i in range(n):
        buf = bins[i]
        if not isinstance(buf, (bytes, bytearray)):
            buf = bytes(buf)
        img = imdecode(buf)
        if img.shape[0] != image_size[0]:
            img = _resize_short(img, image_size[0])
        data[i] = img
    flipped = data[:, :, ::-1, :].copy()
    return [data, flipped], list(issame_list)


def load_bin_pil(path: str) -> Tuple[list, List[bool]]:
    """PIL variant for the occlusion-sweep CLI
    (`datasets/load_dataset.py:431-467`)."""
    from PIL import Image

    with open(path, "rb") as f:
        try:
            bins, issame_list = pickle.load(f)
        except UnicodeDecodeError:
            f.seek(0)
            bins, issame_list = pickle.load(f, encoding="bytes")
    imgs = []
    for i in range(len(issame_list) * 2):
        buf = bins[i]
        if not isinstance(buf, (bytes, bytearray)):
            buf = bytes(buf)
        imgs.append(Image.fromarray(imdecode(buf), mode="RGB"))
    return imgs, list(issame_list)


def _resize_short(img: np.ndarray, size: int) -> np.ndarray:
    """mx.image.resize_short parity (bilinear, short side -> size)."""
    import cv2
    h, w = img.shape[:2]
    if h < w:
        new_h, new_w = size, int(w * size / h)
    else:
        new_h, new_w = int(h * size / w), size
    return cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
