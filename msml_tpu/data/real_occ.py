"""RealOcc occluder-paste augmentation (CVPRW'22).

Parity target: `eval/preprocess/RealOcc/image_infer.py:38-155` + its utils
(~650 LoC of imgaug-style helpers): paste a real-object occluder (hand /
COCO crop / DTD random texture) onto the face with
  * rotation of the occluder toward a random anchor point in the face box
    (angle3pt logic, image_infer.py:94-99)
  * resize-with-padding by 0.75 (image_infer.py:100-102,126-135)
  * masked paste (paste_over) producing the binary occlusion map
  * post augmentation: brightness / color jitter on the composited image

Differences: occluders come from any directory of RGBA images or paired
(img, mask) directories instead of the reference's hard-coded 11k-hands /
COCO / DTD paths; the imgaug/albumentations pipelines are replaced by
equivalent numpy jitter. The returned contract matches the other transforms:
(occluded PIL, mask PIL with 255 = clean).
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image


class RealOcc:
    def __init__(self, occluder_path: str, mask_path: Optional[str] = None,
                 split: str = "train", split_ratio: float = 0.8):
        names = sorted(os.listdir(occluder_path))
        if not names:
            raise FileNotFoundError(f"no occluders in {occluder_path}")
        middle = int(len(names) * split_ratio)
        names = names[:middle] if split == "train" else names[middle:]
        if not names:
            names = sorted(os.listdir(occluder_path))
        self.items: List[Tuple[np.ndarray, np.ndarray]] = []
        for n in names:
            img = Image.open(os.path.join(occluder_path, n)).convert("RGBA")
            arr = np.asarray(img)
            if mask_path is not None and os.path.exists(
                    os.path.join(mask_path, n)):
                m = np.asarray(Image.open(os.path.join(mask_path, n))
                               .convert("L"))
            else:
                m = arr[:, :, 3]
            self.items.append((arr[:, :, :3], (m > 10).astype(np.uint8) * 255))

    def __call__(self, img: Image.Image, rng=None):
        r = rng if rng is not None else np.random
        import cv2

        w, h = img.size
        src = np.asarray(img).copy()
        occ_img, occ_mask = self.items[r.randint(0, len(self.items))]
        occ_img = cv2.resize(occ_img, (w, h))
        occ_mask = cv2.resize(occ_mask, (w, h),
                              interpolation=cv2.INTER_NEAREST)

        # anchor + rotation toward it (image_infer.py:92-99)
        coord = np.array([r.uniform(0, w), r.uniform(0, h)])
        center = (w / 2.0, h / 2.0)
        rotation = _angle3pt((center[0], coord[1]), center, coord)
        if coord[1] > center[1]:
            rotation += 180
        occ_img = _rotate_bound(occ_img, rotation)
        occ_mask = _rotate_bound(occ_mask, rotation)  # cv2 keeps 2D masks 2D
        occ_img = _resize_with_padding(occ_img, 0.75)
        occ_mask = _resize_with_padding(occ_mask, 0.75)

        out, occlusion = _paste_over(occ_img, occ_mask, src, coord)

        # post jitter (brightness/color, the get_src_augmentor analogue)
        out = out.astype(np.float32)
        out *= r.uniform(0.8, 1.2)
        out += r.uniform(-10, 10, size=(1, 1, 3))
        out = np.clip(out, 0, 255).astype(np.uint8)

        mask = 255 - occlusion  # 0: occluded, 255: clean
        return Image.fromarray(out), Image.fromarray(mask)


def _angle3pt(a, b, c) -> float:
    ang = math.degrees(math.atan2(c[1] - b[1], c[0] - b[0])
                       - math.atan2(a[1] - b[1], a[0] - b[0]))
    return ang + 360 if ang < 0 else ang


def _rotate_bound(arr: np.ndarray, angle: float) -> np.ndarray:
    """imutils.rotate_bound parity: rotate without cropping."""
    import cv2
    h, w = arr.shape[:2]
    cx, cy = w / 2.0, h / 2.0
    M = cv2.getRotationMatrix2D((cx, cy), -angle, 1.0)
    cos, sin = abs(M[0, 0]), abs(M[0, 1])
    nw = int(h * sin + w * cos)
    nh = int(h * cos + w * sin)
    M[0, 2] += nw / 2.0 - cx
    M[1, 2] += nh / 2.0 - cy
    return cv2.warpAffine(arr, M, (nw, nh))


def _resize_with_padding(arr: np.ndarray, ratio: float) -> np.ndarray:
    """image_infer.py:126-135."""
    import cv2
    h, w = arr.shape[:2]
    wr, hr = max(int(w * ratio), 1), max(int(h * ratio), 1)
    small = cv2.resize(arr, (wr, hr))
    p = (w - wr) // 2
    padded = cv2.copyMakeBorder(small, p, p, p, p, cv2.BORDER_CONSTANT,
                                value=0)
    return cv2.resize(padded, (w, h))


def _paste_over(occ_img: np.ndarray, occ_mask: np.ndarray, src: np.ndarray,
                coord: np.ndarray):
    """paste_over parity: center the occluder at coord, clip to the face."""
    h, w = src.shape[:2]
    oh, ow = occ_img.shape[:2]
    cx, cy = int(coord[0]), int(coord[1])
    x0, y0 = cx - ow // 2, cy - oh // 2
    sx0, sy0 = max(x0, 0), max(y0, 0)
    sx1, sy1 = min(x0 + ow, w), min(y0 + oh, h)
    occlusion = np.zeros((h, w), np.uint8)
    if sx1 <= sx0 or sy1 <= sy0:
        return src, occlusion
    ox0, oy0 = sx0 - x0, sy0 - y0
    region = occ_img[oy0:oy0 + (sy1 - sy0), ox0:ox0 + (sx1 - sx0)]
    rmask = occ_mask[oy0:oy0 + (sy1 - sy0), ox0:ox0 + (sx1 - sx0)] > 127
    out = src.copy()
    crop = out[sy0:sy1, sx0:sx1]
    crop[rmask] = region[rmask]
    out[sy0:sy1, sx0:sx1] = crop
    occlusion[sy0:sy1, sx0:sx1][rmask] = 255
    return out, occlusion
