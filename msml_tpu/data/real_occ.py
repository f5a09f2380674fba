"""RealOcc occluder-paste augmentation (CVPRW'22).

Parity target: `eval/preprocess/RealOcc/image_infer.py:38-155` + its utils
(`eval/preprocess/RealOcc/utils/{utils,paste_over,colour_transfer,
random_shape_generator}.py`): paste a real-object occluder (hand / COCO crop
/ DTD random texture shape) onto the face with

  * occluder augmentor (utils.py:84-145): rescale the occluder bbox to
    sqrt(src_area / occ_area * U(0.5, 1)), gaussian blur, JPEG compression
    (quality 70-100, p=0.25), affine (scale 0.8-1.2, rotate +-15, shear +-8,
    fit_output, p=0.7), brightness/contrast jitter (limit 0.1, by-mean,
    p=0.5)
  * rotation of the occluder toward a random anchor point in the face box
    (angle3pt logic, image_infer.py:94-103)
  * resize-with-padding by 0.75 (image_infer.py:100-102,126-135)
  * alpha-blended paste (paste_over.py:38-63: 3x3-eroded + 5x5-gaussian-
    blurred alpha; random alpha U(0.4,0.7) w.p. 0.3 for random-shape
    occluders) producing the binary occlusion map
  * src augmentor (utils.py:43-73): gaussian blur, horizontal flip of image
    + masks (p=0.5), brightness/contrast jitter (limit 0.2, by-max, p=0.5)
  * optional sliced-optimal-transport colour transfer of the occluder toward
    the face colour distribution (main.py:69-72,124-161 +
    colour_transfer.py:32-97) — off by default, matching image_infer.py:18
    (import commented out; only the offline main.py path enables it via
    cfg.AUGMENTATION.SOT)

Differences: occluders come from any directory of RGBA images or paired
(img, mask) directories instead of the reference's hard-coded 11k-hands /
COCO / DTD paths; the albumentations pipelines are re-implemented in
numpy/cv2 with the same sampled-parameter ranges. The returned contract
matches the other transforms: (occluded PIL, mask PIL with 255 = clean).
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image


# ---------------------------------------------------------------------------
# colour transfer (colour_transfer.py + main.py:124-161)

def _bilateral_filter(image: np.ndarray, sigma_space: float,
                      sigma_intensity: float) -> np.ndarray:
    """Vectorized bilateral filter (colour_transfer.py:9-29), numpy instead
    of cupy. kernel_size = 2*sigma_space + 1."""
    half = int(2 * sigma_space + 1) // 2
    result = np.zeros(image.shape, np.float64)
    weight = np.zeros(image.shape, np.float64)
    for x in range(-half, half + 1):
        gx = math.exp(-0.5 * x * x / sigma_space ** 2)
        shifted_x = np.roll(image, x, axis=1)
        for y in range(-half, half + 1):
            g_space = gx * math.exp(-0.5 * y * y / sigma_space ** 2)
            shifted = np.roll(shifted_x, y, axis=0)
            diff = image - shifted
            g_int = np.exp(-0.5 * diff * diff / sigma_intensity ** 2)
            w = g_space * g_int
            result += w * shifted
            weight += w
    return result / weight


def color_transfer_sot(src: np.ndarray, trg: np.ndarray, steps: int = 15,
                       batch_size: int = 5, reg_sigmaXY: float = 16.0,
                       reg_sigmaV: float = 30.0,
                       rng: Optional[np.random.RandomState] = None
                       ) -> np.ndarray:
    """Sliced-optimal-transport colour transfer
    (colour_transfer.py:32-97, DeepFaceLab-derived public algorithm):
    iteratively advect src colours toward trg along random 3-d directions,
    then bilateral-filter the difference for spatial regularity.
    src/trg: float (h, w, c) in any range; caller clips the result."""
    r = rng if rng is not None else np.random
    src = np.asarray(src, np.float64)
    trg = np.asarray(trg, np.float64)
    if src.ndim != 3:
        raise ValueError("src shape must have rank 3 (h,w,c)")
    if src.shape != trg.shape:
        raise ValueError("src and trg shapes must be equal")
    h, w, c = src.shape
    new_src = src.copy()
    for _ in range(steps):
        advect = np.zeros((h * w, c), np.float64)
        for _ in range(batch_size):
            direction = r.normal(size=c)
            direction /= np.linalg.norm(direction)
            proj_source = (new_src * direction).sum(-1).reshape(h * w)
            proj_target = (trg * direction).sum(-1).reshape(h * w)
            id_source = np.argsort(proj_source)
            id_target = np.argsort(proj_target)
            a = proj_target[id_target] - proj_source[id_source]
            advect[id_source] += a[:, None] * direction[None, :]
        new_src += advect.reshape(h, w, c) / batch_size
    if reg_sigmaXY != 0.0:
        # reference call order: bilateral_filter(diff, reg_sigmaV, reg_sigmaXY)
        # i.e. sigma_space=reg_sigmaV, sigma_intensity=reg_sigmaXY
        # (colour_transfer.py:84-88)
        diff = (new_src - src).astype(np.float32)
        filt = np.stack([_bilateral_filter(diff[:, :, i], reg_sigmaV,
                                           reg_sigmaXY) for i in range(c)],
                        axis=2)
        new_src = src + filt
    return new_src


def colour_transfer_occluder(src_img: np.ndarray, src_mask: np.ndarray,
                             occluder_img: np.ndarray, src_rect,
                             rng: Optional[np.random.RandomState] = None,
                             **sot_kw) -> np.ndarray:
    """main.py:124-161: prepare the face crop as the colour target (black-
    imbalance compensation + bright-pixel clamp), then SOT-transfer the
    occluder colours toward it. Returns the recoloured occluder (uint8)."""
    import cv2
    r = rng if rng is not None else np.random
    temp_src = cv2.bitwise_or(src_img, src_img, mask=src_mask)
    x, y, rw, rh = src_rect
    cropped = temp_src[y:y + rh, x:x + rw]
    cropped_mask = src_mask[y:y + rh, x:x + rw]
    size = (occluder_img.shape[1], occluder_img.shape[0])
    cropped = cv2.resize(cropped, size, interpolation=cv2.INTER_LANCZOS4)
    cropped_mask = cv2.resize(cropped_mask, size,
                              interpolation=cv2.INTER_LANCZOS4)

    stats = []
    for ch in range(3):
        vals = cropped[:, :, ch][cropped[:, :, ch] != 0]
        stats.append((float(np.mean(vals)) if vals.size else 0.0,
                      float(np.std(vals)) if vals.size else 0.0))
    (rm, rs), (gm, gs), (bm, bs) = stats

    # black-imbalance ratio between src crop and occluder (main.py:146-156)
    denom = np.sum(occluder_img == (0, 0, 0))
    if denom > 0:
        black_ratio = round(
            float(np.sum(cropped < (rm / 2, gm / 2, bm / 2))) / denom - 1, 2)
        black_ratio = min(black_ratio, 1.0)
        if black_ratio > 0:
            zeros = cropped_mask == 0
            cropped_mask[zeros] = r.binomial(
                1, 1 - black_ratio, size=int(zeros.sum()))
            cropped[~cropped_mask.astype(bool)] = [rm, gm, bm]
    # clamp overly bright pixels to mean + 1 std (main.py:157-161)
    bright = ((cropped[:, :, 0] > rm + rs) | (cropped[:, :, 1] > gm + gs)
              | (cropped[:, :, 2] > bm + bs))
    cropped[bright] = [min(255, rm + rs), min(255, gm + gs),
                       min(255, bm + bs)]

    out = color_transfer_sot(occluder_img / 255.0, cropped / 255.0, rng=r,
                             **sot_kw)
    return (np.clip(out, 0.0, 1.0) * 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# augmentors (albumentations-equivalent, utils.py:43-145)

def _gauss_blur(r, img: np.ndarray) -> np.ndarray:
    """A.AdvancedBlur() equivalent: random odd kernel 3-7, sigma U(0.2, 1)."""
    import cv2
    if r.rand() >= 0.5:
        return img
    k = int(r.choice([3, 5, 7]))
    sigma = r.uniform(0.2, 1.0)
    return cv2.GaussianBlur(img, (k, k), sigma)


def _brightness_contrast(r, img: np.ndarray, limit: float,
                         by_max: bool) -> np.ndarray:
    """A.RandomBrightnessContrast: out = img*(1+a) + b*(255 or mean)."""
    if r.rand() >= 0.5:
        return img
    alpha = 1.0 + r.uniform(-limit, limit)
    beta = r.uniform(-limit, limit)
    base = 255.0 if by_max else float(img.mean())
    out = img.astype(np.float32) * alpha + beta * base
    return np.clip(out, 0, 255).astype(np.uint8)


def _jpeg_compress(r, img: np.ndarray) -> np.ndarray:
    """A.OneOf([A.ImageCompression(quality_lower=70, p=0.5)], p=0.5)."""
    import cv2
    if r.rand() >= 0.25:
        return img
    q = int(r.uniform(70, 100))
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, q])
    if not ok:
        return img
    dec = cv2.imdecode(enc, cv2.IMREAD_UNCHANGED)
    return dec if dec.shape == img.shape else img


def _affine_fit(r, img: np.ndarray, mask: np.ndarray):
    """A.Affine(scale=(0.8,1.2), rotate=(-15,15), shear=(-8,8),
    fit_output=True, p=0.7): one sampled transform applied to both."""
    import cv2
    if r.rand() >= 0.7:
        return img, mask
    scale = r.uniform(0.8, 1.2)
    rot = math.radians(r.uniform(-15, 15))
    shear_x = math.tan(math.radians(r.uniform(-8, 8)))
    h, w = img.shape[:2]
    cx, cy = w / 2.0, h / 2.0
    # M = T(c) @ Shear @ Rot*Scale @ T(-c)
    a = scale * math.cos(rot)
    b = scale * math.sin(rot)
    lin = np.array([[a + shear_x * b, -b + shear_x * a],
                    [b, a]])
    # fit_output: transform the corners, shift so everything is visible
    corners = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float64)
    tc = (corners - [cx, cy]) @ lin.T
    mn, mx = tc.min(0), tc.max(0)
    nw, nh = int(math.ceil(mx[0] - mn[0])), int(math.ceil(mx[1] - mn[1]))
    M = np.zeros((2, 3))
    M[:2, :2] = lin
    M[:, 2] = -lin @ [cx, cy] - mn
    img = cv2.warpAffine(img, M, (nw, nh))
    mask = cv2.warpAffine(mask, M, (nw, nh))
    return img, mask


def _resize_by_factor(img: np.ndarray, factor: float) -> np.ndarray:
    """utils.py:117-124 (LANCZOS4 both ways, as shipped)."""
    import cv2
    size = tuple(np.round(np.array(
        [img.shape[1], img.shape[0]]) * factor).astype(int))
    size = (max(size[0], 1), max(size[1], 1))
    return cv2.resize(img, size, interpolation=cv2.INTER_LANCZOS4)


def augment_occluder(r, occ_img: np.ndarray, occ_mask: np.ndarray, src_rect):
    """utils.py:126-145: rescale to the src box, blur/compress/affine/jitter.
    Returns (rgba occluder, mask)."""
    import cv2
    occ_rect = cv2.boundingRect(occ_mask)
    try:
        scale = math.sqrt((src_rect[2] * src_rect[3])
                          / (occ_rect[2] * occ_rect[3]) * r.uniform(0.5, 1))
    except ZeroDivisionError:
        scale = 1.0
    occ_img = _resize_by_factor(occ_img, scale)
    occ_mask = _resize_by_factor(occ_mask, scale)
    occ_img = _gauss_blur(r, occ_img)
    occ_img = _jpeg_compress(r, occ_img)
    occ_img, occ_mask = _affine_fit(r, occ_img, occ_mask)
    occ_img = _brightness_contrast(r, occ_img, 0.1, by_max=False)
    rgba = cv2.cvtColor(occ_img, cv2.COLOR_RGB2RGBA)
    rgba[:, :, 3] = occ_mask
    return rgba, occ_mask


def _augment_src(r, img: np.ndarray, occlusion: np.ndarray):
    """utils.py:43-73 src augmentor: blur + hflip(img, masks) + jitter."""
    img = _gauss_blur(r, img)
    if r.rand() < 0.5:
        img = img[:, ::-1].copy()
        occlusion = occlusion[:, ::-1].copy()
    img = _brightness_contrast(r, img, 0.2, by_max=True)
    return img, occlusion


# ---------------------------------------------------------------------------
# random-shape occluder (DTD 'rand' mode)

def _bezier_closed_curve(r, n_points: int, scale: float):
    """random_shape_generator.py: smooth closed bezier through random points.
    Same construction (ccw sort, per-segment cubic bezier with angle-blended
    control points), seeded rng instead of global numpy."""
    pts = r.rand(n_points, 2) * 0.8 * scale
    d = pts - pts.mean(0)
    pts = pts[np.argsort(np.arctan2(d[:, 0], d[:, 1]))]
    rad, edgy = r.rand(), r.rand()
    p = np.arctan(edgy) / np.pi + 0.5
    a = np.vstack([pts, pts[:1]])
    dd = np.diff(a, axis=0)
    ang = np.arctan2(dd[:, 1], dd[:, 0])
    ang = np.where(ang >= 0, ang, ang + 2 * np.pi)
    ang2 = np.roll(ang, 1)
    ang = p * ang + (1 - p) * ang2 + (np.abs(ang2 - ang) > np.pi) * np.pi
    ang = np.append(ang, [ang[0]])
    curve = []
    t = np.linspace(0, 1, 100)[:, None]
    for i in range(len(a) - 1):
        p1, p2 = a[i], a[i + 1]
        rr = rad * np.linalg.norm(p2 - p1)
        c1 = p1 + rr * np.array([np.cos(ang[i]), np.sin(ang[i])])
        c2 = p2 + rr * np.array([np.cos(ang[i + 1] + np.pi),
                                 np.sin(ang[i + 1] + np.pi)])
        seg = ((1 - t) ** 3 * p1 + 3 * (1 - t) ** 2 * t * c1
               + 3 * (1 - t) * t ** 2 * c2 + t ** 3 * p2)
        curve.append(seg)
    return np.concatenate(curve)


class RandomShapeOccluder:
    """RandomOccluderNmask (utils.py:181-233): a random bezier blob filled
    with a texture image (the DTD analogue: any directory of textures)."""

    def __init__(self, texture_dir: str, mask_shape: int = 512):
        import cv2
        self.mask_shape = mask_shape
        self.textures: List[np.ndarray] = []
        for root, _, files in os.walk(texture_dir):
            for n in sorted(files):
                if not n.lower().endswith((".jpg", ".jpeg", ".png")):
                    continue
                img = cv2.imread(os.path.join(root, n))
                if img is None:
                    continue
                img = cv2.resize(img, (mask_shape, mask_shape))
                self.textures.append(img[:, :, ::-1].copy())  # BGR -> RGB
        if not self.textures:
            raise FileNotFoundError(f"no textures under {texture_dir}")

    def get_img_mask(self, rng=None):
        import cv2
        r = rng if rng is not None else np.random
        n = r.randint(3, 8)
        curve = _bezier_closed_curve(r, n, self.mask_shape)
        keep = r.randint(7, 13)
        curve = curve[::max(len(curve) // keep, 1)]
        mask = np.zeros((self.mask_shape, self.mask_shape), np.uint8)
        cv2.fillPoly(mask, [np.round(curve).astype(np.int32)], 255)
        tex = self.textures[r.randint(0, len(self.textures))]
        img = cv2.bitwise_and(tex, tex, mask=mask)
        x, y, w, h = cv2.boundingRect(mask)
        if w == 0 or h == 0:
            return tex.copy(), np.full(tex.shape[:2], 255, np.uint8)
        return img[y:y + h, x:x + w], mask[y:y + h, x:x + w]


# ---------------------------------------------------------------------------
# the transform

class RealOcc:
    """Paste-a-real-occluder transform (image_infer.py:38-155).

    occluder_path: directory of RGBA occluder images (alpha = mask) or RGB
    images with a parallel mask_path directory. If random_shape_textures is
    given instead, occluders are random bezier blobs cut from those textures
    (the reference's 'rand'/DTD mode), which also enables the random-alpha
    attenuation in paste_over.
    """

    def __init__(self, occluder_path: str = "",
                 mask_path: Optional[str] = None, split: str = "train",
                 split_ratio: float = 0.8,
                 random_shape_textures: str = "",
                 colour_transfer: bool = False):
        self.colour_transfer = colour_transfer
        self.random_occlusion = bool(random_shape_textures)
        self.shape_gen: Optional[RandomShapeOccluder] = None
        self.items: List[Tuple[np.ndarray, np.ndarray]] = []
        if random_shape_textures:
            self.shape_gen = RandomShapeOccluder(random_shape_textures)
            return
        names = sorted(os.listdir(occluder_path))
        if not names:
            raise FileNotFoundError(f"no occluders in {occluder_path}")
        middle = int(len(names) * split_ratio)
        names = names[:middle] if split == "train" else names[middle:]
        if not names:
            names = sorted(os.listdir(occluder_path))
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
        if self.shape_gen is not None:
            occ_img, occ_mask = self.shape_gen.get_img_mask(r)
        else:
            occ_img, occ_mask = self.items[r.randint(0, len(self.items))]
        occ_img = cv2.resize(occ_img, (w, h))
        occ_mask = cv2.resize(occ_mask, (w, h),
                              interpolation=cv2.INTER_NEAREST)
        src_rect = (0, 0, w, h)  # full-face src mask (image_infer.py:86-88)

        if self.colour_transfer:
            # main.py:69-72 path (off in image_infer)
            try:
                occ_img = colour_transfer_occluder(
                    src, np.ones((h, w), np.uint8), occ_img, src_rect, rng=r)
            except Exception:
                pass

        occ_rgba, occ_mask = augment_occluder(r, occ_img, occ_mask, src_rect)

        # anchor + rotation toward it (image_infer.py:92-99)
        coord = np.array([r.uniform(0, w), r.uniform(0, h)])
        center = (w / 2.0, h / 2.0)
        rotation = _angle3pt((center[0], coord[1]), center, coord)
        if coord[1] > center[1]:
            rotation += 180
        occ_rgba = _rotate_bound(occ_rgba, rotation)
        occ_mask = _rotate_bound(occ_mask, rotation)  # cv2 keeps 2D masks 2D
        occ_rgba = _resize_with_padding(occ_rgba, 0.75)
        occ_mask = _resize_with_padding(occ_mask, 0.75)

        out, occlusion = _paste_over(occ_rgba, occ_mask, src, coord, r,
                                     self.random_occlusion)
        out, occlusion = _augment_src(r, out, occlusion)

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


def _paste_over(occ_rgba: np.ndarray, occ_mask: np.ndarray, src: np.ndarray,
                coord: np.ndarray, rng=None, random_occlusion: bool = False):
    """paste_over.py parity: center the occluder at coord, clip to the face,
    alpha-blend with a 3x3-eroded + 5x5-gaussian-smoothed alpha; the binary
    occlusion map comes from the un-smoothed mask."""
    import cv2
    r = rng if rng is not None else np.random
    h, w = src.shape[:2]
    oh, ow = occ_rgba.shape[:2]
    cx, cy = int(round(coord[0])), int(round(coord[1]))
    x0, y0 = cx - ow // 2, cy - oh // 2
    sx0, sy0 = max(x0, 0), max(y0, 0)
    sx1, sy1 = min(x0 + ow, w), min(y0 + oh, h)
    occlusion = np.zeros((h, w), np.uint8)
    if sx1 <= sx0 or sy1 <= sy0:
        return src, occlusion
    ox0, oy0 = sx0 - x0, sy0 - y0
    region = occ_rgba[oy0:oy0 + (sy1 - sy0), ox0:ox0 + (sx1 - sx0)]
    rmask = occ_mask[oy0:oy0 + (sy1 - sy0), ox0:ox0 + (sx1 - sx0)]

    alpha = region[..., 3:].astype(np.float32) / 255.0
    if random_occlusion and r.rand() < 0.3:
        alpha = alpha * r.uniform(0.4, 0.7)
    kernel = np.ones((3, 3), np.uint8)
    alpha = cv2.erode(alpha, kernel, iterations=1)
    alpha = cv2.GaussianBlur(alpha, (5, 5), 0)
    alpha = alpha[..., None]

    out = src.copy()
    crop = out[sy0:sy1, sx0:sx1].astype(np.float32)
    blended = alpha * region[..., :3].astype(np.float32) + (1 - alpha) * crop
    out[sy0:sy1, sx0:sx1] = np.clip(blended, 0, 255).astype(np.uint8)
    occlusion[sy0:sy1, sx0:sx1][rmask > 127] = 255
    return out, occlusion
