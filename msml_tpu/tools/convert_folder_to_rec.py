"""ImageFolder -> IndexedRecordIO converter.

Parity target: `datasets/3d_tools/cvt_casia_webface.py:25-70`: record 0 holds
an extended header (num_images+1, num_classes); records 1..N hold jpeg-packed
(label, image). Readable by data/face_dataset.FaceByRandOccMask and by the
reference's own MXFaceDataset.

Usage:
  python -m msml_tpu.tools.convert_folder_to_rec --src /data/casia_faces \
      --out /data/casia_rec [--quality 97]
Folder layout: src/<class_name>/<image>.jpg, classes sorted alphabetically.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from msml_tpu.data.recordio import IRHeader, IndexedRecordIO, pack


def convert(src: str, out: str, target: str = "train", quality: int = 97):
    import cv2

    classes = sorted(d for d in os.listdir(src)
                     if os.path.isdir(os.path.join(src, d)))
    samples = []
    for ci, cname in enumerate(classes):
        cdir = os.path.join(src, cname)
        for f in sorted(os.listdir(cdir)):
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")):
                samples.append((os.path.join(cdir, f), ci))

    os.makedirs(out, exist_ok=True)
    rec = IndexedRecordIO(os.path.join(out, f"{target}.idx"),
                          os.path.join(out, f"{target}.rec"), "w")
    # record 0: extended header (num_images+1, num_classes)
    # (cvt_casia_webface.py:31-37)
    ok, png = cv2.imencode(".png", np.zeros((32, 32, 3), np.uint8))
    rec.write_idx(0, pack(IRHeader(2, [len(samples) + 1, len(classes)], 1, 0),
                          png.tobytes()))
    for i, (path, label) in enumerate(samples):
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"unreadable image {path}")
        ok, jpg = cv2.imencode(".jpg", img,
                               [cv2.IMWRITE_JPEG_QUALITY, quality])
        rec.write_idx(1 + i, pack(IRHeader(0, float(label), 0, 0),
                                  jpg.tobytes()))
        if i % 5000 == 0:
            print(f"{i}/{len(samples)}")
    rec.close()
    print(f"wrote {len(samples)} samples / {len(classes)} classes to {out}")
    return len(samples), len(classes)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--target", default="train")
    p.add_argument("--quality", type=int, default=97)
    a = p.parse_args()
    convert(a.src, a.out, a.target, a.quality)
