"""Generate train/val image lists and verification pair lists from folder
datasets (PKU-Masked-Face / AR / MegaFace style).

Parity target: `datasets/benchmarks/get_list.py:70-362` — per-identity folder
scans producing: label lists ("path label"), absolute-path lists, a train/val
split, and a verification pair file (alternating lines face1/face2, first
half positive pairs, second half negative; PKU's masked/full variants are
drawn uniformly when present — get_filelist_pku:211-318).

The AR (`write_lists_ar`, get_filelist_ar:81-135) and MegaFace
(`write_lists_mega`, get_filelist_mega:138-208) styles are line-for-line
parity ports of functions that are DEAD CODE in the reference: its
`start_generate_list` dispatcher (318-358) passes 10 arguments to their
9-parameter signatures (only the PKU variant grew the extra
`img_folder_name` param), so 'AR-pre'/'MegaFace' raise TypeError there.
Tested here by calling the reference functions directly.

Usage:
  python -m msml_tpu.tools.make_lists --root /data/pku --out /data/pku/lists \
      [--val-every 10] [--pairs 400]
  python -m msml_tpu.tools.make_lists --style ar --root /data/AR \
      --img-dir /data/AR/AR-pre/input --out /data/AR/AR-pre
  python -m msml_tpu.tools.make_lists --style mega --root /data/MegaFace \
      --out /data/MegaFace
Folder layout (default style): root/<identity>/<image> or PKU's
root/<id>_0 (full) and root/<id>_1 (masked).
"""

from __future__ import annotations

import argparse
import os
import random
from typing import Dict, List


def scan_identities(root: str) -> Dict[str, List[str]]:
    """Group image paths by identity; PKU's '<id>_0'/'<id>_1' subfolders
    collapse into one identity."""
    ids: Dict[str, List[str]] = {}
    for d in sorted(os.listdir(root)):
        full = os.path.join(root, d)
        if not os.path.isdir(full):
            continue
        identity = d[:-2] if d.endswith(("_0", "_1")) else d
        ids.setdefault(identity, [])
        for f in sorted(os.listdir(full)):
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")):
                ids[identity].append(os.path.join(d, f))
    return {k: v for k, v in ids.items() if v}


def write_lists(root: str, out_dir: str, val_every: int = 10,
                n_pairs: int = 400, seed: int = 0) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    ids = scan_identities(root)
    names = sorted(ids)
    rng = random.Random(seed)

    counts = {"train": 0, "val": 0, "pos": 0, "neg": 0}
    with open(os.path.join(out_dir, "list.txt"), "w") as flist, \
            open(os.path.join(out_dir, "list_full.txt"), "w") as ffull, \
            open(os.path.join(out_dir, "train.txt"), "w") as ftrain, \
            open(os.path.join(out_dir, "val.txt"), "w") as fval:
        for label, name in enumerate(names):
            for i, rel in enumerate(ids[name]):
                line = f"{rel} {label}\n"
                flist.write(line)
                ffull.write(f"{os.path.join(root, rel)} {label}\n")
                if val_every and i % val_every == 0:
                    fval.write(line)
                    counts["val"] += 1
                else:
                    ftrain.write(line)
                    counts["train"] += 1

    # verification pairs: alternating-lines format (get_filelist_pku)
    with open(os.path.join(out_dir, "ver_pairs.txt"), "w") as fver:
        multi = [n for n in names if len(ids[n]) >= 2]
        if n_pairs and not multi:
            raise ValueError("cannot generate positive pairs: no identity "
                             "has >= 2 images under this root")
        if n_pairs and len(names) < 2:
            raise ValueError("cannot generate negative pairs: fewer than 2 "
                             "identities under this root")
        for _ in range(n_pairs // 2):
            name = rng.choice(multi)
            a, b = rng.sample(ids[name], 2)
            fver.write(a + "\n")
            fver.write(b + "\n")
            counts["pos"] += 1
        for _ in range(n_pairs - n_pairs // 2):
            n1, n2 = rng.sample(names, 2)
            fver.write(rng.choice(ids[n1]) + "\n")
            fver.write(rng.choice(ids[n2]) + "\n")
            counts["neg"] += 1

    # pairs.txt in the folder-eval format (eval/folder_eval.py). folder_eval
    # keys identities by the *actual directory names*, so PKU's '<id>_0' /
    # '<id>_1' variants are kept distinct here (unlike ver_pairs.txt above,
    # which pairs across the collapsed identity).
    raw_dirs = {d: sorted(f for f in os.listdir(os.path.join(root, d))
                          if f.lower().endswith((".jpg", ".jpeg", ".png",
                                                 ".bmp")))
                for d in sorted(os.listdir(root))
                if os.path.isdir(os.path.join(root, d))}
    raw_dirs = {d: v for d, v in raw_dirs.items() if v}
    dnames = sorted(raw_dirs)
    with open(os.path.join(out_dir, "pairs.txt"), "w") as fp:
        multi = [d for d in dnames if len(raw_dirs[d]) >= 2]
        if n_pairs and not multi:
            raise ValueError("cannot generate positive pairs: no directory "
                             "has >= 2 images under this root")
        if n_pairs and len(dnames) < 2:
            raise ValueError("cannot generate negative pairs: fewer than 2 "
                             "directories under this root")
        for _ in range(n_pairs // 2):
            d = rng.choice(multi)
            i, j = rng.sample(range(len(raw_dirs[d])), 2)
            fp.write(f"{d} {i + 1} {j + 1}\n")
        for _ in range(n_pairs - n_pairs // 2):
            d1, d2 = rng.sample(dnames, 2)
            fp.write(f"{d1} {rng.randrange(len(raw_dirs[d1])) + 1} "
                     f"{d2} {rng.randrange(len(raw_dirs[d2])) + 1}\n")

    print(f"lists written to {out_dir}: {counts}")
    return counts


def write_lists_ar(root: str, img_dir: str, out_dir: str,
                   repeats: int = 10, rng=None) -> dict:
    """AR-dataset lists (`get_filelist_ar`): a FLAT image dir whose
    filenames encode the label — int(name[2:5]), +50 unless the name
    starts with 'm' (men 1-50, women 51-100) — plus the rendered-mask
    path `root/AR-pre/mask/<name>_all_objects.png` as a third column.
    `repeats` full passes (get_list.py:106), each image independently
    assigned train (p=0.7) or val by randint(1,100).

    Reference quirks kept for line-for-line parity: train_full/val_full
    receive the same relative line as train/val (the absolute-path files
    are never actually absolute, get_list.py:122-129), the image dir is
    string-concatenated with a trailing separator, and the directory is
    iterated in raw os.listdir order. rng=None uses the global `random`
    module exactly like the reference (seed it for reproducibility)."""
    rng = rng or random
    os.makedirs(out_dir, exist_ok=True)
    dir_pfx = os.path.join(img_dir, "")  # force trailing separator
    counts = {"train": 0, "val": 0, "labels": 0}
    with open(os.path.join(out_dir, "relative.list"), "w") as list_file, \
            open(os.path.join(out_dir, "train.list"), "w") as ftrain, \
            open(os.path.join(out_dir, "val.list"), "w") as fval, \
            open(os.path.join(out_dir, "train_full.list"), "w") as ftrainf, \
            open(os.path.join(out_dir, "val_full.list"), "w") as fvalf:
        for _ in range(repeats):
            for img in os.listdir(img_dir):
                msk = img[:-4] + "_all_objects.png"
                label = int(img[2:5])
                label += 0 if img[0] == "m" else 50
                num = rng.randint(1, 100)
                line = (f"{dir_pfx}{img} {label} "
                        f"{root}/AR-pre/mask/{msk}\n")
                list_file.write(line)
                if num <= 70:
                    ftrain.write(line)
                    ftrainf.write(line)
                    counts["train"] += 1
                else:
                    fval.write(line)
                    fvalf.write(line)
                    counts["val"] += 1
                counts["labels"] += 1
    print(f"AR lists written to {out_dir}: {counts}")
    return counts


def write_lists_mega(root: str, out_dir: str,
                     distractor_cap: int = 1000000) -> dict:
    """MegaFace lists (`get_filelist_mega`): distractors from
    `root/megaface_images` (os.walk bottom-up, label 9999, capped at 1M,
    .json sidecars skipped) into distractor.list; probes from
    `root/facescrub_images/<identity>/` as ALL ordered same-identity
    image pairs ("pathA label pathB label"), labels = identity index in
    os.listdir order, into probe.list. relative.list gets both streams
    (reference quirk: nothing written is actually relative)."""
    os.makedirs(out_dir, exist_ok=True)
    distractor_path = os.path.join(root, "megaface_images")
    probe_path = os.path.join(root, "facescrub_images")
    counts = {"distractor": 0, "probe": 0, "identities": 0}
    with open(os.path.join(out_dir, "relative.list"), "w") as list_file, \
            open(os.path.join(out_dir, "distractor.list"), "w") as fdis, \
            open(os.path.join(out_dir, "probe.list"), "w") as fprobe:
        for walk_root, _dirs, files in os.walk(distractor_path,
                                               topdown=False):
            for img in files:
                if ".json" in img:
                    continue
                if counts["distractor"] >= distractor_cap:
                    continue
                line = os.path.join(walk_root, img) + " 9999\n"
                list_file.write(line)
                fdis.write(line)
                counts["distractor"] += 1
        for identity in os.listdir(probe_path):
            cur = os.path.join(probe_path, identity)
            label = counts["identities"]
            for img1 in os.listdir(cur):
                for img2 in os.listdir(cur):
                    if img1 == img2:
                        continue
                    line = (f"{os.path.join(cur, img1)} {label} "
                            f"{os.path.join(cur, img2)} {label}\n")
                    list_file.write(line)
                    fprobe.write(line)
                    counts["probe"] += 1
            counts["identities"] += 1
    print(f"MegaFace lists written to {out_dir}: {counts}")
    return counts


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--style", default="pku", choices=["pku", "ar", "mega"])
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--img-dir", default="",
                   help="ar style: the flat image directory")
    p.add_argument("--val-every", type=int, default=10)
    p.add_argument("--pairs", type=int, default=400)
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    if a.style == "ar":
        write_lists_ar(a.root, a.img_dir or os.path.join(
            a.root, "AR-pre", "input"), a.out, a.repeats,
            random.Random(a.seed))
    elif a.style == "mega":
        write_lists_mega(a.root, a.out)
    else:
        write_lists(a.root, a.out, a.val_every, a.pairs, a.seed)
