"""Generate train/val image lists and verification pair lists from folder
datasets (PKU-Masked-Face / AR / MegaFace style).

Parity target: `datasets/benchmarks/get_list.py:70-362` — per-identity folder
scans producing: label lists ("path label"), absolute-path lists, a train/val
split, and a verification pair file (alternating lines face1/face2, first
half positive pairs, second half negative; PKU's masked/full variants are
drawn uniformly when present — get_filelist_pku:211-318).

Usage:
  python -m msml_tpu.tools.make_lists --root /data/pku --out /data/pku/lists \
      [--val-every 10] [--pairs 400]
Folder layout: root/<identity>/<image> or PKU's root/<id>_0 (full) and
root/<id>_1 (masked).
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


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--val-every", type=int, default=10)
    p.add_argument("--pairs", type=int, default=400)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    write_lists(a.root, a.out, a.val_every, a.pairs, a.seed)
