"""Folder-eval (MFR2/PKU) protocol parity: reference qeval_folder chain vs
ours — pair loading, input transform, and the metric chain, with the
reference's own code executed in place.

Three pinned stages (`/root/reference/eval/qeval_folder.py`):
  1. pair loading: `EvaluatorFolder._prepare_img_pairs` (39-75; 1-indexed
     images, 3-word same / 4-word diff lines) vs
     `eval/folder_eval.load_folder_pairs` — images bit-equal, labels equal.
  2. input transform: `_load_one_input` (120-137: Resize(out_size) ->
     CenterCrop(112) -> ToTensor) + the in-place [-1,1] norm (174-182) vs
     `eval/folder_eval.tensorize_folder_img` — on both 112x112 and
     odd-sized images, both flips.
  3. metric chain: `start_verification` (242-306: cosine cdist, roc_curve
     acc at tpr ~= 1-fpr, O(N^2) TAR@FAR loops) executed in place on
     synthetic features vs `eval/occ_sweep.roc_acc_and_tarfar`.

The extraction loop itself is NOT pinned: the reference's inference block
is indented inside its flip-fill loop and returns on the first iteration
(qeval_folder.py:165-239), so its flip-sum adds f(constant -1 image) to
every feature but the first — a bug we deliberately do not replicate
(documented in eval/folder_eval.py).

Usage: python -m msml_tpu.tools.parity_folder
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys


def import_ref_qeval_folder(ref_repo: str):
    from msml_tpu.tools.parity_occ import (install_stubs, patch_cuda_noop,
                                           restore_numpy_aliases)

    install_stubs(ref_repo)
    if ref_repo not in sys.path:
        sys.path.insert(0, ref_repo)
    patch_cuda_noop()
    restore_numpy_aliases()
    spec = importlib.util.spec_from_file_location(
        "ref_qeval_folder",
        os.path.join(ref_repo, "eval", "qeval_folder.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_synthetic_folder(root: str, seed: int = 0, n_ids: int = 4,
                          per_id: int = 3):
    """folder/<identity>/NNNN.png with mixed sizes + pairs.txt with both
    line formats."""
    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(seed)
    sizes = [(112, 112), (100, 130), (160, 144)]
    ids = [f"id{k}" for k in range(n_ids)]
    for k, ident in enumerate(ids):
        d = os.path.join(root, "data", ident)
        os.makedirs(d, exist_ok=True)
        for j in range(per_id):
            w, h = sizes[(k + j) % len(sizes)]
            arr = rng.randint(0, 255, (h, w, 3), np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{j + 1:04d}.png"))
    lines = []
    for k in range(n_ids):          # same pairs: "<id> <i> <j>"
        lines.append(f"{ids[k]} 1 2")
    for k in range(n_ids - 1):      # diff pairs: "<id1> <i> <id2> <j>"
        lines.append(f"{ids[k]} 1 {ids[k + 1]} 3")
    pair_txt = os.path.join(root, "pairs.txt")
    with open(pair_txt, "w") as f:
        f.write("\n".join(lines) + "\n")
    return os.path.join(root, "data"), pair_txt


def main(args):
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from msml_tpu.eval.folder_eval import (load_folder_pairs,
                                           tensorize_folder_img)
    from msml_tpu.eval.occ_sweep import roc_acc_and_tarfar

    qf = import_ref_qeval_folder(args.ref_repo)

    os.makedirs(args.workdir, exist_ok=True)
    folder, pair_txt = make_synthetic_folder(args.workdir, seed=args.seed)

    result = {}

    # ---- 1. pair loading
    inst = qf.EvaluatorFolder.__new__(qf.EvaluatorFolder)
    inst.img_dict = {}
    inst.img_size = (112, 112)
    ref_pairs, ref_labels = inst._prepare_img_pairs(folder, pair_txt)
    our_pairs, our_labels = load_folder_pairs(folder, pair_txt)
    pairs_ok = (len(ref_pairs) == len(our_pairs)
                and np.array_equal(np.asarray(ref_labels),
                                   np.asarray(our_labels))
                and all(np.array_equal(np.asarray(r), np.asarray(o))
                        for r, o in zip(ref_pairs, our_pairs)))
    result["pair_loading"] = {
        "n_imgs": len(ref_pairs), "labels_equal": bool(
            np.array_equal(np.asarray(ref_labels), np.asarray(our_labels))),
        "pass": bool(pairs_ok)}

    # ---- 2. input transform (112 and odd sizes, both flips)
    from types import SimpleNamespace
    inst.cfg = SimpleNamespace(out_size=(112, 112), is_gray=False,
                               use_norm=True, dim_feature=512)
    tf_max = 0.0
    for img in ref_pairs[:6]:
        for flip in (False, True):
            t = inst._load_one_input(img, 0, flip=flip)  # (C,H,W) [0,1]
            ref_a = np.asarray(t).transpose(1, 2, 0)
            ref_a = (ref_a - 0.5) / 0.5                  # start_extract norm
            our_a = tensorize_folder_img(img, (112, 112), True, False, flip)
            tf_max = max(tf_max, float(np.max(np.abs(ref_a - our_a))))
    result["input_transform"] = {"max_delta": tf_max,
                                 "pass": bool(tf_max == 0.0)}

    # ---- 3. metric chain on synthetic features
    rng = np.random.RandomState(args.seed + 7)
    n_pairs = args.pairs
    feats = rng.normal(0, 1, (2 * n_pairs, 512))
    # balanced 0=same/1=diff: start_verification hardcodes
    # neg_cnt = pos_cnt = n_pairs//2 (qeval_folder.py:270-271) and indexes
    # neg_dist with it — unbalanced pair lists crash the reference
    labels = rng.permutation(
        np.r_[np.zeros(n_pairs // 2), np.ones(n_pairs - n_pairs // 2)])
    inst.features = feats.copy()
    inst.ground_truth_label = labels.copy()
    ref_acc, ref_tarfar = inst.start_verification()
    our_acc, our_tarfar = roc_acc_and_tarfar(
        feats, [bool(l == 0) for l in labels])
    metric_ok = (abs(ref_acc - our_acc) == 0.0
                 and np.array_equal(np.asarray(ref_tarfar),
                                    np.asarray(our_tarfar)[:3]))
    result["metric_chain"] = {
        "acc_ref": float(ref_acc), "acc_ours": float(our_acc),
        "acc_delta": float(abs(ref_acc - our_acc)),
        "tarfar_max_delta": float(np.max(np.abs(
            np.asarray(ref_tarfar) - np.asarray(our_tarfar)[:3]))),
        "pass": bool(metric_ok)}

    result["all_pass"] = bool(all(result[k]["pass"] for k in
                                  ("pair_loading", "input_transform",
                                   "metric_chain")))
    print(json.dumps(result, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(result, f, indent=2)
    return result


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="qeval_folder both-stacks parity")
    p.add_argument("--ref-repo", default="/root/reference")
    p.add_argument("--workdir", default="/tmp/msml_parity_folder")
    p.add_argument("--pairs", type=int, default=400)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default="cpu")
    p.add_argument("--out-json", default="")
    return p.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
