"""Folder + pairs.txt verification (MFR2 / PKU-Masked-Face protocol).

Parity target: `eval/qeval_folder.py:16-321` `EvaluatorFolder`:
  * dataset: folder/<identity>/<img>, pairs.txt lines
    "<id> <i> <j>" (same) or "<id1> <i> <id2> <j>" (diff); images are
    1-indexed (qeval_folder.py:39-75)
  * input transform: Resize(out_size) -> CenterCrop(112) -> ToTensor ->
    [-1,1] norm (qeval_folder.py:120-137,174-182); flip-sum features
  * metrics: cosine-distance ROC accuracy at tpr ~= 1-fpr + TAR@FAR
    {1e-1, 1e-2, 1e-3} (242-313) — shares the vectorized math with
    eval/occ_sweep.roc_acc_and_tarfar
  * model cost accounting (#Params / GFLOPs) via jax instead of thop
    (315-321)

Pinned both-stacks by `tools/parity_folder.py` (pair loading, input
transform, metric chain — the reference's own code executed in place).

Documented deviations (reference bugs not replicated):
  * `start_extract`'s inference block is indented INSIDE the flip-fill
    loop (qeval_folder.py:165-239) and returns during its first
    iteration, so rows 1..N-1 of the flip buffer are still zero images
    (normalized to constant -1) when the flip-sum happens — the "flip
    feature" added to every image but the first is f(-1). We flip-sum
    real flipped images (the evident intent, and what qeval_mxnet does).
  * the gray/128 config would crash in the reference (the 112-crop
    tensor is assigned into a cfg.out_size=128 buffer, 159-176); we
    resize+crop to out_size so gray folder eval works.
"""

from __future__ import annotations

import os
from typing import Callable, List, Tuple

import numpy as np
from PIL import Image

from msml_tpu.eval.occ_sweep import center_crop, roc_acc_and_tarfar


def load_folder_pairs(dataset_folder: str, pair_txt: str
                      ) -> Tuple[List[Image.Image], np.ndarray]:
    """qeval_folder.py:39-75. Returns (interleaved pair images, labels with
    0 = same / 1 = diff)."""
    img_dict = {}
    for identity in sorted(os.listdir(dataset_folder)):
        d = os.path.join(dataset_folder, identity)
        if not os.path.isdir(d):
            continue
        img_dict[identity] = [
            Image.open(os.path.join(d, f)).convert("RGB")
            for f in sorted(os.listdir(d))]

    with open(pair_txt) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    labels = np.zeros(len(lines))
    img_pairs: List[Image.Image] = []
    for idx, line in enumerate(lines):
        words = line.split(" ")
        if len(words) == 3:
            id1 = id2 = words[0]
            i1, i2 = words[1], words[2]
        else:
            id1, i1, id2, i2 = words[0], words[1], words[2], words[3]
        img_pairs.append(img_dict[id1][int(i1) - 1])  # 1-indexed
        img_pairs.append(img_dict[id2][int(i2) - 1])
        labels[idx] = len(words) - 3  # 0: same, 1: diff
    return img_pairs, labels


def tensorize_folder_img(img: Image.Image, out_size=(112, 112),
                         use_norm: bool = True, is_gray: bool = False,
                         flip: bool = False) -> np.ndarray:
    """`_load_one_input` + the [-1,1] norm (qeval_folder.py:120-137,
    174-182), HWC float32: flip -> Resize(out_size) (torchvision tuple
    semantics = PIL bilinear to exactly (w,h)) -> CenterCrop(out_size) ->
    /255 -> [-1,1]."""
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    w, h = out_size[0], out_size[1]
    if img.size != (w, h):
        img = img.resize((w, h), Image.BILINEAR)
    img = center_crop(img, out_size)
    a = np.asarray(img, np.float32) / 255.0
    if is_gray:
        a = ((0.2989 * a[..., 0] + 0.5870 * a[..., 1]
              + 0.1140 * a[..., 2]) / 3.0)[..., None]
    elif use_norm:
        a = (a - 0.5) / 0.5
    return a


def evaluate_folder(dataset_folder: str, pair_txt: str,
                    extract_fn: Callable, out_size=(112, 112),
                    batch_size: int = 16, use_norm: bool = True,
                    is_gray: bool = False, dim_feature: int = 512):
    """Full protocol -> (roc_acc, tar@far[3])."""
    imgs, labels = load_folder_pairs(dataset_folder, pair_txt)
    n = len(imgs)
    features = np.zeros((n, dim_feature))
    for flip in (False, True):
        arr = np.stack([tensorize_folder_img(img, out_size, use_norm,
                                             is_gray, flip)
                        for img in imgs])
        for s in range(0, n, batch_size):
            e = min(s + batch_size, n)
            features[s:e] += np.asarray(extract_fn(arr[s:e]))

    issame = [bool(l == 0) for l in labels]
    acc, tarfar = roc_acc_and_tarfar(features, issame)
    return acc, tarfar[:3]


def stat_params_flops(model, variables, input_shape=(1, 112, 112, 3)):
    """#Params (M) and GFLOPs via XLA cost analysis (qeval_folder.py:315-321
    thop equivalent)."""
    import jax
    import jax.numpy as jnp

    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))

    def fwd(img):
        return model.apply(variables, img, train=False)[0]

    lowered = jax.jit(fwd).lower(jnp.zeros(input_shape, jnp.float32))
    cost = lowered.compile().cost_analysis()
    flops = (cost or {}).get("flops", float("nan"))
    return n_params / 1e6, flops / 1e9
