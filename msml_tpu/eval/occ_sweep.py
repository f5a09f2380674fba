"""Occlusion-sweep verification protocol (the `test.py` path).

Parity target: `eval/qeval_mxnet.py:285-591`:
  * sweep lo in {0,10,...,90}, hi = lo+1, protocol 'BB' (both images of a pair
    occluded), `RandomBlock(lo, hi, fill_type)` after CenterCrop
    (qeval_mxnet.py:524-547)
  * 10 repeats per nonzero ratio, 1 repeat for lo=0 (556)
  * features = model(orig) + model(flip), occlusions sampled independently
    for the orig and flip passes (295-390)
  * metric 1: insightface `evaluate` 10-fold accuracy (565-567)
  * metric 2: custom ROC accuracy at the threshold where tpr ~= 1 - fpr, plus
    TAR@FAR in {1e-1..1e-4} on cosine distances (qeval_mxnet.py:422-483) —
    vectorised here (the reference's O(N^2) python loops compute the same
    quantities: far uses strict <, tar uses <=, tar maximised over eligible
    thresholds).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np
from PIL import Image

from msml_tpu.data.rand_occ import RandomBlock
from msml_tpu.eval import verification as ver
from msml_tpu.eval.verification import l2_normalize_np

FAR_VALS = (1e-1, 1e-2, 1e-3, 1e-4, 1e-5)


def center_crop(img: Image.Image, out_size) -> Image.Image:
    """torchvision CenterCrop((h, w)) parity."""
    w, h = img.size
    th, tw = out_size[1], out_size[0]
    left = int(round((w - tw) / 2.0))
    top = int(round((h - th) / 2.0))
    return img.crop((left, top, left + tw, top + th))


def roc_acc_and_tarfar(features: np.ndarray, issame: Sequence[bool]):
    """qeval_mxnet.py:422-483 on l2-normalized features."""
    from sklearn.metrics import roc_curve

    feats = l2_normalize_np(features)
    e1, e2 = feats[0::2], feats[1::2]
    # cosine distance per pair (scipy cdist 'cosine' parity)
    dist = 1.0 - np.sum(e1 * e2, axis=1)
    # ground truth: 0 = same, 1 = different (qeval_mxnet.py:549-553)
    label = np.array([0 if s else 1 for s in issame])

    fpr, tpr, _ = roc_curve(label, dist)
    acc = tpr[np.argmin(np.abs(tpr - (1 - fpr)))]

    pos_dist = np.sort(dist[label == 0])  # same pairs
    neg_dist = np.sort(dist[label == 1])  # different pairs
    neg_cnt = len(neg_dist)
    pos_cnt = len(pos_dist)

    tarfar = np.zeros(len(FAR_VALS))
    for idx, far_target in enumerate(FAR_VALS):
        if idx > 3:  # reference skips 1e-5 (qeval_mxnet.py:457-459)
            continue
        # far(T) = #(neg < T)/neg_cnt; eligible thresholds T (drawn from the
        # negatives) with far(T) <= far_target; tar = max #(pos <= T)/pos_cnt
        far_of_T = np.searchsorted(neg_dist, neg_dist, side="left") / neg_cnt
        eligible = neg_dist[far_of_T <= far_target]
        if len(eligible) == 0:
            continue
        T = eligible.max()
        tarfar[idx] = np.searchsorted(pos_dist, T, side="right") / pos_cnt
    return float(acc), tarfar


def occlusion_sweep(imgs: List[Image.Image], issame: Sequence[bool],
                    extract_fn: Callable[[np.ndarray], np.ndarray],
                    out_size=(112, 112), fill_type: str = "black",
                    batch_size: int = 25, use_norm: bool = True,
                    is_gray: bool = False, no_occ: bool = False,
                    repeats: int = 10, rng: np.random.RandomState = None,
                    dim_feature: int = 512, verbose: bool = True,
                    feature_dir: str = "", protocol: str = "BB"):
    """Run the full sweep; returns list of dict rows per occlusion ratio.
    feature_dir: if set, save the flip-summed features per (ratio, repeat)
    as <dir>/feat_lo{lo}_rep{r}.npy (the reference's .npy feature cache,
    qeval_mxnet.py:392-396).
    protocol: 'BB' occludes both images of a pair; 'NB' occludes only the
    even-indexed image (first of each pair), the other stays clean
    (qeval_mxnet.py:173-187 `_load_one_input`)."""
    import os
    if protocol not in ("BB", "NB"):
        raise ValueError(f"unknown protocol {protocol!r} (expected BB or NB)")
    if feature_dir:
        os.makedirs(feature_dir, exist_ok=True)
    lo_list = [0, 10, 20, 30, 40, 50, 60, 70, 80, 90]
    hi_list = [1, 11, 21, 31, 41, 51, 61, 71, 81, 91]
    if no_occ:
        lo_list, hi_list = [0], [1]
    rng = rng or np.random.RandomState(0)

    results = []
    for lo, hi in zip(lo_list, hi_list):
        block = RandomBlock(lo, hi, fill=fill_type)
        repeat_time = 1 if lo == 0 else repeats
        avg_acc = 0.0
        avg_roc_acc = 0.0
        fars = np.zeros(len(FAR_VALS))
        for rep in range(repeat_time):
            feats = _extract_occluded(imgs, block, extract_fn, out_size,
                                      batch_size, use_norm, is_gray, rng,
                                      dim_feature, protocol)
            if feature_dir:
                np.save(f"{feature_dir}/feat_lo{lo}_rep{rep}.npy", feats)
            norm_feats = l2_normalize_np(feats)
            _, _, accuracy, _, _, _ = ver.evaluate(norm_feats, issame)
            avg_acc += float(np.mean(accuracy))
            racc, tf = roc_acc_and_tarfar(feats, issame)
            avg_roc_acc += racc
            fars += tf
        row = {"lo": lo, "hi": hi, "avg_acc": avg_acc / repeat_time,
               "roc_acc": avg_roc_acc / repeat_time,
               "tar_at_far": (fars / repeat_time).tolist()}
        results.append(row)
        if verbose:
            print("[%d ~ %d] | [avg_acc]: %.4f" % (lo, hi, row["avg_acc"]))
            print("          | [tar@far]: %.4f, %.4f, %.4f, %.4f, %.4f"
                  % tuple(row["tar_at_far"]))
    return results


def _extract_occluded(imgs, block, extract_fn, out_size, batch_size,
                      use_norm, is_gray, rng, dim_feature, protocol="BB"):
    """Protocol 'BB': occlude every image; 'NB': occlude even indices only.
    Occlusions are sampled independently for the orig and flip passes
    (qeval_mxnet.py:173-187,295-390)."""
    num = len(imgs)
    features = np.zeros((num, dim_feature))
    for flip in (False, True):
        arr = np.zeros((num,) + (out_size[1], out_size[0])
                       + ((1,) if is_gray else (3,)), np.float32)
        for i, img in enumerate(imgs):
            one = img.transpose(Image.FLIP_LEFT_RIGHT) if flip else img
            one = center_crop(one, out_size)
            if is_gray and one.mode != "L":
                # torchvision Grayscale() = PIL integer ITU-R 601-2,
                # applied BEFORE the occlusion block (qeval_mxnet.py:97-101:
                # Grayscale is prepended to the transform, so RandomBlock
                # sees the 'L' image and gauss fill draws one channel).
                # NOTE deliberately different from verification.test's
                # callback-path luminance/3 quirk (verification.py:250-254),
                # which lives in eval/verification.py::extract_embeddings.
                one = one.convert("L")
            if protocol == "BB" or i % 2 == 0:
                one = block(one, rng)
            a = np.asarray(one, np.float32) / 255.0
            if is_gray:
                a = a[..., None]
            arr[i] = a
        if use_norm:
            # start_extract normalizes whenever cfg.use_norm, gray included
            # (qeval_mxnet.py:318-325); lightcnn ships use_norm=False
            arr = (arr - 0.5) / 0.5
        for s in range(0, num, batch_size):
            e = min(s + batch_size, num)
            feats = np.asarray(extract_fn(arr[s:e]))
            features[s:e] += feats
    return features
