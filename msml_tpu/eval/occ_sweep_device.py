"""On-device occlusion-sweep: the qeval_mxnet protocol with block occlusion,
normalization and feature extraction fused on the TPU.

Same protocol as eval/occ_sweep.py (sweep lo in {0..90}, 'BB', 10 repeats,
flip-sum features, evaluate + TAR@FAR) but RandomBlock + normalize run on
device via kernels/augment.device_augment_batch — removing the host PIL
transform of 12000 x 2 x 10 x 10 images per run. Distribution parity with the
host transform holds for 'black'/'white' fills (exact area law); 'gauss' fill
differs slightly (the reference casts randn*255 through uint8 with wraparound,
rand_occ.py:57-64 — we fill with unit-normal noise in image domain).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from msml_tpu.eval import verification as ver
from msml_tpu.eval.occ_sweep import roc_acc_and_tarfar
from msml_tpu.eval.verification import l2_normalize_np
from msml_tpu.kernels.augment import device_augment_batch


def pil_gray(d) -> jnp.ndarray:
    """Host-sweep gray convention (occ_sweep._extract_occluded):
    torchvision Grayscale = PIL 'L' integer ITU-R 601-2 BEFORE the block,
    then [0,1] + the same use_norm normalization as RGB. Inputs are
    integer-valued [0,255] floats (load_bin output), so PIL's fixed-point
    rounding ((R*19595 + G*38470 + B*7471 + 0x8000) >> 16) is reproduced
    exactly (all intermediates <= 2^24, exact in f32). The luminance/3
    quirk belongs to the *callback* path (verification.py:250-254), not
    this protocol."""
    d = jnp.asarray(d, jnp.float32)
    l24 = d[..., 0] * 19595. + d[..., 1] * 38470. + d[..., 2] * 7471. \
        + 32768.
    return (jnp.floor(l24 / 65536.0) / 255.0)[..., None]


def occlusion_sweep_device(data_list: List[np.ndarray],
                           issame: Sequence[bool],
                           extract_fn: Callable[[jnp.ndarray], jnp.ndarray],
                           fill_type: str = "black", use_norm: bool = True,
                           is_gray: bool = False, no_occ: bool = False,
                           repeats: int = 10, batch_size: int = 512,
                           seed: int = 0, verbose: bool = True):
    """data_list: [orig, flipped] (N, H, W, 3) float arrays in [0, 255]
    (data/bin_loader.load_bin output). extract_fn: jitted embedding fn."""
    lo_list = [0, 10, 20, 30, 40, 50, 60, 70, 80, 90]
    hi_list = [1, 11, 21, 31, 41, 51, 61, 71, 81, 91]
    if no_occ:
        lo_list, hi_list = [0], [1]

    # move both copies to device once, in [0, 1]
    if is_gray:
        dev = [pil_gray(d) for d in data_list]
    else:
        dev = [jnp.asarray(d, jnp.float32) / 255.0 for d in data_list]
    n = dev[0].shape[0]
    rng = jax.random.PRNGKey(seed)

    results = []
    for lo, hi in zip(lo_list, hi_list):
        repeat_time = 1 if lo == 0 else repeats
        avg_acc = 0.0
        avg_roc = 0.0
        fars = np.zeros(5)
        for rep in range(repeat_time):
            feats = None
            for flip in (0, 1):
                data = dev[flip]
                for s in range(0, n, batch_size):
                    e = min(s + batch_size, n)
                    rng, k = jax.random.split(rng)
                    img = device_augment_batch(
                        data[s:e], k, lo=lo, hi=hi, fill=fill_type,
                        use_norm=use_norm)
                    f = np.asarray(extract_fn(img))
                    if feats is None:
                        feats = np.zeros((n, f.shape[1]))
                    feats[s:e] += f
            norm_feats = l2_normalize_np(feats)
            _, _, accuracy, _, _, _ = ver.evaluate(norm_feats, issame)
            avg_acc += float(np.mean(accuracy))
            racc, tf = roc_acc_and_tarfar(feats, issame)
            avg_roc += racc
            fars += tf
        row = {"lo": lo, "hi": hi, "avg_acc": avg_acc / repeat_time,
               "roc_acc": avg_roc / repeat_time,
               "tar_at_far": (fars / repeat_time).tolist()}
        results.append(row)
        if verbose:
            print("[%d ~ %d] | [avg_acc]: %.4f" % (lo, hi, row["avg_acc"]))
    return results
