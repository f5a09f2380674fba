"""Visualization utilities (observability subsystem).

Parity targets:
  * `utils/vis_tensor.py:plot_tensor` — heat maps of logits/embeddings
  * training snapshots of input / predicted seg / GT mask
    (`train.py:335-364`)
  * FM intermediate-feature scatter plots
    (`backbones/fm/fmoperator.py:202-275`) — here driven from eval output
    rather than module-internal state (no mutable module state in JAX)
  * t-SNE embedding map (`eval/qeval_mxnet.py:191-230`)

All functions degrade to no-ops with a warning when matplotlib is absent.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger("msml_tpu")


def _plt():
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except ImportError:  # pragma: no cover
        logger.warning("matplotlib unavailable; skipping visualization")
        return None


def plot_tensor(tensors: Sequence[np.ndarray], titles: Sequence[str],
                save_name: str = "tensor.jpg") -> Optional[str]:
    """utils/vis_tensor.py parity: side-by-side heat maps."""
    plt = _plt()
    if plt is None:
        return None
    n = len(tensors)
    fig, axes = plt.subplots(1, n, figsize=(5 * n, 4), dpi=150)
    if n == 1:
        axes = [axes]
    for ax, t, title in zip(axes, tensors, titles):
        t = np.asarray(t)
        im = ax.imshow(t if t.ndim == 2 else t.reshape(t.shape[0], -1),
                       aspect="auto", cmap="viridis")
        ax.set_title(title)
        fig.colorbar(im, ax=ax)
    fig.savefig(save_name)
    plt.close(fig)
    return save_name


def save_training_snapshot(out_dir: str, step: int, img: np.ndarray,
                           final_seg: np.ndarray,
                           gt_msk: Optional[np.ndarray] = None,
                           is_gray: bool = False,
                           use_norm: bool = True) -> None:
    """train.py:335-364: save input face, predicted seg argmax, GT mask."""
    from PIL import Image

    snap = os.path.join(out_dir, "snapshot")
    os.makedirs(snap, exist_ok=True)
    face = np.asarray(img)
    if use_norm and not is_gray:
        face = (face + 1.0) * 127.5
    else:
        face = face * 255.0
    if is_gray:
        Image.fromarray(face[..., 0].astype(np.uint8), "L").save(
            os.path.join(snap, f"{step}_face.jpg"))
    else:
        Image.fromarray(face.astype(np.uint8), "RGB").save(
            os.path.join(snap, f"{step}_face.jpg"))
    seg = (np.argmax(np.asarray(final_seg), axis=-1) * 255).astype(np.uint8)
    Image.fromarray(seg).save(os.path.join(snap, f"{step}_seg.jpg"))
    if gt_msk is not None:
        Image.fromarray((np.asarray(gt_msk) * 255).astype(np.uint8)).save(
            os.path.join(snap, f"{step}_gt_occ.jpg"))


def plot_fm_features(contaminated: np.ndarray, mask: np.ndarray,
                     purified: np.ndarray, occ_mask: np.ndarray,
                     save_folder: str = ".", tag: str = "fm") -> None:
    """fmoperator.py:202-275: scatter of contaminated-vs-mask and
    contaminated-vs-purified feature values colored by occlusion."""
    plt = _plt()
    if plt is None:
        return
    colors = np.where(np.asarray(occ_mask).ravel() == 0, 0.3, 0.7)
    for yname, y in (("mask", mask), ("purified", purified)):
        fig = plt.figure(dpi=150)
        plt.xlabel("Contaminated Face Feature")
        plt.ylabel(yname)
        plt.scatter(np.asarray(contaminated).ravel(), np.asarray(y).ravel(),
                    s=1, c=colors, alpha=0.4)
        fig.savefig(os.path.join(save_folder, f"{tag}_{yname}.jpg"))
        plt.close(fig)


def tsne_embedding_map(features: np.ndarray, save_name: str = "tsne.jpg",
                       grid: int = 100) -> Optional[np.ndarray]:
    """qeval_mxnet.py:191-230: t-SNE heat map of embedding space."""
    try:
        from sklearn.manifold import TSNE
    except ImportError:  # pragma: no cover
        logger.warning("sklearn unavailable; skipping t-SNE")
        return None
    emb = TSNE(n_components=2, init="pca",
               random_state=0).fit_transform(np.asarray(features))
    lo, hi = emb.min(), emb.max()
    heat = np.zeros((grid, grid), np.int32)
    pts = ((emb - lo) / max(hi - lo, 1e-9) * (grid - 2)).astype(int)
    for px, py in pts:
        heat[py, px] += 1
    plot_tensor([heat], ["tsne"], save_name)
    return heat
