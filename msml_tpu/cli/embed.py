"""Embedding extraction CLI: weight folder + aligned image folder ->
l2-normalized features.

The reference has no dedicated tool for this — users repurpose the eval
scripts' extraction loops (`eval/qeval_folder.py:120-182`,
`eval/qeval_mxnet.py:299-396`). This packages the same convention as a
one-command workflow: flip-sum features, the folder-eval input transform
(Resize -> CenterCrop -> [-1,1] / gray per the weight folder's config),
batched through the jitted eval step.

Usage:
  msml-embed --weight_folder out/arc18_msml_1 --src aligned_faces/ \
      --out feats.npy                     # + feats.npy.names.txt

Images are expected aligned to the model's input size (use
`msml_tpu.tools.align_dataset` on raw folders first). Output row i is the
embedding of the i-th name in the names file.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def list_images(src: str):
    """Stable-sorted relative paths of all images under src."""
    names = []
    for root, _, files in os.walk(src):
        for f in files:
            if f.lower().endswith(IMG_EXTS):
                names.append(os.path.relpath(os.path.join(root, f), src))
    return sorted(names)


def main(args):
    import jax

    from msml_tpu.core.tpu_flags import apply_tuned_flags
    apply_tuned_flags()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from PIL import Image

    from msml_tpu.core.weight_folder import load_weight_folder
    from msml_tpu.eval.folder_eval import tensorize_folder_img
    from msml_tpu.eval.verification import l2_normalize_np
    from msml_tpu.train.train_step import make_eval_step

    cfg, model, state, mesh, _ = load_weight_folder(args.weight_folder)
    eval_step = make_eval_step(model, mesh)
    names = list_images(args.src)
    if not names:
        raise SystemExit(f"no images under {args.src!r}")
    out_size = tuple(cfg.out_size)
    is_gray = bool(cfg.get("is_gray", False))
    use_norm = bool(cfg.get("use_norm", True))

    feats = None
    flips = (False, True) if args.flip else (False,)
    for s in range(0, len(names), args.batch_size):
        chunk = names[s:s + args.batch_size]
        imgs = [Image.open(os.path.join(args.src, n)).convert("RGB")
                for n in chunk]
        for flip in flips:
            x = np.stack([tensorize_folder_img(im, out_size, use_norm,
                                               is_gray, flip=flip)
                          for im in imgs])
            f = np.asarray(eval_step(state.params, state.batch_stats,
                                     x.astype(np.float32)))
            if feats is None:
                feats = np.zeros((len(names), f.shape[1]), np.float32)
            feats[s:s + len(chunk)] += f
        if args.verbose:
            print(f"{min(s + args.batch_size, len(names))}/{len(names)}")

    if args.l2_norm:
        feats = l2_normalize_np(feats)
    np.save(args.out, feats)
    with open(args.out + ".names.txt", "w") as fh:
        fh.write("\n".join(names) + "\n")
    print(f"wrote {args.out} {feats.shape} + {args.out}.names.txt")
    return feats, names


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="msml_tpu embedding extraction")
    p.add_argument("--weight_folder", required=True)
    p.add_argument("--src", required=True,
                   help="folder of aligned face images (recursed)")
    p.add_argument("--out", default="embeddings.npy")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--flip", action="store_true", default=True,
                   help="flip-sum features (the eval protocols' default)")
    p.add_argument("--no-flip", dest="flip", action="store_false")
    p.add_argument("--l2-norm", action="store_true", default=True)
    p.add_argument("--raw", dest="l2_norm", action="store_false",
                   help="skip the final l2 normalization")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--platform", default="")
    return p.parse_args(argv)


def cli():
    """Console entry point (pyproject [project.scripts])."""
    main(parse_args())


if __name__ == "__main__":
    cli()
