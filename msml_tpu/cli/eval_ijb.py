"""IJB-B / IJB-C 1:1 verification entry point.

Parity target: `eval/qeval_ijbc.py` CLI (argparse at qeval_ijbc.py:41-52):
reads the IJB meta files, aligns crops from the landmark list, extracts
flip-concat features with optional occlusion injection (10-repeat averaged),
aggregates media->template, scores pairs, prints the TPR@FPR table.

Expected layout (the standard insightface IJB release):
  <ijb-root>/meta/<target>_face_tid_mid.txt
  <ijb-root>/meta/<target>_template_pair_label.txt
  <ijb-root>/meta/<target>_name_5pts_score.txt   (img name, 10 lmk, score)
  <ijb-root>/loose_crop/<img files>

Usage:
  python -m msml_tpu.cli.eval_ijb --weight_folder out/arc18_1 \
      --ijb-root /data/IJB --target IJBC [--lo 40 --hi 41]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_name_lmk_score(path: str):
    names, lmks, scores = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 12:
                continue
            names.append(parts[0])
            lmks.append(np.asarray(list(map(float, parts[1:11])),
                                   np.float32).reshape(5, 2))
            scores.append(float(parts[-1]))
    return names, lmks, np.asarray(scores, np.float32)


def main(args):
    import jax
    from msml_tpu.core.tpu_flags import apply_tuned_flags
    apply_tuned_flags()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import cv2

    from msml_tpu.core import checkpoint as ckpt
    from msml_tpu.core.config import config_init, load_yaml
    from msml_tpu.core.mesh import make_mesh
    from msml_tpu.core.precision import policy_from_config
    from msml_tpu.data.rand_occ import RandomBlock
    from msml_tpu.eval.ijb import (align_face, extract_ijb_features,
                                   read_template_media_list,
                                   read_template_pair_list, run_ijb_protocol)
    from msml_tpu.nn.msml import msml_from_config
    from msml_tpu.train.train_step import init_train_state, make_eval_step

    cfg = load_yaml(os.path.join(args.weight_folder, "config.yaml"))
    cfg.out_folder = os.path.dirname(args.weight_folder.rstrip("/")) or "out"
    config_init(cfg, make_output_dir=False)

    mesh = make_mesh()
    use_pfc = float(cfg.get("sample_rate", 1.0)) < 1.0 or bool(
        cfg.get("use_partial_fc", False))
    model = msml_from_config(cfg, policy=policy_from_config(
        bool(cfg.get("fp16", True))), external_header=use_pfc)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(model, cfg, rng, mesh, use_pfc=use_pfc)
    restored = ckpt.restore_checkpoint(args.weight_folder, state)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint in {args.weight_folder}")
    state = restored
    eval_step = make_eval_step(model, mesh)

    def extract_fn(img_np):
        return eval_step(state.params, state.batch_stats,
                         np.asarray(img_np, np.float32))

    meta = os.path.join(args.ijb_root, "meta")
    t = args.target.lower()
    templates, medias = read_template_media_list(
        os.path.join(meta, f"{t}_face_tid_mid.txt"))
    p1, p2, label = read_template_pair_list(
        os.path.join(meta, f"{t}_template_pair_label.txt"))
    names, lmks, faceness = load_name_lmk_score(
        os.path.join(meta, f"{t}_name_5pts_score.txt"))

    print(f"aligning {len(names)} crops ...")
    imgs = np.zeros((len(names), 112, 112, 3), np.float32)
    for i, (name, lmk) in enumerate(zip(names, lmks)):
        img = cv2.imread(os.path.join(args.ijb_root, "loose_crop", name))
        imgs[i] = align_face(img, lmk)

    occ = RandomBlock(args.lo, args.hi) if args.hi > 1 else None
    repeats = 10 if args.lo > 0 else 1  # qeval_ijbc.py:536-546
    rng_np = np.random.RandomState(0)
    score = None
    table = None
    for _ in range(repeats):
        feats = extract_ijb_features(imgs, extract_fn, args.batch_size,
                                     occ_block=occ, rng=rng_np)
        table, s = run_ijb_protocol(
            feats, faceness, templates, medias, p1, p2, label,
            use_detector_score=not args.no_detector_score)
        score = s if score is None else score + s
    score /= repeats

    from msml_tpu.eval.ijb import save_roc_artifacts, tpr_at_fpr_table
    table = tpr_at_fpr_table(label, score)
    print(f"TPR@FPR ({args.target}):")
    for fpr, tpr in table.items():
        print(f"  {fpr:g}: {tpr * 100:.2f}%")
    # write the requested JSON before the plotting artifacts so a missing
    # matplotlib/sklearn degrades gracefully instead of eating the output
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump({str(k): v for k, v in table.items()}, f, indent=2)
    # ROC pdf + csv + raw scores next to the weights (qeval_ijbc.py:544-596)
    art_dir = args.artifact_dir or args.weight_folder
    try:
        paths = save_roc_artifacts(art_dir, args.target, label, score)
        print("artifacts:", ", ".join(paths.values()))
    except Exception as e:  # matplotlib/sklearn optional at runtime
        print(f"warning: ROC artifacts skipped ({e})")
    return table


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="msml_tpu IJB-B/C eval")
    p.add_argument("--weight_folder", required=True)
    p.add_argument("--ijb-root", required=True)
    p.add_argument("--target", default="IJBC", choices=["IJBB", "IJBC"])
    p.add_argument("--lo", type=int, default=0)
    p.add_argument("--hi", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--no-detector-score", action="store_true")
    p.add_argument("--out-json", default="")
    p.add_argument("--artifact-dir", default="",
                   help="where to write the ROC pdf/csv/scores "
                        "(default: the weight folder)")
    p.add_argument("--platform", default="")
    return p.parse_args(argv)


def cli():
    """Console entry point (pyproject [project.scripts])."""
    main(parse_args())


if __name__ == "__main__":
    cli()
