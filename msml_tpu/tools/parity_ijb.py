"""IJB metric-chain parity: reference qeval_ijbc.py functions executed in
place vs msml_tpu/eval/ijb.py, on synthetic templates (offline-closable —
VERDICT r2 missing #4).

Pins, with the reference's own code:
  * meta readers: `read_template_media_list` / `read_template_pair_list`
    (pandas path) vs ours (np.loadtxt) on generated tid_mid / pair files
  * media->template aggregation: `image2template_feature`
    (qeval_ijbc.py:303-337; same-video mean pooling, media sum, l2 norm)
  * batched cosine scoring: `verification` (qeval_ijbc.py:343-370)
  * detector-score weighting (qeval_ijbc.py:496-502 formula)
  * TPR@FPR table: flipud + nearest-fpr selection (qeval_ijbc.py:564-586)

qeval_ijbc.py is a SCRIPT (argparse + protocol run at module level), so the
function defs are extracted by AST and exec'd verbatim — the function bodies
(the load-bearing metric math) run unmodified; none of the surrounding
script code is needed. Heavy imports the functions never touch (menpo,
prettytable, skimage, mxnet) are not required because only the extracted
defs + their actual deps (numpy/sklearn/pandas) are executed.

Usage: python -m msml_tpu.tools.parity_ijb [--images 600 --templates 80
       --pairs 4000] [--out-json F]
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import tempfile


def load_ref_functions(ref_repo: str, names):
    """Extract the named top-level function defs from qeval_ijbc.py and
    exec them (verbatim bodies) in a fresh namespace with their real deps."""
    path = os.path.join(ref_repo, "eval", "qeval_ijbc.py")
    with open(path) as f:
        src = f.read()
    tree = ast.parse(src)
    keep = [n for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            and n.name in names]
    missing = set(names) - {n.name for n in keep}
    if missing:
        raise RuntimeError(f"functions not found in reference: {missing}")
    mod = ast.Module(body=keep, type_ignores=[])
    code = compile(mod, path, "exec")

    import numpy as np
    import pandas as pd
    import sklearn
    import sklearn.preprocessing

    from msml_tpu.tools.parity_occ import restore_numpy_aliases
    restore_numpy_aliases()
    ns = {"np": np, "pd": pd, "sklearn": sklearn, "os": os}
    exec(code, ns)
    return ns


def make_synthetic_protocol(n_images: int, n_templates: int, n_pairs: int,
                            dim: int, seed: int):
    """Synthetic IJB-like protocol: uneven templates, repeated media ids
    (exercising the same-video mean-pooling branch), random pairs."""
    import numpy as np
    rng = np.random.RandomState(seed)
    templates = np.sort(rng.randint(0, n_templates, n_images)) * 3 + 7
    # media ids: ~40% of images share a media with another image of the
    # same template (video frames)
    medias = np.zeros(n_images, int)
    next_media = 0
    for t in np.unique(templates):
        (idx,) = np.where(templates == t)
        i = 0
        while i < len(idx):
            span = rng.randint(1, 4) if rng.rand() < 0.4 else 1
            for j in range(i, min(i + span, len(idx))):
                medias[idx[j]] = next_media
            next_media += 1
            i += span
    feats = rng.randn(n_images, dim).astype(np.float32)
    faceness = rng.rand(n_images).astype(np.float32) * 0.5 + 0.5
    uts = np.unique(templates)
    p1 = uts[rng.randint(0, len(uts), n_pairs)]
    p2 = uts[rng.randint(0, len(uts), n_pairs)]
    label = (rng.rand(n_pairs) > 0.5).astype(int)
    return feats, faceness, templates, medias, p1, p2, label


def main(args):
    import numpy as np

    from msml_tpu.eval import ijb as ours

    ref = load_ref_functions(args.ref_repo, [
        "read_template_media_list", "read_template_pair_list",
        "image2template_feature", "verification"])

    feats, faceness, templates, medias, p1, p2, label = \
        make_synthetic_protocol(args.images, args.templates, args.pairs,
                                args.dim, args.seed)

    rows = {}

    # --- meta readers on generated files
    with tempfile.TemporaryDirectory() as td:
        tid_mid = os.path.join(td, "tid_mid.txt")
        with open(tid_mid, "w") as f:
            for i in range(len(templates)):
                f.write(f"img_{i}.jpg {templates[i]} {medias[i]}\n")
        pair_file = os.path.join(td, "pairs.txt")
        with open(pair_file, "w") as f:
            for i in range(len(p1)):
                f.write(f"{p1[i]} {p2[i]} {label[i]}\n")
        r_t, r_m = ref["read_template_media_list"](tid_mid)
        o_t, o_m = ours.read_template_media_list(tid_mid)
        rows["readers_templates_equal"] = bool((r_t == o_t).all())
        rows["readers_medias_equal"] = bool((r_m == o_m).all())
        r_p1, r_p2, r_lab = ref["read_template_pair_list"](pair_file)
        o_p1, o_p2, o_lab = ours.read_template_pair_list(pair_file)
        rows["readers_pairs_equal"] = bool((r_p1 == o_p1).all()
                                           and (r_p2 == o_p2).all()
                                           and (r_lab == o_lab).all())

    # --- detector-score weighting (qeval_ijbc.py:496-502): both stacks
    # multiply the (flip-summed) feats by faceness before aggregation
    w_ref = feats * faceness[:, np.newaxis]
    w_ours = ours.prepare_image_feats(
        np.concatenate([feats, np.zeros_like(feats)], axis=1), faceness,
        use_flip_test=True, use_norm_score=True, use_detector_score=True)
    rows["detector_weighting_max_delta"] = float(
        np.max(np.abs(w_ref - w_ours)))

    # --- media -> template aggregation
    r_tn, r_ut = ref["image2template_feature"](w_ref, templates, medias)
    o_tn, o_ut = ours.image2template_feature(w_ref, templates, medias)
    rows["unique_templates_equal"] = bool((r_ut == o_ut).all())
    rows["template_feats_max_delta"] = float(np.max(np.abs(r_tn - o_tn)))

    # --- pairwise scoring
    r_score = ref["verification"](r_tn, r_ut, p1, p2)
    o_score = ours.verification_scores(r_tn, r_ut, p1, p2)
    rows["scores_max_delta"] = float(np.max(np.abs(r_score - o_score)))

    # --- TPR@FPR selection (qeval_ijbc.py:564-586, inline script code:
    # roc_curve -> flipud -> nearest-fpr via tuple-min)
    from sklearn.metrics import roc_curve
    fpr, tpr, _ = roc_curve(label, r_score)
    fpr_f, tpr_f = np.flipud(fpr), np.flipud(tpr)
    x_labels = [10 ** -6, 10 ** -5, 10 ** -4, 10 ** -3, 10 ** -2, 10 ** -1]
    ref_table = {}
    for x in x_labels:
        _, min_index = min(list(zip(abs(fpr_f - x), range(len(fpr_f)))))
        ref_table[x] = float(tpr_f[min_index])
    our_table = ours.tpr_at_fpr_table(label, r_score, x_labels)
    rows["tpr_at_fpr_max_delta"] = float(max(
        abs(ref_table[x] - our_table[x]) for x in x_labels))

    ok = (rows["readers_templates_equal"] and rows["readers_medias_equal"]
          and rows["readers_pairs_equal"]
          and rows["unique_templates_equal"]
          and rows["detector_weighting_max_delta"] == 0.0
          and rows["template_feats_max_delta"] <= 1e-12
          and rows["scores_max_delta"] <= 1e-12
          and rows["tpr_at_fpr_max_delta"] == 0.0)
    result = {"images": args.images, "templates_nominal": args.templates,
              "pairs": args.pairs, **rows, "all_pass": bool(ok)}
    print(json.dumps(result, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(result, f, indent=2)
    return result


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="IJB metric-chain parity")
    p.add_argument("--ref-repo", default="/root/reference")
    p.add_argument("--images", type=int, default=600)
    p.add_argument("--templates", type=int, default=80)
    p.add_argument("--pairs", type=int, default=4000)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out-json", default="")
    return p.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
