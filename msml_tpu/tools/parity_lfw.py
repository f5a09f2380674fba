"""End-to-end LFW-protocol accuracy parity: reference PyTorch stack vs this
framework, same weights, same pairs.

The north-star acceptance check (BASELINE.md): verification accuracy of an
`arc18_msml` checkpoint evaluated through BOTH stacks must agree within 0.1%.
This tool runs the complete chain each way —

  reference: torch MSML (built from the reference repo's own code, executed
    in place, never copied) -> CenterCrop/ToTensor/[-1,1] -> batched forward
    -> flip-sum features -> sklearn normalize -> the reference
    `eval/verification.py::evaluate` 10-fold protocol
    (qeval_mxnet.py:285-397,556-567 semantics, no occlusion)
  ours: tools/import_torch transliteration -> nn/msml.py ->
    eval/occ_sweep.py `no_occ` sweep -> eval/verification.py::evaluate

and reports both accuracies and |delta|.

With the released checkpoint + real lfw.bin, run:
  python -m msml_tpu.tools.parity_lfw --weight backbone.pth --bin lfw.bin \
      --ref-repo /path/to/MSML
Without assets (--synthetic N), a reference-format checkpoint is created by
randomising the reference's own torch MSML, and an LFW-like .bin of N pairs
is generated — this pins the *protocol/transliteration* parity; absolute
accuracy then only reflects the synthetic data.

mxnet note: `eval/verification.py` imports mxnet at module scope but
`evaluate()` never touches it; when mxnet is absent a stub module is
installed so the reference metric code runs as-is.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import types


def _load_ref_verification(ref_repo: str):
    """Import the reference eval/verification.py, stubbing mxnet if absent
    (only load_bin/test need it; evaluate() is numpy/sklearn)."""
    try:
        import mxnet  # noqa: F401
    except ImportError:
        mx = types.ModuleType("mxnet")
        nd = types.ModuleType("mxnet.ndarray")
        mx.ndarray = nd
        sys.modules.setdefault("mxnet", mx)
        sys.modules.setdefault("mxnet.ndarray", nd)
    spec = importlib.util.spec_from_file_location(
        "ref_verification", os.path.join(ref_repo, "eval", "verification.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_ref_model(ref_repo: str, num_classes: int):
    """Instantiate the reference's own MSML (arc18_msml spec,
    reference config.yaml backbone fields)."""
    if ref_repo not in sys.path:
        sys.path.insert(0, ref_repo)
    import backbones  # the reference package, executed in place

    model = backbones.MSML(
        frb_type="iresnet18", osb_type="unet", fm_layers=(1, 1, 1, 1),
        header_type="AMArcFace", header_params=(64.0, 0.48, 0.0, 0.0),
        num_classes=num_classes, fp16=False, use_osb=True,
        fm_params=(3, 2, "sigmoid", "mul"),
        peer_params={"use_ori": False, "use_conv": False,
                     "mask_trans": "conv", "use_decoder": False})
    return model


def _randomize_torch(model, seed: int = 0):
    import torch
    import torch.nn as tnn
    torch.manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (tnn.Conv2d, tnn.ConvTranspose2d, tnn.Linear)):
            tnn.init.normal_(m.weight, 0, 0.1)
            if m.bias is not None:
                tnn.init.normal_(m.bias, 0, 0.05)
        elif isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            tnn.init.uniform_(m.weight, 0.5, 1.5)
            tnn.init.normal_(m.bias, 0, 0.1)
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
        elif isinstance(m, tnn.PReLU):
            tnn.init.uniform_(m.weight, 0.1, 0.4)
    # reference invariant: the feature BN's scale is frozen at 1.0
    # (iresnet.py:119-120); every released checkpoint carries exactly 1.0.
    # (lightcnn has no `features` BN — fc output is the embedding)
    feat_bn = getattr(model.frb, "features", None)
    if feat_bn is not None and hasattr(feat_bn, "weight"):
        tnn.init.constant_(feat_bn.weight, 1.0)


def make_synthetic_bin(path: str, n_pairs: int, seed: int = 0,
                       size: int = 112):
    """LFW-like .bin: identity prototypes + noise, alternating same/diff."""
    import pickle

    import numpy as np
    from PIL import Image

    from msml_tpu.data.recordio import imencode

    rng = np.random.RandomState(seed)
    protos = rng.rand(max(n_pairs // 2, 2), 16, 16, 3)

    def face(pid):
        # heavy noise keeps accuracy off the 100% ceiling so the 10-fold
        # threshold search is actually exercised by the parity check
        base = protos[pid % len(protos)]
        img = np.clip(base + rng.randn(16, 16, 3) * 0.45, 0, 1)
        big = np.asarray(Image.fromarray(
            (img * 255).astype(np.uint8)).resize((size, size)))
        return big

    bins, issame = [], []
    for p in range(n_pairs):
        if p % 2 == 0:
            a, b = face(p), face(p)
            issame.append(True)
        else:
            a, b = face(p), face(p + 7919)
            issame.append(False)
        bins.append(imencode(a))
        bins.append(imencode(b))
    with open(path, "wb") as f:
        pickle.dump((bins, issame), f)


def eval_reference(tmodel, imgs, issame, ref_ver, batch_size: int = 25):
    """qeval_mxnet.py:285-397 extraction (no occlusion) + reference
    evaluate()."""
    import numpy as np
    import torch

    tmodel.eval()
    num = len(imgs)
    arr = np.stack([np.asarray(im, np.float32) / 255.0 for im in imgs])
    arr = (arr - 0.5) / 0.5
    feats = None
    with torch.no_grad():
        for flip in (False, True):
            a = arr[:, :, ::-1, :].copy() if flip else arr
            x = torch.from_numpy(a.transpose(0, 3, 1, 2))
            for s in range(0, num, batch_size):
                out = tmodel(x[s:s + batch_size])
                f = (out[0] if isinstance(out, tuple) else out).numpy()
                if feats is None:
                    feats = np.zeros((num, f.shape[1]))
                feats[s:s + batch_size] += f
    import sklearn.preprocessing
    feats = sklearn.preprocessing.normalize(feats)
    # call the reference calculate_roc with evaluate()'s exact conventions
    # (verification.py:181-191) — evaluate() itself also runs calculate_val,
    # whose slinear interpolation crashes on degenerate FAR curves (duplicate
    # x values) that random-weight/synthetic runs can produce; the accuracy
    # qeval_mxnet reports only ever comes from calculate_roc.
    thresholds = np.arange(0, 4, 0.01)
    _, _, accuracy = ref_ver.calculate_roc(
        thresholds, feats[0::2], feats[1::2], np.asarray(list(issame)),
        nrof_folds=10, pca=0)
    return float(np.mean(accuracy))


def eval_ours(state_dict, imgs, issame, batch_size: int = 25):
    """import_torch transliteration + occ_sweep no-occ path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from msml_tpu.core.precision import FULL_PRECISION
    from msml_tpu.eval.occ_sweep import occlusion_sweep
    from msml_tpu.nn.msml import MSML
    from msml_tpu.tools.import_torch import import_msml_checkpoint, merge_into

    params_in, stats_in = import_msml_checkpoint(state_dict)
    model = MSML(frb_type="iresnet18", num_classes=16, use_osb=True,
                 header_type="AMArcFace", header_params=(64.0, 0.48, 0, 0),
                 fm_params=(3, 2, "sigmoid", "mul"), policy=FULL_PRECISION)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 112, 112, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0,
                           jnp.zeros((1,), jnp.int32), train=True)
    params = merge_into(jax.device_get(variables["params"]), params_in)
    stats = merge_into(jax.device_get(variables["batch_stats"]), stats_in)

    @jax.jit
    def fwd(img):
        feature, _ = model.apply({"params": params, "batch_stats": stats},
                                 img, train=False)
        return feature

    def extract_fn(img_np):
        return np.asarray(fwd(jnp.asarray(img_np, jnp.float32)))

    rows = occlusion_sweep(imgs, issame, extract_fn, no_occ=True,
                           batch_size=batch_size, verbose=False)
    return float(rows[0]["avg_acc"])


def main(args):
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import numpy as np
    import torch

    from msml_tpu.data.bin_loader import load_bin_pil

    ref_ver = _load_ref_verification(args.ref_repo)

    if args.bin:
        bin_path = args.bin
    else:
        bin_path = os.path.join(args.workdir, "parity_lfw.bin")
        os.makedirs(args.workdir, exist_ok=True)
        make_synthetic_bin(bin_path, args.synthetic)
        print(f"synthetic bin ({args.synthetic} pairs) -> {bin_path}")

    tmodel = _build_ref_model(args.ref_repo, num_classes=args.num_classes)
    if args.weight:
        sd = torch.load(args.weight, map_location="cpu")
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        missing, unexpected = tmodel.load_state_dict(sd, strict=False)
        print(f"loaded {args.weight}: {len(missing)} missing, "
              f"{len(unexpected)} unexpected")
    else:
        _randomize_torch(tmodel, seed=args.seed)
        print("randomised reference-format weights (no --weight given)")

    imgs, issame = load_bin_pil(bin_path)

    acc_ref = eval_reference(tmodel, imgs, issame, ref_ver,
                             batch_size=args.batch_size)
    # strip the header the eval path never uses
    sd = {k: v for k, v in tmodel.state_dict().items()
          if not k.startswith("classification.")}
    acc_ours = eval_ours(sd, imgs, issame, batch_size=args.batch_size)

    delta = abs(acc_ref - acc_ours)
    result = {"acc_reference": round(acc_ref, 6),
              "acc_ours": round(acc_ours, 6),
              "abs_delta": round(delta, 6),
              "pairs": len(issame),
              "within_0.1pct": bool(delta <= 1e-3)}
    print(json.dumps(result, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(result, f, indent=2)
    return result


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="LFW accuracy parity check")
    p.add_argument("--ref-repo", default="/root/reference",
                   help="path to the reference MSML repo (executed in place)")
    p.add_argument("--weight", default="",
                   help="reference backbone.pth (random weights if omitted)")
    p.add_argument("--bin", default="",
                   help="lfw.bin pair file (synthetic if omitted)")
    p.add_argument("--synthetic", type=int, default=120,
                   help="pairs in the generated bin when --bin omitted")
    p.add_argument("--num-classes", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=25)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workdir", default="/tmp/msml_parity")
    p.add_argument("--platform", default="",
                   help="jax platform override (cpu recommended; the eval "
                        "is small and this frees the TPU)")
    p.add_argument("--out-json", default="")
    return p.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
