"""Occlusion-sweep protocol parity: reference qeval_mxnet chain vs ours,
same weights, same pairs, same RNG draws.

VERDICT r2 "missing #2/#3": the clean LFW protocol was pinned both-stacks
(tools/parity_lfw.py, delta 0.000000); this tool pins the OCCLUDED protocol
and the LightCNN-gray-128 chain the same way. For each case the reference's
own code is executed in place (`/root/reference` never copied):

  reference: eval/qeval_mxnet.py `ExtractFeature.start_extract` (the real
    class: CenterCrop -> [Grayscale] -> RandomBlock(lo,hi,fill) -> ToTensor
    -> [-1,1] -> batched torch forward, orig+flip sum, .npy cache) +
    `Verification.start_verification` (sklearn roc_curve acc + O(N^2)
    TAR@FAR loops) + eval/verification.py `calculate_roc` 10-fold accuracy
  ours: tools/import_torch transliteration -> nn/msml.py ->
    eval/occ_sweep._extract_occluded + evaluate + roc_acc_and_tarfar

Both sides see the SAME occlusion blocks: the reference uses the global
`np.random` stream (seeded), ours a `np.random.RandomState` with the same
seed — RandomBlock's draw sequence (ratio, [gauss noise], x, y; per image,
orig pass then flip pass) is draw-for-draw identical between the two
implementations, so the occluded pixels match bit-for-bit and any metric
delta isolates model/metric differences.

Environment shims (documented, not reference behavior changes):
  * torch has no CUDA here: `Tensor.cuda`/`Module.cuda` are patched to
    no-ops; `nn.DataParallel` with zero devices already falls through to
    the wrapped module.
  * torchvision is absent: a faithful stub of Compose/CenterCrop/Grayscale/
    ToTensor is installed (these are pixel-exact, fully-specified ops; the
    load-bearing reference code — ExtractFeature, RandomBlock, Verification,
    calculate_roc — runs unmodified).
  * mxnet / imutils are absent: stubbed at module level only (the code paths
    exercised never touch them, same trick as tools/parity_lfw.py).

Usage:
  python -m msml_tpu.tools.parity_occ [--synthetic 60] [--cases all]
  python -m msml_tpu.tools.parity_occ --model lightcnn
With the released checkpoint + real lfw.bin: --weight backbone.pth
--bin lfw.bin (see BASELINE.md runbook).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import types
from types import SimpleNamespace


# --------------------------------------------------------------- stubs

def _stub_module(name: str, is_package: bool = False) -> types.ModuleType:
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None,
                                                is_package=is_package)
    if is_package:
        m.__path__ = []
    return m


def install_stubs(ref_repo: str) -> None:
    """Install mxnet/imutils/RealOcc/torchvision stubs and package shims
    for the reference's __init__-less `datasets/` tree (idempotent).

    NOTE: the `datasets` name is hijacked for this process — the reference's
    `datasets/` directory is a namespace package that would otherwise lose
    to the installed HuggingFace `datasets`; parity runs in its own process
    so nothing else is affected."""
    try:
        import mxnet  # noqa: F401
    except ImportError:
        mx = _stub_module("mxnet", is_package=True)
        mx.ndarray = _stub_module("mxnet.ndarray")
        mx.recordio = _stub_module("mxnet.recordio")
        sys.modules.setdefault("mxnet", mx)
        sys.modules.setdefault("mxnet.ndarray", mx.ndarray)
        sys.modules.setdefault("mxnet.recordio", mx.recordio)

    # route `datasets.*` at the reference's directory tree (it has no
    # __init__.py files, and HF datasets shadows the namespace package)
    if "datasets" not in sys.modules or not getattr(
            sys.modules["datasets"], "_msml_parity_shim", False):
        for name, rel in (("datasets", "datasets"),
                          ("datasets.augment", "datasets/augment")):
            m = _stub_module(name, is_package=True)
            m.__path__ = [os.path.join(ref_repo, rel)]
            m._msml_parity_shim = True
            sys.modules[name] = m

    # rand_occ.py imports RealOcc whose utils need imutils/imgaug; we never
    # exercise RealOcc here, so pre-seed the module chain with a dummy
    if "eval.preprocess.RealOcc.image_infer" not in sys.modules:
        for name in ("eval", "eval.preprocess", "eval.preprocess.RealOcc"):
            sys.modules.setdefault(name, _stub_module(name, is_package=True))
        infer = _stub_module("eval.preprocess.RealOcc.image_infer")

        class _RealOccUnavailable:
            def __init__(self, *a, **k):
                raise RuntimeError("RealOcc stub: not exercised by parity")

        infer.RealOcc = _RealOccUnavailable
        sys.modules["eval.preprocess.RealOcc.image_infer"] = infer

    try:
        import easydict  # noqa: F401
    except ImportError:
        ed = _stub_module("easydict")

        class EasyDict(dict):
            """Minimal attr-dict with EasyDict's recursive wrapping."""

            def __init__(self, d=None, **kwargs):
                super().__init__()
                d = dict(d or {}, **kwargs)
                for k, v in d.items():
                    setattr(self, k, v)

            def __setattr__(self, name, value):
                if isinstance(value, dict) and not isinstance(value,
                                                              EasyDict):
                    value = EasyDict(value)
                elif isinstance(value, (list, tuple)):
                    value = type(value)(
                        EasyDict(v) if isinstance(v, dict) else v
                        for v in value)
                super().__setattr__(name, value)
                self[name] = value

            def __getattr__(self, name):
                try:
                    return self[name]
                except KeyError as e:
                    raise AttributeError(name) from e

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed

    try:
        import torchvision  # noqa: F401
    except ImportError:
        _install_torchvision_stub()


def _install_torchvision_stub() -> None:
    """Pixel-exact Compose/CenterCrop/Grayscale/ToTensor (the only
    torchvision ops qeval_mxnet.py uses)."""
    import numpy as np
    import torch

    tv = _stub_module("torchvision", is_package=True)
    tr = _stub_module("torchvision.transforms")

    class Compose:
        def __init__(self, transforms_list):
            self.transforms = list(transforms_list)

        def __call__(self, img):
            for t in self.transforms:
                img = t(img)
            return img

        def __repr__(self):
            return f"Compose({self.transforms})"

    class CenterCrop:
        def __init__(self, size):
            self.size = (int(size), int(size)) if isinstance(
                size, (int, float)) else tuple(int(s) for s in size)

        def __call__(self, img):
            th, tw = self.size
            w, h = img.size
            left = int(round((w - tw) / 2.0))
            top = int(round((h - th) / 2.0))
            return img.crop((left, top, left + tw, top + th))

    class Resize:
        """torchvision v1 tuple semantics (F_pil.resize): a (h, w) size
        always maps to img.resize((w, h), interpolation); default
        interpolation bilinear."""

        def __init__(self, size, interpolation=None):
            from PIL import Image as _Image
            self.size = (int(size), int(size)) if isinstance(
                size, (int, float)) else tuple(int(s) for s in size)
            self.interpolation = (interpolation if interpolation is not None
                                  else _Image.BILINEAR)

        def __call__(self, img):
            return img.resize(self.size[::-1], self.interpolation)

    class Grayscale:
        def __init__(self, num_output_channels: int = 1):
            self.num_output_channels = num_output_channels

        def __call__(self, img):
            out = img.convert("L")
            return out.convert("RGB") if self.num_output_channels == 3 \
                else out

    class ToTensor:
        def __call__(self, pic):
            a = np.array(pic, copy=True)
            if a.ndim == 2:
                a = a[:, :, None]
            t = torch.from_numpy(a.transpose(2, 0, 1)).contiguous()
            if t.dtype == torch.uint8:
                return t.to(torch.float32).div(255)
            return t.to(torch.float32)

    tr.Compose, tr.CenterCrop = Compose, CenterCrop
    tr.Grayscale, tr.ToTensor = Grayscale, ToTensor
    tr.Resize = Resize
    tr.transforms = tr  # `from torchvision.transforms import transforms`
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.transforms"] = tr


def patch_cuda_noop() -> None:
    """torch CPU-only: make .cuda() a no-op (DataParallel with zero GPUs
    already executes the wrapped module directly)."""
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def restore_numpy_aliases():
    """The reference targets numpy 1.x; restore the removed builtin
    aliases it uses (np.int etc.) — same values they had in 1.x. Shared
    by all the run-reference-in-place parity tools."""
    import numpy as np
    for alias, builtin in (("int", int), ("float", float), ("bool", bool),
                           ("object", object), ("str", str)):
        if not hasattr(np, alias):
            setattr(np, alias, builtin)


def import_ref_qeval(ref_repo: str):
    """Import eval/qeval_mxnet.py executed in place."""
    install_stubs(ref_repo)
    if ref_repo not in sys.path:
        sys.path.insert(0, ref_repo)
    patch_cuda_noop()
    restore_numpy_aliases()
    spec = importlib.util.spec_from_file_location(
        "ref_qeval_mxnet", os.path.join(ref_repo, "eval", "qeval_mxnet.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_ref_cfg(ref_repo: str, workdir: str, frb_type: str,
                  num_classes: int):
    """Run the reference's own config derivation (config.py executed in
    place) for an arc18/lightcnn weight-folder yaml."""
    import yaml
    if ref_repo not in sys.path:
        sys.path.insert(0, ref_repo)
    import config as ref_config  # the reference config.py

    user_yaml = {
        "dataset": "webface", "fp16": False, "batch_size": 64,
        "frb_type": frb_type, "osb_type": "unet", "use_osb": True,
        "fm_layers": [1, 1, 1, 1],
        "fm_params": [3, 2, "sigmoid", "mul"],
        "peer_params": {"use_ori": False, "use_conv": False,
                        "mask_trans": "conv", "use_decoder": False},
        "header_type": "AMArcFace",
        "header_params": [64.0, 0.48, 0.0, 0.0],
        "exp_id": 0, "output_prefix": "parity",
    }
    ypath = os.path.join(workdir, "config.yaml")
    with open(ypath, "w") as f:
        yaml.safe_dump(user_yaml, f)
    cfg = ref_config.load_yaml(ypath)
    cwd = os.getcwd()
    os.chdir(workdir)  # their config_exp mkdirs 'out' in CWD
    try:
        ref_config.config_init(cfg)
    finally:
        os.chdir(cwd)
    cfg.num_classes = num_classes  # synthetic-scale head
    return cfg


# ------------------------------------------------------- reference side

_REF_VER_CACHE: dict = {}


def _ref_verification(ref_repo: str):
    """Load the reference eval/verification.py once per repo (each load
    reads + execs the module; main() runs one case per protocol cell)."""
    if ref_repo not in _REF_VER_CACHE:
        from msml_tpu.tools.parity_lfw import _load_ref_verification
        _REF_VER_CACHE[ref_repo] = _load_ref_verification(ref_repo)
    return _REF_VER_CACHE[ref_repo]


def run_reference_case(qm, ref_cfg, weight_folder: str, imgs, issame,
                       lo: int, hi: int, fill: str, protocol: str,
                       seed: int, batch_size: int):
    """One (lo,hi,fill,protocol) case through the reference's own
    ExtractFeature + calculate_roc + Verification, executed in place."""
    import numpy as np
    import sklearn.preprocessing
    import torch
    from torchvision import transforms

    ref_ver = _ref_verification(os.path.dirname(
        os.path.dirname(qm.__file__)) if hasattr(qm, "__file__")
        else "/root/reference")

    h, w = ref_cfg.out_size[1], ref_cfg.out_size[0]
    transform = transforms.Compose([
        transforms.CenterCrop((h, w)),
        qm.RandomBlock(lo, hi, fill=fill),
        transforms.ToTensor()])
    task = {
        "img_root": "/tmp", "list_file": "", "save_path": weight_folder,
        "task_name": "parity", "model_name": "msml", "resume_path": "",
        "num_classes": ref_cfg.num_classes, "transform": transform,
        "weight_folder": weight_folder,
        "ground_truth_label": [0 if s else 1 for s in issame],
    }
    args_ns = SimpleNamespace(pre_trained=False, vis=False)

    np.random.seed(seed)
    torch.manual_seed(seed)
    ef = qm.ExtractFeature(task, cfg=ref_cfg, args=args_ns)
    # the reference hardcodes batch 25 (qeval_mxnet.py:327) and asserts
    # divisibility; honour the assert with our pair count via a local patch
    # of the attribute it reads
    feats = _start_extract_with_batch(ef, list(imgs), protocol, batch_size)

    normalized = sklearn.preprocessing.normalize(feats)
    thresholds = np.arange(0, 4, 0.01)
    _, _, accuracy = ref_ver.calculate_roc(
        thresholds, normalized[0::2], normalized[1::2],
        np.asarray(list(issame)), nrof_folds=10, pca=0)
    acc = float(np.mean(accuracy))

    vt = qm.Verification(task)
    roc_acc, tarfar = vt.start_verification()
    return feats, acc, float(roc_acc), np.asarray(tarfar)


def _start_extract_with_batch(ef, all_img, protocol: str, batch_size: int):
    """start_extract with its hardcoded batch 25 made divisor-safe: the
    reference asserts batch_size*total_step == num (qeval_mxnet.py:328);
    smaller parity runs need a dividing batch. The method body is executed
    unmodified — only the literal is adapted via a wrapper forward loop
    when 25 doesn't divide num."""
    num = len(all_img)
    if num % 25 == 0 and batch_size == 25:
        return ef.start_extract(all_img, protocol=protocol)
    # same chain, same order, adapted batch: tensor-ize via the reference's
    # own _load_one_input (occlusion draws happen here, in its order)
    import numpy as np
    import torch
    cfg = ef.cfg
    model = ef._load_model()
    features = np.zeros((num, cfg.dim_feature))
    features_flip = np.zeros((num, cfg.dim_feature))
    channel = 1 if cfg.is_gray else 3
    width, height = cfg.out_size
    all_input = torch.zeros(num, channel, height, width)
    for i in range(num):
        all_input[i] = ef._load_one_input(all_img[i], i, protocol=protocol)
    all_flip = torch.zeros(num, channel, height, width)
    for i in range(num):
        all_flip[i] = ef._load_one_input(all_img[i], i, flip=True,
                                         protocol=protocol)
    with torch.no_grad():
        if cfg.use_norm:
            all_input = all_input.sub_(0.5).div_(0.5)
            all_flip = all_flip.sub_(0.5).div_(0.5)
        for s in range(0, num, batch_size):
            out = model(all_input[s:s + batch_size])
            f = out[0] if isinstance(out, tuple) else out
            features[s:s + batch_size] = f.cpu().numpy()
        for s in range(0, num, batch_size):
            out = model(all_flip[s:s + batch_size])
            f = out[0] if isinstance(out, tuple) else out
            features_flip[s:s + batch_size] = f.cpu().numpy()
    features = features + features_flip
    save_file = os.path.join(ef.save_path, "{}_{}.npy".format(
        ef.task_name, ef.weight_folder.replace("/", "_")))
    np.save(save_file, features)
    return features


# ------------------------------------------------------------- our side

def build_our_model(state_dict, frb_type: str, num_classes: int):
    """Transliterate the torch state dict into our MSML."""
    import jax
    import jax.numpy as jnp

    from msml_tpu.core.config import Config, config_init
    from msml_tpu.core.precision import FULL_PRECISION
    from msml_tpu.nn.msml import msml_from_config
    from msml_tpu.tools.import_torch import (import_msml_checkpoint,
                                             merge_into)

    cfg = Config.from_dict({
        "dataset": "webface", "fp16": False, "batch_size": 4,
        "frb_type": frb_type, "osb_type": "unet", "use_osb": True,
        "fm_layers": [1, 1, 1, 1], "fm_params": [3, 2, "sigmoid", "mul"],
        "peer_params": {"use_ori": False, "use_conv": False,
                        "mask_trans": "conv", "use_decoder": False},
        "header_type": "AMArcFace", "header_params": [64.0, 0.48, 0.0, 0.0],
        "exp_id": 0, "output_prefix": "parity", "out_folder": "/tmp"})
    config_init(cfg, make_output_dir=False)
    cfg.num_classes = num_classes

    params_in, stats_in = import_msml_checkpoint(state_dict)
    model = msml_from_config(cfg, policy=FULL_PRECISION)
    rng = jax.random.PRNGKey(0)
    c = 1 if cfg.is_gray else 3
    x0 = jnp.zeros((1, cfg.out_size[1], cfg.out_size[0], c), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x0,
                           jnp.zeros((1,), jnp.int32), train=True)
    params = merge_into(jax.device_get(variables["params"]), params_in)
    stats = merge_into(jax.device_get(variables["batch_stats"]), stats_in)

    import jax as _jax

    @_jax.jit
    def fwd(img):
        feature, _ = model.apply({"params": params, "batch_stats": stats},
                                 img, train=False)
        return feature

    import numpy as np

    def extract_fn(img_np):
        return np.asarray(fwd(jnp.asarray(img_np, jnp.float32)))

    return extract_fn, cfg


def run_our_case(extract_fn, cfg, imgs, issame, lo: int, hi: int,
                 fill: str, protocol: str, seed: int, batch_size: int):
    import numpy as np

    from msml_tpu.data.rand_occ import RandomBlock
    from msml_tpu.eval import verification as ver
    from msml_tpu.eval.occ_sweep import (_extract_occluded,
                                         roc_acc_and_tarfar)
    from msml_tpu.eval.verification import l2_normalize_np

    rng = np.random.RandomState(seed)
    block = RandomBlock(lo, hi, fill=fill)
    feats = _extract_occluded(
        list(imgs), block, extract_fn, tuple(cfg.out_size), batch_size,
        bool(cfg.use_norm), bool(cfg.is_gray), rng, int(cfg.dim_feature),
        protocol)
    norm = l2_normalize_np(feats)
    _, _, accuracy, _, _, _ = ver.evaluate(norm, issame)
    acc = float(np.mean(accuracy))
    roc_acc, tarfar = roc_acc_and_tarfar(feats, issame)
    return feats, acc, float(roc_acc), np.asarray(tarfar)


def _tame_torch_scales(model) -> None:
    """Rescale _randomize_torch's N(0, 0.1) conv/linear weights to He scale
    so activations stay O(1) through 18+ layers — keeps the feature-level
    comparison within normal f32 accumulation error instead of the
    conditioning blow-up unscaled random nets produce (metric parity holds
    either way; this makes the reported feature deltas meaningful)."""
    import math

    import torch.nn as tnn
    for m in model.modules():
        if isinstance(m, (tnn.Conv2d, tnn.ConvTranspose2d, tnn.Linear)):
            w = m.weight
            fan_in = w.shape[1] * (w.shape[2] * w.shape[3]
                                   if w.dim() == 4 else 1)
            w.data.mul_(math.sqrt(2.0 / max(fan_in, 1)) / 0.1)


def check_block_alignment(qm, seed: int = 123) -> dict:
    """Bit-exactness of the occlusion pixels: reference RandomBlock (global
    np.random, seeded) vs ours (RandomState, same seed) on the same image.
    Any metric agreement downstream is only meaningful if this holds."""
    import numpy as np
    from PIL import Image

    from msml_tpu.data.rand_occ import RandomBlock as OurBlock

    out = {}
    base_rgb = Image.fromarray(
        np.random.RandomState(7).randint(0, 255, (112, 112, 3), np.uint8))
    base_l = base_rgb.convert("L")
    for fill in ("black", "white", "gauss"):
        for mode, base in (("RGB", base_rgb), ("L", base_l)):
            np.random.seed(seed)
            ref_imgs = [np.asarray(qm.RandomBlock(30, 31, fill=fill)(base))
                        for _ in range(5)]
            rng = np.random.RandomState(seed)
            our_imgs = [np.asarray(OurBlock(30, 31, fill=fill)(base, rng))
                        for _ in range(5)]
            out[f"{fill}_{mode}"] = bool(all(
                (r == o).all() for r, o in zip(ref_imgs, our_imgs)))
    return out


# ---------------------------------------------------------------- main

DEFAULT_CASES = [  # (lo, hi, fill, protocol)
    (0, 1, "black", "BB"),
    (30, 31, "black", "BB"),
    (30, 31, "white", "BB"),
    (30, 31, "gauss", "BB"),
    (30, 31, "black", "NB"),
    (50, 51, "gauss", "NB"),
    (70, 71, "black", "BB"),
]

LIGHTCNN_CASES = [
    (0, 1, "black", "BB"),
    (30, 31, "black", "BB"),
    (30, 31, "gauss", "BB"),
]


def main(args):
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import numpy as np
    import torch

    from msml_tpu.data.bin_loader import load_bin_pil
    from msml_tpu.tools.parity_lfw import (_randomize_torch,
                                           make_synthetic_bin)

    qm = import_ref_qeval(args.ref_repo)

    block_align = check_block_alignment(qm)
    print(json.dumps({"block_pixel_alignment": block_align}))
    if not all(block_align.values()):
        raise SystemExit("RandomBlock RNG draw sequences diverged — "
                         "metric parity below would be meaningless")

    frb_type = "lightcnn" if args.model == "lightcnn" else "iresnet18"
    os.makedirs(args.workdir, exist_ok=True)
    weight_folder = os.path.join(args.workdir, f"wf_{args.model}")
    os.makedirs(weight_folder, exist_ok=True)

    ref_cfg = build_ref_cfg(args.ref_repo, weight_folder, frb_type,
                            args.num_classes)

    # reference torch model built from the reference's own backbones pkg
    import backbones  # executed in place (ref_repo on sys.path)
    tmodel = backbones.MSML(
        frb_type=frb_type, osb_type="unet", fm_layers=(1, 1, 1, 1),
        header_type="AMArcFace", header_params=(64.0, 0.48, 0.0, 0.0),
        num_classes=args.num_classes, fp16=False, use_osb=True,
        fm_params=(3, 2, "sigmoid", "mul"),
        peer_params={"use_ori": False, "use_conv": False,
                     "mask_trans": "conv", "use_decoder": False})
    if args.weight:
        sd = torch.load(args.weight, map_location="cpu")
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        tmodel.load_state_dict(sd, strict=False)
        print(f"loaded {args.weight}")
    else:
        _randomize_torch(tmodel, seed=args.seed)
        _tame_torch_scales(tmodel)
    torch.save(tmodel.state_dict(), os.path.join(weight_folder,
                                                 "backbone.pth"))

    if args.bin:
        bin_path = args.bin
    else:
        bin_path = os.path.join(args.workdir, f"parity_{args.model}.bin")
        make_synthetic_bin(bin_path, args.synthetic,
                           size=int(ref_cfg.out_size[0]))
    imgs, issame = load_bin_pil(bin_path)

    sd_eval = {k: v for k, v in tmodel.state_dict().items()
               if not k.startswith("classification.")}
    extract_fn, our_cfg = build_our_model(sd_eval, frb_type,
                                          args.num_classes)
    # sanity: both configs must describe the same protocol constants
    assert tuple(our_cfg.out_size) == tuple(ref_cfg.out_size)
    assert bool(our_cfg.is_gray) == bool(ref_cfg.is_gray)
    assert bool(our_cfg.use_norm) == bool(ref_cfg.use_norm)

    cases = LIGHTCNN_CASES if args.model == "lightcnn" else DEFAULT_CASES
    if args.cases != "all":
        idx = [int(i) for i in args.cases.split(",")]
        cases = [cases[i] for i in idx]

    rows = []
    ok = True
    for ci, (lo, hi, fill, protocol) in enumerate(cases):
        seed = args.seed + 1000 + ci
        r_feats, r_acc, r_roc, r_tf = run_reference_case(
            qm, ref_cfg, weight_folder, imgs, issame, lo, hi, fill,
            protocol, seed, args.batch_size)
        o_feats, o_acc, o_roc, o_tf = run_our_case(
            extract_fn, our_cfg, imgs, issame, lo, hi, fill, protocol,
            seed, args.batch_size)
        feat_delta = float(np.max(np.abs(r_feats - o_feats)))
        rel = feat_delta / max(float(np.max(np.abs(r_feats))), 1e-9)
        tf_delta = float(np.max(np.abs(r_tf - o_tf)))
        # TAR@FAR counts positive pairs above a threshold picked on the
        # negatives, so on n_pos pairs it is quantized at 1/n_pos: a pair
        # whose score sits within f32 accumulation noise of the threshold
        # flips the metric by a full quantum in one stack but not the
        # other, even when accuracy/ROC deltas are exactly 0.  Allow up to
        # two quanta, but only when the features themselves agree to f32
        # tolerance — a real metric-chain divergence would not be gated on
        # feature agreement.
        quantum = 1.0 / max(int(np.sum(np.asarray(issame, bool))), 1)
        tf_ok = bool(tf_delta <= 1e-3
                     or (tf_delta <= 2.0 * quantum + 1e-6 and rel <= 5e-3))
        row = {
            "case": f"lo{lo}_{fill}_{protocol}",
            "max_feat_delta": feat_delta, "rel_feat_delta": rel,
            "acc_ref": round(r_acc, 6), "acc_ours": round(o_acc, 6),
            "acc_delta": round(abs(r_acc - o_acc), 6),
            "roc_acc_ref": round(r_roc, 6), "roc_acc_ours": round(o_roc, 6),
            "roc_acc_delta": round(abs(r_roc - o_roc), 6),
            "tarfar_max_delta": tf_delta, "tarfar_quantum": quantum,
        }
        row["pass"] = bool(row["acc_delta"] <= 1e-3
                           and row["roc_acc_delta"] <= 1e-3
                           and tf_ok)
        ok &= row["pass"]
        rows.append(row)
        print(json.dumps(row))

    result = {"model": args.model, "pairs": len(issame), "cases": rows,
              "block_pixel_alignment": block_align, "all_pass": bool(ok)}
    print(json.dumps({"model": args.model, "all_pass": bool(ok)}))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(result, f, indent=2)
    return result


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="occlusion-sweep / lightcnn both-stacks parity")
    p.add_argument("--ref-repo", default="/root/reference")
    p.add_argument("--model", default="arc18",
                   choices=["arc18", "lightcnn"])
    p.add_argument("--weight", default="",
                   help="reference backbone.pth (random weights if omitted)")
    p.add_argument("--bin", default="", help="real .bin (synthetic if "
                   "omitted)")
    p.add_argument("--synthetic", type=int, default=50,
                   help="pairs in the generated bin (50 pairs = 100 images "
                        "keeps the reference's hardcoded batch 25 dividing, "
                        "so start_extract runs verbatim)")
    p.add_argument("--num-classes", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=25)
    p.add_argument("--cases", default="all",
                   help="comma-separated case indices, or 'all'")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workdir", default="/tmp/msml_parity_occ")
    p.add_argument("--platform", default="",
                   help="jax platform override (cpu recommended)")
    p.add_argument("--out-json", default="")
    return p.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
