"""Transliterate reference PyTorch MSML checkpoints into msml_tpu params.

Maps the reference `backbone.pth` state dict (`utils/utils_callbacks.py:112`
saves `model.module.state_dict()` of `backbones/msml.py`) onto our flax
params/batch_stats trees:

  * conv weights:      (O, I, kh, kw) -> (kh, kw, I, O)
  * conv-transpose:    (I, O, kh, kw) -> (kh, kw, O, I)  (see nn/common.py)
  * BatchNorm:         weight/bias -> scale/bias; running_mean/var ->
                       batch_stats mean/var
  * PReLU:             weight -> alpha
  * final fc / lightcnn fc: torch flattens NCHW (c*H*W + h*W + w) while we
    flatten NHWC — rows are permuted accordingly (`iresnet.py:230`,
    `lightcnn.py:231`)
  * `features` BN1d: reference freezes scale at 1.0 (`iresnet.py:119-120`);
    our module has use_scale=False, so only bias/stats transfer (a warning is
    emitted if the checkpoint's scale deviates from 1).

Works with numpy-converted state dicts; torch is only needed to torch.load
the file (CPU build is available in this image).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _conv_w(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _deconv_w(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # (I,O,kh,kw)->(kh,kw,O,I)


def _fc_w(w, h, wd, c):
    """torch (out, c*h*w) -> ours (h*w*c, out) with row permutation."""
    w = np.asarray(w)
    out = w.shape[0]
    w = w.reshape(out, c, h, wd)            # (out, C, H, W)
    w = np.transpose(w, (2, 3, 1, 0))       # (H, W, C, out)
    return w.reshape(h * wd * c, out)


class _TreeBuilder:
    def __init__(self):
        self.params: Dict = {}
        self.batch_stats: Dict = {}

    def set(self, tree: Dict, path: Tuple[str, ...], value):
        d = tree
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = np.asarray(value, np.float32)

    def conv(self, path, w, b=None):
        self.set(self.params, path + ("kernel",), _conv_w(w))
        if b is not None:
            self.set(self.params, path + ("bias",), b)

    def deconv(self, path, w, b=None):
        self.set(self.params, path + ("kernel",), _deconv_w(w))
        if b is not None:
            self.set(self.params, path + ("bias",), b)

    def bn(self, path, sd, prefix, use_scale=True):
        if use_scale:
            self.set(self.params, path + ("scale",), sd[prefix + ".weight"])
        self.set(self.params, path + ("bias",), sd[prefix + ".bias"])
        self.set(self.batch_stats, path + ("mean",),
                 sd[prefix + ".running_mean"])
        self.set(self.batch_stats, path + ("var",),
                 sd[prefix + ".running_var"])

    def prelu(self, path, w):
        self.set(self.params, path + ("alpha",), np.asarray(w).reshape(-1))

    def dense(self, path, w, b=None):
        self.set(self.params, path + ("kernel",), np.asarray(w).T)
        if b is not None:
            self.set(self.params, path + ("bias",), b)


def _import_ibasic_stage(b: _TreeBuilder, sd, src: str, dst: Tuple[str, ...],
                         blocks: int):
    """layerN of iresnet/unet encoder -> ResStage blocks."""
    for i in range(blocks):
        s = f"{src}.{i}"
        d = dst + (f"block{i}",)
        b.bn(d + ("bn1",), sd, f"{s}.bn1")
        b.conv(d + ("conv1",), sd[f"{s}.conv1.weight"])
        b.bn(d + ("bn2",), sd, f"{s}.bn2")
        b.prelu(d + ("prelu",), sd[f"{s}.prelu.weight"])
        b.conv(d + ("conv2",), sd[f"{s}.conv2.weight"])
        b.bn(d + ("bn3",), sd, f"{s}.bn3")
        if f"{s}.downsample.0.weight" in sd:
            b.conv(d + ("downsample_conv",), sd[f"{s}.downsample.0.weight"])
            b.bn(d + ("downsample_bn",), sd, f"{s}.downsample.1")


def _count_blocks(sd, prefix: str) -> int:
    idx = set()
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.")
    for k in sd:
        m = pat.match(k)
        if m:
            idx.add(int(m.group(1)))
    return (max(idx) + 1) if idx else 0


def import_iresnet_trunk(b: _TreeBuilder, sd, src_prefix: str,
                         dst: Tuple[str, ...], dim_feature: int = 512,
                         use_scale_features: bool = False):
    """IResNet / IResNetVanilla (iresnet.py:70-363)."""
    p = (src_prefix + ".") if src_prefix else ""
    b.conv(dst + ("conv1",), sd[p + "conv1.weight"])
    b.bn(dst + ("bn1",), sd, p + "bn1")
    b.prelu(dst + ("prelu",), sd[p + "prelu.weight"])
    for li in range(1, 5):
        _import_ibasic_stage(b, sd, f"{p}layer{li}", dst + (f"layer{li}",),
                             _count_blocks(sd, f"{p}layer{li}"))
    b.bn(dst + ("bn2",), sd, p + "bn2")
    b.dense(dst + ("fc",), _fc_w(sd[p + "fc.weight"], 7, 7, 512).T,
            sd[p + "fc.bias"])
    # features BN1d: scale frozen at 1.0 in the reference
    w = np.asarray(sd[p + "features.weight"])
    if not np.allclose(w, 1.0, atol=1e-5):
        import warnings
        warnings.warn("features BN scale != 1.0 in checkpoint; "
                      "our head has use_scale=False — accuracy may differ")
    b.set(b.params, dst + ("features", "bias"), sd[p + "features.bias"])
    b.set(b.batch_stats, dst + ("features", "mean"),
          sd[p + "features.running_mean"])
    b.set(b.batch_stats, dst + ("features", "var"),
          sd[p + "features.running_var"])


def _import_fm(b: _TreeBuilder, sd, src: str, dst: Tuple[str, ...]):
    """FMCnn (fmoperator.py:84-311)."""
    if f"{src}.same_conv.weight" not in sd:
        return  # FMNone
    b.conv(dst + ("same_conv",), sd[f"{src}.same_conv.weight"])
    n_res = _count_blocks(sd, f"{src}.res_block")
    for i in range(n_res):
        s = f"{src}.res_block.{i}"
        d = dst + (f"res{i}",)
        for ci in (1, 2, 3):
            b.conv(d + (f"conv{ci}",), sd[f"{s}.conv{ci}.weight"])
            b.bn(d + (f"bn{ci}",), sd, f"{s}.bn{ci}")
            b.prelu(d + (f"prelu{ci}",), sd[f"{s}.prelu{ci}.weight"])
    if f"{src}.conv_m.0.weight" in sd:
        b.conv(dst + ("conv_m",), sd[f"{src}.conv_m.0.weight"],
               sd[f"{src}.conv_m.0.bias"])
        b.bn(dst + ("conv_m_bn",), sd, f"{src}.conv_m.1")
    for tower in ("conv1", "conv2"):
        if f"{src}.{tower}.0.weight" in sd:
            d = dst + (tower,)
            for j, base in enumerate((0, 3)):
                b.conv(d + (f"conv{j}",), sd[f"{src}.{tower}.{base}.weight"],
                       sd[f"{src}.{tower}.{base}.bias"])
                b.bn(d + (f"bn{j}",), sd, f"{src}.{tower}.{base + 1}")
                b.prelu(d + (f"prelu{j}",),
                        sd[f"{src}.{tower}.{base + 2}.weight"])


def _import_unet(b: _TreeBuilder, sd, src: str, dst: Tuple[str, ...]):
    """Unet (unet.py:94-240)."""
    p = f"{src}."
    b.conv(dst + ("conv1",), sd[p + "conv1.weight"])
    b.bn(dst + ("bn1",), sd, p + "bn1")
    b.prelu(dst + ("prelu",), sd[p + "prelu.weight"])
    for li in range(1, 5):
        _import_ibasic_stage(b, sd, f"{p}layer{li}", dst + (f"layer{li}",),
                             _count_blocks(sd, f"{p}layer{li}"))
    b.bn(dst + ("bn2",), sd, p + "bn2")
    for gi in range(1, 6):
        for leg in ("l1", "l2", "r1", "r2"):
            b.conv(dst + (f"gcm{gi}", f"conv_{leg}"),
                   sd[f"{p}gcm{gi}.conv_{leg}.weight"],
                   sd[f"{p}gcm{gi}.conv_{leg}.bias"])
    for di in range(1, 6):
        b.deconv(dst + (f"deconv{di}",), sd[f"{p}deconv{di}.weight"])


def import_msml_checkpoint(state_dict, num_res: int = 2):
    """Full reference MSML state dict -> (params, batch_stats) trees.

    state_dict: mapping name -> numpy array (torch tensors accepted).
    """
    sd = {k: np.asarray(v if not hasattr(v, "numpy") else v.detach().numpy())
          for k, v in state_dict.items()}
    b = _TreeBuilder()

    if "frb.conv1.weight" in sd:  # iresnet FRB
        import_iresnet_trunk(b, sd, "frb", ("frb",))
    elif "frb.conv1.filter.weight" in sd:
        _import_lightcnn(b, sd, "frb", ("frb",))

    for i in range(4):
        _import_fm(b, sd, f"frb.fm_ops.{i}", (f"fm_op{i}",))

    if "frb.peer.conv1.weight" in sd:
        import_iresnet_trunk(b, sd, "frb.peer", ("peer",))
    elif "frb.peer.conv1.filter.weight" in sd:
        _import_lightcnn(b, sd, "frb.peer", ("peer",))

    if "osb.conv1.weight" in sd:
        _import_unet(b, sd, "osb", ("osb",))

    if "classification.weight" in sd:
        b.set(b.params, ("classification", "weight"),
              sd["classification.weight"])
        if "classification.bias" in sd:
            b.set(b.params, ("classification", "bias"),
                  sd["classification.bias"])
    return b.params, b.batch_stats


def _import_lightcnn(b: _TreeBuilder, sd, src: str, dst: Tuple[str, ...]):
    """network_29layers_v2 (lightcnn.py:145-237). Our stage naming:
    stage1/2 wrap (blockN..., groupN); stage3/4 are flat."""
    p = f"{src}."

    def mfm(dpath, spath):
        b.conv(dpath + ("filter",), sd[f"{spath}.filter.weight"],
               sd[f"{spath}.filter.bias"])

    mfm(dst + ("conv1",), p + "conv1")
    for si, (blk, grp) in enumerate((("block1", "group1"),
                                     ("block2", "group2")), start=1):
        n = _count_blocks(sd, p + blk)
        for i in range(n):
            for ci in (1, 2):
                mfm(dst + (f"stage{si}", f"block{i}", f"conv{ci}"),
                    f"{p}{blk}.{i}.conv{ci}")
        mfm(dst + (f"stage{si}", "group", "conv_a"), f"{p}{grp}.conv_a")
        mfm(dst + (f"stage{si}", "group", "conv"), f"{p}{grp}.conv")
    for i in range(_count_blocks(sd, p + "block3")):
        for ci in (1, 2):
            mfm(dst + (f"stage3_block{i}", f"conv{ci}"),
                f"{p}block3.{i}.conv{ci}")
    mfm(dst + ("group3", "conv_a"), p + "group3.conv_a")
    mfm(dst + ("group3", "conv"), p + "group3.conv")
    for i in range(_count_blocks(sd, p + "block4")):
        for ci in (1, 2):
            mfm(dst + (f"stage4_block{i}", f"conv{ci}"),
                f"{p}block4.{i}.conv{ci}")
    mfm(dst + ("group4", "conv_a"), p + "group4.conv_a")
    mfm(dst + ("group4", "conv"), p + "group4.conv")
    b.dense(dst + ("fc",), _fc_w(sd[p + "fc.weight"], 8, 8, 128).T,
            sd[p + "fc.bias"])


def import_sphere(state_dict, layers=(1, 2, 4, 1)):
    """cosface2018 sphere trunk (`backbones/frb/cosface2018.py:19-73`):
    layerN = Sequential(conv, prelu, Block(conv1, prelu1, conv2, prelu2)*k)
    -> nn/baselines.Sphere params tree."""
    sd = {k: np.asarray(v if not hasattr(v, "numpy") else v.detach().numpy())
          for k, v in state_dict.items()}
    b = _TreeBuilder()
    for li in range(1, 5):
        b.conv((f"layer{li}_conv",), sd[f"layer{li}.0.weight"],
               sd.get(f"layer{li}.0.bias"))
        b.prelu((f"layer{li}_prelu",), sd[f"layer{li}.1.weight"])
        for bi in range(layers[li - 1]):
            s = f"layer{li}.{2 + bi}"
            d = (f"layer{li}_block{bi}",)
            for ci in (1, 2):
                b.conv(d + (f"conv{ci}",), sd[f"{s}.conv{ci}.weight"])
                b.prelu(d + (f"prelu{ci}",), sd[f"{s}.prelu{ci}.weight"])
    # fc over NCHW-flat (512, 7, 6) for the (112, 96) input
    b.dense(("fc",), _fc_w(sd["fc.weight"], 7, 6, 512).T, sd["fc.bias"])
    return b.params, b.batch_stats


def _flat_perm(h: int, w: int, c: int) -> np.ndarray:
    """Permutation p such that vec_hwc = vec_chw[p] (for BN1d params that act
    on an NCHW-flattened vector in torch but an NHWC-flattened one here)."""
    idx = np.arange(c * h * w).reshape(c, h, w)      # chw positions
    return np.transpose(idx, (1, 2, 0)).reshape(-1)  # hwc order


def import_from2021(state_dict, layers=(3, 4, 14, 3)):
    """FROM (TPAMI'21) LResNet50E_IR_Occ checkpoint
    (`backbones/third_party/from2021.py:291-373,412-428`,
    model_p5_w1_9938_9470_6503.pth.tar) -> nn/from2021.From2021 trees
    (everything under the 'model' submodule)."""
    sd = {k: np.asarray(v if not hasattr(v, "numpy") else v.detach().numpy())
          for k, v in state_dict.items()}
    b = _TreeBuilder()
    root = ("model",)

    b.conv(root + ("conv1",), sd["conv1.weight"])
    b.bn(root + ("bn1",), sd, "bn1")
    b.prelu(root + ("prelu1",), sd["prelu1.weight"])
    for li in range(1, 5):
        for bi in range(layers[li - 1]):
            s = f"layer{li}.{bi}"
            d = root + (f"layer{li}_block{bi}",)
            b.bn(d + ("bn1",), sd, f"{s}.bn1")
            b.conv(d + ("conv1",), sd[f"{s}.conv1.weight"])
            b.bn(d + ("bn2",), sd, f"{s}.bn2")
            b.prelu(d + ("prelu",), sd[f"{s}.prelu1.weight"])
            b.conv(d + ("conv2",), sd[f"{s}.conv2.weight"])
            b.bn(d + ("bn3",), sd, f"{s}.bn3")
            if f"{s}.downsample.0.weight" in sd:
                b.conv(d + ("downsample_conv",),
                       sd[f"{s}.downsample.0.weight"])
                b.bn(d + ("downsample_bn",), sd, f"{s}.downsample.1")

    for leg in ("P5_1", "P5_2", "P4_1", "P4_2", "P3_1", "P3_2", "P6", "P7_2"):
        b.conv(root + ("fpn", leg), sd[f"fpn.{leg}.weight"],
               sd.get(f"fpn.{leg}.bias"))

    # mask head: Sequential(conv, prelu, bn, conv, sigmoid)
    b.conv(root + ("mask_conv0",), sd["mask.0.weight"])
    b.prelu(root + ("mask_prelu0",), sd["mask.1.weight"])
    b.bn(root + ("mask_bn0",), sd, "mask.2")
    b.conv(root + ("mask_conv1",), sd["mask.3.weight"])

    # BN1d-over-flattened heads need the chw->hwc permutation
    perm = _flat_perm(7, 6, 512)

    def bn1d_flat(dst, prefix):
        b.set(b.params, dst + ("scale",), sd[prefix + ".weight"][perm])
        b.set(b.params, dst + ("bias",), sd[prefix + ".bias"][perm])
        b.set(b.batch_stats, dst + ("mean",),
              sd[prefix + ".running_mean"][perm])
        b.set(b.batch_stats, dst + ("var",),
              sd[prefix + ".running_var"][perm])

    # regress: Sequential(bn1d, dropout, linear(no bias), bn1d)
    bn1d_flat(root + ("regress_bn0",), "regress.0")
    b.set(b.params, root + ("regress_fc", "kernel"),
          np.asarray(sd["regress.2.weight"]).T[perm, :])
    b.bn(root + ("regress_bn1",), sd, "regress.3")

    # fc: Sequential(bn1d, dropout, linear, bn1d)
    bn1d_flat(root + ("fc_bn0",), "fc.0")
    b.set(b.params, root + ("fc_fc", "kernel"),
          np.asarray(sd["fc.2.weight"]).T[perm, :])
    b.set(b.params, root + ("fc_fc", "bias"), sd["fc.2.bias"])
    b.bn(root + ("fc_bn1",), sd, "fc.3")
    return b.params, b.batch_stats


def merge_into(template: dict, imported: dict, path=()) -> dict:
    """Overlay imported leaves onto a template tree (keeps template leaves
    that the checkpoint doesn't cover), with shape checking."""
    out = {}
    for k, tv in template.items():
        if k in imported:
            iv = imported[k]
            if isinstance(tv, dict):
                out[k] = merge_into(tv, iv, path + (k,))
            else:
                if tuple(np.shape(iv)) != tuple(np.shape(tv)):
                    raise ValueError(
                        f"shape mismatch at {'/'.join(path + (k,))}: "
                        f"ckpt {np.shape(iv)} vs model {np.shape(tv)}")
                out[k] = np.asarray(iv, np.float32)
        else:
            out[k] = tv
    return out
