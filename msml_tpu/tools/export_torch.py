"""Export an msml_tpu checkpoint to the reference `backbone.pth` format.

The inverse of `tools/import_torch.py`: walks our (params, batch_stats)
trees and emits a torch state dict with the reference's exact naming
(`backbones/msml.py` / `backbones/frb/iresnet.py` / `backbones/osb/unet.py`
/ `backbones/fm/fmoperator.py` module attributes), so a model trained here
can be evaluated — or resumed — by the original PyTorch stack
(`test.py --weight_folder`, `qeval_mxnet.py:140-153` load path).

Layout inverses:
  conv   (kh, kw, I, O) -> (O, I, kh, kw)
  deconv (kh, kw, O, I) -> (I, O, kh, kw)
  dense  (in, out)      -> (out, in)
  frb.fc (7*7*512 flat) -> torch (out, C*H*W) row order via the same
                           permutation `_fc_w` inverts
  BN     scale/bias/mean/var -> weight/bias/running_mean/running_var
                                (+ num_batches_tracked = 0)
  features BN1d          -> weight = ones (the reference freezes it at 1.0,
                            iresnet.py:119-120)

Usage:
  python -m msml_tpu.tools.export_torch --weight_folder out/arc18_1 \
      --out backbone.pth
Roundtrip correctness is pinned in tests/test_export_torch.py (export ->
import_msml_checkpoint identity, and a strict torch load + forward-parity
check against the torch oracle architecture).
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np


def _conv_w(k):
    return np.transpose(np.asarray(k), (3, 2, 0, 1))  # HWIO -> OIHW


def _deconv_w(k):
    return np.transpose(np.asarray(k), (3, 2, 0, 1))  # (kh,kw,O,I)->(I,O,..)


def _dense_w(k):
    return np.asarray(k).T


def _fc_w_inv(k, h=7, wd=7, c=512):
    """ours (h*w*c, out) -> torch (out, c*h*w)."""
    k = np.asarray(k)
    out = k.shape[1]
    k = k.reshape(h, wd, c, out)
    k = np.transpose(k, (3, 2, 0, 1))  # (out, C, H, W)
    return k.reshape(out, c * h * wd)


class _Emitter:
    def __init__(self, params: Dict, batch_stats: Dict):
        self.p = params
        self.s = batch_stats
        self.out: Dict[str, np.ndarray] = {}

    @staticmethod
    def _get(tree, path):
        d = tree
        for k in path:
            d = d[k]
        return np.asarray(d)

    def has(self, *path) -> bool:
        d = self.p
        for k in path:
            if not isinstance(d, dict) or k not in d:
                return False
            d = d[k]
        return True

    def conv(self, dst: str, path: Tuple[str, ...], bias: bool = False):
        self.out[dst + ".weight"] = _conv_w(self._get(self.p,
                                                      path + ("kernel",)))
        if bias:
            self.out[dst + ".bias"] = self._get(self.p, path + ("bias",))

    def deconv(self, dst: str, path: Tuple[str, ...]):
        self.out[dst + ".weight"] = _deconv_w(self._get(self.p,
                                                        path + ("kernel",)))

    def bn(self, dst: str, path: Tuple[str, ...], use_scale: bool = True):
        mean = self._get(self.s, path + ("mean",))
        self.out[dst + ".weight"] = (self._get(self.p, path + ("scale",))
                                     if use_scale
                                     else np.ones_like(mean))
        self.out[dst + ".bias"] = self._get(self.p, path + ("bias",))
        self.out[dst + ".running_mean"] = mean
        self.out[dst + ".running_var"] = self._get(self.s, path + ("var",))
        self.out[dst + ".num_batches_tracked"] = np.asarray(0, np.int64)

    def prelu(self, dst: str, path: Tuple[str, ...]):
        self.out[dst + ".weight"] = self._get(self.p, path + ("alpha",))

    def dense(self, dst: str, path: Tuple[str, ...], bias: bool = True):
        self.out[dst + ".weight"] = _dense_w(self._get(self.p,
                                                       path + ("kernel",)))
        if bias:
            self.out[dst + ".bias"] = self._get(self.p, path + ("bias",))


def _export_stage(e: _Emitter, dst: str, path: Tuple[str, ...]):
    i = 0
    while e.has(*path, f"block{i}"):
        d = f"{dst}.{i}"
        p = path + (f"block{i}",)
        e.bn(d + ".bn1", p + ("bn1",))
        e.conv(d + ".conv1", p + ("conv1",))
        e.bn(d + ".bn2", p + ("bn2",))
        e.prelu(d + ".prelu", p + ("prelu",))
        e.conv(d + ".conv2", p + ("conv2",))
        e.bn(d + ".bn3", p + ("bn3",))
        if e.has(*p, "downsample_conv"):
            e.conv(d + ".downsample.0", p + ("downsample_conv",))
            e.bn(d + ".downsample.1", p + ("downsample_bn",))
        i += 1


def _export_iresnet_trunk(e: _Emitter, dst: str, path: Tuple[str, ...]):
    e.conv(dst + ".conv1", path + ("conv1",))
    e.bn(dst + ".bn1", path + ("bn1",))
    e.prelu(dst + ".prelu", path + ("prelu",))
    for li in range(1, 5):
        _export_stage(e, f"{dst}.layer{li}", path + (f"layer{li}",))
    e.bn(dst + ".bn2", path + ("bn2",))
    fc = e._get(e.p, path + ("fc", "kernel"))
    e.out[dst + ".fc.weight"] = _fc_w_inv(fc)
    e.out[dst + ".fc.bias"] = e._get(e.p, path + ("fc", "bias"))
    # features BN1d: frozen unit scale (iresnet.py:119-120)
    bias = e._get(e.p, path + ("features", "bias"))
    e.out[dst + ".features.weight"] = np.ones_like(bias)
    e.out[dst + ".features.bias"] = bias
    e.out[dst + ".features.running_mean"] = e._get(
        e.s, path + ("features", "mean"))
    e.out[dst + ".features.running_var"] = e._get(
        e.s, path + ("features", "var"))
    e.out[dst + ".features.num_batches_tracked"] = np.asarray(0, np.int64)


def _export_fm(e: _Emitter, dst: str, path: Tuple[str, ...]):
    if not e.has(*path, "same_conv"):
        return  # FMNone: no parameters either side
    e.conv(dst + ".same_conv", path + ("same_conv",))
    i = 0
    while e.has(*path, f"res{i}"):
        d = f"{dst}.res_block.{i}"
        p = path + (f"res{i}",)
        for ci in (1, 2, 3):
            e.conv(f"{d}.conv{ci}", p + (f"conv{ci}",))
            e.bn(f"{d}.bn{ci}", p + (f"bn{ci}",))
            e.prelu(f"{d}.prelu{ci}", p + (f"prelu{ci}",))
        i += 1
    if e.has(*path, "conv_m"):
        e.conv(dst + ".conv_m.0", path + ("conv_m",), bias=True)
        e.bn(dst + ".conv_m.1", path + ("conv_m_bn",))
    for tower in ("conv1", "conv2"):
        if e.has(*path, tower):
            for j, base in enumerate((0, 3)):
                e.conv(f"{dst}.{tower}.{base}", path + (tower, f"conv{j}"),
                       bias=True)
                e.bn(f"{dst}.{tower}.{base + 1}", path + (tower, f"bn{j}"))
                e.prelu(f"{dst}.{tower}.{base + 2}",
                        path + (tower, f"prelu{j}"))


def _export_unet(e: _Emitter, dst: str, path: Tuple[str, ...]):
    e.conv(dst + ".conv1", path + ("conv1",))
    e.bn(dst + ".bn1", path + ("bn1",))
    e.prelu(dst + ".prelu", path + ("prelu",))
    for li in range(1, 5):
        _export_stage(e, f"{dst}.layer{li}", path + (f"layer{li}",))
    e.bn(dst + ".bn2", path + ("bn2",))
    for gi in range(1, 6):
        for leg in ("l1", "l2", "r1", "r2"):
            e.conv(f"{dst}.gcm{gi}.conv_{leg}",
                   path + (f"gcm{gi}", f"conv_{leg}"), bias=True)
    for di in range(1, 6):
        e.deconv(f"{dst}.deconv{di}", path + (f"deconv{di}",))


def _export_lightcnn(e: _Emitter, dst: str, path: Tuple[str, ...]):
    """Inverse of import_torch._import_lightcnn (lightcnn.py:145-237)."""

    def mfm(d, p):
        e.conv(d + ".filter", p + ("filter",), bias=True)

    mfm(dst + ".conv1", path + ("conv1",))
    for si, (blk, grp) in enumerate((("block1", "group1"),
                                     ("block2", "group2")), start=1):
        i = 0
        while e.has(*path, f"stage{si}", f"block{i}"):
            for ci in (1, 2):
                mfm(f"{dst}.{blk}.{i}.conv{ci}",
                    path + (f"stage{si}", f"block{i}", f"conv{ci}"))
            i += 1
        mfm(f"{dst}.{grp}.conv_a", path + (f"stage{si}", "group", "conv_a"))
        mfm(f"{dst}.{grp}.conv", path + (f"stage{si}", "group", "conv"))
    i = 0
    while e.has(*path, f"stage3_block{i}"):
        for ci in (1, 2):
            mfm(f"{dst}.block3.{i}.conv{ci}",
                path + (f"stage3_block{i}", f"conv{ci}"))
        i += 1
    mfm(dst + ".group3.conv_a", path + ("group3", "conv_a"))
    mfm(dst + ".group3.conv", path + ("group3", "conv"))
    i = 0
    while e.has(*path, f"stage4_block{i}"):
        for ci in (1, 2):
            mfm(f"{dst}.block4.{i}.conv{ci}",
                path + (f"stage4_block{i}", f"conv{ci}"))
        i += 1
    mfm(dst + ".group4.conv_a", path + ("group4", "conv_a"))
    mfm(dst + ".group4.conv", path + ("group4", "conv"))
    fc = e._get(e.p, path + ("fc", "kernel"))
    e.out[dst + ".fc.weight"] = _fc_w_inv(fc, 8, 8, 128)
    e.out[dst + ".fc.bias"] = e._get(e.p, path + ("fc", "bias"))


def export_msml_state_dict(params: Dict, batch_stats: Dict) -> Dict:
    """(params, batch_stats) trees -> reference-named numpy state dict."""
    e = _Emitter(params, batch_stats)
    if e.has("frb", "conv1", "kernel"):
        _export_iresnet_trunk(e, "frb", ("frb",))
    elif e.has("frb", "conv1", "filter"):
        _export_lightcnn(e, "frb", ("frb",))
    else:
        raise NotImplementedError("unrecognised FRB parameter layout")
    if e.has("frb", "decoder"):
        raise NotImplementedError(
            "decoder export not implemented (the recover decoder is "
            "loss-inert in the reference and unused at eval)")
    for i in range(4):
        _export_fm(e, f"frb.fm_ops.{i}", (f"fm_op{i}",))
    if e.has("peer"):
        if e.has("peer", "conv1", "kernel"):
            _export_iresnet_trunk(e, "frb.peer", ("peer",))
        else:
            _export_lightcnn(e, "frb.peer", ("peer",))
    if e.has("osb"):
        _export_unet(e, "osb", ("osb",))
    if e.has("classification"):
        e.out["classification.weight"] = e._get(
            e.p, ("classification", "weight"))
        if e.has("classification", "bias"):
            e.out["classification.bias"] = e._get(
                e.p, ("classification", "bias"))
    return e.out


def main(args):
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import torch

    from msml_tpu.core.weight_folder import load_weight_folder

    _, _, restored, _, _ = load_weight_folder(args.weight_folder)
    params = jax.device_get(restored.params)
    stats = jax.device_get(restored.batch_stats)
    sd = export_msml_state_dict(params, stats)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(
        np.asarray(v, np.float32) if v.dtype != np.int64 else v).copy())
        for k, v in sd.items()}, args.out)
    print(f"wrote {len(sd)} tensors -> {args.out}")


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="export msml_tpu checkpoint to reference backbone.pth")
    p.add_argument("--weight_folder", required=True)
    p.add_argument("--out", default="backbone.pth")
    p.add_argument("--platform", default="cpu")
    return p.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
