"""MSML composite model: OSB -> FM operators -> FRB -> margin header.

Parity target: `backbones/msml.py:15-174`:
  * shape negotiation per FRB/OSB type (`_prepare_shapes`, msml.py:47-67)
  * FM operator construction from `fm_layers` 0/1 flags (msml.py:69-89)
  * OSB output ordering: osb returns [seg0..seg3, seg5] small->big; reversed,
    final_seg = seg5 (consensus-loss target), segs = [seg3, seg2, seg1, seg0]
    big->small feeding FM stages 1..4 (msml.py:150-158)
  * training forward returns (final_cls, final_seg, kd) where
    final_cls = header(feature) + kd — the reference adds the scalar KD loss
    to every logit (msml.py:171). NOTE this makes softmax-CE *invariant* to
    the KD term (constant logit shift), i.e. KD has no gradient effect in the
    shipped reference; we reproduce that default and additionally expose the
    KD scalar so the train step can weight it as a real loss (kd_mode='loss').
  * eval forward returns (feature, final_seg) (msml.py:173-174)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from msml_tpu.core.precision import Policy, DEFAULT_POLICY
from msml_tpu.heads.margin import MarginHead, SoftmaxHead
from msml_tpu.nn.fm import FMCnn, FMNone
from msml_tpu.nn.iresnet import IRESNET_LAYERS, IResNet, PeerIResNet
from msml_tpu.nn.lightcnn import LightCNN29v2, PeerLightCNN
from msml_tpu.nn.unet import Unet

FRB_TYPES = ("lightcnn", "iresnet18", "iresnet34", "iresnet50", "iresnet100")
OSB_TYPES = ("unet",)
HEAD_TYPES = ("Softmax", "AMArcFace", "AMCosFace")


def frb_shapes(frb_type: str):
    """`msml.py:47-67`: (input_size, gray, heights, f_channels, dim_feature)."""
    if "lightcnn" in frb_type:
        return 128, True, (64, 32, 16, 8), (48, 96, 192, 128), 256
    if "iresnet" in frb_type:
        return 112, False, (56, 28, 14, 7), (64, 128, 256, 512), 512
    raise ValueError("FRB type error")


class MSML(nn.Module):
    frb_type: str = "iresnet18"
    osb_type: str = "unet"
    fm_layers: Sequence[int] = (1, 1, 1, 1)
    num_classes: int = 93431
    fm_params: Sequence = (3, 2, "tanh", "add")   # (S, N, act, arith)
    header_type: str = "Softmax"
    header_params: Sequence[float] = (64.0, 0.5, 0.0, 0.0)  # (s, m, a, k)
    dropout: float = 0.0
    use_osb: bool = True
    # peer_params (`config.yaml:22-26`)
    use_ori: bool = False
    use_conv: bool = False
    mask_trans: str = "conv"
    use_decoder: bool = False
    decoder_loss_weight: float = 0.0
    # when True the classification head lives outside (PartialFC in the
    # train step); training forward then returns (feature, final_seg, kd).
    external_header: bool = False
    # True = remat everything; a sequence of FRB stage numbers (e.g. (3, 4))
    # remats only those FRB stages (OSB stays un-rematted then)
    remat: object = False
    remat_fm: bool = False
    width_mult: object = 1  # FRB channel-width multiplier — int or 4-list
    #                      per stage (iresnet only; a documented non-parity
    #                      capacity knob — nn/iresnet.py, PERF.md "width
    #                      dividend")
    kd_metric: bool = True  # False: skip the KD-metric-only conv2 tower
    #                         (legal when kd_loss_weight == 0; see nn/fm.py)
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        assert len(self.fm_layers) == 4
        if not self.use_osb and any(self.fm_layers):
            raise ValueError(
                "fm_layers requires use_osb=True (FM operators consume OSB "
                "segmentation features; the reference crashes on this "
                "combination too, fmoperator.py:285)")
        input_size, gray, heights, f_channels, dim_feature = frb_shapes(
            self.frb_type)
        self.input_size, self.gray = input_size, gray
        self.dim_feature = dim_feature

        from msml_tpu.nn.iresnet import stage_width_mults
        wm = self.width_mult
        wms = stage_width_mults(wm)
        if any(w != 1 for w in wms):
            if "lightcnn" in self.frb_type:
                raise ValueError("width_mult != 1 is an iresnet-FRB knob")
            f_channels = tuple(c * w for c, w in zip(f_channels, wms))

        kernel_size, num_res, act, arith = self.fm_params
        # remat_fm: rematerialize only the FM operators in the backward —
        # their elementwise/BN chains dominate saved activations while their
        # recompute is cheap (PERF.md)
        fm_cls = FMCnn
        if self.remat_fm:
            fm_cls = nn.remat(FMCnn, static_argnums=(4,))
        fm_ops = []
        for i in range(4):
            if self.fm_layers[i] == 0:
                fm_ops.append(FMNone(name=f"fm_op{i}"))
            elif self.fm_layers[i] == 1:
                fm_ops.append(fm_cls(
                    channel_f=f_channels[i], kernel_size=kernel_size,
                    resblocks=num_res, activation=act, arith_strategy=arith,
                    use_ori=self.use_ori, use_conv=self.use_conv,
                    mask_trans=self.mask_trans, kd_metric=self.kd_metric,
                    policy=self.policy, name=f"fm_op{i}"))
            else:
                raise ValueError("FM Operators type error")
        self.fm_ops = fm_ops

        if "lightcnn" in self.frb_type:
            self.frb = LightCNN29v2(dim_feature=dim_feature,
                                    dropout=self.dropout, fm_ops=fm_ops,
                                    policy=self.policy, name="frb")
            if self.use_ori:
                self.peer = PeerLightCNN(policy=self.policy, name="peer")
        else:
            layers = IRESNET_LAYERS[self.frb_type]
            self.frb = IResNet(layers=layers, dim_feature=dim_feature,
                               dropout=self.dropout, fm_ops=fm_ops,
                               use_decoder=self.use_decoder,
                               decoder_loss_weight=self.decoder_loss_weight,
                               remat=self.remat, width_mult=wm,
                               policy=self.policy, name="frb")
            if self.use_ori:
                self.peer = PeerIResNet(layers=layers,
                                        dim_feature=dim_feature,
                                        policy=self.policy, name="peer")

        if self.use_osb:
            if "unet" not in self.osb_type:
                raise ValueError("OSB type error")
            self.osb = Unet(input_size=input_size,
                            remat=self.remat is True,
                            policy=self.policy, name="osb")

        if not self.external_header:
            s, m, a, k = self.header_params
            if "Softmax" in self.header_type:
                self.classification = SoftmaxHead(self.num_classes,
                                                  name="classification")
            elif self.header_type in ("AMArcFace", "AMCosFace"):
                self.classification = MarginHead(
                    self.num_classes, self.header_type, s, m, a, k,
                    name="classification")
            else:
                raise ValueError("Header type error!")

    def __call__(self, x: jnp.ndarray, label: Optional[jnp.ndarray] = None,
                 ori: Optional[jnp.ndarray] = None, train: bool = False):
        # Part 1: OSB (`msml.py:150-158`)
        if self.use_osb:
            seg_list = list(self.osb(x, train))
            seg_list.reverse()            # [seg5, seg3, seg2, seg1, seg0]
            final_seg = seg_list[0]
            segs = seg_list[1:]           # big -> small
        else:
            segs = (None, None, None, None)
            final_seg = None

        # Peer teacher (`iresnet.py:203-206`)
        peer_feats = (None, None, None, None)
        if ori is not None and self.use_ori:
            _, peer_feats = self.peer(ori)

        # Part 2: FRB (`msml.py:163-167`)
        feature, kd = self.frb(x, segs, peer_feats, train, ori)
        feature = self.policy.cast_to_output(feature)

        if not train:
            return feature, final_seg  # `msml.py:173-174`
        if self.external_header:
            return feature, final_seg, kd
        final_cls = self.classification(feature, label) + kd  # `msml.py:171`
        return final_cls, final_seg, kd


def _check_kd_metric(cfg) -> bool:
    kd_metric = bool(cfg.get("kd_metric", True))
    if not kd_metric and float(cfg.get("kd_loss_weight", 0.0)) > 0:
        raise ValueError("kd_metric: false skips the KD computation and is "
                         "only legal with kd_loss_weight == 0")
    return kd_metric


def msml_from_config(cfg, policy: Policy | None = None,
                     external_header: bool = False) -> MSML:
    """Build an MSML from a derived Config (see core/config.py)."""
    from msml_tpu.core.precision import policy_from_config
    if policy is None:
        policy = policy_from_config(bool(cfg.get("fp16", True)))
    pp = cfg.get("peer_params") or {}
    return MSML(
        frb_type=cfg.frb_type,
        osb_type=cfg.osb_type,
        fm_layers=tuple(cfg.fm_layers),
        num_classes=cfg.num_classes,
        fm_params=tuple(cfg.fm_params),
        header_type=cfg.header_type,
        header_params=tuple(cfg.header_params),
        dropout=float(cfg.get("dropout", 0.0)),
        use_osb=bool(cfg.use_osb),
        use_ori=bool(pp.get("use_ori", False)),
        use_conv=bool(pp.get("use_conv", False)),
        mask_trans=pp.get("mask_trans", "conv"),
        use_decoder=bool(pp.get("use_decoder", False)),
        decoder_loss_weight=float(cfg.get("decoder_loss_weight", 0.0)),
        external_header=external_header,
        remat=cfg.get("remat", False),
        remat_fm=bool(cfg.get("remat_fm", False)),
        width_mult=(tuple(cfg["width_mult"])
                    if isinstance(cfg.get("width_mult"), (list, tuple))
                    else int(cfg.get("width_mult", 1))),
        kd_metric=_check_kd_metric(cfg),
        policy=policy,
    )
