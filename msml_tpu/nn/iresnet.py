"""iResNet (ArcFace-style ResNet) Face Recognition Branch, NHWC / bf16.

Parity targets in the reference:
  * `IBasicBlock`          — `backbones/frb/iresnet.py:38-67`
    (BN-first residual block: bn1 -> conv3x3 -> bn2 -> PReLU -> conv3x3(stride)
     -> bn3, 1x1-conv+BN downsample)
  * `IResNet.forward`      — `backbones/frb/iresnet.py:190-236`
    (stride-1 3x3 stem, four stride-2 stages with an FM-operator hook after
     each, bn2 -> flatten -> dropout -> fc -> BatchNorm1d feature; the final fc
     runs in f32 like the reference's `.float()` cast at iresnet.py:232)
  * `IResNetVanilla`       — `backbones/frb/iresnet.py:241-363` /
    `backbones/peer/arcface.py` (frozen teacher returning the 4 stage features)
  * depth configs 18/34/50 — `backbones/frb/iresnet.py:444-481`

Reference quirk NOT replicated: at `iresnet.py:228` the tuple-assignment bug
makes the recover-decoder loss always 0 while still burning the decoder's
forward FLOPs. We reproduce the *behavior* (no decoder loss by default) without
the dead compute; set `decoder_loss_weight > 0` to make the recover loss real
(see nn/decoder.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from msml_tpu.core.precision import Policy, DEFAULT_POLICY
from msml_tpu.nn.common import (PReLU, batch_norm, conv1x1, conv3x3,
                                flatten_nhwc, remat_stage_set)
from msml_tpu.nn.decoder import DeepMindDecoder

IRESNET_LAYERS = {
    "iresnet18": (2, 2, 2, 2),
    "iresnet34": (3, 4, 6, 3),
    "iresnet50": (3, 4, 14, 3),
    "iresnet100": (3, 13, 30, 3),
}


class IBasicBlock(nn.Module):
    """BN-first residual block (`iresnet.py:38-67`)."""

    planes: int
    stride: int = 1
    use_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        identity = x
        out = batch_norm(train, self.dtype, name="bn1")(x)
        out = conv3x3(self.planes, 1, dtype=self.dtype, name="conv1")(out)
        out = batch_norm(train, self.dtype, name="bn2")(out)
        out = PReLU(self.dtype, name="prelu")(out)
        out = conv3x3(self.planes, self.stride, dtype=self.dtype, name="conv2")(out)
        out = batch_norm(train, self.dtype, name="bn3")(out)
        if self.use_downsample:
            identity = conv1x1(self.planes, self.stride, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = batch_norm(train, self.dtype, name="downsample_bn")(identity)
        return out + identity


class ResStage(nn.Module):
    """One `_make_layer` stage (`iresnet.py:164-188`): first block stride-2
    with downsample, the rest stride-1."""

    planes: int
    blocks: int
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        needs_down = self.stride != 1 or x.shape[-1] != self.planes
        x = IBasicBlock(self.planes, self.stride, needs_down, self.dtype,
                        name="block0")(x, train)
        for i in range(1, self.blocks):
            x = IBasicBlock(self.planes, 1, False, self.dtype,
                            name=f"block{i}")(x, train)
        return x


def stage_width_mults(width_mult) -> tuple:
    """Normalize the width_mult knob: int -> uniform, 4-sequence ->
    per-stage (stem follows stage 1)."""
    if isinstance(width_mult, (list, tuple)):
        if len(width_mult) != 4:
            raise ValueError("width_mult list must have 4 entries")
        return tuple(int(w) for w in width_mult)
    return (int(width_mult),) * 4


class IResNet(nn.Module):
    """FRB iResNet with per-stage FM-operator hooks (`iresnet.py:70-236`).

    __call__(x, segs, peer_feats, train) -> (feature, kd_loss)
      x          : (B, 112, 112, 3) NHWC
      segs       : 4 OSB feature maps (B, 56/28/14/7, ., 18) or (None,)*4
      peer_feats : 4 frozen-teacher stage features or (None,)*4
    """

    layers: Sequence[int] = (2, 2, 2, 2)
    dim_feature: int = 512
    dropout: float = 0.0
    fm_ops: Sequence[nn.Module] = ()
    use_decoder: bool = False
    decoder_loss_weight: float = 0.0
    width_mult: object = 1  # channel-width multiplier — int (all stages)
    #                      or a 4-list of per-stage multipliers, e.g.
    #                      [2,1,1,1] widens ONLY the C=64 stage riding the
    #                      idle MXU lanes (the TPU capacity dividend,
    #                      PERF.md r5: uniform 2x costs 2.43x step time
    #                      because the deep, already-lane-full stages scale
    #                      quadratically; stage-1-only 2x is the nearly-free
    #                      variant the channel-pad data predicts). Any
    #                      width_mult != 1 is a documented NON-PARITY
    #                      variant (reference iresnet.py:70-236 is
    #                      fixed-width)
    remat: object = False  # rematerialize stages: trade recompute FLOPs for
    #                        activation HBM traffic. True = all 4 stages;
    #                        a sequence of stage numbers (e.g. (3, 4)) remats
    #                        only those — for deep configs (iresnet100's
    #                        30-block stage 3) most activation memory sits in
    #                        the block-heavy low-res stages, where recompute
    #                        is also cheapest (PERF.md)
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, segs, peer_feats, train: bool,
                 ori: Optional[jnp.ndarray] = None):
        assert len(self.fm_ops) == 4
        cdt = self.policy.compute_dtype
        x = x.astype(cdt)

        wm = stage_width_mults(self.width_mult)
        x = conv3x3(64 * wm[0], 1, dtype=cdt, name="conv1")(x)
        x = batch_norm(train, cdt, name="bn1")(x)
        x = PReLU(cdt, name="prelu")(x)

        remat_stages = remat_stage_set(self.remat)
        planes = (64 * wm[0], 128 * wm[1], 256 * wm[2], 512 * wm[3])
        kd_losses = []
        for i in range(4):
            stage_cls = (nn.remat(ResStage, static_argnums=(2,))
                         if (i + 1) in remat_stages else ResStage)
            x = stage_cls(planes[i], self.layers[i], 2, cdt,
                          name=f"layer{i + 1}")(x, train)
            x, kd = self.fm_ops[i](x, segs[i], peer_feats[i], train)
            if kd is not None:
                kd_losses.append(kd)

        x = batch_norm(train, cdt, name="bn2")(x)

        # Recover decoder (`iresnet.py:146-150,227-228`): params exist whenever
        # use_decoder; the loss only participates when decoder_loss_weight > 0
        # (the reference's tuple-assignment bug zeroes it unconditionally).
        # The weighted loss is sown into the 'losses' collection so the train
        # step adds it to the total *independently* of kd_loss_weight.
        if self.use_decoder:
            decoder = DeepMindDecoder(n_init=self.dim_feature,
                                      out_channels=3, policy=self.policy,
                                      name="decoder")
            if self.is_initializing() or (self.decoder_loss_weight > 0.0
                                          and ori is not None):
                _rec, l4 = decoder(x, ori if ori is not None else
                                   jnp.zeros((x.shape[0], 112, 112, 3), cdt))
                self.sow("losses", "rec",
                         self.decoder_loss_weight * jnp.asarray(l4,
                                                                jnp.float32))

        x = flatten_nhwc(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        # fc + feature BN in f32 (reference iresnet.py:232-233; `features`
        # scale is frozen at 1.0 => use_scale=False, bias trainable).
        x = nn.Dense(self.dim_feature, dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, use_scale=False, use_bias=True,
                         dtype=jnp.float32, name="features")(x)

        kd = sum(kd_losses) if kd_losses else 0.0
        return x, kd


class PeerIResNet(nn.Module):
    """Frozen teacher (`backbones/peer/arcface.py`, `IResNetVanilla`
    at `iresnet.py:241-363`): returns (feature, [4 stage features]), all
    stop-gradiented. Runs in eval mode (running BN stats) like a loaded
    pretrained teacher.
    """

    layers: Sequence[int] = (2, 2, 2, 2)
    dim_feature: int = 512
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, list]:
        cdt = self.policy.compute_dtype
        x = x.astype(cdt)
        x = conv3x3(64, 1, dtype=cdt, name="conv1")(x)
        x = batch_norm(False, cdt, name="bn1")(x)
        x = PReLU(cdt, name="prelu")(x)
        inters = []
        planes = (64, 128, 256, 512)
        for i in range(4):
            x = ResStage(planes[i], self.layers[i], 2, cdt,
                         name=f"layer{i + 1}")(x, train=False)
            inters.append(jax.lax.stop_gradient(x))
        x = batch_norm(False, cdt, name="bn2")(x)
        x = flatten_nhwc(x)
        x = nn.Dense(self.dim_feature, dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32))
        x = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         use_scale=False, use_bias=True, dtype=jnp.float32,
                         name="features")(x)
        return jax.lax.stop_gradient(x), inters
