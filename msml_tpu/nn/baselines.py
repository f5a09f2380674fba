"""Eval-only baseline backbones.

Parity targets:
  * sphere / cosface2018 — `backbones/frb/cosface2018.py:7-73,190-201`
    (SphereFace-20/64 trunk used as the CosFace-2018 embedding model,
    112x96 or 112x112 input)
  * vanilla torchvision-style ResNet incl. the resnet28 variant —
    `backbones/frb/resnet.py` (BasicBlock ResNet with an embedding fc)
  * FROM (TPAMI'21) LResNet50E-IR+FPN occlusion baseline
    (`backbones/third_party/from2021.py`) is checkpoint-bound and tracked
    for a later round.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from msml_tpu.core.precision import Policy, DEFAULT_POLICY
from msml_tpu.nn.common import PReLU, batch_norm, flatten_nhwc


class _SphereBlock(nn.Module):
    """cosface2018.py:7-16: x + prelu(conv(prelu(conv(x))))."""

    planes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = PReLU(self.dtype, name="prelu1")(out)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = PReLU(self.dtype, name="prelu2")(out)
        return x + out


class Sphere(nn.Module):
    """SphereFace trunk (cosface2018.py:19-73). type 20 or 64."""

    net_type: int = 20
    input_size: Sequence[int] = (112, 96)  # (h, w)
    dim_feature: int = 512
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # no BN in sphere nets
        cdt = self.policy.compute_dtype
        if self.net_type == 20:
            layers = (1, 2, 4, 1)
        elif self.net_type == 64:
            layers = (3, 7, 16, 3)
        else:
            raise ValueError(f"sphere{self.net_type} IS NOT SUPPORTED!")
        x = x.astype(cdt)
        planes = (64, 128, 256, 512)
        for li in range(4):
            x = nn.Conv(planes[li], (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=True, dtype=cdt,
                        name=f"layer{li + 1}_conv")(x)
            x = PReLU(cdt, name=f"layer{li + 1}_prelu")(x)
            for b in range(layers[li]):
                x = _SphereBlock(planes[li], cdt,
                                 name=f"layer{li + 1}_block{b}")(x)
        x = flatten_nhwc(x)
        return nn.Dense(self.dim_feature, dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32))


def cosface2018(input_size=(112, 96), policy: Policy = DEFAULT_POLICY):
    """cosface2018.py:190-201 factory."""
    return Sphere(net_type=20, input_size=tuple(input_size), policy=policy)


class _BasicBlock(nn.Module):
    """torchvision BasicBlock (resnet.py): conv-bn-relu-conv-bn + skip."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = batch_norm(train, self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = batch_norm(train, self.dtype, name="bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = batch_norm(train, self.dtype,
                                  name="downsample_bn")(identity)
        return nn.relu(out + identity)


RESNET_LAYERS = {
    "resnet18": (2, 2, 2, 2),
    "resnet28": (3, 4, 3, 3),
    "resnet34": (3, 4, 6, 3),
}


class ResNet(nn.Module):
    """Vanilla BasicBlock ResNet embedding model (backbones/frb/resnet.py),
    adapted to 112x112 face crops like the reference's resnet28 usage."""

    layers: Sequence[int] = (2, 2, 2, 2)
    dim_feature: int = 512
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        cdt = self.policy.compute_dtype
        x = x.astype(cdt)
        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=cdt, name="conv1")(x)
        x = batch_norm(train, cdt, name="bn1")(x)
        x = nn.relu(x)
        planes = (64, 128, 256, 512)
        for li in range(4):
            for b in range(self.layers[li]):
                stride = 2 if b == 0 else 1
                x = _BasicBlock(planes[li], stride, cdt,
                                name=f"layer{li + 1}_block{b}")(x, train)
        x = batch_norm(train, cdt, name="bn2")(x)
        x = flatten_nhwc(x)
        return nn.Dense(self.dim_feature, dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32))


def resnet28(dim_feature: int = 512, policy: Policy = DEFAULT_POLICY):
    return ResNet(layers=RESNET_LAYERS["resnet28"], dim_feature=dim_feature,
                  policy=policy)
