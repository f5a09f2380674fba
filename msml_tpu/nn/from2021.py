"""FROM (TPAMI'21) occlusion-robust baseline: LResNet50E-IR + FPN mask.

Parity target: `backbones/third_party/from2021.py`:
  * `PyramidFeatures` FPN over stages 2-4 (from2021.py:4-49)
  * `BlockIR` (52-84) — structurally our nn.iresnet.IBasicBlock
  * `LResNet_Occ` (291-373): LResNet50E-IR trunk on (112, 96) input, FPN P3
    -> conv mask head (sigmoid over the 512x7x6 fmap), mask-multiplied
    embedding fc, mask-pattern regressor `vec` over get_grids(112, 96, 5)
    patterns (from2021.py:391-409)
  * `From2021` wrapper returning the plain fc embedding (412-428); eval-only
    baseline (reference loads model_p5_w1_9938_9470_6503.pth.tar — LFW 99.38)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from msml_tpu.core.precision import Policy, DEFAULT_POLICY
from msml_tpu.nn.common import PReLU, batch_norm, flatten_nhwc
from msml_tpu.nn.iresnet import IBasicBlock


def get_grids(h: int, w: int, n: int) -> list:
    """Occlusion-pattern dictionary (from2021.py:391-409): all axis-aligned
    rectangles on an n x n vertex grid, plus the empty grid."""
    x_axis = np.linspace(0, w, n + 1, True, dtype=int)
    y_axis = np.linspace(0, h, n + 1, True, dtype=int)
    vertex_set = [(y, x) for y in y_axis for x in x_axis]
    grids = [np.zeros((h, w))]
    for start in vertex_set:
        for end in vertex_set:
            if end[0] > start[0] and end[1] > start[1]:
                g = np.zeros((h, w))
                g[start[0]:end[0], start[1]:end[1]] = 1.0
                grids.append(g)
    return grids


class PyramidFeatures(nn.Module):
    """FPN (from2021.py:4-49); returns [P3, P4, P5, P6, P7]."""

    feature_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        c3, c4, c5 = inputs

        def conv(f, k, s, name):
            p = (k - 1) // 2
            return nn.Conv(f, (k, k), strides=(s, s),
                           padding=((p, p), (p, p)), dtype=self.dtype,
                           name=name)

        def upsample2(x, like):
            # nn.Upsample(scale_factor=2, mode='nearest') then crop to the
            # skip branch's odd spatial dims
            y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            return y[:, :like.shape[1], :like.shape[2], :]

        p5 = conv(self.feature_size, 1, 1, "P5_1")(c5)
        p5_up = upsample2(p5, c4)
        p5_out = conv(self.feature_size, 3, 1, "P5_2")(p5)

        p4 = conv(self.feature_size, 1, 1, "P4_1")(c4) + p5_up
        p4_up = upsample2(p4, c3)
        p4_out = conv(self.feature_size, 3, 1, "P4_2")(p4)

        p3 = conv(self.feature_size, 1, 1, "P3_1")(c3) + p4_up
        p3_out = conv(self.feature_size, 3, 1, "P3_2")(p3)

        p6 = conv(self.feature_size, 3, 2, "P6")(c5)
        p7 = conv(self.feature_size, 3, 2, "P7_2")(nn.relu(p6))
        return [p3_out, p4_out, p5_out, p6, p7]


class LResNetOcc(nn.Module):
    """LResNet_Occ (from2021.py:291-373), 50E-IR depth, (112, 96) input."""

    layers: Sequence[int] = (3, 4, 14, 3)
    num_mask: int = 226  # len(get_grids(112, 96, 5))
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False,
                 mask: Optional[jnp.ndarray] = None):
        cdt = self.policy.compute_dtype
        x = x.astype(cdt)
        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=cdt, name="conv1")(x)
        x = batch_norm(train, cdt, name="bn1")(x)
        x = PReLU(cdt, name="prelu1")(x)
        planes = (64, 128, 256, 512)
        feats = []
        for li in range(4):
            x = IBasicBlock(planes[li], 2, True, cdt,
                            name=f"layer{li + 1}_block0")(x, train)
            for b in range(1, self.layers[li]):
                x = IBasicBlock(planes[li], 1, False, cdt,
                                name=f"layer{li + 1}_block{b}")(x, train)
            feats.append(x)
        _, x2, x3, fmap = feats  # 28x24x128, 14x12x256, 7x6x512

        if mask is None:
            pyr = PyramidFeatures(dtype=cdt, name="fpn")([x2, x3, fmap])
            m = nn.Conv(256, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=cdt, name="mask_conv0")(pyr[0])
            m = PReLU(cdt, name="mask_prelu0")(m)
            m = batch_norm(train, cdt, name="mask_bn0")(m)
            m = nn.Conv(512, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=cdt, name="mask_conv1")(m)
            mask = nn.sigmoid(m)  # (B, 7, 6, 512)

        # mask-pattern regressor (triplet/dictionary branch)
        v = flatten_nhwc(mask).astype(jnp.float32)
        v = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, name="regress_bn0")(v)
        v = nn.Dropout(0.5, deterministic=not train)(v)
        v = nn.Dense(self.num_mask, use_bias=False, name="regress_fc")(v)
        vec = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                           momentum=0.9, name="regress_bn1")(v)

        # shared fc head applied to both masked and plain fmaps
        # (from2021.py:272-276 calls the same self.fc twice)
        fc_bn0 = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                              momentum=0.9, name="fc_bn0")
        fc_fc = nn.Dense(512, name="fc_fc")
        fc_bn1 = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                              momentum=0.9, name="fc_bn1")

        def fc_head(z):
            z = flatten_nhwc(z).astype(jnp.float32)
            z = fc_bn0(z)
            z = nn.Dropout(0.5, deterministic=not train)(z)
            return fc_bn1(fc_fc(z))

        fc_mask = fc_head(fmap * mask)
        fc = fc_head(fmap)
        return fc_mask, mask, vec, fc


class From2021(nn.Module):
    """from2021.py:412-428: the eval wrapper returning the plain embedding."""

    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_mask = len(get_grids(112, 96, 5))
        _, _, _, fc = LResNetOcc(num_mask=num_mask, policy=self.policy,
                                 name="model")(x, train)
        return fc
