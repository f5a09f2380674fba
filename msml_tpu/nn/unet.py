"""Occlusion Segmentation Branch: U-Net with iResNet encoder + Global Conv
Modules.

Parity target: `backbones/osb/unet.py:16-279`:
  * `_GlobalConvModule` (16-38): separable large-kernel conv (k x 1 -> 1 x k)
    + (1 x k -> k x 1), summed.
  * `Unet.forward` (189-240): stride-2 stem (so stages run at 56/28/14/7/4 for
    112 input), 5 GCMs + 5 ConvTranspose decoders with skip concats, and the
    DAP head (PixelShuffle(3)+AvgPool(3) == per-pixel 9-group channel mean,
    see nn/common.dap). deconv1 kernel is 4 for 128 input, 3 for 112
    (`unet.py:141-148`).
  * Returns [seg0(7), seg1(14), seg2(28), seg3(56), seg5(112, 2ch)] with
    seg0..seg3 stop-gradiented (the "detach link", `unet.py:225-236`): the OSB
    trains only through seg5's consensus loss, while the FRB consumes frozen
    multi-scale mask features.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from msml_tpu.core.precision import Policy, DEFAULT_POLICY
from msml_tpu.nn.common import ConvTranspose2d, PReLU, batch_norm, conv3x3, dap
from msml_tpu.nn.iresnet import ResStage


class GlobalConvModule(nn.Module):
    """`unet.py:16-38`."""

    out_dim: int
    kernel_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        pad = (k - 1) // 2
        x_l = nn.Conv(self.out_dim, (k, 1), padding=((pad, pad), (0, 0)),
                      dtype=self.dtype, name="conv_l1")(x)
        x_l = nn.Conv(self.out_dim, (1, k), padding=((0, 0), (pad, pad)),
                      dtype=self.dtype, name="conv_l2")(x_l)
        x_r = nn.Conv(self.out_dim, (1, k), padding=((0, 0), (pad, pad)),
                      dtype=self.dtype, name="conv_r1")(x)
        x_r = nn.Conv(self.out_dim, (k, 1), padding=((pad, pad), (0, 0)),
                      dtype=self.dtype, name="conv_r2")(x_r)
        return x_l + x_r


class Unet(nn.Module):
    """`unet.py:94-240`. __call__(x, train) -> [seg0, seg1, seg2, seg3, seg5]."""

    layers: Sequence[int] = (2, 2, 2, 2)   # r18 encoder (`unet.py:252`)
    num_classes: int = 2
    kernel_size: int = 7
    dap_k: int = 3
    input_size: int = 112
    remat: bool = False
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> List[jnp.ndarray]:
        cdt = self.policy.compute_dtype
        nc, dk = self.num_classes, self.dap_k
        seg_ch = nc * dk ** 2  # 18
        stage = nn.remat(ResStage, static_argnums=(2,)) if self.remat \
            else ResStage

        x = x.astype(cdt)
        # stride-2 stem (`unet.py:112-117`)
        t = nn.Conv(64, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=cdt, name="conv1")(x)
        s = batch_norm(train, cdt, name="bn1")(t)
        x0 = PReLU(cdt, name="prelu")(s)            # 56 | 64

        x1 = stage(64, self.layers[0], 2, cdt, name="layer1")(x0, train)   # 28 | 32
        x2 = stage(128, self.layers[1], 2, cdt, name="layer2")(x1, train)  # 14 | 16
        x3 = stage(256, self.layers[2], 2, cdt, name="layer3")(x2, train)  # 7 | 8
        x4 = stage(512, self.layers[3], 2, cdt, name="layer4")(x3, train)  # 4 | 4
        xx = batch_norm(train, cdt, name="bn2")(x4)

        x_ = GlobalConvModule(nc * 4, self.kernel_size, cdt, name="gcm1")(xx)
        deconv1_k = 4 if self.input_size == 128 else 3  # `unet.py:141-148`
        seg0 = ConvTranspose2d(seg_ch, deconv1_k, 2, 1, dtype=cdt,
                               name="deconv1")(x_)                        # 7 | 8

        x3_ = GlobalConvModule(seg_ch, self.kernel_size, cdt, name="gcm2")(x3)
        seg1 = ConvTranspose2d(seg_ch, 4, 2, 1, dtype=cdt, name="deconv2")(
            jnp.concatenate([seg0, x3_], axis=-1))                        # 14 | 16

        x2_ = GlobalConvModule(seg_ch, self.kernel_size, cdt, name="gcm3")(x2)
        seg2 = ConvTranspose2d(seg_ch, 4, 2, 1, dtype=cdt, name="deconv3")(
            jnp.concatenate([seg1, x2_], axis=-1))                        # 28 | 32

        x1_ = GlobalConvModule(seg_ch, self.kernel_size, cdt, name="gcm4")(x1)
        seg3 = ConvTranspose2d(seg_ch, 4, 2, 1, dtype=cdt, name="deconv4")(
            jnp.concatenate([seg2, x1_], axis=-1))                        # 56 | 64

        x0_ = GlobalConvModule(seg_ch, self.kernel_size, cdt, name="gcm5")(x0)
        seg5_ = ConvTranspose2d(seg_ch, 4, 2, 1, dtype=cdt, name="deconv5")(
            jnp.concatenate([seg3, x0_], axis=-1))                        # 112 | 128

        # final seg logits in f32 for the consensus loss
        seg5 = dap(seg5_.astype(jnp.float32), nc, dk)

        # detach link (`unet.py:225-236`)
        return [jax.lax.stop_gradient(seg0), jax.lax.stop_gradient(seg1),
                jax.lax.stop_gradient(seg2), jax.lax.stop_gradient(seg3),
                seg5]
