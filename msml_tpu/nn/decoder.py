"""DeepMind-VQVAE-style recover decoder.

Parity target: `backbones/decoder/deepmind.py:20-103` — reconstructs a
112x112 image from the 7x7x512 FRB stage-4 feature through 4 transposed-conv
upsampling stages (7->14->28->56->112) with conv+ResBlock groups, and an L2
recover loss against the unoccluded original.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from msml_tpu.core.precision import Policy, DEFAULT_POLICY
from msml_tpu.nn.common import ConvTranspose2d


class _ResBlock(nn.Module):
    """conv3x3 -> ReLU -> conv1x1, residual, ReLU (`deepmind.py:20-34`)."""

    channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = nn.Conv(self.channel, (3, 3), padding=((1, 1), (1, 1)),
                      dtype=self.dtype, name="conv0")(x)
        out = nn.relu(out)
        out = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="conv1")(out)
        return nn.relu(out + x)


class DeepMindDecoder(nn.Module):
    """`deepmind.py:60-103`. __call__(x, ori) -> (recover, l2_loss)."""

    n_init: int = 512
    n_hid: int = 64
    out_channels: int = 3
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray, ori: jnp.ndarray | None = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray | float]:
        cdt = self.policy.compute_dtype
        h2, h = 2 * self.n_hid, self.n_hid
        x = x.astype(cdt)
        for stage in range(3):
            x = nn.Conv(h2, (3, 3), padding=((1, 1), (1, 1)), dtype=cdt,
                        name=f"conv_in{stage}")(x)
            x = nn.relu(x)
            x = _ResBlock(h2 // 4, cdt, name=f"res{stage}a")(x)
            x = _ResBlock(h2 // 4, cdt, name=f"res{stage}b")(x)
            x = ConvTranspose2d(h, 4, 2, 1, use_bias=True, dtype=cdt,
                                name=f"deconv{stage}")(x)
            x = nn.relu(x)
        recover = ConvTranspose2d(self.out_channels, 4, 2, 1, use_bias=True,
                                  dtype=cdt, name="deconv_out")(x)
        loss = 0.0
        if ori is not None:
            diff = recover.astype(jnp.float32) - ori.astype(jnp.float32)
            loss = jnp.mean(diff * diff)
        return recover, loss
