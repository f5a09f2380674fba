"""LightCNN-29v2 Face Recognition Branch (grayscale 128x128), NHWC.

Parity targets:
  * `mfm` Max-Feature-Map activation — `backbones/frb/lightcnn.py:25-38`
    (conv/linear to 2*C then elementwise max of the halves)
  * `group` / `resblock` — `lightcnn.py:41-66`
  * `network_29layers_v2.forward` with the 4 FM hooks after each
    max+avg pooling stage — `lightcnn.py:145-237`
  * frozen peer teacher returning the 4 stage features —
    `backbones/peer/lightcnn.py:99-136`

No batch norm anywhere in LightCNN (faithful to the reference); fc has bias
and no feature BN.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from msml_tpu.core.precision import Policy, DEFAULT_POLICY
from msml_tpu.nn.common import flatten_nhwc, max_avg_pool2

LIGHTCNN29_LAYERS = (1, 2, 3, 4)


class mfm(nn.Module):
    """Max-Feature-Map conv (`lightcnn.py:25-38`, type=1)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, p = self.kernel_size, self.padding
        x = nn.Conv(2 * self.out_channels, (k, k),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), use_bias=True, dtype=self.dtype,
                    name="filter")(x)
        a, b = jnp.split(x, 2, axis=-1)
        return jnp.maximum(a, b)


class Group(nn.Module):
    """mfm 1x1 then mfm kxk (`lightcnn.py:41-50`)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = mfm(x.shape[-1], 1, 1, 0, self.dtype, name="conv_a")(x)
        return mfm(self.out_channels, 3, 1, 1, self.dtype, name="conv")(x)


class MfmResblock(nn.Module):
    """Two 3x3 mfm convs + residual (`lightcnn.py:53-66`)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = x
        out = mfm(self.out_channels, 3, 1, 1, self.dtype, name="conv1")(x)
        out = mfm(self.out_channels, 3, 1, 1, self.dtype, name="conv2")(out)
        return out + res


class _LightTrunkStage(nn.Module):
    blocks: int
    block_channels: int
    group_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.blocks):
            x = MfmResblock(self.block_channels, self.dtype,
                            name=f"block{i}")(x)
        return Group(self.group_out, self.dtype, name="group")(x)


class LightCNN29v2(nn.Module):
    """FRB LightCNN (`lightcnn.py:145-237`).

    __call__(x, segs, peer_feats, train) -> (feature, kd_loss)
      x: (B, 128, 128, 1); segs at 64/32/16/8 with 18 channels.
    """

    layers: Sequence[int] = LIGHTCNN29_LAYERS
    dim_feature: int = 256
    dropout: float = 0.0
    fm_ops: Sequence[nn.Module] = ()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, segs, peer_feats, train: bool,
                 ori: Optional[jnp.ndarray] = None):
        assert len(self.fm_ops) == 4
        cdt = self.policy.compute_dtype
        x = x.astype(cdt)

        x = mfm(48, 5, 1, 2, cdt, name="conv1")(x)
        x = max_avg_pool2(x)                       # (64, 64, 48)
        x, l0 = self.fm_ops[0](x, segs[0], peer_feats[0], train)

        x = _LightTrunkStage(self.layers[0], 48, 96, cdt, name="stage1")(x)
        x = max_avg_pool2(x)                       # (32, 32, 96)
        x, l1 = self.fm_ops[1](x, segs[1], peer_feats[1], train)

        x = _LightTrunkStage(self.layers[1], 96, 192, cdt, name="stage2")(x)
        x = max_avg_pool2(x)                       # (16, 16, 192)
        x, l2 = self.fm_ops[2](x, segs[2], peer_feats[2], train)

        for i in range(self.layers[2]):
            x = MfmResblock(192, cdt, name=f"stage3_block{i}")(x)
        x = Group(128, cdt, name="group3")(x)
        for i in range(self.layers[3]):
            x = MfmResblock(128, cdt, name=f"stage4_block{i}")(x)
        x = Group(128, cdt, name="group4")(x)
        x = max_avg_pool2(x)                       # (8, 8, 128)
        x, l3 = self.fm_ops[3](x, segs[3], peer_feats[3], train)

        x = flatten_nhwc(x)
        x = nn.Dense(self.dim_feature, use_bias=True, dtype=jnp.float32,
                     name="fc")(x.astype(jnp.float32))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        kds = [l for l in (l0, l1, l2, l3) if l is not None]
        kd = sum(kds) if kds else 0.0
        return x, kd


class PeerLightCNN(nn.Module):
    """Frozen LightCNN teacher (`backbones/peer/lightcnn.py:99-136`)."""

    layers: Sequence[int] = LIGHTCNN29_LAYERS
    dim_feature: int = 256
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, list]:
        cdt = self.policy.compute_dtype
        x = x.astype(cdt)
        inters = []
        x = mfm(48, 5, 1, 2, cdt, name="conv1")(x)
        x = max_avg_pool2(x)
        inters.append(jax.lax.stop_gradient(x))
        x = _LightTrunkStage(self.layers[0], 48, 96, cdt, name="stage1")(x)
        x = max_avg_pool2(x)
        inters.append(jax.lax.stop_gradient(x))
        x = _LightTrunkStage(self.layers[1], 96, 192, cdt, name="stage2")(x)
        x = max_avg_pool2(x)
        inters.append(jax.lax.stop_gradient(x))
        for i in range(self.layers[2]):
            x = MfmResblock(192, cdt, name=f"stage3_block{i}")(x)
        x = Group(128, cdt, name="group3")(x)
        for i in range(self.layers[3]):
            x = MfmResblock(128, cdt, name=f"stage4_block{i}")(x)
        x = Group(128, cdt, name="group4")(x)
        x = max_avg_pool2(x)
        inters.append(jax.lax.stop_gradient(x))
        x = flatten_nhwc(x)
        x = nn.Dense(self.dim_feature, use_bias=True, dtype=jnp.float32,
                     name="fc")(x.astype(jnp.float32))
        return jax.lax.stop_gradient(x), inters
