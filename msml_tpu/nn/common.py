"""Shared NN building blocks, NHWC / TPU-native.

All convolutions use explicit torch-style symmetric padding (not XLA 'SAME') so
that stride-2 convs place their windows exactly like the reference PyTorch
models — a requirement for transliterating reference checkpoints
(`backbones/frb/iresnet.py:17-35`, `backbones/osb/unet.py:41-59`).

Layout convention: NHWC activations (channels-last feeds the MXU's 128-lane
minor dimension); conv kernels are flax-style (kh, kw, in, out).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C) parity;
    flax's builtin PReLU is scalar-only). Init 0.25 like torch."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (x.shape[-1],), jnp.float32)
        alpha = alpha.astype(x.dtype)
        # NOTE: a fused Pallas PReLU (benchmarks/negative/prelu_pallas.py)
        # was measured SLOWER end-to-end (1306 vs 2934 img/s/chip): the
        # custom call breaks XLA's elementwise fusion around every site and
        # the C<128 activations pay 128-lane padding on each kernel
        # round-trip. Plain jnp is the fast path (PERF.md).
        return jnp.where(x >= 0, x, alpha * x)


def conv3x3(features: int, stride: int = 1, use_bias: bool = False,
            dtype=jnp.float32, name: str | None = None) -> nn.Conv:
    """3x3 conv, torch padding=1 (`iresnet.py:17-26`)."""
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   padding=((1, 1), (1, 1)), use_bias=use_bias,
                   dtype=dtype, name=name)


def conv1x1(features: int, stride: int = 1, use_bias: bool = False,
            dtype=jnp.float32, name: str | None = None) -> nn.Conv:
    """1x1 conv (`iresnet.py:29-35`)."""
    return nn.Conv(features, (1, 1), strides=(stride, stride),
                   padding=((0, 0), (0, 0)), use_bias=use_bias,
                   dtype=dtype, name=name)


def batch_norm(train: bool, dtype=jnp.float32, name: str | None = None,
               use_scale: bool = True) -> nn.BatchNorm:
    """BatchNorm with torch defaults: eps 1e-5, momentum 0.1 (flax 0.9)."""
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, use_scale=use_scale,
                        name=name)


class ConvTranspose2d(nn.Module):
    """torch nn.ConvTranspose2d parity on NHWC.

    out = (in - 1) * stride - 2 * padding + kernel, implemented via
    lax.conv_transpose with lax padding (kernel - 1 - padding) per side and
    transpose_kernel=True (gradient-of-conv kernel orientation, matching how
    torch defines transposed convolution). Used by the U-Net decoders
    (`backbones/osb/unet.py:141-156`).
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        # With transpose_kernel=True and spec HWIO, the kernel is the forward
        # conv's kernel being transposed: its I axis is this layer's OUTPUT
        # features and its O axis this layer's INPUT channels — matching
        # torch's ConvTranspose2d weight (in, out, kh, kw) modulo layout.
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (k, k, self.features, in_ch),
            jnp.float32)
        pad = k - 1 - p
        y = lax.conv_transpose(
            x.astype(self.dtype), kernel.astype(self.dtype),
            strides=(s, s), padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def dap(x: jnp.ndarray, num_classes: int = 2, k: int = 3) -> jnp.ndarray:
    """Displacement-Aware Pooling head (`backbones/osb/unet.py:158-161`).

    The reference composes PixelShuffle(k) + AvgPool(k,k). Because the pooling
    window covers exactly the k*k sub-pixel block of one source pixel, the
    composition reduces *exactly* to a per-pixel mean over each class's k*k
    channel group — which is how we compute it (one reshape + mean; no
    upsample/pool traffic on the TPU).

    x: (N, H, W, num_classes * k**2), channel index c*k*k + d (torch
    pixel-shuffle order) -> (N, H, W, num_classes).
    """
    n, h, w, c = x.shape
    assert c == num_classes * k * k, (c, num_classes, k)
    return x.reshape(n, h, w, num_classes, k * k).mean(axis=-1)


def max_avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """F.max_pool2d(x, 2) + F.avg_pool2d(x, 2) (`backbones/frb/lightcnn.py:211`)."""
    mx = nn.max_pool(x, (2, 2), strides=(2, 2))
    av = nn.avg_pool(x, (2, 2), strides=(2, 2))
    return mx + av


def remat_stage_set(remat) -> frozenset:
    """Normalise a remat config value: True -> all 4 backbone stages,
    False/None -> none, sequence of stage numbers -> those stages."""
    if isinstance(remat, bool) or remat is None:
        return frozenset((1, 2, 3, 4)) if remat else frozenset()
    return frozenset(int(s) for s in remat)


def flatten_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """Flatten (N, H, W, C) -> (N, H*W*C).

    NOTE: the reference flattens NCHW (C-major; `iresnet.py:230`). Our
    canonical fc weight layout is HWC-flattened; the torch-checkpoint importer
    permutes fc weights accordingly (see tools/import_torch.py).
    """
    return x.reshape(x.shape[0], -1)
