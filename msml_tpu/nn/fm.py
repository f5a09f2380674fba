"""Feature-Masking operators: the OSB->FRB fusion CNNs.

Parity target: `backbones/fm/fmoperator.py:35-325`:
  * `resblock_bottle` (35-68): 1x1 -> BN -> PReLU -> 3x3 -> BN -> PReLU ->
    1x1 -> BN, residual add, PReLU; bottleneck width in/2 when in <= 128
    else 128.
  * `FMCnn.forward` (277-311): concat(Yf, Yo[18ch]) -> 3x3 (or 1x1) conv ->
    N bottleneck resblocks -> tanh/sigmoid mask -> optional peer-guided path
    (conv_m mask transform, conv1/conv2 towers, MSE KD loss vs teacher) ->
    arith add/sub/div/mul with identity -> (+ f_out) -> skip connection.
  * `FMNone` (314-325): identity pass-through.

This op is MSML's inner hot path (4 calls per step, inside every backbone
stage); the whole chain is elementwise+small-conv and fuses under XLA
(measured at 8.2 ms of the 42 ms flagship step — see PERF.md; a Pallas
fusion is future work, blocked on cross-batch BN statistics in train mode).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from msml_tpu.core.precision import Policy, DEFAULT_POLICY
from msml_tpu.nn.common import PReLU, batch_norm, conv1x1, conv3x3


class ResblockBottle(nn.Module):
    """`fmoperator.py:35-68`."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        bottle = self.channels // 2 if self.channels <= 128 else 128
        identity = x
        out = conv1x1(bottle, dtype=self.dtype, name="conv1")(x)
        out = batch_norm(train, self.dtype, name="bn1")(out)
        out = PReLU(self.dtype, name="prelu1")(out)
        out = conv3x3(bottle, dtype=self.dtype, name="conv2")(out)
        out = batch_norm(train, self.dtype, name="bn2")(out)
        out = PReLU(self.dtype, name="prelu2")(out)
        out = conv1x1(self.channels, dtype=self.dtype, name="conv3")(out)
        out = batch_norm(train, self.dtype, name="bn3")(out)
        out = out + identity
        return PReLU(self.dtype, name="prelu3")(out)


class _ConvTower(nn.Module):
    """conv3x3+BN+PReLU x2 (`fmoperator.py:136-151`)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        for i in range(2):
            x = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=True, dtype=self.dtype, name=f"conv{i}")(x)
            x = batch_norm(train, self.dtype, name=f"bn{i}")(x)
            x = PReLU(self.dtype, name=f"prelu{i}")(x)
        return x


class FMCnn(nn.Module):
    """`fmoperator.py:84-311`. __call__(yf, yo, yt) -> (z_f, kd_loss|None)."""

    channel_f: int
    kernel_size: int = 3
    resblocks: int = 2
    activation: str = "tanh"       # 'tanh' | 'sigmoid'
    arith_strategy: str = "add"    # 'add' | 'sub' | 'div' | 'mul'
    use_ori: bool = False          # peer_params['use_ori']
    use_conv: bool = False         # peer_params['use_conv']
    mask_trans: str = "conv"       # 'conv' | 'invert'
    # kd_metric=False skips the f_occ/conv2 tower + KD MSE entirely. Only
    # legal when kd_loss_weight == 0 (the reference default, where the KD
    # term is a constant logit shift with zero gradient —
    # fmoperator.py:293-308 / msml.py:171): it then only feeds the logged
    # kd metric, at the cost of a full conv tower per stage.
    kd_metric: bool = True
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, yf: jnp.ndarray, yo: jnp.ndarray,
                 yt: Optional[jnp.ndarray] = None, train: bool = False
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        # `train` drives BatchNorm mode (torch module-mode parity); KD is
        # computed only when yt is given ('yt != None' means training,
        # fmoperator.py:299)
        cdt = self.policy.compute_dtype
        identity = yf.astype(cdt)
        x = jnp.concatenate([identity, yo.astype(cdt)], axis=-1)
        if self.kernel_size == 1:
            x = conv1x1(self.channel_f, dtype=cdt, name="same_conv")(x)
        else:
            x = conv3x3(self.channel_f, dtype=cdt, name="same_conv")(x)
        for i in range(self.resblocks):
            x = ResblockBottle(self.channel_f, cdt, name=f"res{i}")(x, train)
        if self.activation == "tanh":
            x = jnp.tanh(x)
        elif self.activation == "sigmoid":
            x = nn.sigmoid(x)
        else:
            raise ValueError(f"activation {self.activation}")

        # feature-distribution capture (fmoperator.py:177-200 en_save hooks);
        # no-ops unless apply(..., mutable=["intermediates"]) requests them
        self.sow("intermediates", "contaminated", identity)
        self.sow("intermediates", "mask", x)

        f_out = 0.0
        kd = None
        if self.use_ori:
            if self.mask_trans == "conv":
                m_bar = nn.Conv(self.channel_f, (3, 3),
                                padding=((1, 1), (1, 1)), use_bias=True,
                                dtype=cdt, name="conv_m")(x)
                m_bar = batch_norm(train, cdt, name="conv_m_bn")(m_bar)
            elif self.mask_trans == "invert":
                m_bar = 1.0 - x
            else:
                raise ValueError("mask_trans type error")
            f_out = m_bar * identity
            if self.use_conv:
                f_out = _ConvTower(self.channel_f, cdt, name="conv1")(f_out, train)
            if (yt is not None and self.kd_metric) \
                    or self.is_initializing():
                yt_ = identity if yt is None else yt.astype(cdt)
                f_occ = m_bar * yt_
                if self.use_conv:
                    f_occ = _ConvTower(self.channel_f, cdt, name="conv2")(
                        f_occ, train)
                if yt is not None:
                    diff = (f_occ.astype(jnp.float32)
                            - f_out.astype(jnp.float32))
                    kd = jnp.mean(diff * diff)

        if self.arith_strategy == "add":
            x = identity + x
        elif self.arith_strategy == "sub":
            x = identity - x
        elif self.arith_strategy == "div":
            x = identity / x
        elif self.arith_strategy == "mul":
            x = identity * x
        else:
            raise ValueError(f"arith {self.arith_strategy}")
        self.sow("intermediates", "purified", x)

        if self.use_ori:
            x = x + f_out
        x = x + identity  # skip connection (fmoperator.py:310)
        return x, kd


class FMNone(nn.Module):
    """`fmoperator.py:314-325`: do nothing."""

    @nn.compact
    def __call__(self, yf, yo, yt=None, train: bool = False):
        return yf, None
