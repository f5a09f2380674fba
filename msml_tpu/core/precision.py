"""Mixed-precision policy: bf16 compute / f32 params.

The TPU-native analogue of the reference's CUDA AMP (`train.py:252,267-272`,
`utils/utils_amp.py:30-85`). On TPU, bfloat16 has the same exponent range as
float32, so no loss-scaling is needed — MaxClipGradScaler's job (keeping fp16
grads finite) is done by the format itself. We keep parameters, batch-norm
statistics, the final fc/features layers and all loss math in float32,
mirroring the reference's `.float()` casts at `iresnet.py:232` and
`msml.py:169`.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)


DEFAULT_POLICY = Policy()
FULL_PRECISION = Policy(compute_dtype=jnp.float32)


def policy_from_config(fp16: bool) -> Policy:
    """Reference `fp16: true` (config.yaml:5) -> bf16 compute on TPU."""
    return DEFAULT_POLICY if fp16 else FULL_PRECISION
