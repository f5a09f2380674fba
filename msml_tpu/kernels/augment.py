"""On-device augmentation stage: random block occlusion + Gaussian-light
relighting + flip + normalize, fused on the TPU.

The reference performs these on the host per-sample:
  * Gaussian-light relighting — `datasets/load_dataset.py:183-201,282-339`
    (156 ms / 1000 samples on CPU, load_dataset.py:329-332)
  * RandomBlock eval occlusion — `datasets/augment/rand_occ.py:25-72`
    (applied 12000x10 times per sweep ratio in qeval_mxnet.py:524-556)

Here the whole stage runs on device over the batch: a jnp implementation
(XLA fuses it into a handful of VPU loops) and a Pallas kernel variant that
generates its randomness on-core via pltpu.prng_random_bits, fusing
block-fill + light + normalize in one VMEM pass. Distributions match the
host versions (same ranges; the PRNG stream itself differs — documented).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- jnp stage
def device_input_stage(img: jnp.ndarray, rng: jax.Array,
                       gauss_light: bool = True,
                       use_norm: bool = True) -> jnp.ndarray:
    """Training-input stage for `device_light` mode: uint8 HWC batch ->
    normalized float input, fused into the jitted train step.

    Mirrors the host float path (`FaceByRandOccMask._add_gauss_to_face` +
    use_norm, reference load_dataset.py:118-127,183-201): /255, Gaussian
    relighting (same parameter distributions; the PRNG stream itself is the
    device stream — documented deviation), (x - 0.5) / 0.5. The host then
    only decodes/occludes/flips uint8 — 4x smaller host->device transfer."""
    x = img.astype(jnp.float32) / 255.0
    if gauss_light:
        x = device_gauss_light(x, rng)
    if use_norm:
        x = (x - 0.5) / 0.5
    return x


def device_gauss_light(img: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Batch relighting (load_dataset.py:183-201): light = scale *
    exp(-0.5 d^2 / r^2) with random center, r = 128, scale ~ U[0.7, 1.4];
    output renormalized to max 1. img: (B, H, W, C) in [0, 1]."""
    b, h, w, c = img.shape
    k_cx, k_cy, k_s = jax.random.split(rng, 3)
    cx = jax.random.uniform(k_cx, (b,)) * w
    cy = jax.random.uniform(k_cy, (b,)) * h
    scale = jax.random.uniform(k_s, (b,), minval=0.7, maxval=1.4)
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    d2 = (xs - cx[:, None, None]) ** 2 + (ys - cy[:, None, None]) ** 2
    light = jnp.exp(-0.5 * d2 / (128.0 ** 2)) * scale[:, None, None]
    out = img * light[..., None]
    mx = out.max(axis=(1, 2, 3), keepdims=True)
    return out / jnp.maximum(mx, 1e-6)


def device_random_block(img: jnp.ndarray, rng: jax.Array, lo: int, hi: int,
                        fill: str = "black") -> jnp.ndarray:
    """Batch RandomBlock (rand_occ.py:25-72): per-image square of area
    ratio*W*W with ratio ~ {lo..hi-1}%, filled black/white/gauss.
    img: (B, H, W, C) in [0, 1] (fill values are 0/1/noise)."""
    b, h, w, c = img.shape
    k_r, k_x, k_y, k_n = jax.random.split(rng, 4)
    ratio = jax.random.randint(k_r, (b,), lo, hi).astype(jnp.float32) * 0.01
    bw = jnp.floor(jnp.sqrt(ratio) * w).astype(jnp.int32)  # block width
    # randint upper bound is per-image (w - bw + 1): sample u in [0,1)
    x0 = (jax.random.uniform(k_x, (b,)) * (w - bw + 1)).astype(jnp.int32)
    y0 = (jax.random.uniform(k_y, (b,)) * (w - bw + 1)).astype(jnp.int32)
    xs = jnp.arange(w)[None, None, :]
    ys = jnp.arange(h)[None, :, None]
    inside = ((xs >= x0[:, None, None]) & (xs < (x0 + bw)[:, None, None])
              & (ys >= y0[:, None, None]) & (ys < (y0 + bw)[:, None, None]))
    inside = inside[..., None]
    if fill == "black":
        fill_val = jnp.zeros_like(img)
    elif fill == "white":
        fill_val = jnp.ones_like(img)
    elif fill == "gauss":
        fill_val = jax.random.normal(k_n, img.shape)
    else:
        raise ValueError(fill)
    return jnp.where(inside, fill_val, img)


@functools.partial(jax.jit, static_argnames=("lo", "hi", "fill", "use_norm",
                                             "flip", "relight"))
def device_augment_batch(img: jnp.ndarray, rng: jax.Array, lo: int = 0,
                         hi: int = 1, fill: str = "black",
                         use_norm: bool = True, flip: bool = False,
                         relight: bool = False) -> jnp.ndarray:
    """Fused eval/train preprocessing: optional flip -> RandomBlock ->
    optional gauss light -> [-1,1] normalize. img in [0,1]."""
    if flip:
        img = img[:, :, ::-1, :]
    if hi > 1 or lo > 0:
        k1, rng = jax.random.split(rng)
        img = device_random_block(img, k1, lo, hi, fill)
    if relight:
        k2, rng = jax.random.split(rng)
        img = device_gauss_light(img, k2)
    if use_norm:
        img = (img - 0.5) / 0.5
    return img


# ------------------------------------------------------------ pallas stage
def pallas_gauss_block_available() -> bool:
    try:
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False


def _u01(bits):
    """random bits -> [0, 1) float32.

    On hardware prng_random_bits materialises as signed int32; mask to the
    low 24 bits (always non-negative, exactly representable in f32) before
    converting."""
    return (bits & 0xFFFFFF).astype(jnp.float32) * (1.0 / 16777216.0)


def _gauss_block_kernel(seed_ref, img_ref, out_ref, *, lo, hi, fill_code,
                        relight, use_norm, w):
    """One image per grid step: block fill + gauss light + renorm +
    normalize, fully in VMEM."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i)
    img = img_ref[0]  # (H, W, C)
    h = img.shape[0]

    rb = pltpu.prng_random_bits((8, 128))  # one tile of scalars
    r0 = _u01(rb[0, 0])
    r1 = _u01(rb[0, 1])
    r2 = _u01(rb[0, 2])
    r3 = _u01(rb[0, 3])
    r4 = _u01(rb[0, 4])
    r5 = _u01(rb[0, 5])

    # integer iota then cast: tpu.iota only produces integer vectors
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)

    # RandomBlock (ratio in {lo..hi-1}%)
    if hi > 1 or lo > 0:
        ratio = (lo + jnp.floor(r0 * (hi - lo))) * 0.01
        bw = jnp.floor(jnp.sqrt(ratio) * w)
        x0 = jnp.floor(r1 * (w - bw + 1.0))
        y0 = jnp.floor(r2 * (w - bw + 1.0))
        # float mask (Mosaic only supports 32-bit minor-dim broadcasts)
        inside = ((xs >= x0) & (xs < x0 + bw)
                  & (ys >= y0) & (ys < y0 + bw)).astype(jnp.float32)
        if fill_code == 2:  # gauss fill from random bits (approx normal)
            nb = pltpu.prng_random_bits(img.shape)
            fill_val = (_u01(nb) - 0.5) * 3.46  # var ~ 1
        else:
            fill_val = jnp.full_like(img, float(fill_code))  # 0 black 1 white
        m = inside[..., None]
        img = img * (1.0 - m) + fill_val * m

    # gauss light
    if relight:
        cx = r3 * w
        cy = r4 * h
        scale = 0.7 + r5 * 0.7
        d2 = (xs - cx) ** 2 + (ys - cy) ** 2
        light = jnp.exp(-0.5 * d2 / (128.0 ** 2)) * scale
        img = img * light[..., None]
        img = img / jnp.maximum(jnp.max(img), 1e-6)

    if use_norm:
        img = (img - 0.5) / 0.5
    out_ref[0] = img


def pallas_augment_batch(img: jnp.ndarray, seed: int, lo: int = 0,
                         hi: int = 1, fill: str = "black",
                         use_norm: bool = True,
                         relight: bool = False) -> jnp.ndarray:
    """Pallas variant of device_augment_batch (no flip; compose outside).
    img: (B, H, W, C) float32 in [0, 1]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = img.shape
    fill_code = {"black": 0, "white": 1, "gauss": 2}[fill]
    kernel = functools.partial(_gauss_block_kernel, lo=lo, hi=hi,
                               fill_code=fill_code, relight=relight,
                               use_norm=use_norm, w=w)
    seed_arr = jnp.asarray([seed], jnp.int32)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[pl.BlockSpec((1, h, w, c), lambda i, s: (i, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, h, w, c), lambda i, s: (i, 0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(img.shape, img.dtype),
    )(seed_arr, img)
