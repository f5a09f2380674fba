"""Pallas implicit-GEMM 3x3 convolution for the C=64 hot shapes.

Why this exists (PERF.md r2-r4): the flagship's MXU efficiency is bound by
iresnet18's small channel widths — a 64->64 3x3 conv at 112^2 runs ~3.6x
below the 128->128 rate because C=64 fills half the MXU's 128 lanes, and
every *semantics-preserving XLA-level* rewrite (space-to-depth, grouped
merge, sub-pixel backward, channel padding, fused-PReLU Pallas) was
measured and falsified in rounds 2-4. This kernel is the one remaining
family (VERDICT r4 #1): a hand-written Mosaic kernel that repacks the
contraction so batchxspatial rides the 128 lanes instead of channels.

Formulation (per output row h of a row-block):

  layout   x: NHWC -> xt [nb, H+2, Ci, L]   with L = bt * W  (batch packed
           into lanes; H zero-padded by 1 on both sides)
  weights  W [3,3,Ci,Co] -> W_cat [3*Co, 3*Ci],
           W_cat[dx*Co+co, dy*Ci+ci] = W[dy,dx,ci,co]
  slab     S = xt[n, h:h+3] reshaped [3*Ci, L]      (vertical taps fold
           into the contraction FOR FREE — H,C are adjacent dims)
  gemm     Y = W_cat @ S             # [3*Co, L], K = 3*Ci = 192, N = L
  combine  out[co,l] = Y1[co,l] + mask(w>0)*Y0[co,l-1]
                                 + mask(w<W-1)*Y2[co,l+1]
           (the three horizontal taps differ only by an OUTPUT lane
           shift, so one GEMM serves all three — no im2col blowup)

The MXU sees M=3*Co=192, K=3*Ci=192, N=bt*W=896 (7 full lane tiles) —
vs XLA's direct lowering where C=64 leaves half the lanes idle. The lane
packing crosses image boundaries; the two boundary lanes per image are
masked after the shift (zero-padding conv semantics).

The same kernel computes dX (a 3x3 stride-1 conv of dY with
spatially-flipped, ci/co-transposed weights); dW has its own kernel
(contract the L lanes: dW[(dy,ci),(dx,co)] = sum_l S[(dy,ci),l] *
D3[(dx,co),l] with D3 the lane-shift-masked dY row).

Reference conv sites this targets: /root/reference/backbones/frb/
iresnet.py:38-67 (BasicBlock conv1/conv2 at C=64).

VERDICT (round 5, measured on the chip — benchmarks/bench_pallas_conv.py,
artifact benchmarks/results/pallas_conv_ab_r5.json): **FALSIFIED**.
fwd/dX are numerically correct on hardware (bf16-level parity, max rel
2.3e-3) but run at 0.246x XLA at 112^2 (3.28 vs 0.81 ms) and 0.705x at
56^2 (1.26 vs 0.89 ms); with the NHWC<->lanes conversion included,
0.13x/0.38x. The dW kernel fails to lower in Mosaic (remote-compile 500)
in both the both-lanes-contracting and transposed-standard forms. Root
cause of the loss: the formulation is row-serial — each output row is one
[192,192]x[192,896] dot (66 MFLOP) chained through VPU rolls/masks/
stores, so instruction issue and the scan carry, not the MXU, bound
throughput (36 TF/s achieved; the same chip runs XLA's lowering at
146 TF/s on this op and 509 TF/s at C=128). This closes the LAST
restructuring family for the C=64 lane-underfill (after s2d, grouped,
sub-pixel, channel-pad, fused-PReLU, r2-r4): the flagship number stands
on XLA's conv lowering by measurement across every family.

Archived out of the package per the negative-results policy
(benchmarks/negative/README.md); interpret-mode correctness tests keep
it honest (test_conv_gemm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# layout transforms (XLA level — measured as part of the with-conversion A/B)

def to_lanes(x, bt: int):
    """NHWC [B,H,W,C] -> [B//bt, H, C, bt*W] (batch packed into lanes)."""
    B, H, W, C = x.shape
    if B % bt:
        raise ValueError(f"batch {B} not divisible by lane-pack {bt}")
    return (x.reshape(B // bt, bt, H, W, C)
             .transpose(0, 2, 4, 1, 3)
             .reshape(B // bt, H, C, bt * W))


def from_lanes(xt, bt: int):
    """Inverse of :func:`to_lanes`."""
    nb, H, C, L = xt.shape
    W = L // bt
    return (xt.reshape(nb, H, C, bt, W)
              .transpose(0, 3, 1, 4, 2)
              .reshape(nb * bt, H, W, C))


def pack_weights(w):
    """HWIO [3,3,Ci,Co] -> W_cat [3*Co, 3*Ci] (dx-major rows, dy-major
    cols) for the row GEMM."""
    kh, kw, Ci, Co = w.shape
    assert kh == 3 and kw == 3, "3x3 kernels only"
    return w.transpose(1, 3, 0, 2).reshape(3 * Co, 3 * Ci)


def flip_weights(w):
    """Weights of the dX conv: dX = conv(dY, rot180(W) with ci<->co)."""
    return w[::-1, ::-1].transpose(0, 1, 3, 2)


# ---------------------------------------------------------------------------
# forward kernel

def _fwd_kernel(xt_ref, wcat_ref, out_ref, slab, sem, *, rows, W, Co, Ci):
    n, r = pl.program_id(0), pl.program_id(1)
    L = slab.shape[-1]
    copy = pltpu.make_async_copy(
        xt_ref.at[n, pl.ds(r * rows, rows + 2)], slab, sem)
    copy.start()
    copy.wait()
    wcat = wcat_ref[:]                                     # [3Co, 3Ci]
    lane = jax.lax.broadcasted_iota(jnp.int32, (Co, L), 1) % W
    m_left = (lane > 0)          # lane l-1 belongs to the same image
    m_right = (lane < W - 1)     # lane l+1 belongs to the same image

    def body(h, _):
        s = slab[pl.ds(h, 3)].reshape(3 * Ci, L)           # [3Ci, L] free
        y = jax.lax.dot_general(
            wcat, s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [3Co, L]
        y0, y1, y2 = y[:Co], y[Co:2 * Co], y[2 * Co:]
        out = (y1
               + jnp.where(m_left, pltpu.roll(y0, 1, 1), 0.0)
               + jnp.where(m_right, pltpu.roll(y2, L - 1, 1), 0.0))
        out_ref[0, h] = out.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, rows, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("img_w", "rows", "interpret"))
def conv3x3_lanes(xt, wcat, img_w: int, rows: int = 28,
                  interpret: bool = False):
    """3x3 stride-1 SAME conv in the batch-in-lanes layout.

    xt: [nb, H+2, Ci, L] (H zero-padded by 1 top+bottom), wcat: [3Co, 3Ci],
    img_w: the per-image width packed into the L lanes -> [nb, H, Co, L].
    """
    nb, Hp, Ci, L = xt.shape
    H = Hp - 2
    Co = wcat.shape[0] // 3
    if H % rows:
        raise ValueError(f"H={H} not divisible by rows={rows}")
    W = img_w
    return pl.pallas_call(
        functools.partial(_fwd_kernel, rows=rows, W=W, Co=Co, Ci=Ci),
        grid=(nb, H // rows),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, Co, L),
                               lambda n, r: (n, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, H, Co, L), xt.dtype),
        scratch_shapes=[pltpu.VMEM((rows + 2, Ci, L), xt.dtype),
                        pltpu.SemaphoreType.DMA(())],
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * H * L * 9 * Ci * Co,
            bytes_accessed=2 * (xt.size + nb * H * Co * L),
            transcendentals=0),
        interpret=interpret,
    )(xt, wcat)


def conv3x3_gemm(x, w, bt: int = 8, rows: int = 28,
                 interpret: bool = False):
    """NHWC 3x3 stride-1 SAME conv via the Pallas implicit GEMM —
    including the layout conversion in and out (the honest end-to-end
    cost when the surrounding graph is NHWC)."""
    B, H, W_, C = x.shape
    xt = to_lanes(x, bt)
    xt = jnp.pad(xt, ((0, 0), (1, 1), (0, 0), (0, 0)))
    yt = conv3x3_lanes(xt, pack_weights(w), W_, rows=rows,
                       interpret=interpret)
    return from_lanes(yt, bt)


# ---------------------------------------------------------------------------
# dW kernel: contract the lane dimension

def _dw_kernel(xt_ref, dyt_ref, out_ref, slab, dslab, sem, *, rows, W, Co,
               Ci):
    n, r = pl.program_id(0), pl.program_id(1)
    L = slab.shape[-1]
    cx = pltpu.make_async_copy(
        xt_ref.at[n, pl.ds(r * rows, rows + 2)], slab, sem)
    cx.start()
    cx.wait()
    cd = pltpu.make_async_copy(dyt_ref.at[n, pl.ds(r * rows, rows)],
                               dslab, sem)
    cd.start()
    cd.wait()
    lane = jax.lax.broadcasted_iota(jnp.int32, (Co, L), 1) % W
    m_left = (lane > 0)
    m_right = (lane < W - 1)

    @pl.when(jnp.logical_and(n == 0, r == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(h, acc):
        s = slab[pl.ds(h, 3)].reshape(3 * Ci, L)          # [3Ci, L]
        d = dslab[h]                                      # [Co, L]
        # D3[(dx,co), l] = dY contribution whose x-partner sits at lane l:
        # dW[dy,dx] pairs x[.., w+dx-1] with dY[.., w]  ->  shift dY by
        # -(dx-1) so the pair shares a lane, masking the image boundary
        d0 = jnp.where(m_right, pltpu.roll(d, L - 1, 1), 0.0)  # dx=0
        d2 = jnp.where(m_left, pltpu.roll(d, 1, 1), 0.0)     # dx=2
        d3 = jnp.concatenate([d0, d, d2], axis=0)            # [3Co, L]
        # standard [M,K]@[K,N] form (the both-lanes-contracting
        # dot_general form fails to lower in Mosaic): transpose D3 once
        # per row — a [3Co, L] -> [L, 3Co] relayout, small next to the
        # K=L GEMM it feeds
        return acc + jax.lax.dot_general(
            s, d3.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [3Ci, 3Co]

    acc = jax.lax.fori_loop(
        0, rows, body, jnp.zeros((3 * Ci, 3 * Co), jnp.float32))
    out_ref[:] += acc


@functools.partial(jax.jit,
                   static_argnames=("img_w", "rows", "interpret"))
def conv3x3_dw_lanes(xt, dyt, img_w: int, rows: int = 28,
                     interpret: bool = False):
    """dW of the 3x3 stride-1 SAME conv, both operands in the
    batch-in-lanes layout. xt: [nb, H+2, Ci, L] (padded), dyt:
    [nb, H, Co, L] -> dW packed [3Ci, 3Co] (use unpack_dw)."""
    nb, Hp, Ci, L = xt.shape
    H = Hp - 2
    Co = dyt.shape[2]
    if H % rows:
        raise ValueError(f"H={H} not divisible by rows={rows}")
    W = img_w
    return pl.pallas_call(
        functools.partial(_dw_kernel, rows=rows, W=W, Co=Co, Ci=Ci),
        grid=(nb, H // rows),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((3 * Ci, 3 * Co), lambda n, r: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * Ci, 3 * Co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows + 2, Ci, L), xt.dtype),
                        pltpu.VMEM((rows, Co, L), dyt.dtype),
                        pltpu.SemaphoreType.DMA(())],
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * H * L * 9 * Ci * Co,
            bytes_accessed=2 * (xt.size + dyt.size),
            transcendentals=0),
        interpret=interpret,
    )(xt, dyt)


def unpack_dw(dw_packed, Ci, Co):
    """[3Ci, 3Co] -> HWIO [3,3,Ci,Co]: rows are dy-major (dy,ci), cols
    dx-major (dx,co)."""
    return (dw_packed.reshape(3, Ci, 3, Co).transpose(0, 2, 1, 3))


def conv3x3_gemm_dw(x, dy, bt: int = 8, rows: int = 28,
                    interpret: bool = False):
    """NHWC dW via the Pallas lane-contraction kernel (incl. layout
    conversion)."""
    B, H, W_, Ci = x.shape
    Co = dy.shape[-1]
    xt = jnp.pad(to_lanes(x, bt), ((0, 0), (1, 1), (0, 0), (0, 0)))
    dyt = to_lanes(dy, bt)
    dw = conv3x3_dw_lanes(xt, dyt, W_, rows=rows, interpret=interpret)
    return unpack_dw(dw, Ci, Co)
