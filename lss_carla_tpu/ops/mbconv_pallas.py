"""Pallas fused depthwise-conv + BN-batch-stats (+swish) for MBConv tails.

Round-2 profiling (`scripts/profile_step.py`) put the EffNet tail —
depthwise convs, training-mode BN, swish, SE scales — at 250-650 GB/s
individually, ~3-5 ms of the 36.5 ms bf16 train step. The XLA pipeline for
``swish(BN_train(dwconv(x)))`` moves the conv output through HBM three
times: conv writes it, the BN stats reduce reads it, normalize+swish reads
it again. This kernel fuses the stats reduce INTO the conv pass:

    y_conv, sum_c, sumsq_c = fused kernel     (read x, write y, stats free)
    mean/var/normalize+swish                  (plain XLA — it fuses these)

i.e. 4 HBM tensor passes instead of 5 for the fwd, plus whatever margin the
Pallas conv has over XLA's depthwise lowering. The backward runs the
standard XLA transpose convs via ``custom_vjp`` (the fusion win is
fwd-only by design — measure-or-kill discipline, see
``scripts/mbconv_bench.py`` and docs/ROADMAP.md).

Reference cost center: the MBConv blocks the torch reference spends its
trunk time in (reference ``src/models.py:63-84``).

Layout: NHWC with channels on the lane axis. Grid (N, row-chunks): the
(H+2p, W+2p, C) padded input slab for one image stays VMEM-resident across
its row-chunk steps (constant-in-j index map), while the output and the f32
accumulator are CHUNK-sized (TH output rows at a time, accumulated through a
VMEM scratch ref). Chunking bounds Mosaic's scoped-VMEM stack: a whole-image
f32 accumulator with the k*k tap products unrolled blew the 16 MB scoped
limit at the early large-spatial stages (measured: 17-28 MB for
(64,176,32)-shaped outputs — Mosaic does not reuse the unrolled taps'
stack slots). Stats accumulate in f32 across ALL grid steps in the
(1, C) output blocks themselves (constant index_map keeps them resident).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_stats_kernel(x_ref, w_ref, y_ref, sum_ref, sumsq_ref, acc_ref, *,
                     kernel, stride, TH, Wo, C):
    """One (image, row-chunk) grid step: depthwise conv of TH output rows +
    per-channel sum/sumsq accumulation.

    x_ref: stride 1 — (1, Hp, Wp, C) zero-padded input slab (bf16/f32),
           the SAME slab for every row-chunk of image i (constant-in-j map);
           stride 2 — (1, 2, 2, Hs, Ws, C) polyphase slabs (see impl: Mosaic
           only lowers stride-1 vector slices, so the even/odd deinterleave
           happens in XLA outside the kernel and every tap here is stride-1)
    w_ref: (kernel*kernel, 1, C) depthwise taps
    y_ref: (1, TH, Wo, C) conv output rows [j*TH, (j+1)*TH)
    sum_ref, sumsq_ref: (1, C) f32 running sums over ALL grid steps
    acc_ref: (TH, Wo, C) f32 VMEM scratch — accumulating through a ref keeps
             the unrolled taps' temporaries chunk-sized (pure dataflow
             accumulation made Mosaic stack-allocate one whole-output f32
             temporary PER TAP, 17-28 MB at the early stages)
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    r0 = j * TH  # first output row of this chunk

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for kh in range(kernel):
        for kw in range(kernel):
            if stride == 1:
                tap = x_ref[0, pl.ds(r0 + kh, TH), pl.ds(kw, Wo), :]
            else:
                # tap (kh, kw) reads padded rows 2i+kh = 2(i + kh//2) + kh%2,
                # i.e. a stride-1 window of the (kh%2, kw%2) phase slab.
                a, b = kh // 2, kw // 2
                tap = x_ref[0, kh % 2, kw % 2,
                            pl.ds(r0 + a, TH), pl.ds(b, Wo), :]
            wvec = w_ref[kh * kernel + kw, :, :]  # (1, C)
            acc_ref[...] += tap.astype(jnp.float32) * wvec[None, :, :]

    acc = acc_ref[...]
    y_ref[0] = acc.astype(y_ref.dtype)

    @pl.when((i == 0) & (j == 0))
    def _():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sumsq_ref[...] = jnp.zeros_like(sumsq_ref)

    sum_ref[...] += jnp.sum(acc, axis=(0, 1))[None, :]
    sumsq_ref[...] += jnp.sum(acc * acc, axis=(0, 1))[None, :]


def _row_chunk(Ho, Wo, C, k):
    """Largest divisor TH of Ho keeping even the WORST-case scoped-VMEM
    stack small: round 3 measured that Mosaic does not reuse the unrolled
    taps' stack slots (17-28 MB observed for whole-image accumulation at
    the (64,176,32) stages), so budget as if all k*k chunk-sized f32 tap
    temporaries are live at once, within ~4 MiB of the 16 MiB scoped
    limit."""
    budget = (4 << 20) // (k * k * Wo * C * 4)
    for th in range(min(Ho, max(budget, 1)), 0, -1):
        if Ho % th == 0:
            return th
    return Ho


def _dw_conv_stats_impl(x, w, stride, interpret):
    N, H, W, C = x.shape
    k = w.shape[0]
    assert w.shape == (k, k, C), w.shape
    # XLA/flax "SAME" semantics (asymmetric at stride 2 on even sizes):
    # total = max((ceil(H/s)-1)*s + k - H, 0), split low = total//2 —
    # exactly what nn.Conv(padding="SAME") produces, so the fused block is
    # bit-for-bit swappable into MBConvBlock.
    Ho = -(-H // stride)
    Wo = -(-W // stride)
    ph = max((Ho - 1) * stride + k - H, 0)
    pw = max((Wo - 1) * stride + k - W, 0)
    xp = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                     (pw // 2, pw - pw // 2), (0, 0)))

    if stride == 1:
        x_in = xp
        x_spec = pl.BlockSpec((1, H + ph, W + pw, C),
                              lambda i, j: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    elif stride == 2:
        # Polyphase deinterleave in XLA (Mosaic can't strided-slice inside
        # the kernel): pad to even 2*Hs x 2*Ws, split rows/cols by parity.
        # Hs/Ws cover every tap's window: phase slab row a+i needs
        # a <= (k-1)//2 and i <= Ho-1.
        Hs = Ho + (k - 1) // 2
        Ws = Wo + (k - 1) // 2
        xp = jnp.pad(xp, ((0, 0), (0, 2 * Hs - xp.shape[1]),
                          (0, 2 * Ws - xp.shape[2]), (0, 0)))
        x_in = xp.reshape(N, Hs, 2, Ws, 2, C).transpose(0, 2, 4, 1, 3, 5)
        x_spec = pl.BlockSpec((1, 2, 2, Hs, Ws, C),
                              lambda i, j: (i, 0, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        raise NotImplementedError(f"stride {stride}")

    TH = _row_chunk(Ho, Wo, C, k)
    kern = functools.partial(_dw_stats_kernel, kernel=k, stride=stride,
                             TH=TH, Wo=Wo, C=C)
    y, s, ss = pl.pallas_call(
        kern,
        grid=(N, Ho // TH),
        in_specs=[
            x_spec,
            pl.BlockSpec((k * k, 1, C), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TH, Wo, C), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, Ho, Wo, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((TH, Wo, C), jnp.float32)],
        interpret=interpret,
    )(x_in, w.reshape(k * k, 1, C))
    return y, s[0], ss[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dw_conv_stats(x, w, stride: int = 1, interpret: bool = False):
    """Depthwise conv (SAME padding) + per-channel batch sum/sumsq.

    x: (N, H, W, C), w: (k, k, C). Returns (y (N,Ho,Wo,C) in x.dtype,
    sum (C,) f32, sumsq (C,) f32) where the sums run over all N*Ho*Wo
    outputs — exactly the moments training-mode BN needs. Differentiable:
    the backward folds the sum/sumsq cotangents into the output cotangent
    (d sum/d y = 1, d sumsq/d y = 2y) and runs XLA's conv transposes, so
    BN normalize + swish composed on top autodiff normally.
    """
    return _dw_conv_stats_impl(x, w, stride, interpret)


def _dw_conv_stats_fwd(x, w, stride, interpret):
    y, s, ss = _dw_conv_stats_impl(x, w, stride, interpret)
    return (y, s, ss), (x, w, y)


def _dw_conv_stats_bwd(stride, interpret, res, cts):
    x, w, y = res
    dy, dsum, dsumsq = cts
    dy_total = (dy.astype(jnp.float32)
                + dsum[None, None, None, :]
                + 2.0 * y.astype(jnp.float32) * dsumsq[None, None, None, :])
    dy_total = dy_total.astype(x.dtype)
    _, conv_vjp = jax.vjp(lambda xx, ww: _xla_dw(xx, ww, stride), x, w)
    dx, dw = conv_vjp(dy_total)
    return dx, dw


dw_conv_stats.defvjp(_dw_conv_stats_fwd, _dw_conv_stats_bwd)


def _xla_dw(x, w, stride):
    """The identical XLA depthwise conv, SAME padding (baseline + bwd)."""
    k = w.shape[0]
    C = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w.reshape(k, k, 1, C),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
        preferred_element_type=x.dtype)


def _bn_swish(y, s, ss, gamma, beta, eps):
    """Training-mode BN (from precomputed moments) + swish, f32 math."""
    count = y.shape[0] * y.shape[1] * y.shape[2]
    mean = s / count
    var = jnp.maximum(ss / count - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    scale = (gamma * rstd).astype(jnp.float32)
    bias = beta - mean * scale
    z = y.astype(jnp.float32) * scale + bias
    out = z * jax.nn.sigmoid(z)
    return out.astype(y.dtype), mean, rstd


def fused_dw_bn_swish(x, w, gamma, beta, stride=1, eps=1e-3,
                      interpret=False):
    """swish(BN_train(dwconv(x))) with the conv+stats pass fused in Pallas.

    Returns (out, mean, var) — mean/var so a caller can update BN running
    stats exactly like flax's BatchNorm does. Differentiable end to end:
    the conv+stats op carries the custom VJP; BN normalize + swish autodiff
    in XLA (and fuse — they are elementwise with two (C,) reductions).
    """
    y, s, ss = dw_conv_stats(x, w, stride, interpret)
    out, mean, _ = _bn_swish(y, s, ss, gamma, beta, eps)
    count = y.shape[0] * y.shape[1] * y.shape[2]
    var = jnp.maximum(ss / count - mean * mean, 0.0)
    return out, mean, var


def xla_dw_bn_swish(x, w, gamma, beta, stride=1, eps=1e-3):
    """Pure-XLA reference of the same computation (baseline for the bench
    and the parity oracle for tests)."""
    y = _xla_dw(x, w, stride)
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(0, 1, 2))
    var = jnp.maximum(jnp.mean(yf * yf, axis=(0, 1, 2)) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    z = (yf - mean) * rstd * gamma + beta
    out = z * jax.nn.sigmoid(z)
    return out.astype(x.dtype), mean, var
