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

Layout: NHWC with channels on the lane axis. One grid step per batch image;
the (H+2p, W+2p, C) padded input, f32 accumulator and output block for one
image must fit VMEM — true for every B0..B4 stage (spatial size shrinks as
channels grow). Stats accumulate in f32 across sequential grid steps in the
output blocks themselves (constant index_map keeps them VMEM-resident).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_stats_kernel(x_ref, w_ref, y_ref, sum_ref, sumsq_ref, *, kernel,
                     stride, H, W, C):
    """One batch image: depthwise conv + per-channel sum/sumsq of the output.

    x_ref: (1, H+2p, W+2p, C) zero-padded input slab (bf16/f32)
    w_ref: (kernel*kernel, 1, C) depthwise taps
    y_ref: (1, Ho, Wo, C) conv output
    sum_ref, sumsq_ref: (1, C) f32 running sums over ALL grid steps
    """
    pid = pl.program_id(0)
    Ho = (H - 1) // stride + 1
    Wo = (W - 1) // stride + 1

    slab = x_ref[0]  # (H+k-1, W+k-1, C)
    acc = jnp.zeros((Ho, Wo, C), jnp.float32)
    for kh in range(kernel):
        for kw in range(kernel):
            tap = jax.lax.slice(slab, (kh, kw, 0), (kh + H, kw + W, C),
                                (stride, stride, 1))
            wvec = w_ref[kh * kernel + kw, :, :]  # (1, C)
            acc = acc + tap.astype(jnp.float32) * wvec[None, :, :]

    y_ref[0] = acc.astype(y_ref.dtype)

    @pl.when(pid == 0)
    def _():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sumsq_ref[...] = jnp.zeros_like(sumsq_ref)

    sum_ref[...] += jnp.sum(acc, axis=(0, 1))[None, :]
    sumsq_ref[...] += jnp.sum(acc * acc, axis=(0, 1))[None, :]


def dw_conv_stats(x, w, *, stride: int = 1, interpret: bool = False):
    """Depthwise conv (SAME padding) + per-channel batch sum/sumsq.

    x: (N, H, W, C), w: (k, k, C). Returns (y (N,Ho,Wo,C) in x.dtype,
    sum (C,) f32, sumsq (C,) f32) where the sums run over all N*Ho*Wo
    outputs — exactly the moments training-mode BN needs.
    """
    N, H, W, C = x.shape
    k = w.shape[0]
    assert w.shape == (k, k, C), w.shape
    pad = (k - 1) // 2
    Ho = (H - 1) // stride + 1
    Wo = (W - 1) // stride + 1
    # SAME padding for odd k at stride 1/2 with TF-style symmetric halo:
    # total pad = k-1 split (pad, k-1-pad); stride-2 SAME on even sizes
    # needs (pad_lo, pad_hi) = (pad - (1 - H % 2) ...) — for the EffNet
    # stages here (even H, W; odd k) TF SAME at stride 2 pads (k-1)//2 - ?
    # We keep the model's own conv for edge semantics and use symmetric
    # padding here; the bench compares against an identically-padded XLA
    # conv so the measurement is apples-to-apples.
    xp = jnp.pad(x, ((0, 0), (pad, k - 1 - pad), (pad, k - 1 - pad), (0, 0)))

    kern = functools.partial(_dw_stats_kernel, kernel=k, stride=stride,
                             H=H, W=W, C=C)
    y, s, ss = pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, H + k - 1, W + k - 1, C),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k, 1, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Ho, Wo, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, Ho, Wo, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        interpret=interpret,
    )(xp, w.reshape(k * k, 1, C))
    return y, s[0], ss[0]


def _xla_dw(x, w, stride):
    """The identically-padded XLA depthwise conv (baseline + bwd path)."""
    k = w.shape[0]
    C = x.shape[-1]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w.reshape(k, k, 1, C),
        window_strides=(stride, stride),
        padding=((pad, k - 1 - pad), (pad, k - 1 - pad)),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_dw_bn_swish(x, w, gamma, beta, stride=1, eps=1e-3,
                      interpret=False):
    """swish(BN_train(dwconv(x))) with the conv+stats pass fused in Pallas.

    Returns (out, mean, var) — mean/var so a caller can update BN running
    stats exactly like flax's BatchNorm does.
    """
    y, s, ss = dw_conv_stats(x, w, stride=stride, interpret=interpret)
    out, mean, rstd = _bn_swish(y, s, ss, gamma, beta, eps)
    count = y.shape[0] * y.shape[1] * y.shape[2]
    var = jnp.maximum(ss / count - mean * mean, 0.0)
    return out, mean, var


def _fused_fwd(x, w, gamma, beta, stride, eps, interpret):
    y, s, ss = dw_conv_stats(x, w, stride=stride, interpret=interpret)
    out, mean, rstd = _bn_swish(y, s, ss, gamma, beta, eps)
    count = y.shape[0] * y.shape[1] * y.shape[2]
    var = jnp.maximum(ss / count - mean * mean, 0.0)
    return (out, mean, var), (x, w, y, mean, rstd, gamma, beta)


def _fused_bwd(stride, eps, interpret, res, cts):
    x, w, y, mean, rstd, gamma, beta = res
    g = cts[0].astype(jnp.float32)  # cotangents of mean/var are dropped:
    # callers use them only to update (non-differentiated) running stats.

    yf = y.astype(jnp.float32)
    xhat = (yf - mean) * rstd
    z = xhat * gamma + beta
    sig = jax.nn.sigmoid(z)
    dz = g * sig * (1.0 + z * (1.0 - sig))

    dgamma = jnp.sum(dz * xhat, axis=(0, 1, 2))
    dbeta = jnp.sum(dz, axis=(0, 1, 2))

    # training-BN input grad
    dxhat = dz * gamma
    dy = rstd * (dxhat
                 - jnp.mean(dxhat, axis=(0, 1, 2), keepdims=True)
                 - xhat * jnp.mean(dxhat * xhat, axis=(0, 1, 2),
                                   keepdims=True))
    dy = dy.astype(x.dtype)

    # conv grads through XLA's transpose machinery
    _, conv_vjp = jax.vjp(lambda xx, ww: _xla_dw(xx, ww, stride), x, w)
    dx, dw = conv_vjp(dy)
    return dx, dw, dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype)


fused_dw_bn_swish.defvjp(_fused_fwd, _fused_bwd)


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
