"""Post-training int8 quantization for inference (serving fast path).

The v5e runs s8xs8->s32 convolutions measurably faster than bf16 (1.24x
on the model's heavy decoder conv shape — ``scripts/int8_probe.py``; the
2x MXU-rate ratio doesn't materialize at these partly bandwidth-bound
shapes). This module quantizes the *dense* convolutions of any trained
model at inference time with no retraining and no model-code changes, via
a flax method interceptor:

* weights: static per-output-channel symmetric int8
  (``scale_c = max|W[..., c]| / 127`` — folded to compile-time constants
  when the params are closed over, as in ``serving.export_predict``);
* activations: dynamic per-tensor symmetric int8 (one ``max|x|`` reduction
  per conv — no calibration pass needed, robust to distribution shift);
* accumulation in int32, dequantize to the conv's original dtype, bias in
  float.

Depthwise convolutions (``feature_group_count > 1``) and small-channel
convs (below ``min_channels``) stay in float: they are bandwidth-bound, so
int8 buys little, and the tiny SE/head convs are accuracy-critical.

The reference has no quantized path (eager fp32 torch only); this is new
TPU-native serving capability (docs/PARITY.md).

Usage:
    from lss_carla_tpu.ops.quant import quantized_apply
    logits = quantized_apply(model, {"params": ..., "batch_stats": ...},
                             imgs, rots, trans, intrins, post_rots,
                             post_trans, train=False)
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def quantize_weight(w, axis_last: bool = True):
    """Per-output-channel symmetric int8: returns (w_i8, scale[cout])."""
    w32 = w.astype(jnp.float32)
    reduce_axes = tuple(range(w32.ndim - 1)) if axis_last else None
    scale = jnp.max(jnp.abs(w32), axis=reduce_axes) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w_i8 = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return w_i8, scale


def quantize_activation(x):
    """Dynamic per-tensor symmetric int8: returns (x_i8, scalar scale)."""
    x32 = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x32)) / 127.0, 1e-12)
    x_i8 = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return x_i8, scale


def conv_int8(x, kernel, bias, strides, padding, feature_group_count=1):
    """int8 x int8 -> int32 convolution with float dequantization.

    Matches ``nn.Conv``'s NHWC/HWIO semantics for rank-4 inputs.
    """
    out_dtype = x.dtype
    w_i8, w_scale = quantize_weight(kernel)
    x_i8, x_scale = quantize_activation(x)
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x_i8, w_i8, window_strides=tuple(strides), padding=padding,
        dimension_numbers=dn, feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (x_scale * w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _norm_padding(padding, kernel_shape):
    """nn.Conv padding spec -> lax.conv padding (str or explicit pairs)."""
    if isinstance(padding, str):
        return padding
    # flax accepts int, (int, int) per dim, or sequence of pairs
    spatial = len(kernel_shape) - 2
    if isinstance(padding, int):
        return [(padding, padding)] * spatial
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


def _is_unit(dilation, nspatial):
    if dilation is None or dilation == 1:
        return True
    try:
        return tuple(dilation) == (1,) * nspatial
    except TypeError:
        return False


def make_conv_interceptor(min_channels: int = 64):
    """Returns a flax interceptor quantizing eligible ``nn.Conv`` calls."""

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (not isinstance(mod, nn.Conv)
                or context.method_name != "__call__"):
            return next_fun(*args, **kwargs)
        x = args[0]
        nspatial = x.ndim - 2
        if (x.ndim != 4 or mod.feature_group_count != 1
                or not _is_unit(mod.kernel_dilation, nspatial)
                or not _is_unit(mod.input_dilation, nspatial)):
            return next_fun(*args, **kwargs)
        kernel = mod.variables["params"]["kernel"]
        cin, cout = kernel.shape[-2], kernel.shape[-1]
        if min(cin, cout) < min_channels:
            return next_fun(*args, **kwargs)
        strides = mod.strides or (1,) * nspatial
        if isinstance(strides, int):
            strides = (strides,) * nspatial
        bias = (mod.variables["params"]["bias"] if mod.use_bias else None)
        padding = _norm_padding(mod.padding, kernel.shape)
        return conv_int8(x, kernel, bias, strides, padding)

    return interceptor


def quantized_apply(model, variables, *args, min_channels: int = 64,
                    **kwargs):
    """``model.apply`` with eligible convs running int8 (PTQ inference)."""
    with nn.intercept_methods(make_conv_interceptor(min_channels)):
        return model.apply(variables, *args, **kwargs)


def quantized_context(min_channels: int = 64):
    """Context manager form, for wrapping an existing trace site."""
    return nn.intercept_methods(make_conv_interceptor(min_channels))
