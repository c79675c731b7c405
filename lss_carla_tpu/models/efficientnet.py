"""EfficientNet trunk (B0..B4) in Flax, NHWC, with endpoint harvest.

Re-implements the behavior the reference gets from ``efficientnet_pytorch``
(reference ``src/models.py:43,63-84``): the stem + 16 MBConv blocks of
EfficientNet-B0, TF-style SAME padding, swish activations,
BatchNorm(momentum=0.01 torch-convention, eps=1e-3), squeeze-excitation, and
the per-block drop-connect schedule ``rate * idx / num_blocks``
(``models.py:73-75``).

Endpoints are recorded exactly like the reference harvest loop
(``models.py:72-82``): whenever a block reduces spatial size, the *input* to
that block is saved as the next ``reduction_k``; after the loop the final
block output is appended. The classifier head (conv_head/pooling/fc) is
intentionally omitted — the reference never runs it.

Width/depth scaling follows the EfficientNet paper so the stretch configs can
use B4 (width 1.4, depth 1.8).
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from lss_carla_tpu.models.layers import Dtype, kaiming_out

# (expand_ratio, kernel, stride, in_filters, out_filters, num_repeats)
_B0_BLOCKS = (
    (1, 3, 1, 32, 16, 1),
    (6, 3, 2, 16, 24, 2),
    (6, 5, 2, 24, 40, 2),
    (6, 3, 2, 40, 80, 3),
    (6, 5, 1, 80, 112, 3),
    (6, 5, 2, 112, 192, 4),
    (6, 3, 1, 192, 320, 1),
)
_SE_RATIO = 0.25

# (width_coefficient, depth_coefficient, dropout) per variant
VARIANTS = {
    "b0": (1.0, 1.0, 0.2),
    "b1": (1.0, 1.1, 0.2),
    "b2": (1.1, 1.2, 0.3),
    "b3": (1.2, 1.4, 0.3),
    "b4": (1.4, 1.8, 0.4),
    # test/CI-only: minimum-width single-repeat trunk with the same stage/
    # stride/endpoint structure as b0 — for sharding-parity tests whose
    # XLA:CPU GSPMD compile time scales with op count, not for training
    "slim": (0.1, 0.1, 0.2),
}

# flax momentum = 1 - torch momentum (torch bn_mom = 0.01)
_BN_MOMENTUM = 0.99
_BN_EPS = 1e-3


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    """EfficientNet channel rounding (paper Appendix; divisor 8)."""
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def block_plan(variant: str) -> List[dict]:
    """Flattened per-block arguments after width/depth scaling."""
    width, depth, _ = VARIANTS[variant]
    plan = []
    for expand, k, s, cin, cout, reps in _B0_BLOCKS:
        cin_s = round_filters(cin, width)
        cout_s = round_filters(cout, width)
        for r in range(round_repeats(reps, depth)):
            plan.append(dict(
                expand=expand, kernel=k,
                stride=s if r == 0 else 1,
                cin=cin_s if r == 0 else cout_s,
                cout=cout_s,
            ))
    return plan


def _bn(train: bool, name=None, dtype=jnp.float32):
    return nn.BatchNorm(use_running_average=not train, momentum=_BN_MOMENTUM,
                        epsilon=_BN_EPS, name=name, dtype=dtype)


class _DWKernel(nn.Module):
    """Parameter-compatible stand-in for ``nn.Conv(name='depthwise_conv')``:
    declares the same ``kernel`` param (k, k, 1, mid) so fused and standard
    traces share one checkpoint tree."""
    mid: int
    kernel: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", kaiming_out,
                          (self.kernel, self.kernel, 1, self.mid))


class _FusedBNStats(nn.Module):
    """Parameter/stats-compatible stand-in for ``nn.BatchNorm(name='bn1')``
    when the batch moments were already computed by the fused Pallas conv:
    declares the same scale/bias params and mean/var running stats, applies
    the same momentum update, returns (gamma, beta)."""
    num: int

    @nn.compact
    def __call__(self, batch_mean, batch_var):
        gamma = self.param("scale", nn.initializers.ones, (self.num,))
        beta = self.param("bias", nn.initializers.zeros, (self.num,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.num,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.num,), jnp.float32))
        if not self.is_initializing():
            m = _BN_MOMENTUM
            ra_mean.value = m * ra_mean.value + (1 - m) * batch_mean
            ra_var.value = m * ra_var.value + (1 - m) * batch_var
        return gamma, beta


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation and drop-connect."""
    expand: int
    kernel: int
    stride: int
    cin: int
    cout: int
    drop_connect_rate: float = 0.0
    dtype: Dtype = jnp.float32
    fused_dw: bool = False  # Pallas conv+BN-stats fusion (train path only)

    @nn.compact
    def __call__(self, x, train: bool):
        inputs = x
        mid = self.cin * self.expand
        if self.expand != 1:
            x = nn.Conv(mid, (1, 1), use_bias=False, kernel_init=kaiming_out,
                        name="expand_conv", dtype=self.dtype)(x)
            x = _bn(train, "bn0", self.dtype)(x)
            x = nn.swish(x)

        if self.fused_dw and train:
            # Pallas fused depthwise conv + BN batch moments (one HBM pass
            # fewer than the conv -> stats-reduce -> normalize pipeline;
            # ops/mbconv_pallas.py). Shares the standard path's param tree.
            from lss_carla_tpu.ops.mbconv_pallas import dw_conv_stats
            k = _DWKernel(mid, self.kernel, name="depthwise_conv")()
            y, s, ss = dw_conv_stats(
                x, k.reshape(self.kernel, self.kernel, mid)
                    .astype(self.dtype), self.stride)
            count = y.shape[0] * y.shape[1] * y.shape[2]
            mean = s / count
            var = jnp.maximum(ss / count - mean * mean, 0.0)
            gamma, beta = _FusedBNStats(mid, name="bn1")(mean, var)
            scale = gamma * jax.lax.rsqrt(var + _BN_EPS)
            z = (y.astype(jnp.float32) * scale + (beta - mean * scale))
            x = (z * jax.nn.sigmoid(z)).astype(self.dtype)
        else:
            # depthwise, TF-style SAME padding (matches the reference
            # trunk's static same padding for these input sizes)
            x = nn.Conv(mid, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride), padding="SAME",
                        feature_group_count=mid, use_bias=False,
                        kernel_init=kaiming_out, name="depthwise_conv",
                        dtype=self.dtype)(x)
            x = _bn(train, "bn1", self.dtype)(x)
            x = nn.swish(x)

        # squeeze-excitation: squeeze channels from *input* filters
        se_ch = max(1, int(self.cin * _SE_RATIO))
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(se_ch, (1, 1), name="se_reduce", dtype=self.dtype)(se)
        se = nn.swish(se)
        se = nn.Conv(mid, (1, 1), name="se_expand", dtype=self.dtype)(se)
        x = nn.sigmoid(se) * x

        x = nn.Conv(self.cout, (1, 1), use_bias=False, kernel_init=kaiming_out,
                    name="project_conv", dtype=self.dtype)(x)
        x = _bn(train, "bn2", self.dtype)(x)

        if self.stride == 1 and self.cin == self.cout:
            if train and self.drop_connect_rate > 0:
                # drop the whole residual branch per-sample with prob `rate`
                keep = 1.0 - self.drop_connect_rate
                rng = self.make_rng("dropout")
                mask = jnp.floor(
                    keep + jax.random.uniform(rng, (x.shape[0], 1, 1, 1),
                                              x.dtype))
                x = x / keep * mask
            x = x + inputs
        return x


class EfficientNetTrunk(nn.Module):
    """Stem + MBConv blocks + endpoint harvest (no classifier head)."""
    variant: str = "b0"
    drop_connect_rate: float = 0.2
    dtype: Dtype = jnp.float32
    fused_dw: bool = False  # Pallas dwconv+BN-stats fusion in train mode

    @nn.compact
    def __call__(self, x, train: bool) -> Dict[str, jnp.ndarray]:
        width, _, _ = VARIANTS[self.variant]
        stem_ch = round_filters(32, width)
        x = x.astype(self.dtype)
        x = nn.Conv(stem_ch, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, kernel_init=kaiming_out,
                    name="conv_stem", dtype=self.dtype)(x)
        x = _bn(train, "bn_stem", self.dtype)(x)
        x = nn.swish(x)

        plan = block_plan(self.variant)
        endpoints: Dict[str, jnp.ndarray] = {}
        prev = x
        for idx, args in enumerate(plan):
            rate = self.drop_connect_rate * idx / len(plan)
            x = MBConvBlock(**args, drop_connect_rate=rate,
                            name=f"block_{idx}", dtype=self.dtype,
                            fused_dw=self.fused_dw)(x, train)
            if prev.shape[1] > x.shape[1]:
                endpoints[f"reduction_{len(endpoints) + 1}"] = prev
            prev = x
        endpoints[f"reduction_{len(endpoints) + 1}"] = x
        return endpoints

    @staticmethod
    def endpoint_channels(variant: str) -> Dict[str, int]:
        """Channel counts of each harvested endpoint (for wiring decoders)."""
        width, _, _ = VARIANTS[variant]
        plan = block_plan(variant)
        chans = {}
        k = 0
        prev_c = round_filters(32, width)  # stem output
        for idx, args in enumerate(plan):
            if args["stride"] > 1:
                k += 1
                chans[f"reduction_{k}"] = prev_c
            prev_c = args["cout"]
        chans[f"reduction_{k + 1}"] = prev_c
        return chans
