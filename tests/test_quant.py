"""int8 post-training quantization (ops/quant.py): op-level error bounds,
interceptor gating, full-model closeness, and quantized AOT export.

The reference has no quantized path; this is new TPU-native serving
capability (int8 convs measure 1.24x bf16 on the heavy decoder shape,
scripts/int8_probe.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from lss_carla_tpu.ops.quant import (conv_int8, make_conv_interceptor,
                                     quantize_activation, quantize_weight,
                                     quantized_apply)


def test_quantize_weight_per_channel(rng):
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))
    w = w.at[..., 0].multiply(100.0)   # one loud channel must not clip others
    w_i8, scale = quantize_weight(w)
    assert w_i8.dtype == jnp.int8 and scale.shape == (16,)
    assert int(jnp.max(jnp.abs(w_i8))) <= 127
    # dequantized error bounded by half a quantization step per channel
    err = np.abs(np.asarray(w_i8, np.float32) * np.asarray(scale) -
                 np.asarray(w))
    assert (err <= 0.5 * np.asarray(scale) + 1e-7).all()


def test_quantize_activation_symmetric(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32)) * 3.0
    x_i8, s = quantize_activation(x)
    assert x_i8.dtype == jnp.int8 and np.ndim(s) == 0
    err = np.abs(np.asarray(x_i8, np.float32) * float(s) - np.asarray(x))
    assert err.max() <= 0.5 * float(s) + 1e-7


def test_conv_int8_close_to_float(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 12, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 32, 64)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.1)
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    want = lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                    dimension_numbers=dn) + b
    got = conv_int8(x, w, b, (1, 1), ((1, 1), (1, 1)))
    denom = np.abs(np.asarray(want)).max()
    rel = np.abs(np.asarray(got) - np.asarray(want)).max() / denom
    assert rel < 0.02, rel


class _Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False)(x)                       # quantized
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=64)(x)               # depthwise: no
        x = nn.Conv(8, (1, 1))(x)                            # small: no
        return x


def test_interceptor_gating(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 64)).astype(np.float32))
    net = _Net()
    v = net.init(jax.random.PRNGKey(0), x)
    ref = net.apply(v, x)
    got = quantized_apply(net, v, x)
    # quantization must change the eligible conv's output...
    assert not np.allclose(np.asarray(got), np.asarray(ref))
    # ...but only within quantization error
    denom = np.abs(np.asarray(ref)).max()
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() / denom < 0.05
    # with the gate above every conv, nothing quantizes: bitwise identical
    ungated = quantized_apply(net, v, x, min_channels=4096)
    np.testing.assert_array_equal(np.asarray(ungated), np.asarray(ref))


@pytest.mark.slow
def test_full_model_quantized_close(rng):
    from util import tiny_batch, tiny_model
    from lss_carla_tpu.training.state import create_train_state

    model = tiny_model()
    batch = tiny_batch(rng)
    args = tuple(jnp.asarray(a) for a in batch[:6])
    state = create_train_state(model, jax.random.PRNGKey(0), args)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ref = model.apply(variables, *args, train=False)
    got = quantized_apply(model, variables, *args, train=False)
    assert got.shape == ref.shape
    # logits agree to a few percent of the logit range on random weights
    denom = np.abs(np.asarray(ref)).max()
    rel = np.abs(np.asarray(got) - np.asarray(ref)).max() / denom
    assert rel < 0.1, rel
    # and the binary decisions (threshold 0, reference get_batch_iou
    # semantics) are near-identical — random-init logits cluster at zero,
    # so this bound is loose; the trained-checkpoint IoU delta is measured
    # on hardware (docs/ACCURACY.md)
    agree = (np.asarray(got) > 0) == (np.asarray(ref) > 0)
    assert agree.mean() > 0.97


@pytest.mark.slow
def test_export_quantized_roundtrip(tmp_path, rng):
    from util import tiny_batch, tiny_model
    from lss_carla_tpu.serving import export_predict, load_predict
    from lss_carla_tpu.training.state import create_train_state

    model = tiny_model()
    batch = tiny_batch(rng, B=1)
    args = tuple(jnp.asarray(a) for a in batch[:6])
    state = create_train_state(model, jax.random.PRNGKey(0), args)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    path = str(tmp_path / "lss_int8.bin")
    export_predict(model, state, path, bsz=1, quantize=True)
    served = load_predict(path)(*args)
    live_q = quantized_apply(model, variables, *args, train=False)
    np.testing.assert_allclose(np.asarray(served), np.asarray(live_q),
                               atol=1e-5, rtol=1e-5)
