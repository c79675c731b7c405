"""Probe: does XLA:TPU run int8 convolutions at ~2x bf16 MXU throughput?

Times one representative heavy conv from the model (the BevEncode decoder
3x3 at 200x200x128-ish shapes) in bf16 vs int8 (s8 x s8 -> s32 via
``preferred_element_type``), chained-in-jit. If int8 lands near 2x, a
post-training-quantized serving path is worth building; if XLA upcasts
(~1x or worse), that's the kill evidence.

Run on the TPU (one process at a time): python scripts/int8_probe.py
"""

import time

import numpy as np


def timed(fn, x, iters=50):
    import jax

    def chained(v):
        def body(_, acc):
            out = fn(acc)
            # feed a same-shaped value back through to serialize iterations
            return acc + out.astype(acc.dtype)[..., :acc.shape[-1]] * 0
        return jax.lax.fori_loop(0, iters, body, v)

    cf = jax.jit(chained)
    r = cf(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = cf(x)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    B, H, W, Cin, Cout = 8, 200, 200, 128, 128
    k = 3
    x_f = jnp.asarray(rng.normal(size=(B, H, W, Cin)).astype(np.float32))
    w_f = jnp.asarray(
        rng.normal(size=(k, k, Cin, Cout)).astype(np.float32) * 0.1)
    dn = lax.conv_dimension_numbers(x_f.shape, w_f.shape,
                                    ("NHWC", "HWIO", "NHWC"))

    flops = 2 * B * H * W * Cin * Cout * k * k

    def conv_bf16(x):
        return lax.conv_general_dilated(
            x, w_f.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.bfloat16)

    x_i8 = jnp.asarray(rng.integers(-127, 127, size=(B, H, W, Cin))
                       .astype(np.int8))
    w_i8 = jnp.asarray(rng.integers(-127, 127, size=(k, k, Cin, Cout))
                       .astype(np.int8))

    def conv_i8(x):
        return lax.conv_general_dilated(
            x, w_i8, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    ms_bf16 = timed(conv_bf16, x_f.astype(jnp.bfloat16))
    print(f"bf16 conv: {ms_bf16:.3f} ms  "
          f"({flops / ms_bf16 / 1e9:.0f} GFLOP/s)")
    ms_i8 = timed(conv_i8, x_i8)
    print(f"int8 conv: {ms_i8:.3f} ms  "
          f"({flops / ms_i8 / 1e9:.0f} GOP/s)  "
          f"speedup {ms_bf16 / ms_i8:.2f}x")


if __name__ == "__main__":
    main()
