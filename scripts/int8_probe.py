"""Probe: how much faster does XLA:TPU run int8 convolutions than bf16?

Times one representative heavy conv from the model (the BevEncode decoder
3x3 at 200x200x128-ish shapes) in bf16 vs int8 (s8 x s8 -> s32 via
``preferred_element_type``), chained-in-jit.

Measured on v5e: **1.24x** (bf16 1.33 ms vs int8 1.07 ms at this shape) —
far below the 2x MXU-rate ratio, because the conv is partly
bandwidth-bound and the s32 accumulator writes are wider. An earlier
version of this probe reported 2.13x; that number was an artifact — its
integer loop-feedback term (``out * 0``) was algebraically folded, so XLA
dead-code-eliminated the int8 conv and the probe timed an empty loop. The
``timed`` helper now uses value-dependent feedback and asserts the op
survives in the compiled HLO.

Run on the TPU (one process at a time): python scripts/int8_probe.py
"""

import time

import numpy as np


def timed(fn, x, iters=50):
    """Chained-in-jit timing with a feedback term XLA cannot fold away.

    ``out * 0`` is algebraically eliminated for INTEGER dtypes (no NaN
    semantics to preserve), which silently dead-codes the op under test —
    so the feedback must actually depend on ``out``'s values: floats use
    the bench.py ``1 + 1e-12*out`` trick, ints xor in the low bit.
    """
    import jax
    import jax.numpy as jnp

    def chained(v):
        def body(_, acc):
            out = fn(acc)
            dep = out[..., :acc.shape[-1]]
            if jnp.issubdtype(acc.dtype, jnp.integer):
                return acc ^ (dep & 1).astype(acc.dtype)
            return acc * (1.0 + jnp.asarray(1e-12, acc.dtype)
                          * dep.astype(acc.dtype))
        return jax.lax.fori_loop(0, iters, body, v)

    cf = jax.jit(chained)
    # guard against silent dead-code elimination of the op under test
    hlo = cf.lower(x).compile().as_text()
    assert "convolution" in hlo or "conv" in hlo, \
        "op under test was eliminated from the compiled program"
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
          f"({flops / (ms_bf16 / 1e3) / 1e12:.0f} TFLOP/s)")
    ms_i8 = timed(conv_i8, x_i8)
    print(f"int8 conv: {ms_i8:.3f} ms  "
          f"({flops / (ms_i8 / 1e3) / 1e12:.0f} TOP/s)  "
          f"speedup {ms_bf16 / ms_i8:.2f}x")


if __name__ == "__main__":
    main()
