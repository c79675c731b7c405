"""Isolated MBConv-tail timing: Pallas fused dwconv+BN-stats vs plain XLA.

VERDICT r2 item 4 (measure-or-kill): the EffNet tail runs at 250-650 GB/s
for ~3-5 ms of the bf16 train step. This bench times the
``swish(BN_train(dwconv(x)))`` stage in isolation — XLA pipeline vs the
Pallas conv+stats fusion (``ops/mbconv_pallas.py``) — at the actual B0
hot-stage shapes (bsz 8, 128x352 input), fwd and fwd+bwd, chained-in-jit
with value-dependent feedback (a ``* 0`` feedback FOLDS, CLAUDE.md).

Usage: python scripts/mbconv_bench.py [--iters 50] [--dtype bfloat16]
       [--stages block1,block2]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (kernel, stride, H, W, C) of the depthwise input at bsz-8 flagship shapes;
# C = expanded (mid) channels. Largest-traffic stages first.
STAGES = {
    "block1": (3, 2, 64, 176, 96),    # 17.3 MB bf16 in
    "block2": (3, 1, 32, 88, 144),    # 6.5 MB in+out
    "block0": (3, 1, 64, 176, 32),    # 5.8 MB
    "block3": (5, 2, 32, 88, 144),
    "block4": (5, 1, 16, 44, 240),
}


def chain(fn, x, iters):
    """fori_loop-chained timing with value-dependent feedback."""
    import jax

    def body(_, xx):
        out = fn(xx)
        # keep the carry dtype stable (fn reduces in f32; a bf16 carry would
        # otherwise widen and fail fori_loop's type check)
        return (xx * (1.0 + 1e-12 * out)).astype(xx.dtype)

    return jax.jit(lambda xx: jax.lax.fori_loop(0, iters, body, xx))


def measure(cf, x, iters):
    import jax
    r = cf(x)
    jax.block_until_ready(r)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = cf(x)
        jax.block_until_ready(r)
        times.append(time.perf_counter() - t0)
    return sorted(times)[1] / iters * 1000.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--bsz", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--stages", default="block1,block2,block0")
    args = p.parse_args()

    from __graft_entry__ import _enable_compile_cache
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from lss_carla_tpu.ops.mbconv_pallas import (fused_dw_bn_swish,
                                                 xla_dw_bn_swish)

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    results = {}
    for name in args.stages.split(","):
        k, s, H, W, C = STAGES[name]
        x = jnp.asarray(rng.normal(size=(args.bsz, H, W, C)), dt)
        w = jnp.asarray(rng.normal(size=(k, k, C)) * 0.1, dt)
        g = jnp.ones((C,), jnp.float32)
        b = jnp.zeros((C,), jnp.float32)

        variants = {
            "xla": lambda xx: jnp.mean(
                xla_dw_bn_swish(xx, w, g, b, s)[0].astype(jnp.float32)),
            "fused": lambda xx: jnp.mean(
                fused_dw_bn_swish(xx, w, g, b, s, 1e-3, False)[0]
                .astype(jnp.float32)),
        }
        row = {}
        for vname, fn in variants.items():
            fwd_ms = measure(chain(fn, x, args.iters), x, args.iters)
            grad_fn = jax.grad(fn)
            fb_ms = measure(
                chain(lambda xx: jnp.mean(grad_fn(xx).astype(jnp.float32)),
                      x, args.iters), x, args.iters)
            row[vname] = {"fwd_ms": round(fwd_ms, 4),
                          "fwd_bwd_ms": round(fb_ms, 4)}
            print(f"{name} {vname}: fwd {fwd_ms:.4f} ms, "
                  f"fwd+bwd {fb_ms:.4f} ms", file=sys.stderr, flush=True)
        row["speedup_fwd"] = round(
            row["xla"]["fwd_ms"] / row["fused"]["fwd_ms"], 3)
        row["speedup_fwd_bwd"] = round(
            row["xla"]["fwd_bwd_ms"] / row["fused"]["fwd_bwd_ms"], 3)
        results[name] = row

    print(json.dumps({"metric": "mbconv_fused_vs_xla",
                      "bsz": args.bsz, "dtype": args.dtype,
                      "stages": results}))


if __name__ == "__main__":
    main()
