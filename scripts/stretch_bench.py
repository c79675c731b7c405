"""Chained-in-jit train-step timing for the BASELINE.json stretch config:
400x400 BEV grid at 0.25 m, 4-class output, EfficientNet-B4 trunk.

Same measurement discipline as bench.py (N iterations inside one jitted
fori_loop, donated state, median-of-3) — python dispatch loops under-measure
on this remote runtime.

Usage: python scripts/stretch_bench.py [--bsz 4] [--variant b4] [--iters 10]

``--mode infer`` times the forward path instead (chained, same discipline)
and accepts ``--quantize`` for int8-PTQ convs — the measurement ROADMAP
item 3b calls for at the compute-bound stretch shapes.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bsz", type=int, default=4)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--variant", default="b4")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--outC", type=int, default=4)
    p.add_argument("--mode", default="step", choices=["step", "infer"])
    p.add_argument("--quantize", action="store_true",
                   help="int8 PTQ convs (--mode infer only)")
    p.add_argument("--quant_min_channels", type=int, default=64)
    args = p.parse_args()
    if args.quantize and args.mode != "infer":
        p.error("--quantize only applies to --mode infer")

    from __graft_entry__ import _enable_compile_cache
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from lss_carla_tpu.configs import DataAugConf, stretch_400_grid
    from lss_carla_tpu.models.lss import compile_model
    from lss_carla_tpu.training.state import create_train_state
    from lss_carla_tpu.training.step import make_train_step

    model = compile_model(stretch_400_grid(), DataAugConf(), outC=args.outC,
                          compute_dtype=args.dtype, variant=args.variant)

    rng = np.random.default_rng(0)
    B, N, fH, fW = args.bsz, 6, 128, 352
    imgs = jnp.asarray(rng.normal(size=(B, N, 3, fH, fW)).astype(np.float32))
    eye = jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, N, 1, 1))
    intrins = (eye.at[..., 0, 0].set(200.0).at[..., 1, 1].set(200.0)
               .at[..., 0, 2].set(fW / 2).at[..., 1, 2].set(fH / 2))
    trans = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    post_trans = jnp.zeros((B, N, 3), jnp.float32)
    nx = 400
    binimgs = jnp.asarray(
        (rng.uniform(size=(B, args.outC, nx, nx)) < 0.03).astype(np.float32))
    batch = (imgs, eye, trans, intrins, eye, post_trans, binimgs)

    state = create_train_state(model, jax.random.PRNGKey(0), batch[:6])

    if args.mode == "infer":
        from lss_carla_tpu.training.step import make_predict_step
        predict = make_predict_step(None, jit=False)

        def body(_, x):
            out = predict(state, (x, *batch[1:6]))
            return x * (1.0 + 1e-12 * out[0, 0, 0, 0])

        cf = jax.jit(
            lambda x: jax.lax.fori_loop(0, args.iters, body, x))
        t0 = time.perf_counter()
        if args.quantize:
            from lss_carla_tpu.ops.quant import quantized_context
            with quantized_context(args.quant_min_channels):
                r = cf(batch[0])
        else:
            r = cf(batch[0])
        jax.block_until_ready(r)
        print(f"compile+first chain: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = cf(batch[0])
            jax.block_until_ready(r)
            times.append(time.perf_counter() - t0)
        ms = sorted(times)[1] / args.iters / args.bsz * 1000.0
        suffix = "_int8" if args.quantize else ""
        print(json.dumps({
            "metric": (f"stretch400_infer_ms_per_sample_bsz{args.bsz}"
                       f"_{args.variant}_{args.dtype}_outC{args.outC}"
                       f"{suffix}"),
            "value": round(ms, 3),
            "unit": "ms",
            "vs_baseline": None,
        }))
        return

    raw_step = make_train_step(None, pos_weight=2.13, jit=False)

    def one(i, st):
        st2, _ = raw_step(st, batch,
                          jax.random.fold_in(jax.random.PRNGKey(0), i))
        return st2

    chained = jax.jit(lambda st: jax.lax.fori_loop(0, args.iters, one, st),
                      donate_argnums=(0,))
    t0 = time.perf_counter()
    state = chained(state)
    jax.block_until_ready(state.step)
    print(f"compile+first chain: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state = chained(state)
        jax.block_until_ready(state.step)
        times.append(time.perf_counter() - t0)
    ms = sorted(times)[1] / args.iters * 1000.0
    print(json.dumps({
        "metric": (f"stretch400_train_step_ms_bsz{args.bsz}"
                   f"_{args.variant}_{args.dtype}_outC{args.outC}"),
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
