"""Chained-in-jit train-step timing for the BASELINE.json stretch config:
400x400 BEV grid at 0.25 m, 4-class output, EfficientNet-B4 trunk.

Same measurement discipline as bench.py (N iterations inside one jitted
fori_loop, donated state, median-of-3) — python dispatch loops under-measure
on this remote runtime.

Usage: python scripts/stretch_bench.py [--bsz 4] [--variant b4] [--iters 10]
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
    args = p.parse_args()

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
