"""Splat-variant micro-benchmark on the flagship shapes (TPU).

Times each splat implementation — forward and forward+backward — with
realistic voxel-id distributions (real frustum geometry, typical intrinsics)
at B=8, P=43296/sample, C=64, 200x200 grid, chained-in-jit (the only timing
methodology that holds on this remote runtime; see CLAUDE.md).

    python scripts/splat_bench.py --iters 50 --dtype bfloat16
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bsz", type=int, default=8)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--methods", nargs="+",
                   default=["scatter", "sorted"])
    args = p.parse_args()

    from __graft_entry__ import _enable_compile_cache
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from lss_carla_tpu.configs import DataAugConf, GridConf
    from lss_carla_tpu.ops.geometry import create_frustum, get_geometry
    from lss_carla_tpu.ops.splat import voxel_indices, voxel_pooling
    from lss_carla_tpu.ops.geometry import gen_dx_bx

    gc, ac = GridConf(), DataAugConf()
    dx, bx, nx = gen_dx_bx(gc.xbound, gc.ybound, gc.zbound)
    frustum = jnp.asarray(create_frustum(ac.final_dim, 16, gc.dbound))
    D, fH, fW = frustum.shape[:3]
    B, N, C = args.bsz, 6, 64

    rng = np.random.default_rng(0)
    eye = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    intr = eye.copy()
    intr[..., 0, 0] = intr[..., 1, 1] = 200.0
    intr[..., 0, 2], intr[..., 1, 2] = 352 / 2, 128 / 2
    # yaw the 6 cameras like a real rig so ids cover the grid realistically
    rots = eye.copy()
    for n, deg in enumerate((55, 0, -55, 110, 180, -110)):
        t = np.deg2rad(deg)
        rots[:, n] = np.array([[np.cos(t), -np.sin(t), 0],
                               [np.sin(t), np.cos(t), 0], [0, 0, 1]],
                              np.float32)
    trans = np.zeros((B, N, 3), np.float32)
    geom = get_geometry(frustum, jnp.asarray(rots), jnp.asarray(trans),
                        jnp.asarray(intr), jnp.asarray(eye),
                        jnp.asarray(np.zeros((B, N, 3), np.float32)))
    flat, valid = voxel_indices(geom, dx, bx, nx)
    print(f"in-grid fraction: {float(jnp.mean(valid)):.3f}  "
          f"P/sample={N * D * fH * fW}", flush=True)

    feats = jnp.asarray(
        rng.normal(size=(B, N, D, fH, fW, C)), jnp.dtype(args.dtype))
    geom = geom.astype(jnp.float32)

    def timeit(body, arg):
        """body: feats -> feats-shaped value with a data dependency on the
        measured computation (chained-in-jit serial timing)."""
        chained = jax.jit(lambda x: jax.lax.fori_loop(
            0, args.iters, lambda i, a: body(a), x))
        r = chained(arg)
        jax.block_until_ready(r)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(chained(arg))
            times.append(time.perf_counter() - t0)
        return sorted(times)[1] / args.iters * 1000.0

    for method in args.methods:
        def fwd(f, method=method):
            out = voxel_pooling(geom, f, dx, bx, nx, method=method)
            return f * (1.0 + 1e-12 * out[0, 0, 0, 0]).astype(f.dtype)

        def fwdbwd(f, method=method):
            out, vjp = jax.vjp(
                lambda ff: voxel_pooling(geom, ff, dx, bx, nx, method=method),
                f)
            return vjp(out)[0]

        ms_f = timeit(fwd, feats)
        ms_fb = timeit(fwdbwd, feats)
        print(f"{method:10s}: fwd {ms_f:7.3f} ms   fwd+bwd {ms_fb:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
