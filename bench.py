"""Benchmark: full training step (fwd+bwd+clip+Adam, one XLA program) on the
flagship SimBEV config — 6 cams x 128x352, EfficientNet-B0, D=41, 200x200 BEV
grid — at batch size 8 on one chip.

The default (``--mode all``) prints THREE JSON lines, one per metric —
f32 train step (the reference-parity dtype), bf16 inference ms/sample, and
the headline bf16 train step LAST:
    {"metric": "train_step_ms_bsz8", "value": <ms>, "unit": "ms",
     "vs_baseline": <baseline_ms / ms>}
    {"metric": "inference_ms_per_sample_bsz8", ...}
    {"metric": "train_step_ms_bsz8_bfloat16", ...}

Baseline: the reference documents ~100 ms/sample single-GPU *inference*
(reference docs/README_SIMBEV.md:186) and no training-step number; we use
8 x 100 ms = 800 ms as a conservative reference-GPU bsz-8 train-step floor (a train
step costs ~3x inference, so the true baseline is likely slower).
vs_baseline > 1 means faster than the reference; the BASELINE.json target is
>= 5.
"""

import argparse
import json
import time

import numpy as np

BASELINE_STEP_MS = 800.0  # 8 samples x ~100 ms/sample (see module docstring)


def build(bsz, splat_method="scatter", dtype="float32", remat=False,
          variant="b0", fused_dw=False):
    import jax
    from __graft_entry__ import _enable_compile_cache
    _enable_compile_cache()
    import jax.numpy as jnp
    from lss_carla_tpu.configs import DataAugConf, GridConf
    from lss_carla_tpu.models.lss import compile_model
    from lss_carla_tpu.training.state import create_train_state
    from lss_carla_tpu.training.step import make_train_step

    model = compile_model(GridConf(), DataAugConf(), outC=1,
                          splat_method=splat_method, compute_dtype=dtype,
                          remat=remat, variant=variant, fused_dw=fused_dw)
    rng = np.random.default_rng(0)
    B, N, fH, fW = bsz, 6, 128, 352
    imgs = jnp.asarray(rng.normal(size=(B, N, 3, fH, fW)).astype(np.float32))
    rots = jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, N, 1, 1))
    trans = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    intrins = jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, N, 1, 1))
    intrins = intrins.at[..., 0, 0].set(200.0).at[..., 1, 1].set(200.0)
    intrins = intrins.at[..., 0, 2].set(fW / 2).at[..., 1, 2].set(fH / 2)
    post_rots = jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, N, 1, 1))
    post_trans = jnp.zeros((B, N, 3), jnp.float32)
    binimgs = jnp.asarray(
        (rng.uniform(size=(B, 1, 200, 200)) < 0.03).astype(np.float32))
    batch = (imgs, rots, trans, intrins, post_rots, post_trans, binimgs)

    state = create_train_state(model, jax.random.PRNGKey(0), batch[:6])
    step = make_train_step(model, pos_weight=2.13)
    return step, state, batch


def bench_input(bsz: int, iters: int):
    """Host input-pipeline throughput: images/sec through the threaded
    loader (native decode path when available)."""
    import tempfile
    from lss_carla_tpu.configs import DataAugConf, GridConf
    from lss_carla_tpu.data.fixtures import generate_fixture
    from lss_carla_tpu.data.loader import DataLoader
    from lss_carla_tpu.data.simbev import SegmentationData

    root = generate_fixture(tempfile.mkdtemp(prefix="bench_input_"),
                            num_scenes=2, samples_per_scene=16,
                            H=224, W=480)
    ds = SegmentationData(root, is_train=True, data_aug_conf=DataAugConf(),
                          grid_conf=GridConf())
    dl = DataLoader(ds, batch_size=bsz, shuffle=True, drop_last=True,
                    num_workers=8)
    n_img = 0
    for b in dl:  # warmup epoch
        n_img += b[0].shape[0] * b[0].shape[1]
    t0 = time.perf_counter()
    n_img = 0
    for _ in range(iters):
        for b in dl:
            n_img += b[0].shape[0] * b[0].shape[1]
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "input_pipeline_images_per_sec",
        "value": round(n_img / dt, 1),
        "unit": "img/s",
        "vs_baseline": None,
    }))


def bench_infer(bsz, iters, dtype, quantize=False, quant_min_channels=64,
                variant="b0", compiler_options=None):
    """Forward-only latency (reference: ~100 ms/sample single GPU,
    docs/README_SIMBEV.md:186). quantize: int8 PTQ convs (ops/quant.py)."""
    import jax
    from __graft_entry__ import _enable_compile_cache
    _enable_compile_cache()
    from lss_carla_tpu.training.step import make_predict_step

    step, state, batch = build(bsz, "scatter", dtype, variant=variant)
    predict = make_predict_step(None, jit=False)

    # chain iterations inside one jit so device executions can't overlap or
    # dedupe — measures true serial latency
    def chained(imgs):
        def body(_, x):
            out = predict(state, (x, *batch[1:6]))
            return x * (1.0 + 1e-12 * out[0, 0, 0, 0])
        return jax.lax.fori_loop(0, iters, body, imgs)

    cf = jax.jit(chained, compiler_options=compiler_options or None)
    if quantize:
        from lss_carla_tpu.ops.quant import quantized_context
        with quantized_context(quant_min_channels):  # traced on first call
            r = cf(batch[0])
    else:
        r = cf(batch[0])
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = cf(batch[0])
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / iters * 1000.0
    ms_per_sample = ms / bsz
    suffix = "_int8" if quantize else ""
    if variant != "b0":
        suffix += f"_{variant}"
    print(json.dumps({
        "metric": f"inference_ms_per_sample_bsz{bsz}{suffix}",
        "value": round(ms_per_sample, 3),
        "unit": "ms",
        "vs_baseline": round(100.0 / ms_per_sample, 3),
    }))


def bench_step(bsz, iters, splat_method, dtype, remat=False, variant="b0",
               warmup=1, accum=1, fused_dw=False, compiler_options=None):
    """Chained-in-jit train-step timing; prints its JSON line.

    ``accum > 1``: gradient accumulation — the step scans ``accum`` stacked
    microbatches of ``bsz`` per optimizer update (effective batch
    bsz*accum); the reported ms is per OPTIMIZER step.
    ``compiler_options``: dict of XLA options attached to the jit compile
    request — the only way to reach TPU-backend flags over a remote
    transport whose client-side XLA_FLAGS parser doesn't know them
    (scripts/xla_flag_sweep.py)."""
    import jax
    import jax.numpy as jnp
    from lss_carla_tpu.training.step import make_train_step
    _, state, batch = build(bsz, splat_method, dtype, remat, variant,
                            fused_dw)
    if accum > 1:
        batch = tuple(jnp.broadcast_to(x, (accum,) + x.shape) for x in batch)

    # chain all iterations inside ONE jitted program: a python dispatch loop
    # under-measures on async/remote runtimes even with data dependencies
    raw_step = make_train_step(None, pos_weight=2.13, jit=False, accum_steps=accum)

    def one(i, st):
        st2, _ = raw_step(st, batch, jax.random.fold_in(
            jax.random.PRNGKey(0), i))
        return st2

    chained = jax.jit(
        lambda st: jax.lax.fori_loop(0, iters, one, st),
        donate_argnums=(0,),
        compiler_options=compiler_options or None)

    for _ in range(max(1, warmup)):   # compile + warmup chained calls
        state = chained(state)
    jax.block_until_ready(state.step)
    times = []
    for _ in range(3):                # median-of-3: robust to runtime hiccups
        t0 = time.perf_counter()
        state = chained(state)
        jax.block_until_ready(state.step)
        times.append(time.perf_counter() - t0)

    ms = sorted(times)[1] / iters * 1000.0
    suffix = "" if dtype == "float32" else f"_{dtype}"
    if variant != "b0":
        suffix += f"_{variant}"
    if accum > 1:
        suffix += f"_accum{accum}"
    if fused_dw:
        suffix += "_fused_dw"
    if compiler_options:
        suffix += "_xla" + "".join(
            f"_{k.rsplit('_', 1)[-1]}{v}" for k, v in
            sorted(compiler_options.items()))
    # vs_baseline scales the 800 ms bsz-8 floor by the effective batch
    print(json.dumps({
        "metric": f"train_step_ms_bsz{bsz}{suffix}",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_STEP_MS * accum / ms, 3),
    }), flush=True)


def _wait_for_backend():
    """Benchmark artifacts are too valuable to lose to a transient
    backend outage (see lss_carla_tpu.utils.backend)."""
    from lss_carla_tpu.utils.backend import wait_for_backend
    wait_for_backend()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bsz", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--splat_method", default="scatter",
                   choices=["scatter", "sorted", "pallas"])
    # bf16 is the shipping TPU training configuration (params/BN stats/loss
    # stay f32); use --mode step --dtype float32 for reference-parity
    # timing alone. --mode all always emits BOTH dtypes, so it rejects an
    # explicit --dtype rather than silently ignoring it.
    p.add_argument("--dtype", default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--mode", default="all",
                   choices=["all", "step", "input", "infer"])
    p.add_argument("--remat", action="store_true")
    p.add_argument("--variant", default="b0",
                   choices=["b0", "b1", "b2", "b3", "b4",
                            "resnet18", "resnet34"],
                   help="camera trunk; --mode step only — the flagship "
                        "metrics stay b0")
    p.add_argument("--accum", type=int, default=1,
                   help=">1: gradient accumulation — scan N stacked "
                        "microbatches per optimizer step (--mode step "
                        "only; effective batch bsz*N)")
    p.add_argument("--quantize", action="store_true",
                   help="int8 PTQ convs; --mode infer only")
    p.add_argument("--quant_min_channels", type=int, default=64,
                   help="quantize only convs with min(cin,cout) >= this")
    p.add_argument("--fused_dw", action="store_true",
                   help="Pallas fused dwconv+BN-stats in the EffNet train "
                        "path; --mode step only (ops/mbconv_pallas.py)")
    p.add_argument("--compiler_option", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="XLA compiler option for the jitted step, e.g. "
                        "xla_tpu_scoped_vmem_limit_kib=65536 (repeatable; "
                        "--mode step only). Rides the compile request, so "
                        "it reaches the TPU backend even where client-side "
                        "XLA_FLAGS can't")
    args = p.parse_args()

    if args.mode == "all" and args.dtype is not None:
        p.error("--mode all always emits both dtypes; use --mode step or "
                "--mode infer with --dtype for a single-dtype timing")
    if args.variant != "b0" and args.mode not in ("step", "infer"):
        p.error("--variant only applies to --mode step/infer (flagship "
                "metrics are measured on the b0 reference config)")
    if args.quantize and args.mode != "infer":
        p.error("--quantize only applies to --mode infer (training stays "
                "in float)")
    if args.accum > 1 and args.mode != "step":
        p.error("--accum only applies to --mode step")
    if args.fused_dw and args.mode != "step":
        p.error("--fused_dw only applies to --mode step (the fusion is a "
                "train-path rewrite; eval/infer use the standard convs)")
    if args.compiler_option and args.mode not in ("step", "infer"):
        p.error("--compiler_option only applies to --mode step/infer")
    compiler_options = {}
    for kv in args.compiler_option:
        if "=" not in kv:
            p.error(f"--compiler_option needs KEY=VALUE, got {kv!r}")
        k, v = kv.split("=", 1)
        compiler_options[k] = v
    dtype = args.dtype or "bfloat16"

    if args.mode != "input":
        _wait_for_backend()

    if args.mode == "input":
        bench_input(args.bsz, max(1, args.iters // 5))
    elif args.mode == "infer":
        bench_infer(args.bsz, args.iters, dtype, args.quantize,
                    args.quant_min_channels, args.variant, compiler_options)
    elif args.mode == "step":
        bench_step(args.bsz, args.iters, args.splat_method, dtype,
                   args.remat, args.variant, args.warmup, args.accum,
                   args.fused_dw, compiler_options)
    else:  # all: f32 step (reference-parity dtype), inference, and the
        # headline bf16 step LAST so single-line consumers see the headline
        bench_step(args.bsz, args.iters, args.splat_method, "float32",
                   args.remat, warmup=args.warmup)
        bench_infer(args.bsz, args.iters, "bfloat16")
        bench_step(args.bsz, args.iters, args.splat_method, "bfloat16",
                   args.remat, warmup=args.warmup)


if __name__ == "__main__":
    main()
