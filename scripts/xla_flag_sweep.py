"""Sweep XLA TPU compiler options against the chained-in-jit bf16 step.

The f32 bsz-16 step cliff was diagnosed as a compiler VMEM-tiling effect
(scripts/memory_analysis.py; docs/ROADMAP.md item 3), and
``xla_tpu_scoped_vmem_limit_kib`` is the lever XLA exposes for exactly
that tradeoff.

Round-4 transport finding: TPU-backend flags CANNOT ride client-side
``XLA_FLAGS`` over the remote (axon) transport — the client's XLA parser
fatals with "Unknown flag" (it only knows CPU flags). They CAN ride the
per-compile options of ``jax.jit(compiler_options=...)``, which serialize
with the compile request; ``bench.py --compiler_option KEY=VALUE``
exposes that. Each config still runs in a fresh subprocess so a fatal in
one config can't take down the sweep (compiler_options feed the compile
cache key, so repeats are cheap).

Usage:  python scripts/xla_flag_sweep.py [--bsz 8] [--dtype bfloat16]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("default", []),
    ("vmem32m", ["xla_tpu_scoped_vmem_limit_kib=32768"]),
    ("vmem64m", ["xla_tpu_scoped_vmem_limit_kib=65536"]),
    ("vmem96m", ["xla_tpu_scoped_vmem_limit_kib=98304"]),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bsz", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--mode", default="step", choices=["step", "infer"],
                   help="which bench metric to sweep (infer: the bf16 "
                        "bsz-32 inference cliff, ROADMAP item 3)")
    p.add_argument("--vmem_kib", type=int, nargs="*", default=None,
                   help="override the scoped-VMEM ladder, KiB (e.g. "
                        "16384 32768 for the cliff-shape probe); "
                        "'default' is always included")
    args = p.parse_args()

    configs = CONFIGS
    if args.vmem_kib is not None:
        configs = [("default", [])] + [
            (f"vmem{kib // 1024}m",
             [f"xla_tpu_scoped_vmem_limit_kib={kib}"])
            for kib in args.vmem_kib]

    results = []
    for name, opts in configs:
        cmd = [sys.executable, "bench.py", "--mode", args.mode,
               "--dtype", args.dtype, "--bsz", str(args.bsz),
               "--iters", str(args.iters)]
        for kv in opts:
            cmd += ["--compiler_option", kv]
        print(f"=== {name}: {opts}", flush=True)
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")), None)
        if proc.returncode != 0 or line is None:
            print(f"{name}: FAILED rc={proc.returncode}\n"
                  f"{proc.stderr[-2000:]}", flush=True)
            results.append((name, None))
            continue
        ms = json.loads(line)["value"]
        print(f"{name}: {ms} ms", flush=True)
        results.append((name, ms))

    print("\n=== sweep summary ===")
    for name, ms in results:
        print(f"{name}: {ms if ms is not None else 'FAILED'}")
    ok = [(n, m) for n, m in results if m is not None]
    if ok:
        best = min(ok, key=lambda t: t[1])
        print(json.dumps({"metric": "xla_flag_sweep_best",
                          "config": best[0], "value": best[1],
                          "unit": "ms"}))


if __name__ == "__main__":
    main()
