"""Sweep XLA TPU compiler flags against the chained-in-jit bf16 train step.

The f32 bsz-16 step cliff was diagnosed as a compiler VMEM-tiling effect
(scripts/memory_analysis.py; docs/ROADMAP.md item 3), and
``--xla_tpu_scoped_vmem_limit_kib`` is the lever XLA exposes for exactly
that tradeoff. Each config runs ``bench.py --mode step`` in a fresh
subprocess (XLA flags are process-level and feed the compile cache key).

Usage:  python scripts/xla_flag_sweep.py [--bsz 8] [--dtype bfloat16]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("default", ""),
    ("vmem32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bsz", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    results = []
    for name, flags in CONFIGS:
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        print(f"=== {name}: XLA_FLAGS={env.get('XLA_FLAGS', '')!r}",
              flush=True)
        proc = subprocess.run(
            [sys.executable, "bench.py", "--mode", "step",
             "--dtype", args.dtype, "--bsz", str(args.bsz),
             "--iters", str(args.iters)],
            cwd=REPO, env=env, capture_output=True, text=True)
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
        print(f"{name:10s} {ms if ms is not None else 'FAIL'}")


if __name__ == "__main__":
    main()
