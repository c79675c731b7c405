"""Profile the jitted train step on the live backend and itemize device time.

Captures a ``jax.profiler`` trace of N dispatches of the single-step program
(the same step ``bench.py`` times chained-in-jit), then parses the chrome
trace (``plugins/profile/*/*.trace.json.gz``), filters to the TPU device
track, and prints per-op device time aggregated by op name plus coarse
groups (EffNet trunk / camencode head / splat / bevencode / backward /
optimizer). This is the measurement tool behind docs/ROADMAP.md item 2
(EffNet small-op tail).

Usage (ONE TPU process at a time — see CLAUDE.md):
    python scripts/profile_step.py --dtype bfloat16 --steps 3 \
        --out /tmp/prof_bf16

The reference has no profiler integration at all (SURVEY.md §5.1: wall-clock
step time only, reference train_simbev.py:228,251).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(out_dir, dtype, bsz, steps, splat_method):
    import jax
    from bench import build

    # build() returns the step already jitted with donated state
    jstep, state, batch = build(bsz, splat_method, dtype)
    rng = jax.random.PRNGKey(0)

    state, metrics = jstep(state, batch, rng)  # compile + warmup
    jax.block_until_ready(metrics["loss"])

    jax.profiler.start_trace(out_dir)
    for i in range(steps):
        state, metrics = jstep(state, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(metrics["loss"])
    jax.profiler.stop_trace()


def parse(out_dir, steps):
    paths = glob.glob(os.path.join(
        out_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace under {out_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # device-op events live on the "XLA Ops" thread of the TPU device pid
    # (NOT "Async XLA Ops"/"XLA Modules"/"Steps", which would double-count)
    dev_pids = set()
    op_tids = set()
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if "TPU" in pname or "tensorcore" in pname.lower():
                dev_pids.add(e["pid"])
        elif e.get("name") == "thread_name":
            if e.get("args", {}).get("name") == "XLA Ops":
                op_tids.add((e["pid"], e["tid"]))
    per_op = collections.defaultdict(lambda: [0.0, 0, "", 0.0, 0.0])
    for e in events:
        if (e.get("ph") != "X" or e.get("pid") not in dev_pids
                or (e.get("pid"), e.get("tid")) not in op_tids):
            continue
        args = e.get("args", {}) or {}
        cat = args.get("hlo_category", "?")
        name = args.get("long_name") or e.get("name", "?")
        rec = per_op[(cat, e.get("name", "?"))]
        rec[0] += e.get("dur", 0) / 1000.0  # us -> ms total over all steps
        rec[1] += 1
        rec[2] = name
        try:
            rec[3] += float(args.get("model_flops", 0) or 0)
        except (TypeError, ValueError):
            pass
        try:
            rec[4] += float(args.get("bytes_accessed", 0) or 0)
        except (TypeError, ValueError):
            pass

    if not per_op:
        raise SystemExit(
            f"no device ops matched in {path}: expected an 'XLA Ops' thread "
            f"on a pid named like /device:TPU:* — profiler plugin naming "
            f"may have changed (pids seen: {sorted(dev_pids)})")
    rows = []
    for (cat, name), (ms, cnt, long_name, flops, byts) in per_op.items():
        rows.append((ms / steps, cnt, cat, name, long_name, flops / steps,
                     byts / steps))
    rows.sort(reverse=True)

    total = sum(r[0] for r in rows)
    by_cat = collections.defaultdict(float)
    for ms, _, cat, _, _, _, _ in rows:
        by_cat[cat] += ms

    print(f"\n== device time per step: {total:.3f} ms "
          f"({len(rows)} distinct ops) ==")
    print("\n-- hlo categories --")
    for g, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {g:<24} {ms:8.3f} ms  ({100 * ms / total:4.1f}%)")
    print("\n-- top ops --")
    print(f"  {'ms/step':>8}  {'n':>3}  {'GF':>7}  {'GB':>7}  "
          f"{'GF/s':>7}  {'GB/s':>7}  name | long_name")
    for ms, cnt, cat, name, long_name, flops, byts in rows[:50]:
        gfs = flops / 1e6 / ms if ms else 0.0
        gbs = byts / 1e6 / ms if ms else 0.0
        print(f"  {ms:8.3f}  {cnt:>3}  {flops / 1e9:7.2f}  "
              f"{byts / 1e9:7.3f}  {gfs:7.0f}  {gbs:7.0f}  "
              f"{name} | {long_name[:160]}")
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--bsz", type=int, default=8)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--splat_method", default="scatter")
    p.add_argument("--out", default="/tmp/prof_step")
    p.add_argument("--parse_only", action="store_true",
                   help="re-parse an existing trace directory")
    args = p.parse_args()

    if not args.parse_only:
        capture(args.out, args.dtype, args.bsz, args.steps,
                args.splat_method)
    parse(args.out, args.steps)


if __name__ == "__main__":
    main()
