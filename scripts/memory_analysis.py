"""HBM memory analysis of the compiled train step across configs.

Answers ROADMAP item 3 (the f32 bsz-16 step-time cliff: 217 ms vs the
~2x-of-bsz-8 expectation) with XLA's own numbers: for each config the
compiled executable's argument/output/temp/peak HBM sizes, via
``jax.stages.Compiled.memory_analysis()``. Compile-only — nothing is
executed, so this is cheap even over the remote tunnel.

    python scripts/memory_analysis.py [--configs f32:8 f32:16 bf16:16 ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def analyze(dtype: str, bsz: int):
    import jax
    from bench import build

    step, state, batch = build(bsz, "scatter",
                               "float32" if dtype == "f32" else "bfloat16")
    lowered = jax.jit(step, donate_argnums=(0,)).lower(
        state, batch, jax.random.PRNGKey(0))
    compiled = lowered.compile()
    m = compiled.memory_analysis()
    gib = 1 << 30
    alias = getattr(m, "alias_size_in_bytes", 0) or 0
    # donated state is aliased arg->output: counting it in both args and
    # outputs would overstate the true peak by ~the state size
    peak = (m.argument_size_in_bytes + m.output_size_in_bytes
            + m.temp_size_in_bytes - alias)
    print(f"{dtype} bsz={bsz}: "
          f"args {m.argument_size_in_bytes / gib:.2f} GiB, "
          f"outputs {m.output_size_in_bytes / gib:.2f} GiB, "
          f"temps {m.temp_size_in_bytes / gib:.2f} GiB, "
          f"aliased {alias / gib:.2f} GiB, "
          f"peak {peak / gib:.2f} GiB", flush=True)
    return m


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="+",
                   default=["f32:8", "f32:16", "bf16:16"])
    args = p.parse_args()
    from lss_carla_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    for cfg in args.configs:
        dtype, bsz = cfg.split(":")
        analyze(dtype, int(bsz))
