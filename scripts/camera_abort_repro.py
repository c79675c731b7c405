"""Minimal repro harness for the camera-parallel XLA:CPU abort flake.

During round-2 development, full-file runs of ``tests/test_parallel_camera.py``
twice died in a SILENT C++ abort (no Python traceback, no OOM) while fetching
results right after a fresh, large shard_map compile — the sequence was:
several distinct full-model shard_map programs (predict / grad / train / eval)
compiled cold and executed back-to-back in ONE process on the virtual
8-device CPU mesh. Shrinking the grad/train/eval meshes to 1x2 made the suite
reliably green, but the trigger was never isolated.

This script reproduces that exact sequence in a fresh subprocess per trial —
all four camera-sharded programs at the original (data=2, cam=3) mesh, cold
compile + immediate execute + host fetch — and records exit codes, so the
flake can be demonstrated (or bounded: "N clean trials on this host").

Usage:
    python scripts/camera_abort_repro.py --trials 5 [--no-cache]

Each trial is a subprocess because the abort killed the whole process; the
parent survives to tally. ``--no-cache`` disables the persistent compile
cache so every trial recompiles cold (the flake only ever occurred on cold
compiles).

Findings log: docs/ROADMAP.md (camera-flake note) + CLAUDE.md.
"""

import argparse
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
if os.environ.get("REPRO_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["REPRO_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, os.path.join(os.environ["REPRO_REPO"], "tests"))
sys.path.insert(0, os.environ["REPRO_REPO"])

import numpy as np
import jax.numpy as jnp
from lss_carla_tpu.parallel.camera import (
    make_camera_sharded_eval_step, make_camera_sharded_predict,
    make_camera_sharded_train_step, make_mesh_2d, shard_batch_2d)
from lss_carla_tpu.parallel.mesh import replicate
from lss_carla_tpu.training.state import TrainState, make_optimizer
from util import tiny_batch, tiny_model

model = tiny_model()
rng = np.random.default_rng(0)
batch = tiny_batch(rng, B=2, N=6)
init = jax.jit(lambda r, *a: model.init({"params": r}, *a, train=False))
variables = init(jax.random.PRNGKey(0), *map(jnp.asarray, batch[:6]))
state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                          batch_stats=variables.get("batch_stats", {}),
                          tx=make_optimizer())

mode = os.environ.get("REPRO_MODE", "sequence")
mesh = make_mesh_2d(2, 3)
placed6 = shard_batch_2d(mesh, batch[:6])
placed7 = shard_batch_2d(mesh, batch)

if mode == "alias":
    # Hypothesis trigger (diagnosed in test_parallel_camera.py:116-121):
    # replicate()'s device-0 shard ALIASES the source buffer on the CPU
    # backend; a donating train step frees it; touching any other replica
    # of the same source afterwards double-frees -> silent C++ abort.
    rstate_a = replicate(mesh, state)   # aliases state's buffers
    rstate_b = replicate(mesh, state)   # second replica of the SAME source
    tstep = make_camera_sharded_train_step(model, mesh, pos_weight=2.13)
    print("[child] donating train step on aliased replica", flush=True)
    st2, metrics = tstep(rstate_a, placed7, jax.random.PRNGKey(1))
    float(metrics["loss"])
    print("[child] touching the second replica (double-free window)",
          flush=True)
    s = 0.0
    for leaf in jax.tree_util.tree_leaves(rstate_b.params):
        s += float(jnp.sum(jnp.abs(leaf)))
    print(f"[child] OK (sum {s:.3f})", flush=True)
else:
    # the round-2 failure sequence: distinct big shard_map programs,
    # cold-compiled and executed back-to-back in one process at a 2x3 mesh,
    # with donation handled safely (deep-copied state) — isolates whether
    # compile+execute alone ever aborts, independent of the alias bug.
    rstate = replicate(mesh, state)

    print("[child] predict compile+exec", flush=True)
    out = make_camera_sharded_predict(model, mesh)(rstate, placed6)
    np.asarray(out)  # host fetch — where the round-2 abort fired

    print("[child] train compile+exec", flush=True)
    private = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                     state)
    tstep = make_camera_sharded_train_step(model, mesh, pos_weight=2.13)
    new_state, metrics = tstep(replicate(mesh, private), placed7,
                               jax.random.PRNGKey(1))
    float(metrics["loss"])

    print("[child] eval compile+exec", flush=True)
    estep = make_camera_sharded_eval_step(model, mesh)
    valid = jnp.ones((batch[0].shape[0],), jnp.float32)
    got = estep(new_state, shard_batch_2d(mesh, batch + (valid,)))
    jax.block_until_ready(got)
    np.asarray(jax.tree_util.tree_leaves(got)[0])

    print("[child] OK", flush=True)
"""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--no-cache", action="store_true",
                   help="cold-compile every trial (flake only seen cold)")
    p.add_argument("--timeout", type=int, default=5400)
    p.add_argument("--mode", default="sequence",
                   choices=["sequence", "alias"],
                   help="sequence: the round-2 cold compile+exec chain; "
                        "alias: deliberately trip the donation/replicate "
                        "aliasing double-free")
    args = p.parse_args()

    results = []
    for t in range(args.trials):
        env = dict(os.environ)
        env["REPRO_REPO"] = REPO
        env["REPRO_MODE"] = args.mode
        if args.no_cache:
            cache = tempfile.mkdtemp(prefix=f"repro_cache_{t}_")
            env["REPRO_CACHE_DIR"] = cache
        else:
            env["REPRO_CACHE_DIR"] = os.path.expanduser(
                "~/.cache/jax_test_compilation")
        t0 = time.time()
        try:
            proc = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                                  capture_output=True, text=True,
                                  timeout=args.timeout)
            rc = proc.returncode
            tail = (proc.stdout + proc.stderr)[-2000:]
        except subprocess.TimeoutExpired as e:
            rc, tail = "timeout", str(e)[-500:]
        dt = time.time() - t0
        sig = (f" (signal {-rc}: likely the silent C++ abort)"
               if isinstance(rc, int) and rc < 0 else "")
        print(f"trial {t}: rc={rc}{sig} in {dt:.0f}s", flush=True)
        if rc != 0:
            print("--- child tail ---")
            print(tail)
        results.append(rc)

    bad = [r for r in results if r != 0]
    print(f"\n{len(results) - len(bad)}/{len(results)} clean trials"
          + (f"; failures: {bad}" if bad else ""))


if __name__ == "__main__":
    main()
