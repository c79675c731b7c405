"""Offline EMA-collapse diagnosis (round-4, VERDICT item 2).

Both measured --ema_decay hardware runs scored val IoU 0.0000 while the raw
model reached 0.65+:
  round 3a: EMA params + CURRENT BN running stats      -> 0.0000
  round 3b: EMA params + EMA of the running stats      -> 0.0000
    (/root/runs/r3b/abl_ema_v2.out, code at 1ae6434)

This script loads a surviving checkpoint from that run and evaluates the
four (params, batch_stats) pairings on the val split, with no training:

  raw        raw params  + raw running stats      (sanity: should score well)
  ema+emastats  EMA params + EMA'd running stats  (the shipped pairing: 0.0?)
  ema+curstats  EMA params + raw running stats    (the round-3a pairing)
  ema+recal  EMA params + RECALIBRATED stats      (SWA-style `update_bn`:
             batch moments recomputed by train-mode forwards of the EMA
             params over K train batches, cumulatively averaged)

Hypothesis: averaged weights need stats *of the averaged weights'
activations* — neither the current stats (describe newer weights) nor an
average of historical stats (avg-of-stats != stats-of-avg; the error
compounds through ~50 BN layers) is that. torch.optim.swa_utils.update_bn
exists for exactly this reason.

Recalibration math (exact, model-agnostic): flax BN in train mode updates
``new = m*old + (1-m)*batch_moment`` and normalizes with the BATCH moments
(the running stats don't affect the output), so feeding a zeros tree as
``old`` yields ``new = (1-m)*batch_moment``. One extra pass with a ones
tree gives ``new_ones = m + (1-m)*batch_moment`` -> ``m = new_ones - new``
per leaf, recovering each layer's momentum without hardcoding it.

Runs on CPU (the TPU is a serialized resource); eval math is identical.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def batch_moments(model, params, batch, momentum_tree=None):
    """Per-BN-layer batch moments for one train-mode forward at ``params``.

    Returns (moments_tree, momentum_tree). The momentum tree is computed on
    the first call (two passes) and reused after (one pass)."""
    imgs, rots, trans, intrins, post_rots, post_trans = batch[:6]
    zeros = jax.tree_util.tree_map(
        jnp.zeros_like, model_init_stats[0])

    def fwd(stats_init):
        _, muts = model.apply(
            {"params": params, "batch_stats": stats_init},
            imgs, rots, trans, intrins, post_rots, post_trans,
            train=True, rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        return muts["batch_stats"]

    new0 = fwd(zeros)
    if momentum_tree is None:
        ones = jax.tree_util.tree_map(jnp.ones_like, zeros)
        new1 = fwd(ones)
        momentum_tree = jax.tree_util.tree_map(
            lambda a, b: jnp.clip(a - b, 0.0, 1.0 - 1e-6), new1, new0)
    moments = jax.tree_util.tree_map(
        lambda n, m: n / (1.0 - m), new0, momentum_tree)
    return moments, momentum_tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/root/runs/r3b/abl_ema_v2/ckpts")
    ap.add_argument("--step", type=int, default=4000)
    ap.add_argument("--dataroot", default="/tmp/fix48")
    ap.add_argument("--bsz", type=int, default=8)
    ap.add_argument("--nworkers", type=int, default=2)
    ap.add_argument("--recal_batches", type=int, default=24)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--resize_lim", type=float, nargs=2, default=(0.70, 0.85))
    ap.add_argument("--max_val_batches", type=int, default=0,
                    help="0 = full val split")
    args = ap.parse_args()

    from lss_carla_tpu.configs import DataAugConf, GridConf
    from lss_carla_tpu.data.loader import compile_data
    from lss_carla_tpu.models.lss import compile_model
    from lss_carla_tpu.training.loop import get_val_info
    from lss_carla_tpu.training.state import (create_train_state,
                                              restore_train_state)
    from lss_carla_tpu.training.step import make_eval_step
    from lss_carla_tpu.utils.checkpoint import CheckpointManager

    grid_conf = GridConf()
    aug = DataAugConf(resize_lim=tuple(args.resize_lim))
    trainloader, valloader = compile_data(
        "unused", args.dataroot, aug, grid_conf, bsz=args.bsz,
        nworkers=args.nworkers)
    model = compile_model(grid_conf, aug, outC=1,
                          compute_dtype=args.compute_dtype)
    fH, fW = aug.final_dim
    sample = (
        jnp.zeros((1, 6, 3, fH, fW)),
        jnp.tile(jnp.eye(3), (1, 6, 1, 1)),
        jnp.zeros((1, 6, 3)),
        jnp.tile(jnp.eye(3), (1, 6, 1, 1)),
        jnp.tile(jnp.eye(3), (1, 6, 1, 1)),
        jnp.zeros((1, 6, 3)),
    )
    state = create_train_state(model, jax.random.PRNGKey(0), sample,
                               ema_decay=1.0)
    global model_init_stats
    model_init_stats = (state.batch_stats,)

    mgr = CheckpointManager(args.ckpt)
    state, meta = restore_train_state(mgr, state, step=args.step)
    print(f"restored step={meta.get('counter')} from {args.ckpt}")

    # --- tree-level distance diagnostics -------------------------------
    def tnorm(t):
        return float(jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                                  for x in jax.tree_util.tree_leaves(t))))
    dp = jax.tree_util.tree_map(lambda a, b: a - b,
                                state.params, state.ema_params)
    print(f"|params|={tnorm(state.params):.3f} "
          f"|ema_params|={tnorm(state.ema_params):.3f} "
          f"|params-ema|={tnorm(dp):.3f}")
    flat = {jax.tree_util.keystr(p): v for p, v in
            jax.tree_util.tree_leaves_with_path(state.batch_stats)}
    eflat = {jax.tree_util.keystr(p): v for p, v in
             jax.tree_util.tree_leaves_with_path(state.ema_batch_stats)}
    var_keys = [k for k in flat if "var" in k]
    ratios = [float(jnp.mean(eflat[k]) / jnp.maximum(jnp.mean(flat[k]), 1e-12))
              for k in var_keys]
    print(f"BN var mean(ema)/mean(cur) over {len(var_keys)} layers: "
          f"median {np.median(ratios):.3f} min {min(ratios):.3f} "
          f"max {max(ratios):.3f}")

    eval_fn = make_eval_step(model, pos_weight=2.13)
    vloader = valloader
    if args.max_val_batches:
        full = list(valloader)[: args.max_val_batches]
        vloader = full

    results = {}

    def run(name, params, stats):
        t0 = time.time()
        info = get_val_info(eval_fn, state.replace(params=params,
                                                   batch_stats=stats),
                            vloader, device_put=jax.device_put)
        results[name] = {"loss": info["loss"], "iou": info["iou"]}
        print(f"[{name:12s}] loss={info['loss']:.4f} iou={info['iou']:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    run("raw", state.params, state.batch_stats)
    run("ema+emastats", state.ema_params, state.ema_batch_stats)
    run("ema+curstats", state.ema_params, state.batch_stats)

    # --- SWA-style recalibration ---------------------------------------
    print(f"recalibrating BN stats: {args.recal_batches} train batches "
          "(train-mode forwards at EMA params)...", flush=True)
    t0 = time.time()
    mom_tree = None
    acc = None
    n = 0
    it = iter(trainloader)
    while n < args.recal_batches:
        try:
            batch = next(it)
        except StopIteration:
            it = iter(trainloader)
            continue
        batch = jax.device_put(tuple(batch[:6]))
        moments, mom_tree = batch_moments(model, state.ema_params, batch,
                                          mom_tree)
        acc = moments if acc is None else jax.tree_util.tree_map(
            jnp.add, acc, moments)
        n += 1
        if n % 8 == 0:
            print(f"  {n}/{args.recal_batches}", flush=True)
    recal = jax.tree_util.tree_map(lambda s: s / n, acc)
    print(f"  done ({time.time() - t0:.0f}s)")
    run("ema+recal", state.ema_params, recal)

    print(json.dumps({"step": int(meta.get("counter", -1)), **results}))


if __name__ == "__main__":
    main()
