"""The training driver — reference ``train_simbev.py:23-460`` rebuilt
TPU-native.

Key differences from the reference loop, all by design:

* the entire step (forward+backward+clip+Adam) is ONE jitted XLA program,
  sharded over an ICI data mesh when more than one device is requested;
* host->device transfer is double-buffered (``prefetch_to_device``) so input
  feeding overlaps the device step;
* metric pulls are batched: loss/IoU device scalars are only synced on log
  steps, keeping the hot loop free of host round-trips;
* checkpoints are Orbax (params+opt state+BN stats+counter+epoch, best-IoU
  tracking, resume) instead of torch.save.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.data.loader import (compile_data, prefetch_to_device,
                                       stack_microbatches)
from lss_carla_tpu.models.lss import compile_model
from lss_carla_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
from lss_carla_tpu.parallel.step import (make_sharded_eval_step,
                                         make_sharded_train_step)
from lss_carla_tpu.training.state import create_train_state
from lss_carla_tpu.training.step import make_eval_step, make_train_step
from lss_carla_tpu.utils.checkpoint import CheckpointManager
from lss_carla_tpu.utils.logging import MetricLogger


def get_val_info(eval_step, state, valloader, device_put=None,
                 heartbeat=None) -> dict:
    """Run the full val loader; mean loss + dataset-level IoU
    (reference ``src/tools.py:243-270``). ``heartbeat`` is called after
    each synchronized batch (stall-watchdog feed during long validations).

    For multiclass heads (outC > 1) the result additionally carries
    ``iou_per_class`` — a list of per-class dataset IoUs (no reference
    equivalent; its metric is single-class)."""
    total = {"loss_sum": 0.0, "intersect": 0.0, "union": 0.0, "batch": 0.0}
    i_c = u_c = None
    it = iter(valloader)
    if device_put is not None:
        it = prefetch_to_device(it, size=2, device_put=device_put)
    for batch in it:
        m = eval_step(state, batch)
        for k in total:
            total[k] += float(m[k])
        if "intersect_c" in m:
            ic = np.asarray(m["intersect_c"], np.float64)
            uc = np.asarray(m["union_c"], np.float64)
            i_c = ic if i_c is None else i_c + ic
            u_c = uc if u_c is None else u_c + uc
        if heartbeat is not None:
            heartbeat()
    n = max(total["batch"], 1.0)
    union = total["union"]
    info = {"loss": total["loss_sum"] / n,
            "iou": total["intersect"] / union if union > 0 else 1.0}
    if i_c is not None and len(i_c) > 1:
        info["iou_per_class"] = [
            float(i / u) if u > 0 else 1.0 for i, u in zip(i_c, u_c)]
    return info


def train(
    dataroot,
    nepochs: int = 100,
    # image config (reference train_simbev.py:28-37 defaults)
    H: int = 224,
    W: int = 480,
    resize_lim=(1.0, 1.0),
    final_dim=(128, 352),
    bot_pct_lim=(0.0, 0.0),
    rot_lim=(0.0, 0.0),
    rand_flip: bool = False,
    ncams: int = 6,
    # training config
    max_grad_norm: float = 5.0,
    pos_weight: float = 2.13,
    logdir: str = "./runs/simbev",
    # BEV grid config
    xbound=(-50.0, 50.0, 0.5),
    ybound=(-50.0, 50.0, 0.5),
    zbound=(-10.0, 10.0, 20.0),
    dbound=(4.0, 45.0, 1.0),
    # optimization config
    bsz: int = 4,
    nworkers: int = 4,
    lr: float = 1e-3,
    weight_decay: float = 1e-7,
    lr_schedule: str = "constant",     # constant|cosine|linear (reference
                                       # trains at constant lr; schedules are
                                       # an opt-in TPU-native extra)
    warmup_steps: int = 0,
    decay_steps: int = 0,              # 0 = auto: nepochs * steps/epoch
    ema_decay: float = 0.0,            # >0 (e.g. 0.999): maintain an EMA of
                                       # the params; validation, best-IoU
                                       # tracking and the val figure then use
                                       # the smoothed model (checkpoints
                                       # carry both raw and EMA params)
    ema_bn_recal: int = 16,            # batches of SWA-style BN-stat
                                       # recalibration at each EMA validation
                                       # (training/bn_recal.py). Measured
                                       # load-bearing: both non-recalibrated
                                       # stat pairings scored val IoU 0.000-
                                       # 0.39 where raw hits 0.70
                                       # (docs/ACCURACY.md ablations).
                                       # 0 = off (use the EMA'd stats)
    accum_steps: int = 1,              # >1: gradient accumulation — each
                                       # optimizer step scans accum_steps
                                       # loader batches (effective batch
                                       # bsz*accum_steps) without the
                                       # per-step memory cliff (ROADMAP 3)
    # validation config
    val_step: int = 500,
    save_step: int = 1000,
    resume: Optional[str] = None,
    # pretrained EfficientNet trunk (reference src/models.py:43 downloads
    # ImageNet weights; here: path to an efficientnet_pytorch .pth, a
    # reference LSS .pt, an Orbax ckpt dir, or "auto" for the hub cache)
    pretrained_trunk: Optional[str] = None,
    # observability
    use_wandb: bool = False,
    wandb_project: str = "lift-splat-shoot",
    wandb_name: Optional[str] = None,
    wandb_entity: Optional[str] = None,
    viz_step: int = 100,
    iou_log_step: int = 100,  # train-IoU/step-time cadence (reference: 100)
    # TPU-native extras (no reference equivalent)
    n_devices: Optional[int] = None,   # total chips in the mesh (None = all)
    multihost: bool = False,           # multi-controller run: this process is
                                       # one host of a pod. Initializes
                                       # jax.distributed (no-op if the
                                       # launcher already did), loads this
                                       # host's input shard, assembles global
                                       # batches, logs/visualizes on process
                                       # 0 only. bsz is the GLOBAL batch.
    cam_devices: int = 1,              # camera-axis model-parallel shards:
                                       # splits the ncams cameras over a 2-D
                                       # (data, cam) mesh (parallel/camera.py);
                                       # n_devices/cam_devices = data shards
    grid_devices: int = 1,             # BEV-grid spatial shards: splits the
                                       # grid X axis over a 2-D (data, grid)
                                       # GSPMD mesh (parallel/grid.py) — the
                                       # axis for LARGE grids (400x400+);
                                       # n_devices/grid_devices = data shards
    seed: int = 42,
    splat_method: str = "scatter",
    compute_dtype: str = "float32",
    variant: str = "b0",
    fused_dw: bool = False,            # Pallas dwconv+BN-stats fusion in the
                                       # EffNet train path (ops/mbconv_pallas)
    outC: int = 1,
    label_mode: str = "vehicle_binary",  # "multiclass" for the stretch config
    label_classes=(0, 1, 2, 3),
    extrinsic_noise=None,              # (rot_deg_std, trans_m_std) or None
    device_normalize: bool = True,     # ship uint8 images, normalize in-jit
    dataset: str = "simbev",           # "simbev" | "nuscenes"
    nuscenes_version: str = "v1.0-mini",
    max_steps: Optional[int] = None,   # early stop for smoke/bench runs
    profile_dir: Optional[str] = None,  # jax.profiler trace output
    watchdog_secs: int = 0,            # stall detector (0 = off); dumps
                                       # stacks at N s, hard-exits at 2N
    debug_stall_at: int = 0,           # TESTING ONLY: freeze the step loop
                                       # at this step to fire the watchdog →
                                       # supervisor chain on purpose (the
                                       # tunnel-hang drill). Skipped on
                                       # --resume so the restarted attempt
                                       # trains through
    async_save: bool = False,          # periodic checkpoints persist in a
                                       # background thread (host IO only);
                                       # best/final/preemption saves stay
                                       # durable (utils/checkpoint.py)
):
    """Train LSS on SimBEV. Mirrors the reference CLI surface exactly; extras
    are keyword-only additions."""
    if pretrained_trunk is not None and variant.startswith("resnet"):
        # fail fast: decidable from the arguments alone, and model init
        # further down costs minutes on the TPU backend
        raise ValueError("--pretrained_trunk imports efficientnet_pytorch "
                         "weights; no import source exists for the "
                         "resnet trunk variants")
    if multihost and not jax.distributed.is_initialized():
        # before any backend/device use; a launcher may have initialized the
        # cluster already (e.g. scripts/multihost_dryrun.py --cli). No-arg
        # initialize auto-detects coordinator/process info from the TPU-pod
        # (or SLURM/k8s) environment.
        jax.distributed.initialize()
    n_procs = jax.process_count()
    proc = jax.process_index()
    is_primary = proc == 0
    from lss_carla_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    os.makedirs(logdir, exist_ok=True)

    grid_conf = GridConf(xbound=tuple(xbound), ybound=tuple(ybound),
                         zbound=tuple(zbound), dbound=tuple(dbound))
    data_aug_conf = DataAugConf(
        H=H, W=W, final_dim=tuple(final_dim), resize_lim=tuple(resize_lim),
        bot_pct_lim=tuple(bot_pct_lim), rot_lim=tuple(rot_lim),
        rand_flip=rand_flip, Ncams=ncams)

    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    n_devices = min(n_devices, len(devices))
    use_mesh = n_devices > 1
    cam_devices = max(1, int(cam_devices))
    grid_devices = max(1, int(grid_devices))
    accum_steps = max(1, int(accum_steps))
    if sum(x > 1 for x in (cam_devices, grid_devices)) > 1:
        raise ValueError("cam_devices and grid_devices are alternative "
                         "model-parallel axes — use at most one")
    if accum_steps > 1 and (cam_devices > 1 or grid_devices > 1):
        raise ValueError("accum_steps > 1 is not supported together with "
                         "cam_devices/grid_devices > 1 (accumulate on the "
                         "data axis or shard the model, not both)")
    if fused_dw and (cam_devices > 1 or grid_devices > 1):
        # the Pallas conv+stats call has no GSPMD partitioning rule: fine
        # inside the shard_map DP step (per-shard local shapes, per-chip BN
        # like the rest of that path) but not under the one-program
        # grid/camera meshes
        raise ValueError("--fused_dw composes with data parallelism only; "
                         "drop it for cam_devices/grid_devices > 1")
    if cam_devices > 1:
        if n_devices % cam_devices != 0:
            raise ValueError(f"n_devices={n_devices} must be divisible by "
                             f"cam_devices={cam_devices}")
        if ncams % cam_devices != 0:
            raise ValueError(f"ncams={ncams} must be divisible by "
                             f"cam_devices={cam_devices} (cameras shard "
                             "evenly over the cam axis)")
    if grid_devices > 1:
        if n_devices % grid_devices != 0:
            raise ValueError(f"n_devices={n_devices} must be divisible by "
                             f"grid_devices={grid_devices}")
        nx0 = int((xbound[1] - xbound[0]) / xbound[2])
        if nx0 % grid_devices != 0:
            raise ValueError(f"grid X dim {nx0} must be divisible by "
                             f"grid_devices={grid_devices} (the BEV X axis "
                             "shards evenly over the grid axis)")
        if bsz % n_devices != 0:
            raise ValueError(f"bsz={bsz} must be divisible by "
                             f"n_devices={n_devices}: the lift stage shards "
                             "the batch over the (data x grid) mesh jointly")
    n_data = n_devices // (cam_devices * grid_devices)  # data-axis shards
    if use_mesh and bsz % n_data != 0:
        raise ValueError(f"bsz={bsz} must be divisible by the data-shard "
                         f"count {n_data} (n_devices/model-parallel shards)")
    if multihost:
        if not use_mesh:
            raise ValueError("--multihost needs a device mesh "
                             "(n_devices > 1)")
        if bsz % n_procs != 0 or n_data % n_procs != 0:
            raise ValueError(
                f"global bsz={bsz} and data shards={n_data} must both be "
                f"divisible by the process count {n_procs}")

    if not is_primary:
        from lss_carla_tpu.utils.logging import NullLogger
        logger = NullLogger()
    else:
        logger = MetricLogger(logdir, use_wandb=use_wandb, wandb_kwargs={
            "project": wandb_project, "name": wandb_name,
            "entity": wandb_entity,
            "config": {"bsz": bsz, "lr": lr, "grid_conf": grid_conf.to_dict(),
                       "data_aug_conf": data_aug_conf.to_dict(),
                       "n_devices": n_devices, "cam_devices": cam_devices,
                       "grid_devices": grid_devices}})

    print("=" * 80)
    print("Training configuration:")
    print(f"  dataroot: {dataroot}")
    print(f"  logdir: {logdir}")
    mesh_desc = ""
    if cam_devices > 1:
        mesh_desc = f" = {n_data} data x {cam_devices} cam"
    elif grid_devices > 1:
        mesh_desc = f" = {n_data} data x {grid_devices} grid"
    print(f"  batch size: {bsz}  (x{n_devices} devices{mesh_desc})")
    if multihost:
        print(f"  multihost: process {proc}/{n_procs} "
              f"({jax.local_device_count()} local devices)")
    print(f"  lr: {lr}  epochs: {nepochs}  cams: {ncams}")
    print(f"  image: {H}x{W} -> {tuple(final_dim)}")
    trunk_name = variant if variant.startswith("resnet") \
        else f"efficientnet-{variant}"
    print(f"  splat: {splat_method}  trunk: {trunk_name}")
    print("=" * 80)

    if label_mode == "multiclass":
        outC = len(label_classes)
    if not isinstance(pos_weight, (int, float)):
        pos_weight = tuple(float(w) for w in pos_weight)
        if len(pos_weight) == 1:
            pos_weight = pos_weight[0]
        elif len(pos_weight) != outC:
            raise ValueError(f"--pos_weight takes 1 value or one per class "
                             f"(outC={outC}); got {len(pos_weight)}")
    if dataset == "nuscenes":
        # the nuScenes loader emits binary vehicle masks only; silently
        # accepting these would broadcast-shape through the loss
        if label_mode != "vehicle_binary":
            raise ValueError(f"dataset='nuscenes' supports only "
                             f"label_mode='vehicle_binary' (got "
                             f"{label_mode!r})")
        if extrinsic_noise is not None:
            raise ValueError("extrinsic_noise is not implemented for the "
                             "nuScenes loader")
        from lss_carla_tpu.data.nuscenes import compile_data_nuscenes
        trainloader, valloader = compile_data_nuscenes(
            nuscenes_version, dataroot, data_aug_conf, grid_conf,
            bsz=bsz // n_procs, nworkers=nworkers,
            drop_to_multiple_of=n_data if use_mesh else None,
            device_normalize=device_normalize,
            shard_index=proc, num_shards=n_procs)
    else:
        trainloader, valloader = compile_data(
            "unused", dataroot, data_aug_conf, grid_conf, bsz=bsz // n_procs,
            nworkers=nworkers, parser_name="segmentationdata",
            drop_to_multiple_of=n_data if use_mesh else None,
            shard_index=proc, num_shards=n_procs,
            dataset_kwargs={"label_mode": label_mode,
                            "label_classes": tuple(label_classes),
                            "extrinsic_noise": extrinsic_noise,
                            "device_normalize": device_normalize})
    print(f"Train batches: {len(trainloader)}  Val batches: {len(valloader)}")
    if accum_steps > len(trainloader):
        # stack_microbatches drops ragged tails, so every epoch would yield
        # ZERO optimizer steps — fail loudly instead of training nothing
        raise ValueError(f"accum_steps={accum_steps} exceeds the "
                         f"{len(trainloader)} train batches per epoch")

    model = compile_model(grid_conf, data_aug_conf, outC=outC,
                          splat_method=splat_method, variant=variant,
                          compute_dtype=compute_dtype, fused_dw=fused_dw)

    rng = jax.random.PRNGKey(seed)
    init_rng, rng = jax.random.split(rng)
    fH, fW = data_aug_conf.final_dim
    img_dtype = jnp.uint8 if device_normalize else jnp.float32
    sample_args = (
        jnp.zeros((1, ncams, 3, fH, fW), img_dtype),
        jnp.tile(jnp.eye(3), (1, ncams, 1, 1)),
        jnp.zeros((1, ncams, 3)),
        jnp.tile(jnp.eye(3), (1, ncams, 1, 1)),
        jnp.tile(jnp.eye(3), (1, ncams, 1, 1)),
        jnp.zeros((1, ncams, 3)),
    )
    if lr_schedule != "constant" and decay_steps <= 0:
        # optimizer steps per epoch (accumulation folds accum_steps loader
        # batches into one update)
        decay_steps = max(nepochs * (len(trainloader) // accum_steps),
                          warmup_steps + 1)
        print(f"  lr schedule: {lr_schedule}, warmup {warmup_steps}, "
              f"decay over {decay_steps} steps (auto)")
    if ema_decay:
        horizon = 1.0 / max(1.0 - ema_decay, 1e-9)
        planned = (max_steps if max_steps is not None
                   else nepochs * (len(trainloader) // accum_steps))
        print(f"  EMA tracking on (decay {ema_decay}, warmup-ramped, "
              f"~{horizon:.0f}-step horizon): validation and best-IoU use "
              "the averaged params"
              + (f" + BN stats recalibrated over {ema_bn_recal} recent "
                 "batches" if ema_bn_recal > 0 else
                 " + EMA'd batch stats (recal OFF — measured val IoU "
                 "0.000 with this pairing, docs/ACCURACY.md)"))
        if planned and horizon > 0.1 * planned:
            print(f"  WARNING: EMA horizon ~{horizon:.0f} steps is "
                  f">10% of the planned {planned} updates — the average "
                  "will lag a still-moving model. Use a decay "
                  f"with 1/(1-decay) well under {max(planned // 10, 1)} "
                  "for this run length.")
    state = create_train_state(model, init_rng, sample_args, lr=lr,
                               weight_decay=weight_decay,
                               max_grad_norm=max_grad_norm,
                               lr_schedule=lr_schedule,
                               warmup_steps=warmup_steps,
                               decay_steps=decay_steps,
                               ema_decay=ema_decay)
    lr_fn = None
    if lr_schedule != "constant" or warmup_steps:
        from lss_carla_tpu.training.state import make_lr_schedule
        lr_fn = make_lr_schedule(lr, lr_schedule, warmup_steps, decay_steps)
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(state.params))
    print(f"Number of trainable parameters: {n_params:,}")

    if pretrained_trunk is not None:
        # applied before (and overridden by) --resume, like the reference:
        # from_pretrained at model build, checkpoint load afterwards
        from lss_carla_tpu.utils.convert import (merge_trunk_variables,
                                                 trunk_variables_from_checkpoint)
        trunk = trunk_variables_from_checkpoint(pretrained_trunk, variant)
        merged = merge_trunk_variables(
            {"params": jax.device_get(state.params),
             "batch_stats": jax.device_get(state.batch_stats)}, trunk)
        state = state.replace(params=merged["params"],
                              batch_stats=merged["batch_stats"],
                              # re-seed the EMA: it was seeded from the
                              # random init before the trunk merge (copy,
                              # not alias — the train step donates both)
                              ema_params=(jax.tree_util.tree_map(
                                  jnp.copy, merged["params"])
                                  if state.ema_params is not None else None),
                              ema_batch_stats=(jax.tree_util.tree_map(
                                  jnp.copy, merged["batch_stats"])
                                  if state.ema_batch_stats is not None
                                  else None))
        print(f"Loaded pretrained trunk from {pretrained_trunk}")

    # mesh + state placement BEFORE checkpoint restore: a multi-controller
    # restore must target globally-sharded abstract arrays (orbax restores
    # each process's addressable shards; see utils/checkpoint.ocp_abstract)
    do_replicate = replicate
    if multihost:
        from lss_carla_tpu.parallel.mesh import (process_local_put,
                                                 replicate_global)
        do_replicate = replicate_global
    if use_mesh and cam_devices > 1:
        # 2-D (data, cam) mesh: batch over data shards, cameras over cam
        # shards; partial splat + BEV psum inside the step (parallel/camera.py)
        from lss_carla_tpu.parallel.camera import (
            make_camera_sharded_eval_step, make_camera_sharded_train_step,
            make_mesh_2d, shard_batch_2d, shard_batch_2d_local)
        mesh = make_mesh_2d(n_data, cam_devices)
        state = do_replicate(mesh, state)
        train_fn = make_camera_sharded_train_step(model, mesh, pos_weight,
                                                  ema_decay=ema_decay)
        eval_fn = make_camera_sharded_eval_step(model, mesh, pos_weight)
        if multihost:
            device_put = lambda b: shard_batch_2d_local(mesh, b)  # noqa: E731
        else:
            device_put = lambda b: shard_batch_2d(mesh, b)  # noqa: E731
    elif use_mesh and grid_devices > 1:
        # 2-D (data, grid) GSPMD mesh: lift batch-split over all chips, BEV
        # X axis space-split for the decode (parallel/grid.py)
        from lss_carla_tpu.parallel.grid import (
            make_grid_sharded_eval_step, make_grid_sharded_train_step,
            make_mesh_grid, shard_batch_grid, shard_batch_grid_local)
        mesh = make_mesh_grid(n_data, grid_devices)
        state = do_replicate(mesh, state)
        train_fn = make_grid_sharded_train_step(model, mesh, pos_weight,
                                                ema_decay=ema_decay)
        eval_fn = make_grid_sharded_eval_step(model, mesh, pos_weight)
        if multihost:
            device_put = lambda b: shard_batch_grid_local(mesh, b)  # noqa: E731
        else:
            device_put = lambda b: shard_batch_grid(mesh, b)  # noqa: E731
    elif use_mesh:
        mesh = make_mesh(n_devices)
        state = do_replicate(mesh, state)
        train_fn = make_sharded_train_step(model, mesh, pos_weight,
                                           ema_decay=ema_decay,
                                           accum_steps=accum_steps)
        eval_fn = make_sharded_eval_step(model, mesh, pos_weight)
        sharding = batch_sharding(mesh)
        if multihost:
            device_put = process_local_put(sharding)
        else:
            device_put = lambda b: jax.device_put(b, sharding)  # noqa: E731
    else:
        train_fn = make_train_step(model, pos_weight, ema_decay=ema_decay,
                                   accum_steps=accum_steps)
        eval_fn = make_eval_step(model, pos_weight)
        device_put = jax.device_put

    # train batches are (accum_steps, B, ...) stacks when accumulating:
    # microbatch axis replicated, batch axis sharded (val keeps device_put)
    device_put_train = device_put
    if accum_steps > 1 and use_mesh:
        from lss_carla_tpu.parallel.mesh import microbatched_sharding
        mb_sharding = microbatched_sharding(mesh)
        if multihost:
            device_put_train = process_local_put(mb_sharding)
        else:
            device_put_train = \
                lambda b: jax.device_put(b, mb_sharding)  # noqa: E731

    if multihost:
        # first cross-process sync of the run: orbax's CheckpointManager
        # init allgathers across processes, and the gloo rendezvous window
        # (~30 s) is far shorter than the model-init compile skew between a
        # cache-hitting and a cold-compiling host. Re-align on the KV store
        # (long timeout) first.
        from lss_carla_tpu.parallel.mesh import process_barrier
        process_barrier("pre_ckpt_manager")
    ckpt = CheckpointManager(os.path.join(logdir, "ckpts"),
                             async_save=async_save)
    counter, start_epoch, best_val_iou = 0, 0, 0.0
    if resume is not None:
        mgr = ckpt if os.path.abspath(resume) == ckpt.directory else \
            CheckpointManager(resume)
        from lss_carla_tpu.training.state import restore_train_state
        state, meta = restore_train_state(mgr, state)
        if use_mesh and not multihost:
            # single-process restore yields host arrays (sharding-free
            # abstract); multihost restore is already globally sharded
            state = replicate(mesh, state)
        counter = int(meta.get("counter", 0))
        start_epoch = int(meta.get("epoch", 0))
        # periodic/preemption checkpoint meta carries no val_iou; without
        # consulting best.json a resumed run would reset best tracking to 0
        # and overwrite the saved best with a worse model
        candidates = [float(meta.get("val_iou", 0.0))]
        for m in ([mgr] if mgr is ckpt else [mgr, ckpt]):
            if m.best_val_iou() is not None:
                candidates.append(m.best_val_iou())
        best_val_iou = max(candidates)
        print(f"Resumed from step {counter}, epoch {start_epoch} "
              f"(best val IoU so far {best_val_iou:.4f})")

    def eval_state_of(s):
        """State whose params validation/val-viz should read: the EMA
        average when tracked (the model that would be served), else the
        raw training params. The EMA params come with ``ema_batch_stats``
        — which ``recal_ema_stats`` below refreshes to the averaged
        weights' OWN batch moments at each validation (both lagged-stat
        pairings measured val IoU 0.000-0.39 where raw params + their own
        stats score 0.70; docs/ACCURACY.md ablations)."""
        if not ema_decay:
            return s
        return s.replace(params=s.ema_params,
                         batch_stats=(s.ema_batch_stats
                                      if s.ema_batch_stats is not None
                                      else s.batch_stats))

    # SWA-style BN recalibration (training/bn_recal.py): a rolling window
    # of the last K training batches feeds train-mode forwards at the EMA
    # params right before each validation; the checkpointed
    # ema_batch_stats then always describe the averaged weights'
    # activations (best/periodic saves happen after validation, so
    # explore/serving --ema read the recalibrated pair).
    import collections
    recal_window = collections.deque(
        maxlen=max(int(ema_bn_recal), 0) or None) \
        if ema_decay and ema_bn_recal > 0 else None
    recalibrator = None

    def recal_ema_stats(s):
        """Refresh s.ema_batch_stats from the recal window (no-op when
        recalibration is off or no batches have been seen yet)."""
        nonlocal recalibrator
        if recal_window is None or not recal_window:
            return s
        if recalibrator is None:
            from lss_carla_tpu.training.bn_recal import BNRecalibrator
            recalibrator = BNRecalibrator(model, s.batch_stats)
        inputs = [tuple(x[0] for x in b) if accum_steps > 1 else b
                  for b in recal_window]
        try:
            stats = recalibrator.recalibrate(s.ema_params, inputs)
        except Exception as e:  # recal must never kill training
            print(f"  EMA BN recalibration failed ({e}); "
                  "falling back to the EMA'd stats")
            return s
        return s.replace(ema_batch_stats=stats)

    predict_fn = None
    viz_val_batch = None  # fetched once, mesh-placed once, reused forever
    if multihost and viz_step:
        # the figure path fetches sample 0 to one host; running predict on
        # process 0 alone would hang the others' collectives, and an
        # all-process gather for a debug figure isn't worth it — scalar
        # metrics (replicated) still log normally on process 0
        print("multihost: figure visualization disabled")
        viz_step = 0
    if viz_step:
        if use_mesh and cam_devices > 1:
            from lss_carla_tpu.parallel.camera import \
                make_camera_sharded_predict
            predict_fn = make_camera_sharded_predict(model, mesh)
        elif use_mesh and grid_devices > 1:
            from lss_carla_tpu.parallel.grid import make_grid_sharded_predict
            predict_fn = make_grid_sharded_predict(model, mesh)
        else:
            from lss_carla_tpu.training.step import make_predict_step
            predict_fn = make_predict_step(model)
        # Pre-compile NOW (at the runtime batch size and sharding), before
        # any prefetch thread exists: a first-time compile on the viz path
        # while the producer thread is mid-transfer deadlocks on runtimes
        # whose transport is not thread-safe. Warm with the REAL val viz
        # batch placed via the mesh-aware device_put — the val loader pads
        # every batch to a static full shape, so this is exactly the
        # shape+sharding the validation viz will replay (no mid-run
        # recompile, and no per-validation prefetch pipeline for one batch).
        try:
            for vb in iter(valloader):
                viz_val_batch = device_put(vb[:7])
                break
            warm = viz_val_batch[:6] if viz_val_batch is not None else \
                device_put(tuple(np.zeros((bsz,) + a.shape[1:], a.dtype)
                                 for a in sample_args))
            jax.block_until_ready(predict_fn(state, warm))
            # train batches carry ncams cameras while val batches always
            # carry all 6 — a different shape would recompile mid-run on
            # the first train-viz call (the exact hazard above)
            if viz_val_batch is not None \
                    and viz_val_batch[0].shape[1] != ncams:
                warm_train = device_put(tuple(
                    np.zeros((bsz,) + a.shape[1:], a.dtype)
                    for a in sample_args))
                jax.block_until_ready(predict_fn(state, warm_train))
        except Exception as e:
            print(f"viz predict warmup failed ({e}); disabling viz")
            predict_fn = None

    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # Preemption safety (no reference equivalent): on SIGTERM/SIGINT save a
    # resumable checkpoint before exiting. TPU pools preempt with SIGTERM.
    #
    # Multihost: the checkpoint save is a COLLECTIVE, so a signal on one
    # host must become a cluster-wide agreement on a common stop step —
    # host loops run ahead of each other (async dispatch), so acting on a
    # local flag alone would have hosts calling the collective save at
    # different counters (deadlock). jax.distributed's PreemptionSyncManager
    # solves exactly this: its C++ notifier catches SIGTERM on any host,
    # broadcasts through the coordination service, and
    # ``reached_sync_point(step)`` returns True on every host at the SAME
    # step. Python must NOT install its own SIGTERM handler in this mode
    # (sigaction would replace the notifier's).
    preempted = {"flag": False}
    psm = None
    if multihost:
        from jax._src import distributed
        psm = distributed.global_state.preemption_sync_manager
        if psm is None:
            try:
                distributed.global_state.initialize_preemption_sync_manager()
                psm = distributed.global_state.preemption_sync_manager
            except Exception as e:
                print(f"preemption sync manager unavailable ({e}); "
                      "SIGTERM will NOT checkpoint in this multihost run")

    def _on_signal(signum, frame):
        print(f"signal {signum} received -> checkpoint and exit")
        preempted["flag"] = True

    import signal
    prev_handlers = {}
    if not multihost:
        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[sig] = signal.signal(sig, _on_signal)
        except ValueError:
            prev_handlers = {}  # not in main thread (e.g. under a test runner)

    watchdog = None
    if watchdog_secs:
        from lss_carla_tpu.training.watchdog import StallWatchdog
        watchdog = StallWatchdog(watchdog_secs,
                                 abort_after=2 * watchdog_secs).start()
        print(f"Stall watchdog armed after first step "
              f"(warn {watchdog_secs}s, abort {2 * watchdog_secs}s)")

    print("Starting training...")
    stop = False
    first_val_done = False   # watchdog is disarmed around the first
                             # validation (eval-program compile)
    early_stop_epoch = None   # set when --max_steps ends the run early
    try:
        for epoch in range(start_epoch, nepochs):
            if hasattr(trainloader, "set_epoch"):
                # resume-correct shuffling: epoch e always draws shuffle
                # order seed+e, whether reached directly or via --resume
                trainloader.set_epoch(epoch)
            it = prefetch_to_device(
                stack_microbatches(iter(trainloader), accum_steps),
                size=2, device_put=device_put_train)
            for batch in it:
                if counter == 0:
                    print("first batch on device; compiling the train step "
                          "(first compile can take minutes)...", flush=True)
                t0 = time.time()
                step_rng = jax.random.fold_in(rng, counter)
                state, metrics = train_fn(state, batch, step_rng)
                counter += 1
                t1 = time.time()
                if recal_window is not None:
                    recal_window.append(batch[:6])

                if watchdog is not None and counter == 1:
                    # arm after the first step (incl. its compile) completes
                    float(metrics["loss"])
                    watchdog.beat()
                if debug_stall_at and counter == debug_stall_at \
                        and resume is None:
                    # deliberate hang (mimics the observed tunnel wedge):
                    # the watchdog must dump stacks at N s and hard-exit 42
                    # at 2N, and --supervise must restart with --resume
                    # (which skips this branch)
                    print(f"[debug] injected stall at step {counter} — "
                          f"sleeping forever", flush=True)
                    while True:
                        time.sleep(60)
                if counter % 10 == 0:
                    logger.scalars(counter, **{
                        "train/loss": float(metrics["loss"])})
                    # the float() above synchronized on this step's completion
                    # — a true device-progress heartbeat (dispatches alone
                    # return immediately on async runtimes)
                    if watchdog is not None:
                        watchdog.beat()
                if iou_log_step and counter % iou_log_step == 0:
                    union = float(metrics["union"])
                    iou = float(metrics["intersect"]) / union if union > 0 else 1.0
                    scalars = {
                        "train/iou": iou, "train/epoch": epoch,
                        "train/step_time": t1 - t0,
                        "train/samples_per_sec":
                            bsz * accum_steps / max(t1 - t0, 1e-9)}
                    if lr_fn is not None:
                        scalars["train/lr"] = float(lr_fn(counter))
                    logger.scalars(counter, **scalars)
                    print(f"[{epoch}] step {counter}: "
                          f"loss={float(metrics['loss']):.4f} iou={iou:.4f} "
                          f"step_time={t1 - t0:.3f}s")

                # train-batch visualization (reference logs one every 100
                # train iters, train_simbev.py:268-329). Sibling of the
                # IoU-log block: --viz_step alone controls the cadence
                if predict_fn is not None and viz_step \
                        and counter % viz_step == 0:
                    try:
                        from lss_carla_tpu.utils.viz import make_bev_figure
                        union = float(metrics["union"])
                        viz_iou = (float(metrics["intersect"]) / union
                                   if union > 0 else 1.0)
                        # accumulation stacks (A, B, ...): viz microbatch 0
                        # (the slice keeps the per-microbatch sharding the
                        # warmed predict_fn was compiled for)
                        vbt = batch if accum_steps == 1 else \
                            tuple(x[0] for x in batch)
                        logits = predict_fn(state, vbt[:6])
                        pred = np.asarray(jax.nn.sigmoid(logits[0, 0]))
                        fig = make_bev_figure(
                            np.asarray(vbt[0][0]),
                            np.asarray(vbt[6][0, 0]), pred,
                            title=f"Training iter {counter} | "
                                  f"IoU {viz_iou:.4f}")
                        logger.figure(counter, "train/visualization", fig)
                        import matplotlib.pyplot as plt
                        plt.close(fig)
                    except Exception as e:
                        print(f"  train viz failed: {e}")

                if val_step and counter % val_step == 0:
                    if watchdog is not None and not first_val_done:
                        # disarm for this process's FIRST validation — it
                        # includes the eval-program compile, which (like
                        # the first train step) can legitimately take
                        # minutes on a cold cache; per-batch heartbeats
                        # re-arm as soon as real eval batches complete
                        watchdog.pause()
                    state = recal_ema_stats(state)
                    val_info = get_val_info(
                        eval_fn, eval_state_of(state), valloader,
                        device_put=device_put,
                        heartbeat=watchdog.beat if watchdog else None)
                    first_val_done = True
                    val_scalars = {"val/loss": val_info["loss"],
                                   "val/iou": val_info["iou"]}
                    if ema_decay:
                        # raw-params val alongside the EMA val: an
                        # EMA-vs-raw gap must be visible live, not
                        # discovered after a soak (round-3 postmortem)
                        raw_info = get_val_info(
                            eval_fn, state, valloader,
                            device_put=device_put,
                            heartbeat=watchdog.beat if watchdog else None)
                        val_scalars["val/loss_raw"] = raw_info["loss"]
                        val_scalars["val/iou_raw"] = raw_info["iou"]
                    for ci, v in enumerate(val_info.get("iou_per_class", [])):
                        val_scalars[f"val/iou_c{ci}"] = v
                    logger.scalars(counter, **val_scalars)
                    print(f"  validation: loss={val_info['loss']:.4f} "
                          f"iou={val_info['iou']:.4f}"
                          + (f" raw_iou={val_scalars['val/iou_raw']:.4f}"
                             if ema_decay else "")
                          + ("".join(f" c{ci}={v:.3f}" for ci, v in
                             enumerate(val_info.get("iou_per_class", [])))))
                    if watchdog is not None:
                        watchdog.beat()
                    if predict_fn is not None and viz_val_batch is not None:
                        try:
                            from lss_carla_tpu.utils.viz import make_bev_figure
                            vb = viz_val_batch  # cached, already mesh-placed
                            logits = predict_fn(eval_state_of(state), vb[:6])
                            pred = np.asarray(jax.nn.sigmoid(logits[0, 0]))
                            fig = make_bev_figure(
                                np.asarray(vb[0][0]), np.asarray(vb[6][0, 0]),
                                pred,
                                title=f"Validation iter {counter} | "
                                      f"IoU {val_info['iou']:.4f}")
                            logger.figure(counter, "val/visualization", fig)
                            import matplotlib.pyplot as plt
                            plt.close(fig)
                        except Exception as e:  # viz must never kill training
                            print(f"  viz failed: {e}")
                    if val_info["iou"] > best_val_iou:
                        best_val_iou = val_info["iou"]
                        if watchdog is not None:
                            watchdog.pause()  # saves stream minutes; an abort
                            # mid-write would corrupt the checkpoint
                        ckpt.save_best(counter, state, epoch, best_val_iou)
                        logger.summary(best_val_iou=best_val_iou)
                        print(f"  new best IoU {best_val_iou:.4f} (saved)")
                        if watchdog is not None:
                            watchdog.beat()

                if save_step and counter % save_step == 0:
                    if watchdog is not None:
                        watchdog.pause()
                    ckpt.save(counter, state, epoch)
                    if watchdog is not None:
                        # with --async_save the write may still be in flight
                        # here; a watchdog hard-exit mid-write is safe (orbax
                        # commits atomically, older steps survive) but loses
                        # that newest save — see StallWatchdog.pause()
                        watchdog.beat()

                if psm is not None and psm.reached_sync_point(counter):
                    # a host of the pod received SIGTERM; every host gets
                    # True at this same counter -> collective save is safe
                    print(f"preemption sync point at step {counter} "
                          "-> checkpoint and exit")
                    preempted["flag"] = True
                if preempted["flag"]:
                    if watchdog is not None:
                        watchdog.pause()
                    # wait=True: durability must not depend on reaching
                    # close() — an exception between here and close() (e.g.
                    # stop_trace below) must not lose the preemption save
                    ckpt.save(counter, state, epoch, wait=True)
                    stop = True
                    break
                if max_steps is not None and counter >= max_steps:
                    early_stop_epoch = epoch
                    stop = True
                    break
            if stop:
                break
    finally:
        # stop even on an escaping exception: a still-armed watchdog would
        # os._exit the caller up to 2N seconds after the crash
        if watchdog is not None:
            watchdog.stop()   # final save streams over the tunnel too

    for sig, h in prev_handlers.items():
        import signal as _signal
        _signal.signal(sig, h)

    if profile_dir:
        jax.profiler.stop_trace()

    if not preempted["flag"]:
        # normal completion: final save records epoch=nepochs (reference
        # train_simbev.py:446-453 semantics). A preemption save was already
        # written with the TRUE epoch — overwriting it here would make the
        # resumed run think training finished. A --max_steps early stop is
        # NOT completion: record the true epoch so --resume continues.
        final_epoch = nepochs if early_stop_epoch is None else \
            early_stop_epoch
        # wait=True: the final save is a durability contract, not an
        # optimization opportunity — don't rely on close() to drain it
        ckpt.save(counter, state, final_epoch, wait=True)
    ckpt.close()
    logger.close()
    print(f"Best validation IoU: {best_val_iou:.4f}")
    return {"counter": counter, "best_val_iou": best_val_iou, "state": state}


# re-exported for callers (explore.py imports it from here)
from lss_carla_tpu.utils.checkpoint import ocp_abstract  # noqa: E402,F401
