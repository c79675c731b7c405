"""Multi-HOST training dry run: N processes x M local CPU devices.

Validates the DCN-scale design end-to-end without TPU pods: every process
initializes ``jax.distributed``, loads ITS shard of the global batch
(``DataLoader(shard_index=process_id)`` semantics), assembles global arrays
with ``jax.make_array_from_process_local_data``, and executes the shard_map
train step over the GLOBAL mesh — gradient psum crosses process boundaries.

Self-orchestrating: run with no arguments to spawn the workers.

    python scripts/multihost_dryrun.py                 # 2 procs x 4 devices
    python scripts/multihost_dryrun.py --procs 2 --local_devices 4
    python scripts/multihost_dryrun.py --mesh camera   # 2-D (data, cam) mesh
    python scripts/multihost_dryrun.py --mesh grid     # 2-D (data, grid) mesh
    python scripts/multihost_dryrun.py --accum 2       # grad accumulation

``--mesh camera`` runs the camera-axis model-parallel step
(``parallel/camera.py``) over a global (data, cam) mesh laid out so the
cam-axis BEV psum stays INTRA-process (ICI on a real pod) while the
data-axis gradient psum crosses processes (DCN) — the deployment layout.
"""

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def worker(process_id: int, num_processes: int, local_devices: int,
           port: int, mesh_kind: str = "data", accum: int = 1):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices} "
        # gloo collectives wait at most this long for peers: must
        # cover cross-process XLA compile skew (cache hit vs cold)
        "--xla_cpu_collective_timeout_seconds=1800")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes, process_id=process_id)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from lss_carla_tpu.configs import DataAugConf, GridConf
    from lss_carla_tpu.models.lss import compile_model
    from lss_carla_tpu.parallel.mesh import DATA_AXIS
    from lss_carla_tpu.parallel.step import make_sharded_train_step
    from lss_carla_tpu.training.state import create_train_state

    n_global = jax.device_count()
    if mesh_kind == "grid":
        from lss_carla_tpu.parallel.grid import (
            GRID_AXIS, make_grid_sharded_train_step, shard_batch_grid_local)
        n_grid = 2
        # grid-axis neighbours WITHIN a process (same rationale as the cam
        # mesh): the decode's halo exchanges and the lift->decode reshard
        # ride intra-host links, only the gradient reduction crosses DCN
        mesh = Mesh(np.asarray(jax.devices()).reshape(-1, n_grid),
                    (DATA_AXIS, GRID_AXIS))
        # the GSPMD lift shards the batch over the WHOLE mesh jointly
        data_size = n_global
        cam_shard_specs = None
    elif mesh_kind == "camera":
        from lss_carla_tpu.parallel.camera import (
            CAM_AXIS, make_camera_sharded_train_step)
        n_cam = 2
        # devices enumerate process-major, so reshaping (n_global/n_cam,
        # n_cam) pairs cam-axis neighbours WITHIN a process: the per-step
        # BEV psum rides intra-host links (ICI on a pod), only the gradient
        # pmean crosses processes (DCN)
        mesh = Mesh(np.asarray(jax.devices()).reshape(-1, n_cam),
                    (DATA_AXIS, CAM_AXIS))
        data_size = n_global // n_cam
        cam_shard_specs = (P(DATA_AXIS, CAM_AXIS),) * 6 + (P(DATA_AXIS),)
    else:
        mesh = Mesh(np.asarray(jax.devices()), (DATA_AXIS,))
        data_size = n_global
        cam_shard_specs = None
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(DATA_AXIS))

    grid_conf = GridConf(xbound=(-40.0, 40.0, 5.0), ybound=(-40.0, 40.0, 5.0),
                         zbound=(-10.0, 10.0, 20.0), dbound=(4.0, 36.0, 8.0))
    aug_conf = DataAugConf(H=64, W=128, final_dim=(32, 64))
    model = compile_model(grid_conf, aug_conf, outC=1)

    B_global, N = data_size, 6
    B_local = B_global // num_processes
    rng = np.random.default_rng(1000 + process_id)  # per-host data

    def local_batch():
        imgs = rng.normal(size=(B_local, N, 3, 32, 64)).astype(np.float32)
        eye = np.tile(np.eye(3, dtype=np.float32), (B_local, N, 1, 1))
        intr = eye.copy()
        intr[..., 0, 0] = intr[..., 1, 1] = 60.0
        intr[..., 0, 2], intr[..., 1, 2] = 32.0, 16.0
        z3 = np.zeros((B_local, N, 3), np.float32)
        binimg = (rng.uniform(size=(B_local, 1, 16, 16)) < 0.1
                  ).astype(np.float32)
        return (imgs, eye, z3, intr, eye, z3, binimg)

    # identical init on every host (same seed) -> replicated global state
    sample = tuple(jnp.zeros_like(jnp.asarray(a[:1]))
                   for a in local_batch()[:6])
    state = create_train_state(model, jax.random.PRNGKey(0), sample)
    state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            rep, np.asarray(x)), state)

    if mesh_kind == "grid":
        step = make_grid_sharded_train_step(model, mesh, pos_weight=2.13)
    elif mesh_kind == "camera":
        step = make_camera_sharded_train_step(model, mesh, pos_weight=2.13)
    else:
        step = make_sharded_train_step(model, mesh, pos_weight=2.13,
                                       accum_steps=accum)
    # gradient accumulation stacks (accum, B, ...): microbatch axis
    # replicated, batch axis sharded — the loop's device_put_train contract
    mb_shard = NamedSharding(mesh, P(None, DATA_AXIS))
    for i in range(2):
        if accum > 1:
            group = [local_batch() for _ in range(accum)]
            lb = tuple(np.stack([g[j] for g in group])
                       for j in range(len(group[0])))
            batch = jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    mb_shard, x), lb)
        elif mesh_kind == "grid":
            batch = shard_batch_grid_local(mesh, local_batch())
        elif mesh_kind == "camera":
            lb = local_batch()
            batch = tuple(
                jax.make_array_from_process_local_data(
                    NamedSharding(mesh, spec), x)
                for spec, x in zip(cam_shard_specs, lb))
        else:
            lb = local_batch()
            batch = jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(shard, x),
                lb)
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        loss = float(metrics["loss"])
        print(f"[proc {process_id}] step {i}: global devices={n_global} "
              f"loss={loss:.4f}", flush=True)
        assert np.isfinite(loss)

    # replicated state must agree across processes: print a param checksum
    leaf = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    print(f"[proc {process_id}] param checksum {float(np.sum(leaf)):.6f}",
          flush=True)
    jax.distributed.shutdown()


def cli_worker(process_id: int, num_processes: int, local_devices: int,
               port: int, dataroot: str, rundir: str):
    """Drive the REAL training CLI path (``train(multihost=True)``) as one
    process of a multi-controller run: per-host loader shards, global-mesh
    step, process-0 logging, orbax multihost save, then --resume."""
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices} "
        # gloo collectives wait at most this long for peers: must
        # cover cross-process XLA compile skew (cache hit vs cold)
        "--xla_cpu_collective_timeout_seconds=1800")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes, process_id=process_id)
    import numpy as np

    from lss_carla_tpu.training.loop import train

    kwargs = dict(
        dataroot=dataroot, logdir=rundir, multihost=True,
        H=64, W=128, final_dim=(32, 64),
        # 16x16 BEV cells over the fixture's +/-50 m extent, matching the
        # grid=16 labels the parent generated (SimBEV labels are
        # pre-rasterized; bounds and label grid must agree)
        xbound=(-50.0, 50.0, 6.25), ybound=(-50.0, 50.0, 6.25),
        zbound=(-10.0, 10.0, 20.0), dbound=(4.0, 36.0, 8.0),
        bsz=4, nworkers=2, nepochs=1, viz_step=0, iou_log_step=1)
    import time
    t0 = time.time()

    def mark(msg):
        print(f"[proc {process_id} +{time.time() - t0:6.1f}s] {msg}",
              flush=True)

    # leg 1: fresh start; step 2 fires validation + best + periodic save +
    # the early-stop final save (idempotent resave at the same counter —
    # the orbax delete+save path under multi-process coordination)
    mark("leg 1 (fresh train) starting")
    out = train(max_steps=2, val_step=2, save_step=2, **kwargs)
    assert out["counter"] == 2, out["counter"]
    mark("leg 1 done")
    # leg 2: resume from the shared ckpt dir, run 2 more steps
    out = train(max_steps=4, val_step=0, save_step=0,
                resume=os.path.join(rundir, "ckpts"), **kwargs)
    assert out["counter"] == 4, out["counter"]
    mark("leg 2 (resume) done")
    # leg 3: preemption — SIGTERM lands on ONE host mid-training; the
    # PreemptionSyncManager must turn it into a cluster-wide agreement so
    # every host checkpoints at the SAME counter (the save is collective).
    # Worker 1 self-signals once process 0's logger shows training started.
    import signal
    import threading
    run3 = os.path.join(os.path.dirname(rundir), "run_preempt")
    if process_id == 1:
        def _sigterm_when_training():
            jsonl = os.path.join(run3, "metrics.jsonl")
            while True:
                time.sleep(0.2)
                try:
                    if os.path.getsize(jsonl) > 0:
                        break
                except OSError:
                    continue
            os.kill(os.getpid(), signal.SIGTERM)
        threading.Thread(target=_sigterm_when_training, daemon=True).start()
    out = train(max_steps=100, val_step=0, save_step=0,
                **dict(kwargs, logdir=run3, nepochs=50))
    assert 1 <= out["counter"] < 100, out["counter"]
    mark("leg 3 (preempt) done")
    print(f"[proc {process_id}] preempt-synced at {out['counter']}",
          flush=True)
    leaf = np.asarray(jax.tree_util.tree_leaves(out["state"].params)[0])
    print(f"[proc {process_id}] cli param checksum "
          f"{float(np.sum(leaf)):.6f}", flush=True)
    jax.distributed.shutdown()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--procs", type=int, default=2)
    p.add_argument("--local_devices", type=int, default=4)
    p.add_argument("--port", type=int, default=9921)
    p.add_argument("--mesh", default="data",
                   choices=["data", "camera", "grid"])
    p.add_argument("--accum", type=int, default=1,
                   help=">1: gradient-accumulation step (data mesh only) — "
                        "validates the (None, data) microbatch sharding "
                        "across processes")
    p.add_argument("--cli", action="store_true",
                   help="drive the real training entry point "
                        "(train(multihost=True)) over the processes: "
                        "fixture data, per-host loader shards, validation, "
                        "orbax multihost checkpointing + resume")
    p.add_argument("--workdir", default="/tmp/mh_cli_dryrun")  # --cli state
    p.add_argument("--process_id", type=int, default=None)  # internal
    args = p.parse_args()

    if args.cli:
        args.local_devices = 2  # global mesh 2x2; bsz 4 -> 1 sample/device
    if args.mesh in ("camera", "grid") \
            and (args.procs * args.local_devices) % 2:
        p.error(f"--mesh {args.mesh} needs an even global device count "
                "(model axis = 2)")
    if args.accum > 1 and args.mesh != "data":
        p.error("--accum requires --mesh data")

    dataroot = os.path.join(args.workdir, "fixture")
    rundir = os.path.join(args.workdir, "run")
    if args.process_id is not None:
        if args.cli:
            cli_worker(args.process_id, args.procs, args.local_devices,
                       args.port, dataroot, rundir)
        else:
            worker(args.process_id, args.procs, args.local_devices,
                   args.port, args.mesh, args.accum)
        return

    if args.cli:
        # fresh fixture + run dir; generate in a CPU-forced subprocess (the
        # fixture generator imports jax transitively, and this parent must
        # not touch the default backend)
        import shutil
        shutil.rmtree(args.workdir, ignore_errors=True)
        os.makedirs(args.workdir)
        gen = (f"import jax; jax.config.update('jax_platforms', 'cpu'); "
               f"from lss_carla_tpu.data.fixtures import generate_fixture; "
               f"generate_fixture({dataroot!r}, num_scenes=5, grid=16, "
               f"samples_per_scene=4, H=64, W=128)")
        subprocess.run([sys.executable, "-c", gen], check=True, cwd=REPO)

    procs = []
    for i in range(args.procs):
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--procs", str(args.procs),
             "--local_devices", str(args.local_devices),
             "--port", str(args.port), "--mesh", args.mesh,
             "--accum", str(args.accum), "--process_id", str(i)]
            + (["--cli", "--workdir", args.workdir] if args.cli else []),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outputs, failed = [], False
    for i, pr in enumerate(procs):
        out, _ = pr.communicate(timeout=1800)  # covers cold GSPMD compiles
        # on a loaded box (the grid mesh's full fwd+bwd is the slowest)
        outputs.append(out.decode())
        failed |= pr.returncode != 0
    for o in outputs:
        print(o[-2000:])
    if failed:
        print("MULTIHOST DRYRUN FAILED")
        sys.exit(1)
    # losses and checksums must match across processes (replicated math)
    import re
    sums = set()
    for o in outputs:
        m = re.findall(r"param checksum (-?\d+\.\d+)", o)
        sums.update(m)
    assert len(sums) == 1, f"state diverged across hosts: {sums}"
    if args.cli:
        assert "Resumed from step 2" in outputs[0], "resume leg missing"
        # preemption leg: SIGTERM hit only worker 1, yet EVERY process must
        # report the same agreed stop counter (collective save correctness)
        stops = set()
        for o in outputs:
            m = re.findall(r"preempt-synced at (\d+)", o)
            assert m, "preemption leg missing from a worker"
            stops.update(m)
        assert len(stops) == 1, f"preempt stop step diverged: {stops}"
        assert any("preemption sync point at step" in o for o in outputs), \
            "preemption never triggered (run ended before the signal)"
        print(f"MULTIHOST CLI DRYRUN OK: {args.procs} processes x "
              f"{args.local_devices} devices — train CLI end-to-end "
              "(loader shards, validation, orbax save/resume, synced "
              f"preemption at step {stops.pop()}), state consistent")
    else:
        print(f"MULTIHOST DRYRUN OK ({args.mesh} mesh): {args.procs} "
              f"processes x {args.local_devices} devices, state consistent")


if __name__ == "__main__":
    main()
