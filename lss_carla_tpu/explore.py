"""Eval / viz / op-parity entry points — reference ``src/explore.py`` rebuilt.

The reference versions are dead code (broken imports); these are working
equivalents on the SimBEV loader:

* ``eval_model_iou``  — restore a checkpoint, run the full val loader, print
  mean loss + dataset IoU (reference ``explore.py:194-246``).
* ``viz_model_preds`` — render the 3-row camera/GT/pred/overlay panels to
  PNGs (reference ``explore.py:249-363``, wandb figure variant).
* ``splat_check``     — the ``cumsum_check`` equivalent (reference
  ``explore.py:119-191``): run the same batch through both splat
  implementations (XLA scatter vs Pallas kernel) and compare forward output
  AND depthnet weight gradients.
* ``lidar_check``     — frustum-geometry sanity viz: project each camera's
  frustum points into the BEV plane and save a scatter plot.

All take dataroot + the usual config kwargs; designed for CLI use via
``python -m lss_carla_tpu.explore <fn> ...`` (see ``main``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.data.loader import compile_data
from lss_carla_tpu.models.lss import compile_model
from lss_carla_tpu.training.loop import get_val_info, ocp_abstract
from lss_carla_tpu.training.state import create_train_state
from lss_carla_tpu.training.step import make_eval_step, make_predict_step
from lss_carla_tpu.utils.checkpoint import CheckpointManager


def _build(dataroot, bsz=4, nworkers=4, H=None, W=None,
           final_dim=(128, 352), ncams=6, checkpoint: Optional[str] = None,
           best: bool = False, grid_conf: Optional[GridConf] = None,
           dataset: str = "simbev", version: str = "v1.0-mini",
           use_ema: bool = False, label_mode: str = "vehicle_binary",
           label_classes=(0, 1, 2, 3), **model_kw):
    # source dims default per dataset: real nuScenes images are 900x1600 —
    # building the homography against the SimBEV 224x480 dims would scale
    # camera geometry wrong by ~3x (override with H/W for fixtures)
    if H is None or W is None:
        H = H or (900 if dataset == "nuscenes" else 224)
        W = W or (1600 if dataset == "nuscenes" else 480)
    grid_conf = grid_conf or GridConf()
    aug_conf = DataAugConf(H=H, W=W, final_dim=tuple(final_dim), Ncams=ncams)
    if dataset == "nuscenes":
        from lss_carla_tpu.data.nuscenes import compile_data_nuscenes
        trainloader, valloader = compile_data_nuscenes(
            version, dataroot, aug_conf, grid_conf, bsz=bsz,
            nworkers=nworkers)
    else:
        ds_kw = None
        if label_mode != "vehicle_binary":
            ds_kw = {"label_mode": label_mode,
                     "label_classes": tuple(label_classes)}
        trainloader, valloader = compile_data(
            "unused", dataroot, aug_conf, grid_conf, bsz=bsz,
            nworkers=nworkers, dataset_kwargs=ds_kw)
    outC = len(label_classes) if label_mode == "multiclass" else 1
    model = compile_model(grid_conf, aug_conf, outC=outC, **model_kw)
    fH, fW = aug_conf.final_dim
    sample = (
        jnp.zeros((1, ncams, 3, fH, fW)),
        jnp.tile(jnp.eye(3), (1, ncams, 1, 1)),
        jnp.zeros((1, ncams, 3)),
        jnp.tile(jnp.eye(3), (1, ncams, 1, 1)),
        jnp.tile(jnp.eye(3), (1, ncams, 1, 1)),
        jnp.zeros((1, ncams, 3)),
    )
    # use_ema builds the restore target WITH the EMA subtree so an
    # EMA-tracking checkpoint's averaged params can be selected; either
    # way restore_train_state tolerates checkpoints from the other config
    state = create_train_state(model, jax.random.PRNGKey(0), sample,
                               ema_decay=1.0 if use_ema else 0.0)
    if checkpoint:
        from lss_carla_tpu.training.state import restore_train_state
        mgr = CheckpointManager(checkpoint)
        # weights-only fallback: eval doesn't need optimizer state, and the
        # checkpoint may have been trained with a schedule this constant-LR
        # eval state lacks (opt_state structure mismatch)
        state, meta = restore_train_state(mgr, state, best=best,
                                          allow_weights_only=True)
        print(f"restored checkpoint step={meta.get('counter')}"
              + (" (best)" if best else ""))
        if use_ema:
            # evaluate the averaged model — params AND batch_stats (a
            # no-EMA checkpoint was seeded ema=params/batch_stats by the
            # tolerant restore, so this is then a no-op)
            state = state.replace(params=state.ema_params,
                                  batch_stats=state.ema_batch_stats)
    return model, state, trainloader, valloader, grid_conf, aug_conf


def eval_model_iou(dataroot, checkpoint: str, bsz=4, nworkers=4,
                   quantize: bool = False, **kw):
    """With ``quantize=True`` the forward runs int8 PTQ (``ops/quant.py``)
    — the IoU delta vs the float eval is the quantization accuracy cost."""
    model, state, _, valloader, *_ = _build(
        dataroot, bsz=bsz, nworkers=nworkers, checkpoint=checkpoint, **kw)
    eval_fn = make_eval_step(model, pos_weight=2.13)
    if quantize:
        from lss_carla_tpu.ops.quant import quantized_context
        with quantized_context():
            # the first batch traces the jitted eval step inside the
            # interceptor context, baking the int8 convs into the program
            info = get_val_info(eval_fn, state, valloader,
                                device_put=jax.device_put)
    else:
        info = get_val_info(eval_fn, state, valloader,
                            device_put=jax.device_put)
    print(info)
    return info


def viz_model_preds(dataroot, checkpoint: Optional[str] = None,
                    outdir="./viz_outputs", max_batches=2, bsz=4,
                    dataset: str = "simbev",
                    map_folder: Optional[str] = None, **kw):
    """Render camera/GT/pred/overlay panels (reference ``explore.py:249-363``).

    With ``dataset="nuscenes"`` and a ``map_folder`` holding the map
    expansion JSONs, the prediction panel gets the reference's static-map
    underlay (road/lane polygons + dividers in the ego frame,
    ``explore.py:353-358``)."""
    from lss_carla_tpu.utils.viz import make_bev_figure
    import matplotlib.pyplot as plt

    model, state, _, valloader, grid_conf, _aug = _build(
        dataroot, bsz=bsz, checkpoint=checkpoint, dataset=dataset, **kw)
    extent = (grid_conf.ybound[0], grid_conf.ybound[1],
              grid_conf.xbound[0], grid_conf.xbound[1])

    map_draw_for = None
    if map_folder is not None:
        if dataset != "nuscenes":
            raise ValueError("map underlay needs dataset='nuscenes' "
                             "(SimBEV publishes no map expansion)")
        from lss_carla_tpu.data.nusc_maps import (get_nusc_maps,
                                                  plot_nusc_map,
                                                  yaw_from_quat)
        ds = valloader.dataset
        scene2map = ds.t.scene2map()
        scene_name = {sc["token"]: sc["name"] for sc in ds.t.scene}
        # only load the locations this split's scenes actually use (the
        # real expansion JSONs are hundreds of MB each)
        used = {scene2map[scene_name[ds.t.sample[tok]["scene_token"]]]
                for tok in ds.samples}
        nusc_maps = get_nusc_maps(map_folder, names=sorted(used))
        stretch = max(abs(float(b)) for b in extent)

        def map_draw_for(idx):
            tok = ds.samples[idx % len(ds.samples)]
            loc = scene2map[scene_name[ds.t.sample[tok]["scene_token"]]]
            if loc not in nusc_maps:
                return None
            pose = ds._ego_pose_for(tok)
            yaw = yaw_from_quat(pose["rotation"])
            return lambda ax: plot_nusc_map(
                ax, nusc_maps[loc], pose["translation"][:2], yaw, stretch)

    predict = make_predict_step(model)
    os.makedirs(outdir, exist_ok=True)
    count = 0
    for bi, batch in enumerate(valloader):
        if bi >= max_batches:
            break
        batch = jax.device_put(batch)
        logits = predict(state, batch[:6])
        preds = np.asarray(jax.nn.sigmoid(logits))
        # one fetch per batch (per-element float() costs a device round
        # trip each on the remote transport)
        valid = np.asarray(batch[7]) if len(batch) > 7 else None
        for si in range(preds.shape[0]):
            if valid is not None and valid[si] == 0.0:
                continue  # pad_last wrap-around duplicate, not a real sample
            fig = make_bev_figure(
                np.asarray(batch[0][si]), np.asarray(batch[6][si, 0]),
                preds[si, 0], extent=extent,
                map_draw=(map_draw_for(bi * bsz + si)
                          if map_draw_for else None))
            path = os.path.join(outdir, f"eval{count:06d}.png")
            fig.savefig(path)
            plt.close(fig)
            print(path)
            count += 1
    return count


def splat_check(dataroot=None, bsz=2, **kw):
    """Forward+backward parity between splat implementations on one batch
    (the reference cumsum_check contract, ``explore.py:166-191``).

    Without a dataroot, uses a tiny synthetic config (small grid keeps the
    Pallas accumulator VMEM-resident and both compiles fast)."""
    from lss_carla_tpu.training.loss import bce_with_logits

    if dataroot is not None:
        model_s, state, trainloader, *_ = _build(
            dataroot, bsz=bsz, splat_method="scatter", **kw)
        batch = jax.device_put(next(iter(trainloader)))
    else:  # tiny synthetic config
        from lss_carla_tpu.models.lss import compile_model as _cm
        grid_conf = GridConf(xbound=(-40.0, 40.0, 1.25),
                             ybound=(-40.0, 40.0, 1.25),
                             dbound=(4.0, 44.0, 2.0))
        aug_conf = DataAugConf(H=64, W=128, final_dim=(32, 64))
        model_s = _cm(grid_conf, aug_conf, outC=1, splat_method="scatter",
                      variant=kw.get("variant", "b0"))
        rng = np.random.default_rng(0)
        fH, fW = aug_conf.final_dim
        nxy = int(grid_conf.nx[0])
        imgs = rng.normal(size=(bsz, 6, 3, fH, fW)).astype(np.float32)
        eye = np.tile(np.eye(3, dtype=np.float32), (bsz, 6, 1, 1))
        intr = eye.copy()
        intr[..., 0, 0] = intr[..., 1, 1] = 60.0
        intr[..., 0, 2], intr[..., 1, 2] = fW / 2, fH / 2
        zeros3 = np.zeros((bsz, 6, 3), np.float32)
        binimg = (rng.uniform(size=(bsz, 1, nxy, nxy)) < 0.03).astype(np.float32)
        batch = tuple(map(jnp.asarray,
                          (imgs, eye, zeros3, intr, eye, zeros3, binimg)))
        state = create_train_state(model_s, jax.random.PRNGKey(0), batch[:6])

    from lss_carla_tpu.models.lss import compile_model as _cm2
    # the pallas twin must mirror every model option or state.params won't
    # match its module tree (or, worse, silently compare different models)
    model_p = _cm2(model_s.grid_conf, model_s.data_aug_conf,
                   outC=model_s.outC, splat_method="pallas",
                   variant=model_s.variant, camC=model_s.camC,
                   downsample=model_s.downsample, remat=model_s.remat,
                   compute_dtype=model_s.compute_dtype)

    results = {}
    for name, model in [("scatter", model_s), ("pallas", model_p)]:
        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                *batch[:6], train=False)
            return bce_with_logits(out, batch[6], 2.13), out

        (loss, out), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        g = grads["camencode"]["depthnet"]["kernel"]
        results[name] = (float(out.mean()), float(g.mean()), float(loss))
        print(f"{name}: out.mean={results[name][0]:.6f} "
              f"depthnet.grad.mean={results[name][1]:.3e} loss={loss:.6f}")
    if len(results) == 2:
        a, b = results["scatter"], results["pallas"]
        print(f"|Δout.mean|={abs(a[0]-b[0]):.2e} "
              f"|Δgrad.mean|={abs(a[1]-b[1]):.2e}")
    return results


def lidar_check(dataroot, outdir="./viz_outputs", H=None, W=None,
                final_dim=(128, 352), dataset: str = "simbev",
                version: str = "v1.0-mini", max_samples: int = 2,
                nsweeps: int = 3, **kw):
    """Geometry sanity viz (reference ``explore.py:21-116``).

    SimBEV mode (model-free): project each camera's frustum into the BEV
    plane. nuScenes mode: per sample, project the real multi-sweep lidar
    cloud into every (augmented) camera image — depth-colored, via
    ``ego_to_cam`` + the tracked homography, exactly the reference's
    panels — plus the lidar BEV scatter and the GT mask."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # source dims default per dataset (real nuScenes images are 900x1600;
    # the in-image mask and homography both need the TRUE source dims)
    if H is None or W is None:
        H = H or (900 if dataset == "nuscenes" else 224)
        W = W or (1600 if dataset == "nuscenes" else 480)

    if dataset == "nuscenes":
        return _lidar_check_nuscenes(dataroot, outdir, H, W, final_dim,
                                     version, max_samples, nsweeps)

    grid_conf = GridConf()
    aug_conf = DataAugConf(H=H, W=W, final_dim=tuple(final_dim))
    _, valloader = compile_data("unused", dataroot, aug_conf, grid_conf,
                                bsz=1, nworkers=0)
    from lss_carla_tpu.ops.geometry import create_frustum, get_geometry
    batch = next(iter(valloader))
    frustum = jnp.asarray(create_frustum(aug_conf.final_dim, 16,
                                         grid_conf.dbound))
    geom = np.asarray(get_geometry(
        frustum, *(jnp.asarray(batch[i]) for i in (1, 2, 3, 4, 5))))
    os.makedirs(outdir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 8))
    for n in range(geom.shape[1]):
        pts = geom[0, n].reshape(-1, 3)
        ax.scatter(pts[:, 0], pts[:, 1], s=0.3, label=f"cam{n}")
    # ego footprint (reference tools.py:273-284); plot-x is ego X here
    from lss_carla_tpu.utils.viz import EGO_L, EGO_OFF, EGO_W
    xs = np.array([-EGO_L / 2, EGO_L / 2, EGO_L / 2, -EGO_L / 2]) + EGO_OFF
    ys = np.array([-EGO_W / 2, -EGO_W / 2, EGO_W / 2, EGO_W / 2])
    ax.fill(xs, ys, "#76b900", zorder=5)
    ax.set_xlabel("ego X (m)")
    ax.set_ylabel("ego Y (m)")
    ax.legend(markerscale=10)
    ax.set_title("Frustum coverage in BEV")
    path = os.path.join(outdir, "lidar_check.png")
    fig.savefig(path)
    plt.close(fig)
    print(path)
    return path


def _lidar_check_nuscenes(dataroot, outdir, H, W, final_dim, version,
                          max_samples, nsweeps):
    """Reference lidar_check panels (``explore.py:80-116``): six cameras
    with the depth-colored lidar projection, lidar BEV, GT mask."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from lss_carla_tpu.data.nuscenes import (NUSC_CAMERA_ORDER,
                                             NuScenesDataset, get_lidar_data)
    from lss_carla_tpu.ops.geometry import ego_to_cam, get_only_in_img_mask
    from lss_carla_tpu.ops.image import denormalize_img
    from lss_carla_tpu.utils.viz import add_ego_box

    grid_conf = GridConf()
    aug_conf = DataAugConf(H=H, W=W, final_dim=tuple(final_dim))
    ds = NuScenesDataset(dataroot, False, aug_conf, grid_conf,
                         version=version)
    fH, fW = aug_conf.final_dim
    os.makedirs(outdir, exist_ok=True)
    paths = []
    for i in range(min(max_samples, len(ds))):
        tok = ds.samples[i]
        imgs, rots, trans, intrins, post_rots, post_trans = \
            ds.get_image_data(tok, NUSC_CAMERA_ORDER)
        binimg = ds.get_binimg(tok)
        pts = get_lidar_data(ds.t, dataroot, tok, nsweeps=nsweeps)
        xyz = jnp.asarray(pts[:3])

        fig = plt.figure(figsize=(18, 6))
        gs = fig.add_gridspec(2, 5, width_ratios=(1, 1, 1, 1.2, 1.2))
        for ci, cam in enumerate(NUSC_CAMERA_ORDER):
            ax = fig.add_subplot(gs[ci // 3, ci % 3])
            ax.imshow(denormalize_img(imgs[ci].transpose(1, 2, 0)))
            cam_pts = np.asarray(ego_to_cam(
                xyz, jnp.asarray(rots[ci]), jnp.asarray(trans[ci]),
                jnp.asarray(intrins[ci])))
            mask = np.array(get_only_in_img_mask(
                jnp.asarray(cam_pts), H, W))
            # into augmented-image pixels via the tracked homography
            plot = post_rots[ci] @ cam_pts + post_trans[ci][:, None]
            mask &= ((plot[0] > 0) & (plot[0] < fW)
                     & (plot[1] > 0) & (plot[1] < fH))
            ax.scatter(plot[0, mask], plot[1, mask], c=cam_pts[2, mask],
                       s=4, alpha=0.4, cmap="jet")
            ax.set_title(cam, fontsize=8)
            ax.axis("off")

        ax = fig.add_subplot(gs[:, 3])
        ax.scatter(pts[1], pts[0], c=pts[2], vmin=-5, vmax=5, s=4)
        add_ego_box(ax)
        ax.set_xlim(-50, 50)
        ax.set_ylim(-50, 50)
        ax.set_aspect("equal")
        ax.set_title("lidar (ego frame)", fontsize=9)

        ax = fig.add_subplot(gs[:, 4])
        ax.imshow(binimg[0], origin="lower", cmap="Greys", vmin=0, vmax=1,
                  extent=(grid_conf.ybound[0], grid_conf.ybound[1],
                          grid_conf.xbound[0], grid_conf.xbound[1]))
        add_ego_box(ax)
        ax.set_title("GT vehicles", fontsize=9)

        path = os.path.join(outdir, f"lcheck{i:05d}.png")
        fig.savefig(path, dpi=110)
        plt.close(fig)
        print(path)
        paths.append(path)
    return paths


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser(description="LSS-TPU eval/viz tools")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("eval_model_iou", "viz_model_preds", "splat_check",
                 "lidar_check"):
        sp = sub.add_parser(name)
        sp.add_argument("--dataroot", default=None)
        sp.add_argument("--checkpoint", default=None)
        sp.add_argument("--best", action="store_true",
                        help="restore the best-by-val-IoU checkpoint")
        sp.add_argument("--ema", action="store_true",
                        help="evaluate the checkpoint's EMA params "
                             "(runs trained with --ema_decay)")
        sp.add_argument("--bsz", type=int, default=2)
        sp.add_argument("--variant", default="b0",
                        choices=("b0", "b1", "b2", "b3", "b4",
                                 "resnet18", "resnet34"),
                        help="camera trunk the checkpoint was trained with")
        sp.add_argument("--H", type=int, default=None,
                        help="source image height (default: 224 SimBEV / "
                             "900 nuScenes)")
        sp.add_argument("--W", type=int, default=None,
                        help="source image width (default: 480 SimBEV / "
                             "1600 nuScenes)")
        if name in ("viz_model_preds", "eval_model_iou", "lidar_check"):
            sp.add_argument("--dataset", default="simbev",
                            choices=("simbev", "nuscenes"))
            sp.add_argument("--version", default="v1.0-mini")
        if name == "eval_model_iou":
            sp.add_argument("--quantize", action="store_true",
                            help="run the forward with int8 PTQ convs")
        if name in ("eval_model_iou", "viz_model_preds"):
            # stretch-config checkpoints (400x400 grid, multiclass head)
            sp.add_argument("--xbound", type=float, nargs=3, default=None,
                            help="BEV grid x bounds/step the checkpoint "
                                 "was trained with (default -50 50 0.5)")
            sp.add_argument("--ybound", type=float, nargs=3, default=None)
            sp.add_argument("--label_mode", default="vehicle_binary",
                            choices=("vehicle_binary", "multiclass"))
            sp.add_argument("--label_classes", type=int, nargs="+",
                            default=[0, 1, 2, 3])
        if name == "viz_model_preds":
            sp.add_argument("--map_folder", default=None,
                            help="nuScenes map-expansion folder for the "
                                 "static-map underlay")
    a = p.parse_args()
    kwargs = {}
    if a.variant != "b0" and a.cmd != "lidar_check":
        kwargs["variant"] = a.variant   # lidar_check builds no model
    if a.H is not None:
        kwargs["H"] = a.H
    if a.W is not None:
        kwargs["W"] = a.W
    if a.dataroot is not None:
        kwargs["dataroot"] = a.dataroot
    if a.checkpoint is not None:
        kwargs["checkpoint"] = a.checkpoint
        kwargs["best"] = a.best
        if a.ema:
            kwargs["use_ema"] = True
    if a.cmd == "viz_model_preds":
        kwargs.update(dataset=a.dataset, map_folder=a.map_folder,
                      version=a.version)
    elif a.cmd == "eval_model_iou":
        kwargs.update(dataset=a.dataset, version=a.version,
                      quantize=a.quantize)
    if a.cmd in ("eval_model_iou", "viz_model_preds"):
        if a.xbound is not None:
            kwargs["grid_conf"] = GridConf(
                xbound=tuple(a.xbound),
                ybound=tuple(a.ybound if a.ybound is not None else a.xbound))
        if a.label_mode != "vehicle_binary":
            kwargs.update(label_mode=a.label_mode,
                          label_classes=tuple(a.label_classes))
    if a.cmd in ("splat_check", "lidar_check"):
        kwargs.pop("best", None)
        kwargs.pop("use_ema", None)
    if a.cmd == "lidar_check":
        kwargs.pop("bsz", None)
        kwargs.update(dataset=a.dataset, version=a.version)
        globals()[a.cmd](**kwargs)
    else:
        globals()[a.cmd](bsz=a.bsz, **kwargs)
