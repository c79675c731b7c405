"""End-to-end smoke: the full training driver on the synthetic fixture,
tiny shapes, CPU — covering data pipeline -> jitted sharded step ->
logging -> checkpoint -> resume."""

import json
import os

import numpy as np
import pytest

from lss_carla_tpu.data.fixtures import generate_fixture
from lss_carla_tpu.training.loop import train

pytestmark = pytest.mark.slow  # full-model CPU compiles


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("simbev_e2e")
    # 64x64 BEV labels keep the CPU BevEncode compile cheap; the full
    # 200x200 path is exercised on TPU by bench.py / __graft_entry__
    return generate_fixture(root, num_scenes=3, samples_per_scene=4,
                            H=64, W=128, grid=64)


def _run(fixture_root, tmp_path, **kw):
    args = dict(
        dataroot=fixture_root,
        nepochs=1,
        H=64, W=128, final_dim=(32, 64),
        xbound=(-40.0, 40.0, 5.0), ybound=(-40.0, 40.0, 5.0),
        zbound=(-10.0, 10.0, 20.0), dbound=(4.0, 36.0, 8.0),
        bsz=2, nworkers=0, lr=1e-3,
        val_step=2, save_step=2, viz_step=0,
        logdir=str(tmp_path / "run"),
        n_devices=1, max_steps=2,
    )
    args.update(kw)
    return train(**args), args


# 64x64 grid covering the fixture's +-50m world (cell = 100/64 m)
GRID_64 = dict(xbound=(-50.0, 50.0, 1.5625), ybound=(-50.0, 50.0, 1.5625),
               dbound=(4.0, 45.0, 8.0))


def test_train_smoke_and_checkpoint_resume(fixture_root, tmp_path):
    # grid matches the fixture's 64x64 labels in size and world extent
    result, args = _run(fixture_root, tmp_path, **GRID_64)
    assert result["counter"] == 2
    # metrics JSONL written
    metrics_path = os.path.join(args["logdir"], "metrics.jsonl")
    assert os.path.exists(metrics_path)

    # resume from the saved checkpoint and take 2 more steps (the final save
    # records epoch=nepochs, reference semantics, so raise nepochs)
    result2, _ = _run(
        fixture_root, tmp_path, **GRID_64,
        resume=os.path.join(args["logdir"], "ckpts"),
        max_steps=4, nepochs=2)
    assert result2["counter"] == 4


def test_train_8device_mesh_with_viz_and_val(fixture_root, tmp_path):
    """Full driver over an 8-device CPU mesh with validation + viz enabled:
    the viz batch is fetched once and placed with the mesh sharding (no
    recompile path), and the padded val pass scores the whole set."""
    # train split is 2 scenes x 4 samples = one bsz-8 batch per epoch
    result, args = _run(fixture_root, tmp_path, **GRID_64,
                        bsz=8, n_devices=8, viz_step=2, val_step=2,
                        save_step=0, max_steps=2, nepochs=2)
    assert result["counter"] == 2
    import json
    recs = [json.loads(l) for l in
            open(os.path.join(args["logdir"], "metrics.jsonl"))]
    assert any("val/iou" in r for r in recs), "validation must have run"
    # viz figures land in the tensorboard event file
    tb = [f for f in os.listdir(args["logdir"])
          if f.startswith("events.out")]
    assert tb and os.path.getsize(
        os.path.join(args["logdir"], tb[0])) > 1000


def test_train_2d_cam_mesh_with_viz_and_val(fixture_root, tmp_path):
    """Full driver over a 2-D (4 data x 2 cam) mesh (--cam_devices 2):
    camera-sharded lift + BEV psum inside the train/eval/predict steps,
    validation + viz enabled, metrics finite."""
    result, args = _run(fixture_root, tmp_path, **GRID_64,
                        bsz=8, n_devices=8, cam_devices=2, viz_step=2,
                        val_step=2, save_step=0, max_steps=2, nepochs=2)
    assert result["counter"] == 2
    recs = [json.loads(l) for l in
            open(os.path.join(args["logdir"], "metrics.jsonl"))]
    vals = [r for r in recs if "val/iou" in r]
    assert vals, "validation must have run on the 2-D mesh"
    assert all(np.isfinite(r["val/iou"]) for r in vals)


def test_cam_devices_validation(tmp_path):
    """Bad (n_devices, cam_devices, ncams) combos fail fast, before any
    model init."""
    log = str(tmp_path / "v")
    with pytest.raises(ValueError, match="divisible by cam_devices"):
        train("/nonexistent", n_devices=8, cam_devices=3, logdir=log)
    with pytest.raises(ValueError, match="ncams"):
        train("/nonexistent", n_devices=8, cam_devices=4, ncams=6,
              logdir=log)


def test_train_2d_grid_mesh_with_viz_and_val(fixture_root, tmp_path):
    """Full driver over a 2-D (4 data x 2 grid) GSPMD mesh
    (--grid_devices 2): lift batch-split over all 8 devices, BEV decode
    spatially partitioned, validation + viz enabled, metrics finite."""
    result, args = _run(fixture_root, tmp_path, **GRID_64,
                        bsz=8, n_devices=8, grid_devices=2, viz_step=2,
                        val_step=2, save_step=0, max_steps=2, nepochs=2)
    assert result["counter"] == 2
    recs = [json.loads(l) for l in
            open(os.path.join(args["logdir"], "metrics.jsonl"))]
    vals = [r for r in recs if "val/iou" in r]
    assert vals, "validation must have run on the grid mesh"
    assert all(np.isfinite(r["val/iou"]) for r in vals)


def test_grid_devices_validation(tmp_path):
    """Bad (n_devices, grid_devices, bsz, grid-dim) combos fail fast,
    before any model init."""
    log = str(tmp_path / "v")
    with pytest.raises(ValueError, match="divisible by grid_devices"):
        train("/nonexistent", n_devices=8, grid_devices=5, logdir=log)
    with pytest.raises(ValueError, match="grid X dim"):
        # 200-cell X axis does not split 16 ways... use an odd grid
        train("/nonexistent", n_devices=8, grid_devices=8,
              xbound=(-50.0, 50.0, 1.0 / 0.9), logdir=log)
    with pytest.raises(ValueError, match="alternative model-parallel"):
        train("/nonexistent", n_devices=8, cam_devices=2, grid_devices=2,
              logdir=log)
    with pytest.raises(ValueError, match="lift stage shards"):
        train("/nonexistent", n_devices=8, grid_devices=2, bsz=4,
              logdir=log)


def test_train_with_pretrained_trunk(fixture_root, tmp_path):
    """--pretrained_trunk seeds the camera trunk from an ImageNet-style
    efficientnet_pytorch file before training (reference src/models.py:43)."""
    import torch
    from test_convert import _synthetic_imagenet_sd, _trunk_vars
    tv = _trunk_vars()
    sd = _synthetic_imagenet_sd(tv, seed=11)
    path = tmp_path / "efficientnet-b0-imagenet.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    result, _ = _run(fixture_root, tmp_path, **GRID_64,
                     lr=0.0, weight_decay=0.0, max_steps=1, val_step=0,
                     save_step=0, pretrained_trunk=str(path))
    got = np.asarray(result["state"].params["camencode"]["trunk"]
                     ["conv_stem"]["kernel"])
    np.testing.assert_allclose(
        got, np.transpose(sd["_conv_stem.weight"], (2, 3, 1, 0)), atol=1e-6)


def test_max_steps_stop_records_true_epoch_and_best_iou(fixture_root,
                                                        tmp_path):
    """A --max_steps early stop must save the TRUE epoch (not nepochs, which
    would make --resume a silent no-op) and a resumed run must restore
    best-IoU tracking from best.json (periodic meta has no val_iou)."""
    from lss_carla_tpu.utils.checkpoint import CheckpointManager

    result, args = _run(fixture_root, tmp_path, **GRID_64,
                        nepochs=50, max_steps=2, val_step=2, save_step=0)
    ckdir = os.path.join(args["logdir"], "ckpts")
    mgr = CheckpointManager(ckdir)
    # final save after the early stop: epoch is the real one (0), not 50
    from lss_carla_tpu.training.loop import ocp_abstract
    import jax
    abstract = jax.tree_util.tree_map(ocp_abstract, result["state"])
    _, meta = mgr.restore(abstract)
    assert int(meta["epoch"]) == 0
    mgr.close()

    # resume with the SAME nepochs continues (old semantics made this a
    # no-op) and best-IoU tracking carries over from best.json
    result2, _ = _run(fixture_root, tmp_path, **GRID_64,
                      nepochs=50, max_steps=4, val_step=0, save_step=0,
                      resume=ckdir)
    assert result2["counter"] == 4
    assert result2["best_val_iou"] >= result["best_val_iou"]


def test_train_with_ema_validates_and_resumes(fixture_root, tmp_path):
    """--ema_decay: the loop maintains EMA params, validation runs on the
    averaged model, the checkpoint carries both trees, and a resume with
    EMA still on restores them exactly."""
    import jax
    import numpy as np

    result, args = _run(fixture_root, tmp_path, **GRID_64, ema_decay=0.9)
    assert result["counter"] == 2
    st = result["state"]
    assert st.ema_params is not None
    # after 2 steps the average must lag the raw params
    diffs = [float(np.max(np.abs(np.asarray(e) - np.asarray(p)))) for e, p in
             zip(jax.tree_util.tree_leaves(st.ema_params),
                 jax.tree_util.tree_leaves(st.params))]
    assert max(diffs) > 0

    assert st.ema_batch_stats is not None

    result2, _ = _run(
        fixture_root, tmp_path, **GRID_64, ema_decay=0.9,
        resume=os.path.join(args["logdir"], "ckpts"),
        max_steps=4, nepochs=2)
    assert result2["counter"] == 4
    assert result2["state"].ema_params is not None
    assert result2["state"].ema_batch_stats is not None


def test_train_with_accum_steps(fixture_root, tmp_path):
    """--accum_steps 2: each optimizer step consumes two loader batches (8
    train samples / bsz 2 = 4 batches -> 2 optimizer steps per epoch), and
    validation/checkpointing run on optimizer-step cadence."""
    result, args = _run(fixture_root, tmp_path, **GRID_64, accum_steps=2)
    assert result["counter"] == 2
    assert int(result["state"].step) == 2
    assert os.path.exists(os.path.join(args["logdir"], "metrics.jsonl"))


def test_accum_exceeding_epoch_batches_fails_fast(fixture_root, tmp_path):
    """accum_steps > batches/epoch would silently train zero steps (the
    stacker drops ragged tails) — must raise instead."""
    import pytest
    with pytest.raises(ValueError, match="exceeds"):
        _run(fixture_root, tmp_path, **GRID_64, accum_steps=64)


def test_train_with_async_save_and_resume(fixture_root, tmp_path):
    """--async_save: periodic checkpoints persist in a background thread;
    the run drains on exit, so a fresh process can resume from them and the
    final checkpoint is durable."""
    result, args = _run(fixture_root, tmp_path, **GRID_64, async_save=True)
    assert result["counter"] == 2
    result2, _ = _run(
        fixture_root, tmp_path, **GRID_64, async_save=True,
        resume=os.path.join(args["logdir"], "ckpts"),
        max_steps=4, nepochs=2)
    assert result2["counter"] == 4
