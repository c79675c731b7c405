"""End-to-end smoke: the full training driver on the synthetic fixture,
tiny shapes, CPU — covering data pipeline -> jitted sharded step ->
logging -> checkpoint -> resume."""

import json
import os

import numpy as np
import pytest

from lss_carla_tpu.data.fixtures import generate_fixture
from lss_carla_tpu.training.loop import train


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
