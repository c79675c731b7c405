"""Best-checkpoint preservation: periodic rotation must never GC the best
checkpoint; restore(best=True) returns it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lss_carla_tpu.utils.checkpoint import CheckpointManager


def _state(v: float):
    return {"w": jnp.full((4,), v), "b": jnp.asarray(v)}


def _abstract():
    return {"w": jax.ShapeDtypeStruct((4,), jnp.float32),
            "b": jax.ShapeDtypeStruct((), jnp.float32)}


def test_best_survives_rotation(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    mgr.save_best(1, _state(1.0), epoch=0, val_iou=0.5)  # best at step 1
    for step in range(2, 8):
        mgr.save(step, _state(float(step)), epoch=0)
    # periodic manager rotated away early steps...
    assert 2 not in mgr._mgr.all_steps()
    # ...but the best checkpoint is intact
    state, meta = mgr.restore(_abstract(), best=True)
    assert meta["counter"] == 1
    assert float(state["b"]) == 1.0
    np.testing.assert_allclose(np.asarray(state["w"]), 1.0)
    assert mgr.best_step() == 1
    # latest restore still works
    state2, meta2 = mgr.restore(_abstract())
    assert meta2["counter"] == 7
    mgr.close()


def test_restore_falls_back_to_best_when_only_best_exists(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck2"))
    mgr.save_best(5, _state(5.0), epoch=1, val_iou=0.4)
    state, meta = mgr.restore(_abstract())
    assert meta["counter"] == 5
    mgr.close()


def test_restore_empty_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck3"))
    with pytest.raises(FileNotFoundError):
        mgr.restore(_abstract())
    mgr.close()


def test_best_val_iou_survives_periodic_saves(tmp_path):
    """Resume reads best.json for best-IoU tracking: periodic/preemption
    checkpoint meta has no val_iou, and restoring 0.0 would let a worse
    model overwrite the saved best (review finding, round 2)."""
    mgr = CheckpointManager(str(tmp_path / "ck"))
    assert mgr.best_val_iou() is None
    mgr.save_best(5, _state(1.0), epoch=0, val_iou=0.7)
    mgr.save(6, _state(2.0), epoch=0)          # periodic: no val_iou in meta
    _, meta = mgr.restore(_abstract())
    assert "val_iou" not in meta               # the hazard being guarded
    assert mgr.best_val_iou() == pytest.approx(0.7)
    mgr.close()


def test_async_save_roundtrip_and_idempotence(tmp_path):
    """async_save=True: saves launch background writes; restore/close are
    drain points; same-step re-save (periodic+final coinciding) still
    replaces; best saves stay durable before best.json is written."""
    mgr = CheckpointManager(str(tmp_path / "ck"), async_save=True)
    mgr.save(1, _state(1.0), epoch=0)
    mgr.save(2, _state(2.0), epoch=0)          # drains step 1 first
    mgr.save_best(2, _state(2.0), epoch=0, val_iou=0.6)  # durable + best.json
    assert mgr.best_val_iou() == pytest.approx(0.6)
    mgr.save(2, _state(3.0), epoch=1)          # idempotent re-save, async
    state, meta = mgr.restore(_abstract())     # restore drains in-flight
    assert meta == {"counter": 2, "epoch": 1}
    assert float(state["b"]) == 3.0
    # the best manager kept the pre-re-save weights
    bstate, bmeta = mgr.restore(_abstract(), best=True)
    assert float(bstate["b"]) == 2.0 and bmeta["val_iou"] == pytest.approx(0.6)
    mgr.close()

    # a fresh (sync) manager sees everything the async one wrote
    mgr2 = CheckpointManager(str(tmp_path / "ck"))
    state2, meta2 = mgr2.restore(_abstract())
    assert meta2["counter"] == 2 and float(state2["b"]) == 3.0
    mgr2.close()


def test_weights_only_fallback_for_optimizer_mismatch(tmp_path):
    """A schedule-trained checkpoint must be openable by eval tools built
    with the default constant-LR optimizer (round-5 finding: the stretch
    eval cross-check failed on opt_state[3] dict-vs-EmptyState). Only the
    opt-in allow_weights_only path may absorb it — training resume keeps
    the loud error."""
    from lss_carla_tpu.training.state import (TrainState, make_optimizer,
                                              restore_train_state)
    params = {"w": jnp.ones((4,))}
    bs = {"m": jnp.zeros((4,))}
    trained = TrainState.create(
        apply_fn=lambda *a: None, params=params, batch_stats=bs,
        tx=make_optimizer(lr_schedule="cosine", warmup_steps=2,
                          decay_steps=10))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(3, trained, epoch=1)
    mgr.close()

    evalside = TrainState.create(
        apply_fn=lambda *a: None,
        params={"w": jnp.zeros((4,))}, batch_stats={"m": jnp.ones((4,))},
        tx=make_optimizer())  # constant LR -> different opt_state tree
    mgr2 = CheckpointManager(str(tmp_path / "ck"))
    # training-resume semantics: still a hard error
    with pytest.raises(Exception):
        restore_train_state(mgr2, evalside)
    # eval semantics: weights restored, optimizer state left fresh
    got, meta = restore_train_state(mgr2, evalside, allow_weights_only=True)
    np.testing.assert_allclose(np.asarray(got.params["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(got.batch_stats["m"]), 0.0)
    assert meta["counter"] == 3
    mgr2.close()
