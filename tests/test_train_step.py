import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss_carla_tpu.parallel import make_mesh, make_sharded_eval_step, \
    make_sharded_train_step, replicate, shard_batch
from lss_carla_tpu.training import create_train_state, make_eval_step, \
    make_train_step
from lss_carla_tpu.training.loss import bce_with_logits, get_batch_iou

from util import tiny_batch, tiny_model


def test_bce_matches_torch():
    import torch
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
    targets = (rng.uniform(size=(2, 1, 8, 8)) < 0.3).astype(np.float32)
    want = torch.nn.BCEWithLogitsLoss(
        pos_weight=torch.tensor([2.13]))(torch.from_numpy(logits),
                                         torch.from_numpy(targets))
    got = bce_with_logits(jnp.asarray(logits), jnp.asarray(targets), 2.13)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_bce_per_class_pos_weight_matches_torch():
    # torch pos_weight-tensor semantics: one weight per channel, broadcast
    # over (B, C, H, W) — the multiclass stretch config's class balancing
    import torch
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    targets = (rng.uniform(size=(2, 4, 8, 8)) < 0.3).astype(np.float32)
    w = [2.13, 25.0, 25.0, 25.0]
    want = torch.nn.BCEWithLogitsLoss(
        pos_weight=torch.tensor(w).reshape(1, 4, 1, 1))(
            torch.from_numpy(logits), torch.from_numpy(targets))
    got = bce_with_logits(jnp.asarray(logits), jnp.asarray(targets), tuple(w))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    # scalar path unchanged by the generalization
    got1 = bce_with_logits(jnp.asarray(logits), jnp.asarray(targets), 2.13)
    got2 = bce_with_logits(jnp.asarray(logits), jnp.asarray(targets),
                           (2.13, 2.13, 2.13, 2.13))
    np.testing.assert_allclose(float(got1), float(got2), rtol=1e-6)


def test_batch_iou_reference_semantics():
    logits = jnp.array([[1.0, -1.0], [0.5, -0.5]])
    tgt = jnp.array([[1.0, 1.0], [0.0, 0.0]])
    i, u, iou = get_batch_iou(logits, tgt)
    assert (i, u) == (1.0, 3.0)
    assert iou == pytest.approx(1 / 3)
    # union == 0 -> iou = 1.0 convention
    _, _, iou0 = get_batch_iou(jnp.array([-1.0]), jnp.array([0.0]))
    assert iou0 == 1.0


@pytest.fixture(scope="module")
def state_and_batch():
    model = tiny_model()
    rng = np.random.default_rng(0)
    batch = tiny_batch(rng)
    sample_args = tuple(jnp.asarray(a) for a in batch[:6])
    state = create_train_state(model, jax.random.PRNGKey(0), sample_args)
    return model, state, tuple(jnp.asarray(a) for a in batch)


def test_train_step_updates_and_learns(state_and_batch):
    model, state, batch = state_and_batch
    step = make_train_step(model, pos_weight=2.13)
    losses = []
    # the step donates its input state; work on a copy so the module-scoped
    # fixture stays alive for the other tests
    s = jax.tree_util.tree_map(jnp.copy, state)
    for i in range(8):
        s, metrics = step(s, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(s.step) == 8
    # overfitting a fixed batch must reduce loss
    assert losses[-1] < losses[0] * 0.9, losses


def test_eval_step_accumulates(state_and_batch):
    model, state, batch = state_and_batch
    ev = make_eval_step(model, pos_weight=2.13)
    m = ev(state, batch)
    assert float(m["batch"]) == batch[0].shape[0]
    assert np.isfinite(float(m["loss_sum"]))
    assert float(m["union"]) >= 0


def test_sharded_train_step_matches_metrics_shape(state_and_batch):
    model, state, _ = state_and_batch
    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    batch = tiny_batch(rng, B=8)
    step = make_sharded_train_step(model, mesh, pos_weight=2.13)
    # copy before replicating: replication may alias the source buffer as one
    # shard, and the donating step would free the module-scoped fixture
    s = replicate(mesh, jax.tree_util.tree_map(jnp.copy, state))
    db = shard_batch(mesh, batch)
    s, metrics = step(s, db, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(s.step) == 1
    # params stay replicated and identical across devices
    p = jax.tree_util.tree_leaves(s.params)[0]
    assert p.sharding.is_fully_replicated


def test_sharded_eval_matches_single_device(state_and_batch):
    """Eval has no BN-stat updates or dropout, so sharded == single-device."""
    model, state, _ = state_and_batch
    mesh = make_mesh(8)
    rng = np.random.default_rng(4)
    batch = tuple(jnp.asarray(a) for a in tiny_batch(rng, B=8))
    single = make_eval_step(model, pos_weight=2.13)(state, batch)
    sh = make_sharded_eval_step(model, mesh, pos_weight=2.13)(
        replicate(mesh, state), shard_batch(mesh, batch))
    np.testing.assert_allclose(float(sh["loss_sum"]),
                               float(single["loss_sum"]), rtol=2e-4)
    np.testing.assert_allclose(float(sh["intersect"]),
                               float(single["intersect"]), rtol=1e-6)
    np.testing.assert_allclose(float(sh["union"]), float(single["union"]),
                               rtol=1e-6)


def test_lr_schedules():
    """Opt-in schedules: warmup ramps from 0 to lr, cosine/linear decay to 0
    at the horizon; constant stays the reference-parity default; bad args
    fail fast."""
    import numpy as np
    import pytest
    from lss_carla_tpu.training.state import make_lr_schedule

    lr = 1e-3
    const = make_lr_schedule(lr)
    assert const(0) == const(10_000) == lr

    for kind in ("cosine", "linear"):
        s = make_lr_schedule(lr, kind, warmup_steps=100, decay_steps=1000)
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(100)), lr, rtol=1e-6)
        assert 0.0 < float(s(500)) < lr
        np.testing.assert_allclose(float(s(1000)), 0.0, atol=lr * 1e-3)

    warm_const = make_lr_schedule(lr, "constant", warmup_steps=50)
    assert float(warm_const(0)) == 0.0
    np.testing.assert_allclose(float(warm_const(50)), lr, rtol=1e-6)
    np.testing.assert_allclose(float(warm_const(5000)), lr, rtol=1e-6)

    with pytest.raises(ValueError, match="decay_steps"):
        make_lr_schedule(lr, "cosine", warmup_steps=10, decay_steps=5)
    with pytest.raises(ValueError, match="unknown lr_schedule"):
        make_lr_schedule(lr, "step")


def test_optimizer_with_schedule_updates_params():
    """The scheduled optimizer produces warmup-scaled updates (near-zero at
    step 0, full lr later) on a toy parameter."""
    import jax.numpy as jnp
    import numpy as np
    from lss_carla_tpu.training.state import make_optimizer

    tx = make_optimizer(lr=0.1, weight_decay=0.0, max_grad_norm=0.0,
                        lr_schedule="cosine", warmup_steps=5, decay_steps=50)
    params = {"w": jnp.ones(3)}
    grads = {"w": jnp.ones(3)}
    opt_state = tx.init(params)
    updates0, opt_state = tx.update(grads, opt_state, params)
    assert float(jnp.max(jnp.abs(updates0["w"]))) < 1e-8  # lr(0) == 0
    for _ in range(5):
        updates, opt_state = tx.update(grads, opt_state, params)
    # past warmup: Adam-normalized grads scaled by ~lr
    assert float(jnp.max(jnp.abs(updates["w"]))) > 0.05
