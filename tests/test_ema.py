"""EMA parameter averaging (``--ema_decay``): update math against a manual
recursion, sharded-step replication, and checkpoint tolerance in both
directions (EMA run <-> non-EMA checkpoint). No reference equivalent — a
TPU-native training extra (docs/PARITY.md "New TPU-native capability").
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss_carla_tpu.training import create_train_state, make_train_step
from lss_carla_tpu.training.state import restore_train_state
from lss_carla_tpu.utils.checkpoint import CheckpointManager

from util import slim_model, tiny_batch

pytestmark = pytest.mark.slow  # full-model (tiny-config) CPU compiles

DECAY = 0.5  # large (1 - decay) so drift is far above test tolerance


@pytest.fixture(scope="module")
def model_state_batch():
    # slim trunk: these tests assert optimizer/EMA/accum tree
    # mechanics (model-agnostic); full-size-model coverage lives in
    # the torch-parity and train-loop files (round-3 precedent)
    model = slim_model()
    rng = np.random.default_rng(0)
    batch = tuple(jnp.asarray(a) for a in tiny_batch(rng))
    state = create_train_state(model, jax.random.PRNGKey(0), batch[:6],
                               ema_decay=DECAY)
    return model, state, batch


def _copy(tree):
    return jax.tree_util.tree_map(jnp.copy, tree)


def test_ema_seeded_at_init(model_state_batch):
    _, state, _ = model_state_batch
    assert state.ema_params is not None
    for e, p in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))
    # batch_stats are averaged too: EMA params must pair with BN running
    # stats lagging by the same horizon (TrainState.ema_batch_stats)
    assert state.ema_batch_stats is not None
    for e, b in zip(jax.tree_util.tree_leaves(state.ema_batch_stats),
                    jax.tree_util.tree_leaves(state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(b))


def test_ema_off_by_default(model_state_batch):
    model, _, batch = model_state_batch
    state = create_train_state(model, jax.random.PRNGKey(0), batch[:6])
    assert state.ema_params is None
    step = make_train_step(model, jit=False)
    state2, _ = step(state, batch, jax.random.PRNGKey(1))
    assert state2.ema_params is None


def test_donated_step_accepts_freshly_created_state(model_state_batch):
    """create_train_state must COPY params into the EMA seed, not alias:
    the jitted step donates the whole state, and two tree leaves sharing a
    buffer fail with "attempt to donate the same buffer twice"."""
    model, _, batch = model_state_batch
    state = create_train_state(model, jax.random.PRNGKey(0), batch[:6],
                               ema_decay=DECAY)
    step = make_train_step(model, ema_decay=DECAY)
    s2, _ = step(state, batch, jax.random.PRNGKey(0))
    assert s2.ema_params is not None


def _eff_decay(t):
    """The warmup-ramped decay ema_update applies at step t (see
    training/state.ema_update): min(DECAY, (1+t)/(10+t))."""
    return min(DECAY, (1.0 + t) / (10.0 + t))


def test_ema_matches_manual_recursion(model_state_batch):
    model, state, batch = model_state_batch
    step = make_train_step(model, ema_decay=DECAY)
    s = _copy(state)  # the jitted step donates its input
    expected = _copy(state.params)
    for i in range(3):
        s, _ = step(s, batch, jax.random.PRNGKey(i))
        d = _eff_decay(int(s.step))
        expected = jax.tree_util.tree_map(
            lambda e, p: e * d + p * (1.0 - d), expected, s.params)
    for got, want in zip(jax.tree_util.tree_leaves(s.ema_params),
                         jax.tree_util.tree_leaves(expected)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)
    # EMA lags the raw params (params moved, average is behind)
    diffs = [float(jnp.max(jnp.abs(e - p))) for e, p in zip(
        jax.tree_util.tree_leaves(s.ema_params),
        jax.tree_util.tree_leaves(s.params))]
    assert max(diffs) > 0


def test_ema_batch_stats_match_manual_recursion(model_state_batch):
    model, state, batch = model_state_batch
    step = make_train_step(model, ema_decay=DECAY)
    s = _copy(state)
    expected = _copy(state.batch_stats)
    for i in range(3):
        s, _ = step(s, batch, jax.random.PRNGKey(i))
        d = _eff_decay(int(s.step))
        expected = jax.tree_util.tree_map(
            lambda e, b: e * d + b * (1.0 - d),
            expected, s.batch_stats)
    for got, want in zip(jax.tree_util.tree_leaves(s.ema_batch_stats),
                         jax.tree_util.tree_leaves(expected)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)
    # and they lag the raw running stats
    diffs = [float(jnp.max(jnp.abs(e - b))) for e, b in zip(
        jax.tree_util.tree_leaves(s.ema_batch_stats),
        jax.tree_util.tree_leaves(s.batch_stats))]
    assert max(diffs) > 0


def test_ema_warmup_ramp(model_state_batch):
    """The effective decay ramps (1+t)/(10+t) early and caps at `decay`
    late; warmup=False applies the flat decay at any step."""
    from lss_carla_tpu.training.state import ema_update
    _, state, _ = model_state_batch
    ones = jax.tree_util.tree_map(jnp.ones_like, state.params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)

    def first_leaf(tree):
        return float(jax.tree_util.tree_leaves(tree)[0].ravel()[0])

    for t, want in [(1, min(DECAY, 2 / 11)), (4, min(DECAY, 5 / 14)),
                    (10_000, DECAY)]:
        s = state.replace(step=jnp.asarray(t, jnp.int32),
                          params=zeros, ema_params=ones,
                          batch_stats={}, ema_batch_stats=None)
        got = first_leaf(ema_update(s, DECAY).ema_params)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        got_flat = first_leaf(ema_update(s, DECAY, warmup=False).ema_params)
        np.testing.assert_allclose(got_flat, DECAY, rtol=1e-6)


def test_sharded_step_keeps_ema_replicated(model_state_batch):
    from lss_carla_tpu.parallel import (make_mesh, make_sharded_train_step,
                                        replicate, shard_batch)
    model, state, batch = model_state_batch
    mesh = make_mesh(2)
    s = replicate(mesh, _copy(state))
    prev_ema = _copy(state.ema_params)
    step = make_sharded_train_step(model, mesh, ema_decay=DECAY)
    s, _ = step(s, shard_batch(mesh, batch), jax.random.PRNGKey(0))
    d = _eff_decay(int(s.step))
    expected = jax.tree_util.tree_map(
        lambda e, p: e * d + np.asarray(p) * (1.0 - d),
        prev_ema, s.params)
    for got, want in zip(jax.tree_util.tree_leaves(s.ema_params),
                         jax.tree_util.tree_leaves(expected)):
        got = np.asarray(got)
        np.testing.assert_allclose(got, np.asarray(want),
                                   rtol=1e-6, atol=1e-7)


def test_checkpoint_roundtrip_and_mismatch_tolerance(model_state_batch,
                                                     tmp_path):
    model, state, batch = model_state_batch
    step = make_train_step(model, ema_decay=DECAY)
    s, _ = step(_copy(state), batch, jax.random.PRNGKey(0))  # ema != params

    mgr = CheckpointManager(str(tmp_path / "ema_ckpt"))
    mgr.save(1, s, epoch=0)

    # exact round-trip: EMA target <- EMA checkpoint
    target = create_train_state(model, jax.random.PRNGKey(0), batch[:6],
                                ema_decay=DECAY)
    restored, meta = restore_train_state(mgr, target)
    assert meta["counter"] == 1
    for got, want in zip(jax.tree_util.tree_leaves(restored.ema_params),
                         jax.tree_util.tree_leaves(s.ema_params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # non-EMA run <- EMA checkpoint: subtree dropped, params intact
    target_plain = create_train_state(model, jax.random.PRNGKey(0), batch[:6])
    restored2, _ = restore_train_state(mgr, target_plain)
    assert restored2.ema_params is None
    assert restored2.ema_batch_stats is None
    for got, want in zip(jax.tree_util.tree_leaves(restored2.params),
                         jax.tree_util.tree_leaves(s.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # EMA run <- non-EMA checkpoint: EMA seeded from the restored params
    # and batch_stats
    mgr2 = CheckpointManager(str(tmp_path / "plain_ckpt"))
    s_plain = s.replace(ema_params=None, ema_batch_stats=None)
    mgr2.save(1, s_plain, epoch=0)
    restored3, _ = restore_train_state(mgr2, target)
    for got, want in zip(jax.tree_util.tree_leaves(restored3.ema_params),
                         jax.tree_util.tree_leaves(s_plain.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(
            jax.tree_util.tree_leaves(restored3.ema_batch_stats),
            jax.tree_util.tree_leaves(s_plain.batch_stats)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # EMA run <- round-2 params-only-EMA checkpoint: ema_batch_stats seeded
    # from the restored batch_stats, ema_params restored as saved
    mgr3 = CheckpointManager(str(tmp_path / "r2_ckpt"))
    s_r2 = s.replace(ema_batch_stats=None)
    mgr3.save(1, s_r2, epoch=0)
    restored4, _ = restore_train_state(mgr3, target)
    for got, want in zip(jax.tree_util.tree_leaves(restored4.ema_params),
                         jax.tree_util.tree_leaves(s_r2.ema_params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(
            jax.tree_util.tree_leaves(restored4.ema_batch_stats),
            jax.tree_util.tree_leaves(s_r2.batch_stats)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # non-EMA run <- round-2 params-only-EMA checkpoint: dropped
    restored5, _ = restore_train_state(mgr3, target_plain)
    assert restored5.ema_params is None
    assert restored5.ema_batch_stats is None

    mgr.close()
    mgr2.close()
    mgr3.close()
