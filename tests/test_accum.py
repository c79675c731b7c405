"""Gradient accumulation (``--accum_steps``): the scan step's grads/BN/
metrics against a manual two-microbatch computation, the host-side batch
stacker, and the sharded variant. No reference equivalent — a TPU-native
training extra (docs/PARITY.md "New TPU-native capability").
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss_carla_tpu.data.loader import stack_microbatches
from lss_carla_tpu.training import create_train_state, make_train_step
from lss_carla_tpu.training.step import _micro_grads

from util import slim_model, tiny_batch

pytestmark = pytest.mark.slow  # full-model (tiny-config) CPU compiles


def test_stack_microbatches_shapes_and_ragged_tail():
    rng = np.random.default_rng(0)
    batches = [tiny_batch(rng, B=2) for _ in range(5)]
    out = list(stack_microbatches(iter(batches), 2))
    assert len(out) == 2  # 5 batches -> 2 stacks, ragged tail dropped
    for j, el in enumerate(out[0]):
        assert el.shape == (2,) + batches[0][j].shape
        np.testing.assert_array_equal(el[0], batches[0][j])
        np.testing.assert_array_equal(el[1], batches[1][j])
    # accum_steps=1 passes batches through untouched
    same = list(stack_microbatches(iter(batches), 1))
    assert len(same) == 5 and same[0] is batches[0]


@pytest.fixture(scope="module")
def model_and_data():
    # slim trunk: these tests assert optimizer/EMA/accum tree
    # mechanics (model-agnostic); full-size-model coverage lives in
    # the torch-parity and train-loop files (round-3 precedent)
    model = slim_model()
    rng = np.random.default_rng(0)
    mb0 = tuple(jnp.asarray(a) for a in tiny_batch(rng, B=2))
    mb1 = tuple(jnp.asarray(a) for a in tiny_batch(rng, B=2))
    stacked = tuple(jnp.stack([a, b]) for a, b in zip(mb0, mb1))
    state = create_train_state(model, jax.random.PRNGKey(0), mb0[:6])
    return model, state, mb0, mb1, stacked


def test_accum_matches_manual_two_microbatches(model_and_data):
    """Compare at the GRADIENT level, before Adam (at step 1 the Adam
    update is ~lr*sign(grad), which would amplify float noise on near-zero
    grads into +-lr param flips), and with BOTH sides jitted: eager-vs-jit
    backprop through this depth diverges by percent-level noise on
    cancellation-heavy leaves (trunk bn2.bias grads have ~1e-7 norm),
    while jit-vs-jit agrees to ~1e-5 (measured)."""
    from lss_carla_tpu.training.step import accum_scan
    model, state, mb0, mb1, stacked = model_and_data
    key = jax.random.PRNGKey(7)

    grads, loss, new_bs, intersect, union = jax.jit(
        lambda s: accum_scan(s, stacked, key, 2.13, 2))(state)

    # manual: grads at FIXED params, BN stats threaded sequentially,
    # dropout folded per microbatch index — exactly the scan's contract
    @jax.jit
    def manual(s):
        g0, l0, bs0, _, i0, u0 = _micro_grads(
            s, s.batch_stats, mb0, jax.random.fold_in(key, 0), 2.13)
        g1, l1, bs1, _, i1, u1 = _micro_grads(
            s, bs0, mb1, jax.random.fold_in(key, 1), 2.13)
        g = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g0, g1)
        return g, (l0 + l1) / 2, bs1, i0 + i1, u0 + u1

    want_grads, want_loss, want_bs, want_i, want_u = manual(state)

    for got, want in zip(jax.tree_util.tree_leaves(grads),
                         jax.tree_util.tree_leaves(want_grads)):
        got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
        err = np.linalg.norm((got - want).ravel())
        nrm = np.linalg.norm(want.ravel())
        # jit-vs-jit floor measured ~9e-6 abs / 4e-6 rel; a semantic bug
        # (unaveraged grads, mis-threaded BN) moves leaves by O(1) relative
        assert err < 1e-3 * nrm + 1e-4, (
            f"L2 err {err} for leaf shape {want.shape} (norm {nrm})")
    for got, want in zip(jax.tree_util.tree_leaves(new_bs),
                         jax.tree_util.tree_leaves(want_bs)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)
    assert float(loss) == pytest.approx(float(want_loss), rel=1e-4)
    assert float(intersect) == pytest.approx(float(want_i))
    assert float(union) == pytest.approx(float(want_u))


def test_accum_step_single_update(model_and_data):
    """The full step applies exactly ONE optimizer update per stacked batch
    and returns summed IoU counts."""
    model, state, _, _, stacked = model_and_data
    step = make_train_step(model, accum_steps=2, jit=False)
    s2, metrics = step(state, stacked, jax.random.PRNGKey(7))
    assert int(s2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["union"]) >= 0


def test_sharded_accum_step_runs(model_and_data):
    from lss_carla_tpu.parallel import make_mesh, make_sharded_train_step, \
        replicate
    from lss_carla_tpu.parallel.mesh import microbatched_sharding
    model, state, _, _, stacked = model_and_data
    mesh = make_mesh(2)
    s = replicate(mesh, jax.tree_util.tree_map(jnp.copy, state))
    step = make_sharded_train_step(model, mesh, accum_steps=2)
    batch = jax.device_put(stacked, microbatched_sharding(mesh))
    s, metrics = step(s, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["union"]) >= 0
    assert int(s.step) == 1
