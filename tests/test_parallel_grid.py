"""BEV-grid spatial parallelism (GSPMD (data, grid) mesh, parallel/grid.py).

The grid step is ONE global-shape jit program with sharding constraints, so
— unlike the shard_map DP step (per-chip BN stats) — it must be numerically
the SAME program as the unsharded single-device step: global-batch BN,
identical dropout masks. These tests verify:

* forward parity on a (data=2, grid=2) mesh vs the unsharded model,
* the FULL train step (fwd+bwd+Adam+BN update, dropout on) matches the
  unsharded ``training.step.make_train_step`` leaf-for-leaf with the same
  rng — the strongest parity statement any sharded step here makes,
* outputs come back replicated across every device of the mesh,
* eval metrics (with a validity mask) match the single-device accumulators.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss_carla_tpu.parallel.grid import (
    make_grid_sharded_eval_step, make_grid_sharded_predict,
    make_grid_sharded_train_step, make_mesh_grid, shard_batch_grid)
from lss_carla_tpu.parallel.mesh import replicate
from lss_carla_tpu.training.loss import masked_eval_metrics
from lss_carla_tpu.training.state import TrainState, make_optimizer
from lss_carla_tpu.training.step import make_train_step

from util import slim_model, tiny_batch

POS_WEIGHT = 2.13

pytestmark = pytest.mark.slow  # multi-device full-model CPU compiles


def _fresh_state(model, batch):
    init = jax.jit(lambda r, *a: model.init({"params": r}, *a, train=False))
    variables = init(jax.random.PRNGKey(0), *map(jnp.asarray, batch[:6]))
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=make_optimizer())


@pytest.fixture(scope="module")
def setup():
    # slim trunk: GSPMD compile time scales with trunk op count;
    # the sharded-vs-unsharded parity statement is model-agnostic
    # (full-size-model coverage: torch-parity + train-loop tests)
    model = slim_model()
    rng = np.random.default_rng(0)
    # B=4: divisible by the 4-way (data x grid) lift sharding of the
    # (2, 2) predict mesh; the train/eval tests slice it to B=2
    batch = tiny_batch(rng, B=4, N=6)
    return model, _fresh_state(model, batch), batch


def test_predict_parity_grid_mesh(setup):
    model, state, batch = setup
    ref = jax.jit(lambda *a: model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        *a, train=False))(*map(jnp.asarray, batch[:6]))

    mesh = make_mesh_grid(2, 2)
    predict = make_grid_sharded_predict(model, mesh)
    placed = shard_batch_grid(mesh, batch[:6])
    out = predict(replicate(mesh, state), placed)
    # logits come back X-sharded over the grid axis by contract
    assert out.sharding.spec == jax.sharding.PartitionSpec(
        "data", None, "grid")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_train_step_matches_unsharded(setup):
    """Same rng, same batch: the GSPMD step's updated params, BN stats, and
    metrics must equal the unsharded step's (up to float reassociation from
    the partitioned reductions).

    Uses an SGD state so the param comparison stays tight: the update is
    LINEAR in the gradient, so reassociation-level grad noise stays
    reassociation-level in the params. (Adam turns a ~1e-7 difference on a
    near-zero gradient element into a full ±lr sign flip — m/sqrt(v) is
    sign-sensitive at 0 — which is optimizer amplification, not a sharding
    bug; Adam execution on the grid mesh is covered by the e2e driver test
    in test_train_loop.py.)"""
    import optax
    model, state, batch = setup
    jbatch = tuple(jnp.asarray(x[:2]) for x in batch)
    rng = jax.random.PRNGKey(7)
    state = TrainState.create(
        apply_fn=model.apply, params=state.params,
        batch_stats=state.batch_stats, tx=optax.sgd(1e-3))

    ref_step = make_train_step(model, pos_weight=POS_WEIGHT, jit=False)
    ref_state, ref_metrics = ref_step(state, jbatch, rng)

    mesh = make_mesh_grid(1, 2)
    step = make_grid_sharded_train_step(model, mesh, pos_weight=POS_WEIGHT)
    # the step donates: give it a private deep copy (see
    # test_parallel_camera.py for the aliasing hazard on the CPU backend)
    private = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                     state)
    st2, metrics = step(replicate(mesh, private),
                        shard_batch_grid(mesh, jbatch), rng)

    for k in ("loss", "intersect", "union"):
        np.testing.assert_allclose(np.asarray(metrics[k]),
                                   np.asarray(ref_metrics[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)

    for name, got_tree, ref_tree in (("params", st2.params, ref_state.params),
                                     ("batch_stats", st2.batch_stats,
                                      ref_state.batch_stats)):
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_tree)
        flat_got = {jax.tree_util.keystr(p): g
                    for p, g in jax.tree_util.tree_leaves_with_path(got_tree)}
        assert len(flat_ref) == len(flat_got)
        for path, rv in flat_ref:
            gv = flat_got[jax.tree_util.keystr(path)]
            np.testing.assert_allclose(
                np.asarray(gv), np.asarray(rv), rtol=2e-4, atol=2e-6,
                err_msg=f"{name}{jax.tree_util.keystr(path)}")

    # state replicated on every device of the mesh
    leaf = jax.tree_util.tree_leaves(st2.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    assert len(shards) == 2
    for s in shards[1:]:
        np.testing.assert_array_equal(s, shards[0])


def test_eval_step_masked_parity(setup):
    model, state, batch = setup
    jbatch = tuple(jnp.asarray(x[:2]) for x in batch)
    valid = jnp.asarray([1.0, 0.0], jnp.float32)  # second sample is padding

    logits = jax.jit(lambda *a: model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        *a, train=False))(*jbatch[:6])
    ref = masked_eval_metrics(logits, jbatch[6], valid, POS_WEIGHT)

    mesh = make_mesh_grid(1, 2)
    eval_step = make_grid_sharded_eval_step(model, mesh,
                                            pos_weight=POS_WEIGHT)
    got = eval_step(replicate(mesh, state),
                    shard_batch_grid(mesh, jbatch + (valid,)))
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
