"""Camera-axis model parallelism (2-D data x cam mesh, parallel/camera.py).

The splat is a sum over frustum points and points partition by camera, so a
camera-sharded lift + partial splat + psum(bev) must reproduce the
single-device model exactly (up to float add order). These tests verify:

* forward parity on a (data=2, cam=3) mesh vs the unsharded model,
* the per-subtree gradient reduction (psum over cam for camencode — each
  shard holds the true grad restricted to its cameras; pmean elsewhere)
  against jax.grad of the unsharded loss,
* the full train step executes, updates params, and keeps the state
  replicated across every device of the 2-D mesh,
* eval metrics (with a validity mask) match the single-device accumulators.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss_carla_tpu.parallel.camera import (
    CAM_AXIS, _lift_and_decode, _reduce_grads, make_camera_sharded_eval_step,
    make_camera_sharded_predict, make_camera_sharded_train_step, make_mesh_2d,
    shard_batch_2d)
from lss_carla_tpu.parallel.mesh import DATA_AXIS, replicate
from lss_carla_tpu.training.loss import bce_with_logits, masked_eval_metrics
from lss_carla_tpu.training.state import TrainState, make_optimizer

from util import slim_model, tiny_batch

POS_WEIGHT = 2.13

pytestmark = pytest.mark.slow  # multi-device full-model CPU compiles


@pytest.fixture(scope="module")
def setup():
    # slim trunk: shard_map compile time scales with trunk op count;
    # the sharded-vs-unsharded parity statement is model-agnostic
    # (full-size-model coverage: torch-parity + train-loop tests)
    model = slim_model()
    rng = np.random.default_rng(0)
    batch = tiny_batch(rng, B=2, N=6)
    init = jax.jit(lambda r, *a: model.init({"params": r}, *a, train=False))
    variables = init(jax.random.PRNGKey(0), *map(jnp.asarray, batch[:6]))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=make_optimizer())
    return model, state, batch


def test_predict_parity_2d_mesh(setup):
    model, state, batch = setup
    ref = jax.jit(lambda *a: model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        *a, train=False))(*map(jnp.asarray, batch[:6]))

    mesh = make_mesh_2d(2, 3)
    predict = make_camera_sharded_predict(model, mesh)
    placed = shard_batch_2d(mesh, batch[:6])
    out = predict(replicate(mesh, state), placed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grad_reduction_matches_unsharded(setup):
    """Uniform-pmean reduction (psum transposes to psum, so each cam
    shard's camencode grad is n_cam x its partial) == jax.grad of the
    global loss (eval-mode forward: no dropout, deterministic BN).

    Runs on a (1, 2) mesh: the cam-axis scaling subtlety is fully exercised
    at n_cam=2, and the smaller program keeps the CPU compile tractable —
    the 2-D composition itself is covered by the (2, 3) predict test."""
    model, state, batch = setup
    jbatch = tuple(map(jnp.asarray, batch))

    def ref_loss(params):
        out = model.apply({"params": params,
                           "batch_stats": state.batch_stats},
                          *jbatch[:6], train=False)
        return bce_with_logits(out, jbatch[6], POS_WEIGHT)

    ref_grads = jax.jit(jax.grad(ref_loss))(state.params)

    mesh = make_mesh_2d(1, 2)
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def sharded_grads(state, batch):
        def loss_fn(params):
            logits, _ = _lift_and_decode(
                state, *batch[:6], train=False, params=params)
            return bce_with_logits(logits, batch[6], POS_WEIGHT)
        return _reduce_grads(jax.grad(loss_fn)(state.params))

    cam_spec = P(DATA_AXIS, CAM_AXIS)
    fn = jax.jit(shard_map(
        sharded_grads, mesh=mesh,
        in_specs=(P(), (cam_spec,) * 6 + (P(DATA_AXIS),)),
        out_specs=P(), check_vma=False))
    got = fn(replicate(mesh, state), shard_batch_2d(mesh, jbatch))

    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_got = {jax.tree_util.keystr(p): g
                for p, g in jax.tree_util.tree_leaves_with_path(got)}
    assert len(flat_ref) == len(flat_got)
    for path, rg in flat_ref:
        gg = flat_got[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(rg), rtol=2e-4, atol=2e-6,
            err_msg=jax.tree_util.keystr(path))


def test_train_step_executes_and_replicates(setup):
    model, state, batch = setup
    mesh = make_mesh_2d(1, 2)
    step = make_camera_sharded_train_step(model, mesh, pos_weight=POS_WEIGHT)

    # the step donates its state, and replicate()'s device-0 shard aliases
    # the source buffer on the CPU backend — donating a replica of the
    # shared fixture state double-frees buffers that the other tests'
    # replicas still reference (observed as a hard abort). Deep-copy EVERY
    # array leaf (params, batch_stats, opt_state) so the donated tree owns
    # its buffers, and keep host snapshots for the before/after asserts.
    #
    # ROOT-CAUSED (round 3, scripts/camera_abort_repro.py): --mode alias
    # reproduces it on demand — donate a replicate() of a shared state,
    # then touch any other replica of the same source. When jax's
    # dispatch-time _check_if_deleted catches the access it raises a clean
    # "Array has been deleted" RuntimeError; when the freed buffer is hit
    # inside the runtime (async fetch) it is the silent C++ abort round 2
    # saw. With deep copies (--mode sequence: all programs cold-compiled
    # and executed back-to-back at a 2x3 mesh) trials run clean.
    params_np = jax.tree_util.tree_map(np.asarray, state.params)
    bs_np = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    private = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                     state)
    st = replicate(mesh, private)
    placed = shard_batch_2d(mesh, batch)
    st2, metrics = step(st, placed, jax.random.PRNGKey(7))

    loss = float(metrics["loss"])
    assert np.isfinite(loss) and loss > 0
    assert float(metrics["union"]) >= float(metrics["intersect"]) >= 0

    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(jnp.asarray(a) - b))),
        params_np, st2.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0

    # state replicated: every device shard of a camencode and a bevencode
    # leaf must be identical (the per-subtree reduction keeps the update
    # identical on all 6 devices)
    for top in ("camencode", "bevencode"):
        leaf = jax.tree_util.tree_leaves(st2.params[top])[0]
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        assert len(shards) == 2
        for s in shards[1:]:
            np.testing.assert_array_equal(s, shards[0])

    # BN running stats were updated (train step ran stage-1 + stage-2 BN),
    # in BOTH halves of the model (the two-stage mutable-collection merge)
    for top in ("camencode", "bevencode"):
        bs_moved = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(jnp.asarray(a) - b))),
            bs_np[top], st2.batch_stats[top])
        assert max(jax.tree_util.tree_leaves(bs_moved)) > 0, top


def test_eval_step_masked_parity(setup):
    model, state, batch = setup
    jbatch = tuple(map(jnp.asarray, batch))
    valid = jnp.asarray([1.0, 0.0], jnp.float32)  # second sample is padding

    logits = jax.jit(lambda *a: model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        *a, train=False))(*jbatch[:6])
    ref = masked_eval_metrics(logits, jbatch[6], valid, POS_WEIGHT)

    mesh = make_mesh_2d(1, 2)
    eval_step = make_camera_sharded_eval_step(model, mesh,
                                              pos_weight=POS_WEIGHT)
    got = eval_step(replicate(mesh, state),
                    shard_batch_2d(mesh, jbatch + (valid,)))
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
