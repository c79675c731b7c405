"""Sharded validation exactness: pad-and-mask val over an 8-device CPU mesh
must score every val sample exactly once and match a plain numpy
reference accumulation (the reference's ``get_val_info`` contract,
``src/tools.py:243-270``), with a single static batch shape (one compile).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss_carla_tpu.data.loader import DataLoader
from lss_carla_tpu.parallel.mesh import batch_sharding, make_mesh
from lss_carla_tpu.parallel.step import make_sharded_eval_step
from lss_carla_tpu.training.loop import get_val_info
from lss_carla_tpu.training.loss import masked_eval_metrics

POS_WEIGHT = 2.13
GRID = 16


def _fake_apply(variables, imgs, rots, trans, intrins, post_rots,
                post_trans, train=False):
    # deterministic per-sample logits derived from the image content:
    # exercises thresholding on both sides of 0
    B = imgs.shape[0]
    bias = jnp.mean(imgs.reshape(B, -1), axis=1)
    ramp = jnp.linspace(-1.0, 1.0, GRID * GRID).reshape(1, 1, GRID, GRID)
    return bias[:, None, None, None] + ramp


def _fake_state():
    """Real TrainState pytree (eval only touches params/batch_stats/apply_fn)
    with a model-free apply_fn."""
    import optax
    from lss_carla_tpu.training.state import TrainState
    return TrainState.create(apply_fn=_fake_apply, params={},
                             batch_stats={}, tx=optax.sgd(0.0))


class _FakeValSet:
    """In-memory 7-tuple dataset with per-sample distinct content."""

    def __init__(self, n, seed=0):
        rng = np.random.default_rng(seed)
        self.samples = []
        for _ in range(n):
            imgs = rng.normal(scale=0.5, size=(2, 3, 8, 8)).astype(np.float32)
            eye = np.broadcast_to(np.eye(3, dtype=np.float32),
                                  (2, 3, 3)).copy()
            z3 = np.zeros((2, 3), np.float32)
            binimg = (rng.uniform(size=(1, GRID, GRID)) < 0.3).astype(
                np.float32)
            self.samples.append((imgs, eye, z3, eye.copy(), eye.copy(), z3,
                                 binimg))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def _reference_val_info(dataset):
    """Plain numpy accumulation over every sample, one at a time."""
    loss_sum = intersect = union = 0.0
    for s in dataset.samples:
        imgs, binimg = s[0], s[6]
        logits = np.asarray(_fake_apply(
            {}, jnp.asarray(imgs[None]), *[jnp.asarray(a[None])
                                           for a in s[1:6]]))[0]
        x, y = logits.astype(np.float64), binimg.astype(np.float64)
        sp = np.logaddexp(0, -x)
        sn = np.logaddexp(0, x)
        loss_sum += float(np.mean(POS_WEIGHT * y * sp + (1 - y) * sn))
        pred = logits > 0
        tgt = binimg.astype(bool)
        intersect += float(np.sum(pred & tgt))
        union += float(np.sum(pred | tgt))
    return {"loss": loss_sum / len(dataset.samples),
            "iou": intersect / union}


@pytest.mark.parametrize("n_val", [19, 24])  # remainder and exact-multiple
def test_sharded_val_exact_whole_set(n_val):
    """8-device mesh + pad_last loader: IoU/loss equal the sample-by-sample
    numpy reference — no dropped remainder, no double-counted padding."""
    ds = _FakeValSet(n_val)
    mesh = make_mesh(8)
    sharding = batch_sharding(mesh)
    device_put = lambda b: jax.device_put(b, sharding)  # noqa: E731

    valloader = DataLoader(ds, batch_size=8, shuffle=False, num_workers=0,
                           pad_last=True)
    shapes = {tuple(a.shape for a in b) for b in valloader}
    assert len(shapes) == 1, "pad_last must make every batch the same shape"

    eval_fn = make_sharded_eval_step(model=None, mesh=mesh,
                                     pos_weight=POS_WEIGHT)
    got = get_val_info(eval_fn, _fake_state(), valloader,
                       device_put=device_put)
    want = _reference_val_info(ds)
    assert got["iou"] == pytest.approx(want["iou"], rel=1e-5)
    assert got["loss"] == pytest.approx(want["loss"], rel=1e-5)


def test_masked_eval_metrics_excludes_padding():
    logits = jnp.stack([jnp.full((1, 4, 4), 3.0),
                        jnp.full((1, 4, 4), -3.0)])
    targets = jnp.stack([jnp.ones((1, 4, 4)), jnp.ones((1, 4, 4))])
    m_all = masked_eval_metrics(logits, targets, jnp.array([1.0, 1.0]), 1.0)
    m_first = masked_eval_metrics(logits, targets, jnp.array([1.0, 0.0]), 1.0)
    assert float(m_first["batch"]) == 1.0
    assert float(m_first["intersect"]) == 16.0  # sample 0: all TP
    assert float(m_first["union"]) == 16.0
    assert float(m_all["intersect"]) == 16.0    # sample 1 adds FNs only
    assert float(m_all["union"]) == 32.0
    # loss_sum over one valid sample = that sample's mean BCE
    want = float(np.logaddexp(0, -3.0))
    assert float(m_first["loss_sum"]) == pytest.approx(want, rel=1e-6)


def test_per_class_iou_counts():
    """intersect_c/union_c break the counts down by output class (the
    multiclass stretch configs); scalars stay the class sums."""
    B, C = 2, 3
    logits = np.full((B, C, 4, 4), -1.0, np.float32)
    targets = np.zeros((B, C, 4, 4), np.float32)
    logits[:, 0, :2, :2] = 1.0          # class 0: perfect quadrant
    targets[:, 0, :2, :2] = 1.0
    logits[:, 1, 0, :] = 1.0            # class 1: disjoint pred vs target
    targets[:, 1, 1, :] = 1.0           # class 2: empty everywhere
    m = masked_eval_metrics(jnp.asarray(logits), jnp.asarray(targets),
                            jnp.ones(B), 1.0)
    np.testing.assert_array_equal(np.asarray(m["intersect_c"]), [8, 0, 0])
    np.testing.assert_array_equal(np.asarray(m["union_c"]), [8, 16, 0])
    assert float(m["intersect"]) == 8.0
    assert float(m["union"]) == 24.0
    # padding mask applies per class too
    m1 = masked_eval_metrics(jnp.asarray(logits), jnp.asarray(targets),
                             jnp.array([1.0, 0.0]), 1.0)
    np.testing.assert_array_equal(np.asarray(m1["union_c"]), [4, 8, 0])


def test_get_val_info_emits_per_class_iou():
    from lss_carla_tpu.training.loop import get_val_info

    def fake_eval(state, batch):
        return {"loss_sum": jnp.array(2.0), "intersect": jnp.array(3.0),
                "union": jnp.array(6.0), "batch": jnp.array(2.0),
                "intersect_c": jnp.array([1.0, 2.0]),
                "union_c": jnp.array([2.0, 8.0])}

    info = get_val_info(fake_eval, None, [object(), object()])
    assert info["iou"] == 0.5
    assert info["iou_per_class"] == [0.5, 0.25]
