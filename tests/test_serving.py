"""AOT export/load: the serialized artifact must reproduce the live model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss_carla_tpu.serving import export_predict, load_predict
from lss_carla_tpu.training.state import create_train_state

from util import tiny_model

pytestmark = pytest.mark.slow  # full-model CPU compiles


def test_export_load_roundtrip(tmp_path, rng):
    model = tiny_model()
    B, N, H, W = 1, 6, 32, 64
    imgs = jnp.asarray(rng.normal(size=(B, N, 3, H, W)).astype(np.float32))
    eye = jnp.tile(jnp.eye(3), (B, N, 1, 1))
    z3 = jnp.zeros((B, N, 3))
    intr = eye * 60.0
    intr = intr.at[:, :, 2, 2].set(1.0)
    args = (imgs, eye, z3, intr, eye, z3)
    state = create_train_state(model, jax.random.PRNGKey(0), args)

    path = str(tmp_path / "lss_export.bin")
    export_predict(model, state, path, bsz=B)

    live = model.apply({"params": state.params,
                        "batch_stats": state.batch_stats},
                       *args, train=False)
    predict = load_predict(path)
    served = predict(*args)
    assert served.shape == live.shape
    np.testing.assert_allclose(np.asarray(served), np.asarray(live),
                               atol=1e-5, rtol=1e-5)
