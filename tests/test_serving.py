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


def test_export_cli_from_checkpoint(tmp_path, rng, monkeypatch, capsys):
    """python -m lss_carla_tpu.serving: checkpoint -> artifact with the
    tiny config's grid/aug flags; the artifact must reproduce the live
    model restored from that checkpoint (incl. --ema selecting the
    averaged params)."""
    from lss_carla_tpu.serving import _main
    from lss_carla_tpu.training import make_train_step
    from lss_carla_tpu.utils.checkpoint import CheckpointManager
    from util import tiny_batch

    model = tiny_model()
    batch = tuple(jnp.asarray(a) for a in tiny_batch(rng, B=1))
    state = create_train_state(model, jax.random.PRNGKey(0), batch[:6],
                               ema_decay=0.5)
    # one train step so EMA != params (the CLI's --ema must pick EMA)
    state, _ = make_train_step(model, ema_decay=0.5)(
        state, batch, jax.random.PRNGKey(1))
    ck = str(tmp_path / "ckpts")
    mgr = CheckpointManager(ck)
    mgr.save(1, state, epoch=0)
    mgr.close()

    out = str(tmp_path / "art.bin")
    argv = ["serving", "--checkpoint", ck, "--out", out, "--ema",
            "--H", "64", "--W", "128", "--final_dim", "32", "64",
            "--xbound", "-40", "40", "5", "--ybound", "-40", "40", "5",
            "--dbound", "4", "36", "8"]
    monkeypatch.setattr("sys.argv", argv)
    _main()
    assert "ema" in capsys.readouterr().out

    want = model.apply({"params": state.ema_params,
                        "batch_stats": state.ema_batch_stats},
                       *batch[:6], train=False)
    got = load_predict(out)(*batch[:6])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
