"""HTTP inference server (lss_carla_tpu/server.py): end-to-end request
cycle over an exported artifact, signature validation, stats."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss_carla_tpu.server import INPUT_NAMES, serve
from lss_carla_tpu.serving import export_predict
from lss_carla_tpu.training.state import create_train_state

from util import tiny_model

pytestmark = pytest.mark.slow  # full-model CPU compiles


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, r.read()


@pytest.fixture(scope="module")
def artifact_and_args(tmp_path_factory):
    model = tiny_model()
    B, N, H, W = 1, 6, 32, 64
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(B, N, 3, H, W)).astype(np.float32))
    eye = jnp.tile(jnp.eye(3), (B, N, 1, 1)).astype(jnp.float32)
    z3 = jnp.zeros((B, N, 3), jnp.float32)
    intr = (eye * 60.0).at[:, :, 2, 2].set(1.0)
    args = (imgs, eye, z3, intr, eye, z3)
    state = create_train_state(model, jax.random.PRNGKey(0), args)
    path = str(tmp_path_factory.mktemp("srv") / "lss.bin")
    export_predict(model, state, path, bsz=B)

    live = model.apply({"params": state.params,
                        "batch_stats": state.batch_stats}, *args,
                       train=False)
    return path, args, np.asarray(live)


@pytest.fixture(scope="module")
def running_server(artifact_and_args):
    path, args, live = artifact_and_args
    httpd = serve(path, port=0, warmup_args=tuple(np.asarray(a)
                                                  for a in args))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, args, live
    httpd.shutdown()


def _npz(arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def test_healthz(running_server):
    base, _, _ = running_server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        assert r.status == 200


def test_predict_roundtrip_matches_live(running_server):
    base, args, live = running_server
    payload = _npz({n: np.asarray(a) for n, a in zip(INPUT_NAMES, args)})
    status, body = _post(base + "/predict", payload)
    assert status == 200
    logits = np.load(io.BytesIO(body))["logits"]
    np.testing.assert_allclose(logits, live, atol=1e-5, rtol=1e-5)


def test_signature_mismatch_400(running_server):
    base, args, _ = running_server
    bad = {n: np.asarray(a) for n, a in zip(INPUT_NAMES, args)}
    bad["imgs"] = bad["imgs"][:, :, :, :16]          # wrong H
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/predict", _npz(bad))
    assert ei.value.code == 400
    assert b"signature mismatch" in ei.value.read()


def test_missing_input_400(running_server):
    base, args, _ = running_server
    partial = {n: np.asarray(a) for n, a in zip(INPUT_NAMES[:3], args[:3])}
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/predict", _npz(partial))
    assert ei.value.code == 400


def test_corrupt_payload_400(running_server):
    base, _, _ = running_server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/predict", b"not an npz archive at all")
    assert ei.value.code == 400
    assert b"unreadable npz" in ei.value.read()


def test_unwarmed_server_healthz_503(artifact_and_args):
    path, _, _ = artifact_and_args
    httpd = serve(path, port=0)           # no warmup_args
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(base + "/healthz", timeout=30)
    assert ei.value.code == 503
    httpd.shutdown()


def test_stats(running_server):
    base, args, _ = running_server
    # independent of test ordering: make at least one request first
    payload = _npz({n: np.asarray(a) for n, a in zip(INPUT_NAMES, args)})
    _post(base + "/predict", payload)
    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 1
    assert stats["latency_ms"]["p50"] is not None
