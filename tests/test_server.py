"""HTTP inference server (lss_carla_tpu/server.py): end-to-end request
cycle over an exported artifact, signature validation, stats."""

import io
import json
import threading
import time
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


# --- micro-batching (--coalesce) ---------------------------------------


@pytest.fixture(scope="module")
def artifact_b8(tmp_path_factory):
    """Artifact exported at the batch-8 throughput sweet spot, plus 16
    distinct single-sample inputs and their live model logits."""
    model = tiny_model()
    B, N, H, W = 8, 6, 32, 64
    rng = np.random.default_rng(7)
    imgs16 = rng.normal(size=(16, N, 3, H, W)).astype(np.float32)
    eye16 = np.tile(np.eye(3, dtype=np.float32), (16, N, 1, 1))
    z316 = np.zeros((16, N, 3), np.float32)
    intr16 = eye16 * 60.0
    intr16[..., 2, 2] = 1.0
    args16 = (imgs16, eye16, z316, intr16, eye16, z316)

    init_args = tuple(jnp.asarray(a[:1]) for a in args16)
    state = create_train_state(model, jax.random.PRNGKey(0), init_args)
    path = str(tmp_path_factory.mktemp("srv8") / "lss_b8.bin")
    export_predict(model, state, path, bsz=B)

    live = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        *(jnp.asarray(a) for a in args16), train=False))
    return path, args16, live


@pytest.fixture(scope="module")
def coalescing_server(artifact_b8):
    path, args16, live = artifact_b8
    warm = tuple(a[:8] for a in args16)
    httpd = serve(path, port=0, warmup_args=warm, coalesce=True,
                  flush_ms=50.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, args16, live
    httpd.shutdown()
    httpd.service.close()


def _concurrent_posts(base, args16, indices):
    """POST one single-sample request per index from its own thread (all
    released together through a barrier, so thread startup and payload
    encoding stay out of the concurrency window); returns {index: logits},
    raising on any failure."""
    indices = list(indices)
    results, errors = {}, []
    payloads = {i: _npz({n: a[i:i + 1]
                         for n, a in zip(INPUT_NAMES, args16)})
                for i in indices}
    barrier = threading.Barrier(len(indices))

    def client(i):
        try:
            barrier.wait(timeout=60)
            status, body = _post(base + "/predict", payloads[i])
            assert status == 200
            results[i] = np.load(io.BytesIO(body))["logits"]
        except Exception as e:       # pragma: no cover - surfaced below
            errors.append((i, e))

    threads = [threading.Thread(target=client, args=(i,)) for i in indices]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    return results


def test_coalesce_concurrent_clients_get_their_own_logits(coalescing_server):
    base, args16, live = coalescing_server
    results = _concurrent_posts(base, args16, range(16))
    for i in range(16):
        assert results[i].shape[0] == 1
        np.testing.assert_allclose(results[i][0], live[i],
                                   atol=1e-4, rtol=1e-4)
    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    # 16 concurrent single-sample clients against an idle batch-8 server
    # must coalesce: strictly fewer device batches than requests
    assert stats["batches"] < stats["requests"]
    assert stats["mean_batch_occupancy"] > 1.0


def test_coalesce_multi_sample_and_mismatch(coalescing_server):
    base, args16, live = coalescing_server
    # a 3-sample request rides the same coalescing path
    payload = _npz({n: a[:3] for n, a in zip(INPUT_NAMES, args16)})
    status, body = _post(base + "/predict", payload)
    assert status == 200
    logits = np.load(io.BytesIO(body))["logits"]
    np.testing.assert_allclose(logits, live[:3], atol=1e-4, rtol=1e-4)
    # over the artifact batch -> 400, and wrong trailing dims -> 400
    too_big = _npz({n: np.repeat(a[:1], 9, axis=0)
                    for n, a in zip(INPUT_NAMES, args16)})
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/predict", too_big)
    assert ei.value.code == 400
    bad = {n: a[:1] for n, a in zip(INPUT_NAMES, args16)}
    bad["imgs"] = bad["imgs"][:, :, :, :16]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/predict", _npz(bad))
    assert ei.value.code == 400


def test_coalesce_throughput_vs_serial(artifact_and_args, artifact_b8):
    """The round-2 verdict's acceptance test: >= 2x throughput under 16
    concurrent single-sample clients vs the serial single-threaded path.

    The device is stubbed with a fixed 60 ms per-CALL latency — the measured
    v5e serving profile (CLAUDE.md: 1.70 ms/sample at bsz 8 AND bsz 16, i.e.
    a device call costs ~the same regardless of occupancy, so throughput is
    calls/s). On XLA:CPU the economics invert (per-op compute scales with
    batch and saturates all cores), so timing real CPU predicts here would
    measure the backend, not the batcher. Correctness of the real device
    path is covered by the two tests above."""
    path1, args, _ = artifact_and_args       # bsz-1 artifact

    def stub(shape):
        def fake_predict(*cols):
            time.sleep(0.060)
            return np.zeros(shape, np.float32)
        return fake_predict

    # serial single-threaded server on the bsz-1 artifact
    httpd1 = serve(path1, port=0,
                   warmup_args=tuple(np.asarray(a) for a in args))
    httpd1.service._predict = stub((1, 1, 16, 16))
    threading.Thread(target=httpd1.serve_forever, daemon=True).start()
    base1 = f"http://127.0.0.1:{httpd1.server_address[1]}"

    # a fresh coalescing server on the bsz-8 artifact (the module fixture's
    # server keeps its real predict path for the correctness tests)
    path8, args16, _ = artifact_b8
    httpd8 = serve(path8, port=0,
                   warmup_args=tuple(a[:8] for a in args16),
                   coalesce=True, flush_ms=50.0)
    httpd8.service._predict = stub((8, 1, 16, 16))
    threading.Thread(target=httpd8.serve_forever, daemon=True).start()
    base8s = f"http://127.0.0.1:{httpd8.server_address[1]}"

    payload1 = _npz({n: np.asarray(a) for n, a in zip(INPUT_NAMES, args)})
    _post(base1 + "/predict", payload1)                      # warm HTTP path
    _concurrent_posts(base8s, args16, range(2))

    t0 = time.perf_counter()
    for _ in range(16):
        _post(base1 + "/predict", payload1)
    t_serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    _concurrent_posts(base8s, args16, range(16))
    t_conc = time.perf_counter() - t0

    httpd1.shutdown()
    httpd8.shutdown()
    httpd8.service.close()

    speedup = t_serial / t_conc
    print(f"serial 16x1: {t_serial*1e3:.1f} ms, "
          f"coalesced 16 concurrent: {t_conc*1e3:.1f} ms "
          f"({speedup:.2f}x)")
    assert speedup >= 2.0, (t_serial, t_conc)


def test_stats(running_server):
    base, args, _ = running_server
    # independent of test ordering: make at least one request first
    payload = _npz({n: np.asarray(a) for n, a in zip(INPUT_NAMES, args)})
    _post(base + "/predict", payload)
    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 1
    assert stats["latency_ms"]["p50"] is not None
