"""Minimal HTTP inference server over an AOT serving artifact.

The reference has no serving layer at all (SURVEY.md §1: "no serving
layer"); this completes the deployment story around
``lss_carla_tpu.serving``: export once, then serve the artifact from a
process that needs no model code.

Protocol (stdlib-only on both sides):

* ``POST /predict`` — request body is an ``.npz`` archive holding the six
  forward inputs (``imgs, rots, trans, intrins, post_rots, post_trans``)
  with exactly the artifact's shapes/dtypes; response is an ``.npz`` with
  ``logits`` (B, outC, X, Y). 400 on shape/dtype mismatch (the expected
  signature is included in the error).
* ``GET /healthz`` — 200 once the artifact is loaded and warmed; 503
  before warmup. An un-warmed server's first successful request pays the
  compile and pins the signature (health then flips to 200).
* ``GET /stats`` — JSON request count + latency percentiles (ms).

The handler is single-threaded by design: one device, one in-flight batch
(requests queue in the listen backlog). Start with:

    python -m lss_carla_tpu.server --artifact /models/lss.bin --port 8471
"""

from __future__ import annotations

import io
import json
import time
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Optional

import numpy as np

INPUT_NAMES = ("imgs", "rots", "trans", "intrins", "post_rots", "post_trans")


class PredictService:
    """Wraps a loaded artifact; validates payloads and tracks latency."""

    def __init__(self, artifact_path: str):
        import jax
        from lss_carla_tpu.serving import load_predict
        self._predict = load_predict(artifact_path)
        self.signature = None     # filled on first (warmup) call
        self.latencies_ms = []
        self.requests = 0
        self._jax = jax

    def warmup(self, example_args):
        """Compile with example inputs; pins the accepted signature."""
        self.signature = [(tuple(a.shape), str(a.dtype))
                          for a in example_args]
        out = self._predict(*example_args)
        self._jax.block_until_ready(out)
        return out

    def predict(self, arrays):
        missing = [n for n in INPUT_NAMES if n not in arrays]
        if missing:
            raise ValueError(f"missing inputs: {missing}")
        args = [np.asarray(arrays[n]) for n in INPUT_NAMES]
        if self.signature is not None:
            got = [(tuple(a.shape), str(a.dtype)) for a in args]
            if got != self.signature:
                raise ValueError(
                    f"signature mismatch: got {got}, expected "
                    f"{self.signature} (the artifact has static shapes)")
        t0 = time.perf_counter()
        out = np.asarray(self._predict(*args))
        ms = (time.perf_counter() - t0) * 1000.0
        if self.signature is None:
            # un-warmed server: the first successful request pins the
            # signature, so /healthz flips to 200 and later requests are
            # shape-validated
            self.signature = [(tuple(a.shape), str(a.dtype)) for a in args]
        self.requests += 1
        self.latencies_ms.append(ms)
        if len(self.latencies_ms) > 10000:
            self.latencies_ms = self.latencies_ms[-5000:]
        return out

    def stats(self) -> dict:
        lat = sorted(self.latencies_ms)
        pct = (lambda p: round(lat[min(int(p * len(lat)), len(lat) - 1)], 3)
               if lat else None)
        return {"requests": self.requests,
                "latency_ms": {"p50": pct(0.50), "p90": pct(0.90),
                               "p99": pct(0.99)}}


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def make_handler(service: PredictService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):    # quiet: latency lives in /stats
            pass

        def _send(self, code, body: bytes, ctype="application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                if service.signature is None:
                    self._send(503, b"loading: not warmed", "text/plain")
                else:
                    self._send(200, b"ok", "text/plain")
            elif self.path == "/stats":
                self._send(200, json.dumps(service.stats()).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                self._send(400, b"bad Content-Length header", "text/plain")
                return
            try:
                arrays = dict(np.load(io.BytesIO(self.rfile.read(n)),
                                      allow_pickle=False))
            except Exception as e:   # truncated/corrupt npz -> BadZipFile
                self._send(400, f"unreadable npz payload: {e}".encode(),
                           "text/plain")
                return
            try:
                logits = service.predict(arrays)
            except ValueError as e:
                self._send(400, str(e).encode(), "text/plain")
                return
            except Exception as e:   # device/runtime failure: report, don't
                self._send(500, f"{type(e).__name__}: {e}".encode(),
                           "text/plain")          # drop the connection
                return
            self._send(200, _npz_bytes(logits=logits))

    return Handler


def serve(artifact: str, port: int = 8471, host: str = "127.0.0.1",
          warmup_args=None) -> HTTPServer:
    """Build the server (caller runs ``serve_forever``; tests drive it
    directly)."""
    service = PredictService(artifact)
    if warmup_args is not None:
        service.warmup(warmup_args)
    httpd = HTTPServer((host, port), make_handler(service))
    httpd.service = service
    return httpd


def _main():
    import argparse
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--artifact", required=True)
    p.add_argument("--port", type=int, default=8471)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--bsz", type=int, default=1,
                   help="batch size the artifact was exported with (for "
                        "warmup input synthesis)")
    p.add_argument("--ncams", type=int, default=6)
    p.add_argument("--final_dim", type=int, nargs=2, default=(128, 352))
    p.add_argument("--uint8", action="store_true",
                   help="artifact was exported with uint8 image inputs")
    args = p.parse_args()

    from lss_carla_tpu.serving import _example_args
    import jax.numpy as jnp
    fH, fW = args.final_dim
    warm = _example_args(args.bsz, args.ncams, fH, fW,
                         jnp.uint8 if args.uint8 else jnp.float32)
    warm = tuple(np.asarray(a) for a in warm)
    httpd = serve(args.artifact, args.port, args.host, warmup_args=warm)
    print(f"serving {args.artifact} on {args.host}:{args.port} "
          f"(signature {httpd.service.signature})", flush=True)
    httpd.serve_forever()


if __name__ == "__main__":
    _main()
