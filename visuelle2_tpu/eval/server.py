"""Minimal HTTP inference server over a serving artifact — stdlib only.

Production deployment of the reference means a Python process importing the
whole training repo; here a single exported artifact (eval/export.py)
serves over HTTP with nothing but jax + the standard library:

    python -m visuelle2_tpu.cli.serve --artifact m.v2tpu --http 8080

Protocol (npz in / npz out — numpy's own wire format, no extra deps):

* ``POST /forecast`` — body is an ``.npz`` containing the batch arrays
  (the artifact header's keys).  Short batches are zero-padded to the
  export batch size per key and the response is sliced back, so clients
  may send 1..B rows.  Response ``.npz`` has one array ``forecast``.
* ``GET /health`` — JSON with the artifact's keys/shapes and a monotonic
  request counter.

The compiled call is serialized with a lock: one model execution at a time
(the device is the bottleneck; queueing in threads adds nothing).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def make_server(forecast_fn, header, port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) an HTTP server wrapping ``forecast_fn``.

    ``forecast_fn``/``header`` come from ``eval.export.load_forecaster``.
    ``port=0`` binds an ephemeral port (``server.server_address[1]``).
    """
    keys = header["keys"]
    shapes = {k: tuple(v) for k, v in header.get("shapes", {}).items()}
    # Export batch size (sample rows).  Window-flattened models
    # (CrossAttnRNN210-style stfore) return [B*W, out_len] rather than a
    # sample-leading axis (models/cross_attn_rnn.py:270), so short-batch
    # responses must be sliced per SAMPLE, not per output row.
    batch_rows = shapes.get("mask", (0,))[0]
    lock = threading.Lock()
    stats = {"requests": 0}

    def slice_rows(out, n):
        """Slice a model output back to the client's ``n`` real samples."""
        if n is None or n == out.shape[0]:
            return out
        if batch_rows and out.shape[0] != batch_rows:
            if out.shape[0] % batch_rows:
                raise ValueError(
                    f"forecast rows {out.shape[0]} not a multiple of the "
                    f"export batch {batch_rows}; cannot slice to {n} samples")
            w = out.shape[0] // batch_rows  # windows per sample
            lead = out.reshape((batch_rows, w) + out.shape[1:])[:n]
            return lead.reshape((n * w,) + out.shape[1:])
        return out[:n]

    def run_batch(arrays):
        missing = set(keys) - set(arrays)
        if missing:
            raise ValueError(f"batch missing keys: {sorted(missing)}")
        # Real-row count from the mask (every batch dict carries one); the
        # response forecast is sliced back to it.
        n = np.asarray(arrays["mask"]).shape[0] if "mask" in arrays else None
        padded = {}
        for k in keys:
            a = np.asarray(arrays[k])
            want = shapes.get(k)
            if want is not None:
                if a.shape[1:] != want[1:]:
                    raise ValueError(f"'{k}' trailing dims {a.shape[1:]} "
                                     f"!= export {want[1:]}")
                if a.shape[0] > want[0]:
                    raise ValueError(f"'{k}' has {a.shape[0]} rows > "
                                     f"export batch {want[0]}")
                if a.shape[0] < want[0]:
                    pad = [(0, want[0] - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
                    a = np.pad(a, pad)
            padded[k] = a
        with lock:
            out = np.asarray(forecast_fn(padded))
            stats["requests"] += 1
        return slice_rows(out, n)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/health":
                return self._send(404, b"not found", "text/plain")
            body = json.dumps({
                "ok": True, "keys": keys,
                "shapes": {k: list(v) for k, v in shapes.items()},
                "requests": stats["requests"],
            }).encode()
            self._send(200, body, "application/json")

        def do_POST(self):
            if self.path != "/forecast":
                return self._send(404, b"not found", "text/plain")
            try:
                raw = self.rfile.read(int(self.headers["Content-Length"]))
                with np.load(io.BytesIO(raw)) as z:
                    arrays = {k: z[k] for k in z.files}
                out = run_batch(arrays)
                buf = io.BytesIO()
                np.savez(buf, forecast=out)
                self._send(200, buf.getvalue(), "application/octet-stream")
            except Exception as e:  # client errors -> 400 with the reason
                self._send(400, f"{type(e).__name__}: {e}".encode(),
                           "text/plain")

    return ThreadingHTTPServer(("0.0.0.0", port), Handler)


def serve_forever(forecast_fn, header, port: int):
    srv = make_server(forecast_fn, header, port)
    print(f"serving on :{srv.server_address[1]} "
          f"(POST /forecast, GET /health)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
