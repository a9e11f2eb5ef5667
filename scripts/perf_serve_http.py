"""HTTP-level throughput of the serving MicroBatcher (CPU, self-contained).

Measures what request coalescing (eval/server.py::MicroBatcher) buys at the
real HTTP surface: N single-row forecasts sent back-to-back by one client
vs the same N requests from C concurrent clients.  The compiled call always
runs the full export batch B, so serial 1-row requests waste B-1 rows per
dispatch; concurrent clients share dispatches (zero added latency policy)
and the requests/dispatches ratio from /health shows the achieved packing.

Runs on CPU with a tiny-arch artifact — the point is the dispatch-count
mechanics, not chip throughput (for chip numbers see perf_serve.py).

    python scripts/perf_serve_http.py
    -> {"serial_rps": ..., "concurrent_rps": ..., "speedup": ...,
        "serial_dispatches": N, "concurrent_dispatches": <much smaller>}
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

N_REQUESTS = 48
N_CLIENTS = 8
BATCH = 16


def main():
    from visuelle2_tpu.cli.export import synth_batch
    from visuelle2_tpu.eval.client import ForecastClient
    from visuelle2_tpu.eval.export import export_forecaster, load_forecaster
    from visuelle2_tpu.eval.server import make_server
    from visuelle2_tpu.models import VocabSizes, build

    vocab = VocabSizes(5, 6, 5, 126)
    model = build("gated_v4", vocab=vocab, output_len=12,
                  embedding_dim=16, hidden_dim=16, image_arch="tiny")
    batch = synth_batch(BATCH, 32, vocab, demand=True, output_len=12)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, batch, train=False)
    path = "/tmp/perf_serve_http.v2tpu"
    export_forecaster(model, variables, batch, path)
    fn, header = load_forecaster(path)

    srv = make_server(fn, header, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    client = ForecastClient(f"http://127.0.0.1:{srv.server_address[1]}")

    rows = [{k: np.asarray(v)[i % BATCH: i % BATCH + 1]
             for k, v in batch.items()} for i in range(N_REQUESTS)]
    client.forecast(rows[0])  # compile warmup
    d0 = client.health()["dispatches"]

    t0 = time.perf_counter()
    for r in rows:
        client.forecast(r)
    serial_s = time.perf_counter() - t0
    d1 = client.health()["dispatches"]

    idx = iter(range(N_REQUESTS))
    lock = threading.Lock()

    def worker():
        while True:
            with lock:
                i = next(idx, None)
            if i is None:
                return
            client.forecast(rows[i])

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(N_CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    conc_s = time.perf_counter() - t0
    d2 = client.health()["dispatches"]

    srv.shutdown()
    srv.batcher.close()
    out = {
        "n_requests": N_REQUESTS, "clients": N_CLIENTS,
        "export_batch": BATCH,
        "serial_rps": round(N_REQUESTS / serial_s, 1),
        "concurrent_rps": round(N_REQUESTS / conc_s, 1),
        "speedup": round(serial_s / conc_s, 2),
        "serial_dispatches": d1 - d0,
        "concurrent_dispatches": d2 - d1,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
