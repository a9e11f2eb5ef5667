"""Score a split with a serving artifact — no model code, weights, or
checkpoint needed.

Counterpart of ``forecast_dl.py``/``forecast_*.py`` for deployment: where
those rebuild the flax model and restore an orbax checkpoint, this loads the
single StableHLO artifact written by ``--export`` (eval/export.py) and runs
it over the dataset, printing the same WAPE/MAE lines
(``/root/reference/forecast_dl.py:191-198`` semantics).  This is both the
serving entry point and an integrity check that the shipped artifact
reproduces the checkpoint's numbers.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from visuelle2_tpu.cli.common import add_common_args, build_loaders
from visuelle2_tpu.eval.export import load_forecaster


def w8a8_dedup_advisory(header: dict, batch_size: int, slots: int):
    """One-line note when a w8a8 artifact is served outside the engine's
    measured win region (image duplication > 4, docs/perf_dedup_series.json
    — the requant chain is overhead once dedup shrinks the byte-bound
    early-stage activations).  ``--quantize auto`` at export time would
    have declined w8a8 here; an explicitly-forced artifact gets this
    advisory instead.  Returns None when there is nothing to say."""
    if header.get("quantize") != "w8a8" or not slots:
        return None
    from visuelle2_tpu.models.quantized_resnet import (
        W8A8_AUTO_MAX_DUPLICATION,
    )

    duplication = batch_size / slots
    if duplication <= W8A8_AUTO_MAX_DUPLICATION:
        return None
    return (f"[serve] note: w8a8 artifact at image duplication "
            f"{duplication:.1f} (batch {batch_size} / {slots} unique "
            f"images) — "
            f"measured SLOWER than the float path above "
            f"d={W8A8_AUTO_MAX_DUPLICATION:g} "
            f"(docs/perf_dedup_series.json); consider a float or "
            f"--quantize auto export for this duplication factor")


def run(args):
    print(args)
    fn, header = load_forecaster(args.artifact)
    if getattr(args, "http", 0):
        # Artifact-only inference server — no dataset, no model code.
        from visuelle2_tpu.eval.server import serve_forever

        return serve_forever(fn, header, args.http,
                             grace_s=args.drain_grace_s)
    demand = bool(args.demand)
    output_len = 12 if demand else args.output_len
    dedup = "img_idx" in header["keys"]
    # The artifact's signature fixed the batch size AND (for dedup) the
    # image-slot count at export time; build the loader with exactly those,
    # not the local flags/topology — any other shapes fail the exported
    # call's signature check.
    if "mask" in header.get("shapes", {}):
        args.batch_size = int(header["shapes"]["mask"][0])
    slots = int(header["shapes"]["images"][0]) if dedup else 0
    # gtm_v1 artifacts take ingest-time text features; build them locally
    # and refuse a featurizer mismatch (a checkpoint trained on BERT
    # features scores silently garbage on the crc32 fallback and vice
    # versa — models/gtm_v1.py).
    text_features = "text_features" in header["keys"]
    loaders, _vocab, norm_scalar = build_loaders(
        args, demand=demand, output_len=output_len, splits=("test",),
        text_features=text_features,
        dedup_eval_images=dedup, dedup_image_slots=slots)
    loader = loaders["test"]
    # Advisory on the TRUE duplication factor (the artifact's slot count is
    # padded to the exporting host's device multiple, which would understate
    # duplication and mute the warning near the crossover).
    advisory = w8a8_dedup_advisory(
        header, args.batch_size,
        getattr(loader, "unique_image_slots", 0) or slots)
    if advisory:
        print(advisory)
    if text_features:
        want = (header.get("provenance") or {}).get("text_fingerprint")
        have = getattr(loader, "text_fingerprint", None)
        if want and have and want != have:
            raise SystemExit(
                f"gtm_v1 text featurizer mismatch: the artifact was exported "
                f"with '{want}' features but this host produces '{have}'. "
                f"Provide the same featurizer (e.g. set VISUELLE2_BERT_PATH "
                f"to a local BERT snapshot) or re-export.")

    # Shared scoring helpers (train.loop / ops.metrics): the artifact path
    # must compute WAPE/MAE identically to the model path it cross-checks.
    import jax
    import jax.numpy as jnp

    from visuelle2_tpu.ops.metrics import eval_metrics, finalize_metrics
    from visuelle2_tpu.train.loop import expand_mask, target_and_pred

    sums = None
    t0 = time.perf_counter()
    for batch in loader:
        forecast = np.asarray(fn(batch))  # host fetch serializes batches
        target, pred = target_and_pred(batch, forecast)
        part = eval_metrics(target, pred, expand_mask(batch, target),
                            norm_scalar=norm_scalar)
        sums = part if sums is None else jax.tree_util.tree_map(
            jnp.add, sums, part)
    dt = time.perf_counter() - t0
    if sums is None:
        raise SystemExit("the test split has no batches")
    sums = {k: float(v) for k, v in sums.items()}
    fin = finalize_metrics(sums)
    wape, mae = fin["wape"], fin["mae"]
    print(f"WAPE: {wape:.3f}, MAE: {mae:.3f}, "
          f"{sums['rows'] / dt:,.0f} forecasts/s (artifact, host-synced per batch)")
    print(f"WAPE: {wape}")
    print(f"MAE: {mae}")
    return {"wape": wape, "mae": mae}


def build_parser():
    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--artifact", type=str, required=True,
                   help="serving artifact from forecast_*.py --export")
    p.add_argument("--demand", "--new_product", type=int, default=0)
    p.add_argument("--output_len", type=int, default=1)
    p.add_argument("--http", type=int, default=0,
                   help="serve the artifact over HTTP on this port instead "
                        "of scoring a split (POST /forecast npz -> npz, "
                        "GET /health)")
    p.add_argument("--drain_grace_s", type=float, default=10.0,
                   help="--http only: on SIGTERM (preemption/rollout), stop "
                        "accepting immediately and give in-flight requests "
                        "this many seconds to finish before exiting 143")
    return p


def main():
    run(build_parser().parse_args())


if __name__ == "__main__":
    main()
