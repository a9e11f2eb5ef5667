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


def run(args):
    print(args)
    fn, header = load_forecaster(args.artifact)
    if getattr(args, "http", 0):
        # Artifact-only inference server — no dataset, no model code.
        from visuelle2_tpu.eval.server import serve_forever

        return serve_forever(fn, header, args.http)
    demand = bool(args.demand)
    output_len = 12 if demand else args.output_len
    dedup = "img_idx" in header["keys"]
    # A dedup artifact's signature fixed its image-slot count at export time
    # (exporting host's device topology); build the loader with that exact
    # count rather than recomputing from the local device count.
    slots = int(header["shapes"]["images"][0]) if dedup else 0
    loaders, _vocab, norm_scalar = build_loaders(
        args, demand=demand, output_len=output_len, splits=("test",),
        dedup_eval_images=dedup, dedup_image_slots=slots)
    loader = loaders["test"]

    err_sum = gt_sum = n_vals = n_forecasts = 0.0
    t0 = time.perf_counter()
    for batch in loader:
        forecast = np.asarray(fn(batch))  # host fetch serializes batches
        if demand:
            target = batch["ts"]
            mask = batch["mask"]
        else:
            target = batch["y"].reshape(-1, batch["y"].shape[-1])
            reps = target.shape[0] // batch["mask"].shape[0]
            mask = np.repeat(batch["mask"], reps) if reps > 1 else batch["mask"]
        pred = forecast.reshape(target.shape)
        err_sum += (np.abs(target - pred) * norm_scalar * mask[:, None]).sum()
        gt_sum += (np.abs(target) * norm_scalar * mask[:, None]).sum()
        n_vals += mask.sum() * target.shape[-1]
        n_forecasts += mask.sum()
    dt = time.perf_counter() - t0
    wape = 100.0 * err_sum / max(gt_sum, 1e-9)
    mae = err_sum / max(n_vals, 1.0)
    print(f"WAPE: {wape:.3f}, MAE: {mae:.3f}, "
          f"{n_forecasts / dt:,.0f} forecasts/s (artifact, host-synced per batch)")
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
    return p


def main():
    run(build_parser().parse_args())


if __name__ == "__main__":
    main()
