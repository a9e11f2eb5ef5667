"""Statistical baselines over the stfore test split — counterpart of the
reference's ``forecast_stat.py`` (``/root/reference/forecast_stat.py:87-99``
flags; prints ``wape,mae`` with ``utils.calc_error_metrics`` semantics).

Unlike the reference's nested statsmodels loops (``Oracle.py:25-61``), all
windows are scored by one vmapped XLA program (``ops/stats.py``).
"""

from __future__ import annotations

import argparse

import numpy as np

from visuelle2_tpu.cli.common import add_common_args, build_loaders
from visuelle2_tpu.models.oracle import Oracle
from visuelle2_tpu.ops.metrics import calc_error_metrics


def run(args):
    print(args)
    loaders, _vocab, norm_scalar = build_loaders(
        args, demand=False, output_len=args.output_len, splits=("test",))
    model = Oracle(args.method, bool(args.use_teacher_forcing))
    fn = model.jitted()

    gt, forecasts = [], []
    warned_holt = False
    for batch in loaders["test"]:
        if args.method == "holt" and not warned_holt:
            T = batch["X"].shape[-1]
            if T > 2:
                print(f"[forecast_stat] note: holt with window length {T} > 2 "
                      "minimizes SSE over (alpha,beta) and the free initial "
                      "state — statsmodels' least-squares objective (within "
                      "1% of series max of a free-init SSE oracle; "
                      "ops/stats.py). The production 2-step windows are "
                      "exact.")
            warned_holt = True
        n = int(batch["mask"].sum())
        y_hat = np.asarray(fn(batch["X"]))[:n]
        forecasts.append(y_hat.squeeze())
        gt.append(batch["y"][:n].squeeze())
    gt = np.concatenate(gt) * norm_scalar
    forecasts = np.concatenate(forecasts) * norm_scalar
    mae, wape = calc_error_metrics(gt, forecasts)
    print(f"Results for {args.method}")
    print(f"{wape},{mae}")
    return wape, mae


def build_parser():
    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--method", type=str, default="naive",
                   choices=["naive", "ses", "holt"],
                   help="holt is exact for the production 2-week windows "
                        "(closed-form linear extrapolation); for longer "
                        "windows it minimizes SSE over (alpha,beta) and the "
                        "free initial state — statsmodels' least-squares "
                        "objective, within 1%% of a free-init SSE oracle "
                        "(ops/stats.py; pinned by "
                        "tests/test_stats_and_metrics.py)")
    p.add_argument("--use_teacher_forcing", type=int, default=1)
    p.add_argument("--trend_len", type=int, default=52)
    p.add_argument("--output_len", type=int, default=1)
    return p


def main():
    run(build_parser().parse_args())


if __name__ == "__main__":
    main()
