from visuelle2_tpu.ops.metrics import calc_error_metrics, wape, mae, eval_metrics
from visuelle2_tpu.ops.stats import (
    naive_forecast,
    ses_forecast,
    holt_forecast,
    ses_fit_forecast,
)

__all__ = [
    "calc_error_metrics", "wape", "mae", "eval_metrics",
    "naive_forecast", "ses_forecast", "holt_forecast", "ses_fit_forecast",
]
