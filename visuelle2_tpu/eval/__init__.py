from visuelle2_tpu.eval.forecast import score_split, ForecastResult
from visuelle2_tpu.eval.profiler import compiled_flops, compiled_stats, flops_per_sample

__all__ = ["score_split", "ForecastResult", "compiled_flops", "compiled_stats", "flops_per_sample"]
