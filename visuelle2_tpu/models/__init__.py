from visuelle2_tpu.models.base import VocabSizes, flatten_windows, repeat_windows
from visuelle2_tpu.models.cross_attn_rnn import (
    CrossAttnRNN21,
    CrossAttnRNN210,
    CrossAttnRNNDemand,
)
from visuelle2_tpu.models.oracle import Oracle
from visuelle2_tpu.models.registry import BUILDERS, build, model_names
from visuelle2_tpu.models.seq2seq import Seq2SeqForecaster, VARIANTS

__all__ = [
    "VocabSizes", "flatten_windows", "repeat_windows",
    "CrossAttnRNN21", "CrossAttnRNN210", "CrossAttnRNNDemand",
    "Oracle", "Seq2SeqForecaster", "VARIANTS",
    "BUILDERS", "build", "model_names",
]
