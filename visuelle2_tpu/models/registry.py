"""Model registry: one canonical name per reference model class.

Maps the reference's 11 model classes (SURVEY.md §2.2) onto the framework's
constructors.  ``build(name, **overrides)`` returns a flax module (or Oracle).
"""

from __future__ import annotations

from typing import Any, Dict

from visuelle2_tpu.models.cross_attn_rnn import (
    CrossAttnRNN21,
    CrossAttnRNN210,
    CrossAttnRNNDemand,
)
from visuelle2_tpu.models.gtm_v1 import GTMv1
from visuelle2_tpu.models.oracle import Oracle
from visuelle2_tpu.models.seq2seq import Seq2SeqForecaster

# Reference defaults: dims 512 for CrossAttnRNN (train_dl.py:197-199);
# emb 32 / hidden 64 / heads 4 / layers 1 for the GTM family
# (train_GTM_visuelle2.py:165-168).
_CROSS_ATTN_DEFAULTS = dict(attention_dim=512, embedding_dim=512, hidden_dim=512)
_GTM_DEFAULTS = dict(embedding_dim=32, hidden_dim=64, num_heads=4, num_layers=1)


def _seq2seq(variant):
    def make(**kw):
        merged = {**_GTM_DEFAULTS, **kw}
        return Seq2SeqForecaster(variant=variant, **merged)

    return make


BUILDERS: Dict[str, Any] = {
    "cross_attn_rnn_21": lambda **kw: CrossAttnRNN21(**{**_CROSS_ATTN_DEFAULTS, **kw}),
    "cross_attn_rnn_210": lambda **kw: CrossAttnRNN210(**{**_CROSS_ATTN_DEFAULTS, **kw}),
    "cross_attn_rnn_demand": lambda **kw: CrossAttnRNNDemand(**{**_CROSS_ATTN_DEFAULTS, **kw}),
    "gtm": _seq2seq("gtm"),
    "m4ft": _seq2seq("m4ft"),
    "gated_v1": _seq2seq("gated_v1"),
    "gated_v2": _seq2seq("gated_v2"),
    "gated_v3": _seq2seq("gated_v3"),
    "gated_v4": _seq2seq("gated_v4"),
    # Original VISUELLE-1 GTM (BERT text branch; norm scalar 1065 — GTM.py:321)
    "gtm_v1": lambda **kw: GTMv1(**{**_GTM_DEFAULTS, **kw}),
    "oracle": lambda **kw: Oracle(**kw),
}


def build(name: str, **overrides):
    if name not in BUILDERS:
        raise KeyError(f"unknown model '{name}'; known: {sorted(BUILDERS)}")
    return BUILDERS[name](**overrides)


def model_names():
    return sorted(BUILDERS)
