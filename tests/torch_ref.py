"""Helpers converting randomly-initialized torch module weights into our flax
parameter pytrees, for golden numerics tests (SURVEY.md §4 seam 2: per-module
numerics vs recorded torch outputs with fixed weights)."""

import numpy as np
import torch


def t2n(t):
    return t.detach().cpu().numpy()


def linear_params(lin: torch.nn.Linear):
    p = {"kernel": t2n(lin.weight).T}
    if lin.bias is not None:
        p["bias"] = t2n(lin.bias)
    return p


def layernorm_params(ln: torch.nn.LayerNorm):
    return {"scale": t2n(ln.weight), "bias": t2n(ln.bias)}


def gru_params(gru: torch.nn.GRU):
    return {
        "w_i": t2n(gru.weight_ih_l0).T,
        "w_h": t2n(gru.weight_hh_l0).T,
        "b_i": t2n(gru.bias_ih_l0),
        "b_h": t2n(gru.bias_hh_l0),
    }


def mha_params(mha: torch.nn.MultiheadAttention):
    D = mha.embed_dim
    w = t2n(mha.in_proj_weight)
    b = t2n(mha.in_proj_bias)
    return {
        "q_proj": {"kernel": w[:D].T, "bias": b[:D]},
        "k_proj": {"kernel": w[D:2 * D].T, "bias": b[D:2 * D]},
        "v_proj": {"kernel": w[2 * D:].T, "bias": b[2 * D:]},
        "out_proj": {"kernel": t2n(mha.out_proj.weight).T,
                     "bias": t2n(mha.out_proj.bias)},
    }


def encoder_layer_params(layer: torch.nn.TransformerEncoderLayer):
    return {
        "self_attn": mha_params(layer.self_attn),
        "ffn": {"linear1": linear_params(layer.linear1),
                "linear2": linear_params(layer.linear2)},
        "norm1": layernorm_params(layer.norm1),
        "norm2": layernorm_params(layer.norm2),
    }


def decoder_layer_params(layer: torch.nn.TransformerDecoderLayer):
    return {
        "self_attn": mha_params(layer.self_attn),
        "cross_attn": mha_params(layer.multihead_attn),
        "ffn": {"linear1": linear_params(layer.linear1),
                "linear2": linear_params(layer.linear2)},
        "norm1": layernorm_params(layer.norm1),
        "norm2": layernorm_params(layer.norm2),
        "norm3": layernorm_params(layer.norm3),
    }
