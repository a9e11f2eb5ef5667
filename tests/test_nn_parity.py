"""Golden numerics: our flax ops vs torch modules with identical random weights.

All comparisons run in eval mode (dropout off) — the reference applies dropout
only during training.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.torch_ref import (
    decoder_layer_params,
    encoder_layer_params,
    gru_params,
    linear_params,
    mha_params,
)
from visuelle2_tpu.ops.attention import AdditiveAttention, MultiHeadAttention
from visuelle2_tpu.ops.gru import GRU
from visuelle2_tpu.ops.masks import causal_mask, gcd_block_mask
from visuelle2_tpu.ops.positional import sinusoidal_table
from visuelle2_tpu.ops.transformer import TransformerDecoderLayer, TransformerEncoderLayer

torch.manual_seed(0)


def test_gru_matches_torch(rng):
    B, T, I, H = 3, 7, 5, 11
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    tgru = torch.nn.GRU(I, H, num_layers=1, batch_first=True)
    with torch.no_grad():
        t_out, t_h = tgru(torch.tensor(x))

    params = {"params": gru_params(tgru)}
    out, h = GRU(H).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h), t_h.numpy()[0], atol=2e-5)


def test_mha_matches_torch(rng):
    B, Lq, Lk, D, h = 2, 4, 6, 16, 4
    q = rng.standard_normal((B, Lq, D)).astype(np.float32)
    k = rng.standard_normal((B, Lk, D)).astype(np.float32)
    v = rng.standard_normal((B, Lk, D)).astype(np.float32)
    tm = torch.nn.MultiheadAttention(D, h, dropout=0.0)
    with torch.no_grad():
        # torch default layout is [L, B, D]
        t_out, t_w = tm(torch.tensor(q).transpose(0, 1), torch.tensor(k).transpose(0, 1),
                        torch.tensor(v).transpose(0, 1))

    params = {"params": mha_params(tm)}
    out, w = MultiHeadAttention(D, h).apply(
        params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), t_out.transpose(0, 1).numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(w), t_w.numpy(), atol=2e-5)


@pytest.mark.parametrize("weight_on", ["inputs", "projected"])
def test_additive_attention_matches_reference_formula(rng, weight_on):
    # Recreate the reference math directly in torch (CrossAttnRNN21.py:74-89 /
    # CrossAttnRNNDemand.py:124-149) and compare.
    B, L, De, Dd, A = 2, 5, 8, 6, 7
    enc = rng.standard_normal((B, L, De)).astype(np.float32)
    dec = rng.standard_normal((B, Dd)).astype(np.float32)
    el = torch.nn.Linear(De, A, bias=False)
    dl = torch.nn.Linear(Dd, A, bias=False)
    al = torch.nn.Linear(A, 1)
    with torch.no_grad():
        h_j = el(torch.tensor(enc))
        s_i = dl(torch.tensor(dec))
        energy = al(torch.tanh(h_j + s_i.unsqueeze(1))).squeeze(2)
        alpha = torch.softmax(energy, dim=1)
        base = torch.tensor(enc) if weight_on == "inputs" else h_j
        t_out = alpha.unsqueeze(2) * base

    params = {"params": {
        "encoder_linear": linear_params(el),
        "decoder_linear": linear_params(dl),
        "attn_linear": linear_params(al),
    }}
    out, a = AdditiveAttention(A, weight_on=weight_on).apply(
        params, jnp.asarray(enc), jnp.asarray(dec))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(a), alpha.numpy(), atol=2e-5)


def test_transformer_encoder_layer_matches_torch(rng):
    B, L, D, h, F = 2, 6, 16, 4, 32
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    tl = torch.nn.TransformerEncoderLayer(D, h, dim_feedforward=F, dropout=0.0)
    tl.eval()
    with torch.no_grad():
        t_out = tl(torch.tensor(x).transpose(0, 1)).transpose(0, 1)

    params = {"params": encoder_layer_params(tl)}
    out = TransformerEncoderLayer(D, h, F, dropout=0.0).apply(
        params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=3e-5)


def test_transformer_encoder_layer_with_gcd_mask(rng):
    B, L, D, h, F = 2, 8, 16, 4, 32
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    tl = torch.nn.TransformerEncoderLayer(D, h, dim_feedforward=F, dropout=0.0)
    tl.eval()
    # torch mask generation per GTM_Visuelle2.py:57-64 (gcd blocks).
    tmask = torch.tensor(np.asarray(gcd_block_mask(L, 4)))
    with torch.no_grad():
        t_out = tl(torch.tensor(x).transpose(0, 1), src_mask=tmask).transpose(0, 1)

    params = {"params": encoder_layer_params(tl)}
    out = TransformerEncoderLayer(D, h, F, dropout=0.0).apply(
        params, jnp.asarray(x), mask=gcd_block_mask(L, 4))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=3e-5)


def test_transformer_decoder_layer_matches_torch(rng):
    B, Lt, Lm, D, h, F = 2, 5, 9, 16, 4, 64
    tgt = rng.standard_normal((B, Lt, D)).astype(np.float32)
    mem = rng.standard_normal((B, Lm, D)).astype(np.float32)
    tl = torch.nn.TransformerDecoderLayer(D, h, dim_feedforward=F, dropout=0.0)
    tl.eval()
    tmask = torch.tensor(np.asarray(causal_mask(Lt)))
    with torch.no_grad():
        t_out = tl(torch.tensor(tgt).transpose(0, 1), torch.tensor(mem).transpose(0, 1),
                   tgt_mask=tmask).transpose(0, 1)

    params = {"params": decoder_layer_params(tl)}
    out = TransformerDecoderLayer(D, h, F, dropout=0.0).apply(
        params, jnp.asarray(tgt), jnp.asarray(mem), tgt_mask=causal_mask(Lt))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=3e-5)


def test_masks_match_torch_generation():
    # gcd mask: GTM_Visuelle2.py:57-64; causal: :209-213.
    import math

    size, horizon = 52, 10
    m = np.asarray(gcd_block_mask(size, horizon))
    split = math.gcd(size, horizon)
    want = np.full((size, size), -np.inf, np.float32)
    for i in range(0, size, split):
        want[i:i + split, i:i + split] = 0.0
    np.testing.assert_array_equal(m, want)

    c = np.asarray(causal_mask(4))
    tw = torch.triu(torch.ones(4, 4)) == 1
    tw = tw.transpose(0, 1).float().masked_fill(~tw.transpose(0, 1), -np.inf) - 1.0
    assert (np.asarray(c)[np.tril_indices(4)] == 0).all()
    assert np.isinf(np.asarray(c)[0, 1])


def test_positional_encoding_matches_torch_formula():
    # GTM_Visuelle2.py:13-28
    import math

    max_len, D = 52, 16
    pe = torch.zeros(max_len, D)
    position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, D, 2).float() * (-math.log(10000.0) / D))
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)
    np.testing.assert_allclose(sinusoidal_table(max_len, D), pe.numpy(), atol=1e-6)
