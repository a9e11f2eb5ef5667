"""Whole-model forward goldens vs torch (VERDICT r1 item 2).

Composes entire reference models in raw torch at tiny dims — the reference
*math* (``/root/reference/models/CrossAttnRNN21.py:121-211``,
``Proposed_model_v4.py:245-289``), built from torch primitives, not reference
imports — converts the weights into our flax trees, and asserts the
end-to-end eval-mode forecasts match.  Module-level goldens can't catch
wiring bugs (what feeds the decoder, residual/dropout placement, token
order); with no VISUELLE2 data in the container this is the strongest
available proxy for WAPE/MAE parity.
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
    t2n,
)
from visuelle2_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD
from visuelle2_tpu.models import VocabSizes, build

E = 16  # embedding = attention = hidden: the reference ties them by default
VOCAB = VocabSizes(5, 6, 5, 126)


def _tiny_resnet():
    """torchvision-layout Bottleneck ResNet, blocks (1,1,1,1) — the torch
    counterpart of ResNetBackbone('tiny') (see test_resnet_conversion)."""

    class Bottleneck(torch.nn.Module):
        def __init__(self, cin, width, stride):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(width)
            self.conv2 = torch.nn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(width)
            self.conv3 = torch.nn.Conv2d(width, width * 4, 1, bias=False)
            self.bn3 = torch.nn.BatchNorm2d(width * 4)
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, width * 4, 1, stride, bias=False),
                torch.nn.BatchNorm2d(width * 4))

        def forward(self, x):
            out = torch.relu(self.bn1(self.conv1(x)))
            out = torch.relu(self.bn2(self.conv2(out)))
            return torch.relu(self.bn3(self.conv3(out)) + self.downsample(x))

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(64)
            self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
            cin = 64
            for i, w in enumerate((64, 128, 256, 512)):
                setattr(self, f"layer{i + 1}",
                        torch.nn.Sequential(Bottleneck(cin, w, 2 if i else 1)))
                cin = w * 4

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            for i in range(4):
                x = getattr(self, f"layer{i + 1}")(x)
            return x

    net = Net()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    return net


def _backbone_variables(net):
    from visuelle2_tpu.models.resnet import params_from_torch

    return params_from_torch(net.state_dict(), arch="tiny")


def _embedding_params(emb):
    return {"embedding": t2n(emb.weight)}


def _additive_params(enc_lin, dec_lin, attn_lin):
    return {"encoder_linear": {"kernel": t2n(enc_lin.weight).T},
            "decoder_linear": {"kernel": t2n(dec_lin.weight).T},
            "attn_linear": linear_params(attn_lin)}


def _normalized_images(images_u8):
    """The exact transform our models fuse on device (images.py:31-43) as
    the torch-side input (the reference normalizes in the dataset)."""
    x = images_u8.astype(np.float32) / 255.0
    x = (x - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
        IMAGENET_STD, np.float32)
    return torch.tensor(np.transpose(x, (0, 3, 1, 2)))


def _batch(n=4, demand=False, windows=10, horizon=1, seed=3):
    rng = np.random.default_rng(seed)
    b = {
        "cat": rng.integers(0, 5, n).astype(np.int32),
        "col": rng.integers(0, 6, n).astype(np.int32),
        "fab": rng.integers(0, 5, n).astype(np.int32),
        "store": rng.integers(0, 126, n).astype(np.int32),
        "temporal": rng.random((n, 4)).astype(np.float32),
        "gtrends": rng.random((n, 3, 52)).astype(np.float32),
        "images": rng.integers(0, 255, (n, 32, 32, 3)).astype(np.uint8),
    }
    if demand:
        b["ts"] = rng.random((n, 12)).astype(np.float32)
    else:
        b["X"] = rng.random((n, windows, 2)).astype(np.float32)
        b["y"] = rng.random((n, windows, horizon)).astype(np.float32)
    return b


def _additive(enc_lin, dec_lin, attn_lin, enc_out, hidden):
    """Reference AdditiveAttention math (CrossAttnRNN21.py:74-89):
    alpha-weighted *raw* encoder output."""
    h_j = enc_lin(enc_out)
    s_i = dec_lin(hidden)
    energy = attn_lin(torch.tanh(h_j + s_i.unsqueeze(1))).squeeze(2)
    alpha = torch.softmax(energy, dim=1)
    return alpha.unsqueeze(2) * enc_out, alpha


def test_cross_attn_rnn_21_whole_model_matches_torch():
    torch.manual_seed(7)
    n, W = 4, 10
    batch = _batch(n=n, windows=W)

    # ---- torch side: the reference model composed from torch primitives.
    cnn = _tiny_resnet().eval()
    img_fc = torch.nn.Linear(2048, E)
    trend_gru = torch.nn.GRU(3, E, batch_first=True)
    temp_lins = [torch.nn.Linear(1, E) for _ in range(4)]
    embs = [torch.nn.Embedding(v, E)
            for v in (VOCAB.num_cat, VOCAB.num_col, VOCAB.num_fab,
                      VOCAB.num_store)]
    sales_gru = torch.nn.GRU(1, E, batch_first=True)
    self_attn = torch.nn.MultiheadAttention(E, 4, dropout=0.1).eval()
    adds = {k: (torch.nn.Linear(E, E, bias=False),
                torch.nn.Linear(E, E, bias=False),
                torch.nn.Linear(E, 1)) for k in ("img", "ts", "mm")}
    trend_linear = torch.nn.Linear(52 * E, E)
    mm_embedder = torch.nn.Linear(E, E)
    decoder_fc = torch.nn.Linear(E, 1)

    with torch.no_grad():
        # CrossAttnRNN21.py:137-209, eval mode (dropout = identity).
        X = torch.tensor(batch["X"]).reshape(n * W, 2, 1)
        feats = cnn(_normalized_images(batch["images"]))  # [n, 2048, 1, 1]
        img_enc = img_fc(feats.flatten(2).permute(0, 2, 1))       # [n, 1, E]
        trend_enc = trend_gru(
            torch.tensor(batch["gtrends"]).permute(0, 2, 1))[0]   # [n, 52, E]
        dummy = sum(l(torch.tensor(batch["temporal"][:, i:i + 1]))
                    for i, l in enumerate(temp_lins))
        attr = sum(e(torch.tensor(batch[k].astype(np.int64)))
                   for e, k in zip(embs, ("cat", "col", "fab", "store")))
        rep = lambda t: t.repeat_interleave(W, dim=0)
        img_enc, trend_enc = rep(img_enc), rep(trend_enc)
        dummy, attr = rep(dummy), rep(attr)
        trend_enc = self_attn(*([trend_enc.permute(1, 0, 2)] * 3))[0]
        _, hidden = sales_gru(X)
        hidden = hidden.squeeze(0)                                # [nW, E]
        att_img, _ = _additive(*adds["img"], img_enc, hidden)
        att_img = att_img.sum(1)
        att_tr, _ = _additive(*adds["ts"], trend_enc.permute(1, 0, 2), hidden)
        att_tr = trend_linear(att_tr.reshape(n * W, -1))
        mm_in = torch.stack([dummy, att_img, attr, att_tr], dim=1)
        att_mm, _ = _additive(*adds["mm"], mm_in, hidden)
        ctx = mm_embedder((mm_in + att_mm).sum(1))
        t_pred = decoder_fc(ctx).reshape(n, W, 1).numpy()

    # ---- our side with converted weights.
    rn = _backbone_variables(cnn)
    temp_names = ("day", "week", "month", "year")
    variables = {
        "params": {
            "static": {
                "image_encoder": {"backbone": rn["params"],
                                  "fc": linear_params(img_fc)},
                "trend_encoder": {"gru": gru_params(trend_gru)},
                "temp_encoder": {nm: linear_params(l)
                                 for nm, l in zip(temp_names, temp_lins)},
                "attribute_encoder": {
                    nm: _embedding_params(e)
                    for nm, e in zip(("cat", "col", "fab", "store"), embs)},
            },
            "ts_self_attention": mha_params(self_attn),
            "sales_encoder_gru": gru_params(sales_gru),
            "fusion": {
                "img_attention": _additive_params(*adds["img"]),
                "ts_attention": _additive_params(*adds["ts"]),
                "multimodal_attention": _additive_params(*adds["mm"]),
                "trend_linear": linear_params(trend_linear),
                "multimodal_embedder": linear_params(mm_embedder),
            },
            "decoder_fc": linear_params(decoder_fc),
        },
        "batch_stats": {"static": {"image_encoder": {
            "backbone": rn["batch_stats"]}}},
    }
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    model = build("cross_attn_rnn_21", vocab=VOCAB, out_len=1,
                  attention_dim=E, embedding_dim=E, hidden_dim=E,
                  image_arch="tiny")
    pred, _ = model.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(pred), t_pred, atol=1e-4, rtol=1e-4)


def _additive_proj(enc_lin, dec_lin, attn_lin, enc_out, hidden):
    """Demand's AdditiveAttention variant: alpha-weighted *projected* h_j
    (CrossAttnRNNDemand.py:125-147)."""
    h_j = enc_lin(enc_out)
    s_i = dec_lin(hidden)
    energy = attn_lin(torch.tanh(h_j + s_i.unsqueeze(1))).squeeze(2)
    alpha = torch.softmax(energy, dim=1)
    return alpha.unsqueeze(2) * h_j, alpha


def test_cross_attn_rnn_demand_whole_model_matches_torch():
    """The 12-step zero-init decode loop (CrossAttnRNNDemand.py:247-349)
    under lax.scan must match the reference's Python loop step for step —
    including the shared-day-embedding temporal quirk (:55-65) and the
    projected-h_j attention flavour."""
    torch.manual_seed(5)
    n, T = 4, 12
    batch = _batch(n=n, demand=True)

    cnn = _tiny_resnet().eval()
    img_fc = torch.nn.Linear(2048, E)
    trend_gru = torch.nn.GRU(3, E, batch_first=True)
    day_lin = torch.nn.Linear(1, E)  # applied to ALL four features (:60-64)
    embs = [torch.nn.Embedding(v, E)
            for v in (VOCAB.num_cat, VOCAB.num_col, VOCAB.num_fab,
                      VOCAB.num_store)]
    self_attn = torch.nn.MultiheadAttention(E, 4, dropout=0.1).eval()
    adds = {k: (torch.nn.Linear(E, E, bias=False),
                torch.nn.Linear(E, E, bias=False),
                torch.nn.Linear(E, 1)) for k in ("img", "ts", "mm")}
    trend_linear = torch.nn.Linear(52 * E, E)
    mm_embedder = torch.nn.Linear(E, E)
    dec_gru = torch.nn.GRU(E + 1, E, batch_first=True)
    decoder_fc = torch.nn.Linear(E, 1)

    with torch.no_grad():
        feats = cnn(_normalized_images(batch["images"]))
        img_enc = img_fc(feats.flatten(2).permute(0, 2, 1))
        trend_enc = trend_gru(
            torch.tensor(batch["gtrends"]).permute(0, 2, 1))[0]
        dummy = sum(day_lin(torch.tensor(batch["temporal"][:, i:i + 1]))
                    for i in range(4))
        attr = sum(e(torch.tensor(batch[k].astype(np.int64)))
                   for e, k in zip(embs, ("cat", "col", "fab", "store")))
        trend_sa = self_attn(*([trend_enc.permute(1, 0, 2)] * 3))[0]
        trend_sa = trend_sa.permute(1, 0, 2)

        hidden = torch.zeros(n, E)
        dec_out = torch.zeros(n, 1, 1)
        outs = []
        for _t in range(T):
            a_img, _ = _additive_proj(*adds["img"], img_enc, hidden)
            a_img = a_img.sum(1)
            a_tr, _ = _additive_proj(*adds["ts"], trend_sa, hidden)
            a_tr = trend_linear(a_tr.reshape(n, -1))
            mm_in = torch.stack([dummy, a_img, attr, a_tr], dim=1)
            a_mm, _ = _additive_proj(*adds["mm"], mm_in, hidden)
            ctx = mm_embedder((mm_in + a_mm).sum(1))
            x = torch.cat([ctx.unsqueeze(1), dec_out], dim=2)
            out, h = dec_gru(x, hidden.unsqueeze(0))
            hidden = h.squeeze(0)
            dec_out = decoder_fc(out)
            outs.append(dec_out[:, 0, :])
        t_pred = torch.stack(outs, dim=1).numpy()  # [n, 12, 1]

    rn = _backbone_variables(cnn)
    variables = {
        "params": {
            "static": {
                "image_encoder": {"backbone": rn["params"],
                                  "fc": linear_params(img_fc)},
                "trend_encoder": {"gru": gru_params(trend_gru)},
                "temp_encoder": {"day": linear_params(day_lin)},
                "attribute_encoder": {
                    nm: _embedding_params(e)
                    for nm, e in zip(("cat", "col", "fab", "store"), embs)},
            },
            "ts_self_attention": mha_params(self_attn),
            "decoder": {
                "fusion": {
                    "img_attention": _additive_params(*adds["img"]),
                    "ts_attention": _additive_params(*adds["ts"]),
                    "multimodal_attention": _additive_params(*adds["mm"]),
                    "trend_linear": linear_params(trend_linear),
                    "multimodal_embedder": linear_params(mm_embedder),
                },
                "decoder_cell": gru_params(dec_gru),
                "decoder_fc": linear_params(decoder_fc),
            },
        },
        "batch_stats": {"static": {"image_encoder": {
            "backbone": rn["batch_stats"]}}},
    }
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    model = build("cross_attn_rnn_demand", vocab=VOCAB, out_len=12,
                  attention_dim=E, embedding_dim=E, hidden_dim=E,
                  image_arch="tiny", faithful_temporal_bug=True)
    pred, _ = model.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(pred), t_pred, atol=1e-4, rtol=1e-4)


class _TorchPureGatedMHA(torch.nn.Module):
    """Reference math of PureGatedMultiheadAttention
    (Proposed_model_v2.py:546-602), seq-first like torch MHA."""

    def __init__(self, D, h, head_gate=False):
        super().__init__()
        self.h, self.d = h, D // h
        self.q_proj = torch.nn.Linear(D, D)
        self.k_proj = torch.nn.Linear(D, D)
        self.v_proj = torch.nn.Linear(D, D)
        self.out_proj = torch.nn.Linear(D, D)
        self.gate_proj = torch.nn.Linear(self.d if head_gate else D,
                                         self.d if head_gate else D)
        torch.nn.init.constant_(self.gate_proj.bias, 2.0)
        self.head_gate = head_gate

    def forward(self, query, key, value, attn_mask=None):
        L, B, D = query.shape
        S = key.shape[0]
        h, d = self.h, self.d
        q = self.q_proj(query).view(L, B, h, d).permute(1, 2, 0, 3)
        k = self.k_proj(key).view(S, B, h, d).permute(1, 2, 0, 3)
        v = self.v_proj(value).view(S, B, h, d).permute(1, 2, 0, 3)
        q_t = q.reshape(B * h, L, d)
        scores = torch.bmm(q_t, k.reshape(B * h, S, d).transpose(1, 2)) * d ** -0.5
        if attn_mask is not None:
            scores = scores + attn_mask
        probs = torch.softmax(scores, dim=-1)
        out = torch.bmm(probs, v.reshape(B * h, S, d))
        if self.head_gate:  # HeadSpecificGatedAttention (:643-690)
            out = out * torch.sigmoid(self.gate_proj(q_t))
            merged = out.view(B, h, L, d).permute(2, 0, 1, 3).reshape(L, B, D)
        else:  # post-concat gate (:546-602)
            merged = out.view(B, h, L, d).permute(2, 0, 1, 3).reshape(L, B, D)
            merged = merged * torch.sigmoid(self.gate_proj(query))
        return self.out_proj(merged)


def _gated_mha_params(m):
    return {nm: linear_params(getattr(m, f"{nm}"))
            for nm in ("q_proj", "k_proj", "v_proj", "gate_proj", "out_proj")}


def test_cross_attn_rnn_210_whole_model_matches_torch():
    """SO-fore 2-10: sales-GRU-initialized 10-step decode under lax.scan vs
    the reference loop (CrossAttnRNN210.py:143-227), TF off (eval)."""
    torch.manual_seed(9)
    n, W, T = 4, 1, 10
    batch = _batch(n=n, windows=W, horizon=T)

    cnn = _tiny_resnet().eval()
    img_fc = torch.nn.Linear(2048, E)
    trend_gru = torch.nn.GRU(3, E, batch_first=True)
    temp_lins = [torch.nn.Linear(1, E) for _ in range(4)]
    embs = [torch.nn.Embedding(v, E)
            for v in (VOCAB.num_cat, VOCAB.num_col, VOCAB.num_fab,
                      VOCAB.num_store)]
    sales_gru = torch.nn.GRU(1, E, batch_first=True)
    self_attn = torch.nn.MultiheadAttention(E, 4, dropout=0.1).eval()
    adds = {k: (torch.nn.Linear(E, E, bias=False),
                torch.nn.Linear(E, E, bias=False),
                torch.nn.Linear(E, 1)) for k in ("img", "ts", "mm")}
    trend_linear = torch.nn.Linear(52 * E, E)
    mm_embedder = torch.nn.Linear(E, E)
    dec_gru = torch.nn.GRU(E + 1, E, batch_first=True)
    decoder_fc = torch.nn.Linear(E, 1)

    with torch.no_grad():
        X = torch.tensor(batch["X"]).reshape(n * W, 2, 1)
        feats = cnn(_normalized_images(batch["images"]))
        img_enc = img_fc(feats.flatten(2).permute(0, 2, 1))
        trend_enc = trend_gru(
            torch.tensor(batch["gtrends"]).permute(0, 2, 1))[0]
        dummy = sum(l(torch.tensor(batch["temporal"][:, i:i + 1]))
                    for i, l in enumerate(temp_lins))
        attr = sum(e(torch.tensor(batch[k].astype(np.int64)))
                   for e, k in zip(embs, ("cat", "col", "fab", "store")))
        trend_sa = self_attn(*([trend_enc.permute(1, 0, 2)] * 3))[0]
        trend_sa = trend_sa.permute(1, 0, 2)

        _, h = sales_gru(X)
        hidden = h.squeeze(0)
        dec_out = X[:, -1, :].unsqueeze(1)  # last observed sale [N, 1, 1]
        outs = []
        for _t in range(T):
            a_img, _ = _additive(*adds["img"], img_enc, hidden)
            a_img = a_img.sum(1)
            a_tr, _ = _additive(*adds["ts"], trend_sa, hidden)
            a_tr = trend_linear(a_tr.reshape(n * W, -1))
            mm_in = torch.stack([dummy, a_img, attr, a_tr], dim=1)
            a_mm, _ = _additive(*adds["mm"], mm_in, hidden)
            ctx = mm_embedder((mm_in + a_mm).sum(1))
            x = torch.cat([ctx.unsqueeze(1), dec_out], dim=2)
            out, h2 = dec_gru(x, hidden.unsqueeze(0))
            hidden = h2.squeeze(0)
            dec_out = decoder_fc(out)
            outs.append(dec_out[:, 0, 0])
        t_pred = torch.stack(outs, dim=1).numpy()  # [N, 10]

    rn = _backbone_variables(cnn)
    temp_names = ("day", "week", "month", "year")
    variables = {
        "params": {
            "static": {
                "image_encoder": {"backbone": rn["params"],
                                  "fc": linear_params(img_fc)},
                "trend_encoder": {"gru": gru_params(trend_gru)},
                "temp_encoder": {nm: linear_params(l)
                                 for nm, l in zip(temp_names, temp_lins)},
                "attribute_encoder": {
                    nm: _embedding_params(e)
                    for nm, e in zip(("cat", "col", "fab", "store"), embs)},
            },
            "ts_self_attention": mha_params(self_attn),
            "sales_encoder_gru": gru_params(sales_gru),
            "decoder": {
                "fusion": {
                    "img_attention": _additive_params(*adds["img"]),
                    "ts_attention": _additive_params(*adds["ts"]),
                    "multimodal_attention": _additive_params(*adds["mm"]),
                    "trend_linear": linear_params(trend_linear),
                    "multimodal_embedder": linear_params(mm_embedder),
                },
                "decoder_cell": gru_params(dec_gru),
                "decoder_fc": linear_params(decoder_fc),
            },
        },
        "batch_stats": {"static": {"image_encoder": {
            "backbone": rn["batch_stats"]}}},
    }
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    model = build("cross_attn_rnn_210", vocab=VOCAB, out_len=T,
                  attention_dim=E, embedding_dim=E, hidden_dim=E,
                  image_arch="tiny", use_teacher_forcing=False)
    pred, _ = model.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(pred), t_pred, atol=1e-4, rtol=1e-4)


def test_gated_v2_whole_model_matches_torch():
    """gated_v2 end to end vs the reference math: head-specific-gated trend
    encoder, pure-gated fusion (+2.0 bias), standard-self/pure-gated-cross
    decoder (Proposed_model_v2.py:747-847)."""
    torch.manual_seed(13)
    n = 4
    batch = _batch(n=n, demand=True)

    cnn = _tiny_resnet().eval()
    projection = torch.nn.Conv2d(2048, E, 1)  # v2 ImageEncoder (:506-522)
    embs = [torch.nn.Embedding(v, E)
            for v in (VOCAB.num_cat, VOCAB.num_col, VOCAB.num_fab,
                      VOCAB.num_store)]
    sales_gru = torch.nn.GRU(1, E, batch_first=True)
    dummy_lins = [torch.nn.Linear(1, E) for _ in range(4)]
    dummy_fusion = torch.nn.Linear(4 * E, E)
    gt_input = torch.nn.Linear(3, E)
    enc_sa = [_TorchPureGatedMHA(E, 4, head_gate=True) for _ in range(2)]
    enc_norm = [[torch.nn.LayerNorm(E) for _ in range(2)] for _ in range(2)]
    enc_ff = [(torch.nn.Linear(E, 2048), torch.nn.Linear(2048, E))
              for _ in range(2)]
    gate_fc = torch.nn.Linear(6 * E, 6 * E)
    torch.nn.init.constant_(gate_fc.bias, 2.0)
    fusion_fc = torch.nn.Linear(6 * E, E)
    dec_sa = torch.nn.MultiheadAttention(E, 4, dropout=0.1).eval()
    dec_ca = _TorchPureGatedMHA(E, 4)
    dec_norm = [torch.nn.LayerNorm(E) for _ in range(3)]
    dec_ff = (torch.nn.Linear(E, 4 * E), torch.nn.Linear(4 * E, E))
    decoder_fc = torch.nn.Linear(E, 12)

    pos = torch.zeros(52, E)
    position = torch.arange(0, 52, dtype=torch.float).unsqueeze(1)
    div = torch.exp(torch.arange(0, E, 2).float() * (-np.log(10000.0) / E))
    pos[:, 0::2] = torch.sin(position * div)
    pos[:, 1::2] = torch.cos(position * div)

    with torch.no_grad():
        # v2 forward (:803-846), eval mode.  gcd(52, 12) = 4 block mask.
        mask = torch.full((52, 52), float("-inf"))
        for i in range(0, 52, 4):
            mask[i:i + 4, i:i + 4] = 0.0
        g = gt_input(torch.tensor(batch["gtrends"]).permute(0, 2, 1))
        src = g.permute(1, 0, 2) + pos[:, None, :]
        for sa, (n1, n2), (l1, l2) in zip(enc_sa, enc_norm, enc_ff):
            src = n1(src + sa(src, src, src, attn_mask=mask))
            src = n2(src + l2(torch.relu(l1(src))))
        memory = src

        h_text = torch.stack([e(torch.tensor(batch[k].astype(np.int64)))
                              for e, k in zip(embs, ("cat", "col", "fab",
                                                     "store"))], dim=1)
        feats = cnn(_normalized_images(batch["images"]))
        h_img = projection(feats).mean(dim=(2, 3))
        d = torch.cat([l(torch.tensor(batch["temporal"][:, i:i + 1]))
                       for i, l in enumerate(dummy_lins)], dim=1)
        h_dummy = dummy_fusion(d)
        h_sales = sales_gru(torch.zeros(n, 2, 1))[0][:, -1, :]

        cat_f = torch.cat([h_img, h_text.reshape(n, -1), h_dummy], dim=1)
        gated = cat_f + cat_f * torch.sigmoid(gate_fc(cat_f))
        static_ctx = torch.relu(fusion_fc(gated))

        tgt = (h_sales + static_ctx).unsqueeze(0)
        t2 = dec_sa(tgt, tgt, tgt)[0]
        tgt = dec_norm[0](tgt + t2)
        tgt = dec_norm[1](tgt + dec_ca(tgt, memory, memory))
        tgt = dec_norm[2](tgt + dec_ff[1](torch.relu(dec_ff[0](tgt))))
        t_pred = decoder_fc(tgt).transpose(0, 1).reshape(n, 12).numpy()

    rn = _backbone_variables(cnn)
    enc_layers = {}
    for i, (sa, (n1, n2), (l1, l2)) in enumerate(zip(enc_sa, enc_norm, enc_ff)):
        enc_layers[f"layer{i}"] = {
            "self_attn": _gated_mha_params(sa),
            "ffn": {"linear1": linear_params(l1), "linear2": linear_params(l2)},
            "norm1": {"scale": t2n(n1.weight), "bias": t2n(n1.bias)},
            "norm2": {"scale": t2n(n2.weight), "bias": t2n(n2.bias)},
        }
    variables = {
        "params": {
            "gtrend_encoder": {"input_linear": linear_params(gt_input),
                               "encoder": enc_layers},
            "text_encoder": {nm: _embedding_params(e)
                             for nm, e in zip(("cat", "col", "fab", "store"),
                                              embs)},
            "image_encoder": {
                "backbone": rn["params"],
                "projection": {
                    "kernel": np.transpose(t2n(projection.weight), (2, 3, 1, 0)),
                    "bias": t2n(projection.bias)},
            },
            "dummy_encoder": dict(
                {nm: linear_params(l)
                 for nm, l in zip(("day", "week", "month", "year"),
                                  dummy_lins)},
                fusion=linear_params(dummy_fusion)),
            "sales_encoder": {"gru": gru_params(sales_gru)},
            "fusion": {"gate_fc": linear_params(gate_fc),
                       "fusion_fc": linear_params(fusion_fc)},
            "decoder": {"layer0": {
                "self_attn": mha_params(dec_sa),
                "cross_attn": _gated_mha_params(dec_ca),
                "ffn": {"linear1": linear_params(dec_ff[0]),
                        "linear2": linear_params(dec_ff[1])},
                "norm1": {"scale": t2n(dec_norm[0].weight),
                          "bias": t2n(dec_norm[0].bias)},
                "norm2": {"scale": t2n(dec_norm[1].weight),
                          "bias": t2n(dec_norm[1].bias)},
                "norm3": {"scale": t2n(dec_norm[2].weight),
                          "bias": t2n(dec_norm[2].bias)},
            }},
            "decoder_fc": linear_params(decoder_fc),
        },
        "batch_stats": {"image_encoder": {"backbone": rn["batch_stats"]}},
    }
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    model = build("gated_v2", vocab=VOCAB, output_len=12,
                  embedding_dim=E, hidden_dim=E, image_arch="tiny")
    pred, _ = model.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(pred), t_pred, atol=1e-4, rtol=1e-4)


def test_gated_v4_whole_model_matches_torch():
    torch.manual_seed(11)
    n = 4
    batch = _batch(n=n, demand=True)

    # ---- torch side (Proposed_model_v4.py:245-289, eval mode).
    cnn = _tiny_resnet().eval()
    projection = torch.nn.Conv2d(2048, E, 1)
    input_linear = torch.nn.Linear(3, E)
    enc_layers = [torch.nn.TransformerEncoderLayer(E, 4, dropout=0.2)
                  for _ in range(2)]
    embs = [torch.nn.Embedding(v, E)
            for v in (VOCAB.num_cat, VOCAB.num_col, VOCAB.num_fab,
                      VOCAB.num_store)]
    sales_gru = torch.nn.GRU(1, E, batch_first=True)
    dummy_lins = [torch.nn.Linear(1, E) for _ in range(4)]
    dummy_fusion = torch.nn.Linear(4 * E, E)
    img_gate = torch.nn.Linear(5 * E, E)
    dummy_gate = torch.nn.Linear(5 * E, E)
    fusion_fc = torch.nn.Linear(6 * E, E)
    fusion_norm = torch.nn.LayerNorm(E)
    dec_layer = torch.nn.TransformerDecoderLayer(E, 4, dim_feedforward=4 * E,
                                                 dropout=0.1)
    decoder_fc = torch.nn.Linear(E, 12)
    for m in (dec_layer, *enc_layers):
        m.eval()

    # Sinusoidal positions (Proposed_model_v4.py:13-27), eval (no dropout).
    pos = torch.zeros(52, E)
    position = torch.arange(0, 52, dtype=torch.float).unsqueeze(1)
    div = torch.exp(torch.arange(0, E, 2).float() * (-np.log(10000.0) / E))
    pos[:, 0::2] = torch.sin(position * div)
    pos[:, 1::2] = torch.cos(position * div)

    with torch.no_grad():
        # GTrendEmbedder (:49-86): linear -> +pos (seq-first) -> 2 encoder
        # layers with the gcd block mask (gcd(52, 12) = 4).
        g = input_linear(torch.tensor(batch["gtrends"]).permute(0, 2, 1))
        g = g.permute(1, 0, 2) + pos[:, None, :]
        mask = torch.full((52, 52), float("-inf"))
        for i in range(0, 52, 4):
            mask[i:i + 4, i:i + 4] = 0.0
        memory = g
        for layer in enc_layers:
            memory = layer(memory, src_mask=mask)

        h_text = torch.stack([e(torch.tensor(batch[k].astype(np.int64)))
                              for e, k in zip(embs, ("cat", "col", "fab",
                                                     "store"))], dim=1)
        feats = cnn(_normalized_images(batch["images"]))
        h_img = projection(feats).mean(dim=(2, 3))
        d = torch.cat([l(torch.tensor(batch["temporal"][:, i:i + 1]))
                       for i, l in enumerate(dummy_lins)], dim=1)
        h_dummy = dummy_fusion(d)

        # Demand: item_sales = zeros(bs, 1, 2) (training_step :302).
        h_sales = sales_gru(torch.zeros(n, 2, 1))[0][:, -1, :]

        text_flat = h_text.reshape(n, -1)
        gi = torch.sigmoid(img_gate(torch.cat([text_flat, h_img], 1)))
        gd = torch.sigmoid(dummy_gate(torch.cat([text_flat, h_dummy], 1)))
        fused = torch.cat([h_img + h_img * gi, text_flat,
                           h_dummy + h_dummy * gd], 1)
        static_ctx = torch.relu(fusion_norm(fusion_fc(fused)))

        tgt = (h_sales + static_ctx).unsqueeze(0)      # [1, n, E]
        out = dec_layer(tgt, memory)
        t_pred = decoder_fc(out).transpose(0, 1).reshape(n, 12).numpy()

    # ---- our side with converted weights.
    rn = _backbone_variables(cnn)
    variables = {
        "params": {
            "gtrend_encoder": {
                "input_linear": linear_params(input_linear),
                "encoder": {f"layer{i}": encoder_layer_params(l)
                            for i, l in enumerate(enc_layers)},
            },
            "text_encoder": {nm: _embedding_params(e)
                             for nm, e in zip(("cat", "col", "fab", "store"),
                                              embs)},
            "image_encoder": {
                "backbone": rn["params"],
                "projection": {
                    "kernel": np.transpose(t2n(projection.weight), (2, 3, 1, 0)),
                    "bias": t2n(projection.bias)},
            },
            "dummy_encoder": dict(
                {nm: linear_params(l)
                 for nm, l in zip(("day", "week", "month", "year"),
                                  dummy_lins)},
                fusion=linear_params(dummy_fusion)),
            "sales_encoder": {"gru": gru_params(sales_gru)},
            "fusion": {
                "img_gate_fc": linear_params(img_gate),
                "dummy_gate_fc": linear_params(dummy_gate),
                "fusion_fc": linear_params(fusion_fc),
                "fusion_norm": {"scale": t2n(fusion_norm.weight),
                                "bias": t2n(fusion_norm.bias)},
            },
            "decoder": {"layer0": decoder_layer_params(dec_layer)},
            "decoder_fc": linear_params(decoder_fc),
        },
        "batch_stats": {"image_encoder": {"backbone": rn["batch_stats"]}},
    }
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    model = build("gated_v4", vocab=VOCAB, output_len=12,
                  embedding_dim=E, hidden_dim=E, image_arch="tiny")
    pred, _ = model.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(pred), t_pred, atol=1e-4, rtol=1e-4)


def _bn_params(bn):
    return ({"scale": t2n(bn.weight), "bias": t2n(bn.bias)},
            {"mean": t2n(bn.running_mean), "var": t2n(bn.running_var)})


def _ln_params(ln):
    return {"scale": t2n(ln.weight), "bias": t2n(ln.bias)}


class _TorchFusionBlock(torch.nn.Module):
    """M4FT FusionBlock: BN -> Linear -> ReLU -> Dropout -> Linear
    (M4FT_Visuelle2.py:161-173), eval mode."""

    def __init__(self, H):
        super().__init__()
        self.bn = torch.nn.BatchNorm1d(H).eval()
        self.fc1 = torch.nn.Linear(H, H)
        self.fc2 = torch.nn.Linear(H, H)
        with torch.no_grad():
            self.bn.running_mean.uniform_(-0.3, 0.3)
            self.bn.running_var.uniform_(0.7, 1.3)

    def forward(self, x):
        return self.fc2(torch.relu(self.fc1(self.bn(x))))

    def params(self):
        p, s = _bn_params(self.bn)
        return ({"bn": p, "fc1": linear_params(self.fc1),
                 "fc2": linear_params(self.fc2)},
                {"bn": s})


@pytest.mark.parametrize("variant", ["gtm", "m4ft", "gated_v1", "gated_v3"])
def test_seq2seq_variants_whole_model_match_torch(variant):
    """Remaining GTM-family variants end to end vs raw-torch compositions:
    gtm (BN concat fusion, GTM_Visuelle2.py:151-172), m4ft (hierarchical
    summation fusion over hidden-projected encoders, M4FT_Visuelle2.py:
    83-202), gated_v1 (R-GFN + gated cross-attn decoder, Proposed_model.py:
    141-262), gated_v3 (TARG text anchor over m4ft encoders,
    Proposed_model_v3.py:175-236)."""
    torch.manual_seed(17)
    n = 4
    batch = _batch(n=n, demand=True)
    m4ft_style = variant in ("m4ft", "gated_v3")

    cnn = _tiny_resnet().eval()
    projection = torch.nn.Conv2d(2048, E, 1)
    final_proj = torch.nn.Linear(E, E) if m4ft_style else None
    embs = [torch.nn.Embedding(v, E)
            for v in (VOCAB.num_cat, VOCAB.num_col, VOCAB.num_fab,
                      VOCAB.num_store)]
    text_proj = torch.nn.Linear(4 * E, E) if m4ft_style else None
    sales_gru = torch.nn.GRU(1, E, batch_first=True)
    temp_lins = [torch.nn.Linear(1, E) for _ in range(4)]
    temp_proj = torch.nn.Linear(4 * E, E)  # dummy_fusion or m4ft proj
    gt_input = torch.nn.Linear(3, E)
    enc_layers_t = [torch.nn.TransformerEncoderLayer(E, 4, dropout=0.2).eval()
                    for _ in range(2)]
    dec_layer = torch.nn.TransformerDecoderLayer(
        E, 4, dim_feedforward=4 * E, dropout=0.1).eval()
    decoder_fc = torch.nn.Linear(E, 12)

    # Fusion networks per variant.
    if variant == "gtm":
        fus_bn = torch.nn.BatchNorm1d(6 * E).eval()
        with torch.no_grad():
            fus_bn.running_mean.uniform_(-0.3, 0.3)
            fus_bn.running_var.uniform_(0.7, 1.3)
        fus_fc1 = torch.nn.Linear(6 * E, 6 * E, bias=False)
        fus_fc2 = torch.nn.Linear(6 * E, E)
    elif variant == "m4ft":
        blocks = {k: _TorchFusionBlock(E)
                  for k in ("fusion_temp_text", "fusion_text_vis",
                            "fusion_final")}
    elif variant == "gated_v1":
        gates = {k: (torch.nn.Linear(d, d), torch.nn.LayerNorm(d))
                 for k, d in (("img_gate", E), ("text_gate", 4 * E),
                              ("dummy_gate", E))}
        fus_fc = torch.nn.Linear(6 * E, E)
        v1_ca_mha = torch.nn.MultiheadAttention(E, 4, dropout=0.1).eval()
        v1_gate = torch.nn.Linear(E, E)
        v1_sa = torch.nn.MultiheadAttention(E, 4, dropout=0.1).eval()
        v1_norm = [torch.nn.LayerNorm(E) for _ in range(3)]
        v1_ff = (torch.nn.Linear(E, 4 * E), torch.nn.Linear(4 * E, E))
    else:  # gated_v3 (TARG, text anchor)
        g1 = torch.nn.Linear(2 * E, E)
        g2 = torch.nn.Linear(2 * E, E)
        final_block = _TorchFusionBlock(E)

    pos = torch.zeros(52, E)
    position = torch.arange(0, 52, dtype=torch.float).unsqueeze(1)
    div = torch.exp(torch.arange(0, E, 2).float() * (-np.log(10000.0) / E))
    pos[:, 0::2] = torch.sin(position * div)
    pos[:, 1::2] = torch.cos(position * div)

    with torch.no_grad():
        mask = torch.full((52, 52), float("-inf"))
        for i in range(0, 52, 4):
            mask[i:i + 4, i:i + 4] = 0.0
        g = gt_input(torch.tensor(batch["gtrends"]).permute(0, 2, 1))
        memory = g.permute(1, 0, 2) + pos[:, None, :]
        for layer in enc_layers_t:
            memory = layer(memory, src_mask=mask)

        e_stack = torch.stack([e(torch.tensor(batch[k].astype(np.int64)))
                               for e, k in zip(embs, ("cat", "col", "fab",
                                                      "store"))], dim=1)
        feats = cnn(_normalized_images(batch["images"]))
        img_pooled = projection(feats).mean(dim=(2, 3))
        d = torch.cat([l(torch.tensor(batch["temporal"][:, i:i + 1]))
                       for i, l in enumerate(temp_lins)], dim=1)
        e_temp = temp_proj(d)
        h_sales = sales_gru(torch.zeros(n, 2, 1))[0][:, -1, :]

        if m4ft_style:
            e_text = text_proj(e_stack.reshape(n, -1))
            e_vis = final_proj(img_pooled)
            if variant == "m4ft":
                out_tt = blocks["fusion_temp_text"](e_temp + e_text)
                out_tv = blocks["fusion_text_vis"](e_text + e_vis)
                ctx = blocks["fusion_final"](
                    out_tt + out_tv + e_temp + e_text + e_vis)
            else:  # TARG: q=text, contexts gated by sigma(W[q;c])
                gate1 = torch.sigmoid(g1(torch.cat([e_text, e_vis], 1)))
                gate2 = torch.sigmoid(g2(torch.cat([e_text, e_temp], 1)))
                ctx = final_block(e_text + e_vis * gate1 + e_temp * gate2)
        else:
            text_flat = e_stack.reshape(n, -1)
            if variant == "gtm":
                cat_f = torch.cat([img_pooled, text_flat, e_temp], 1)
                ctx = fus_fc2(torch.relu(fus_fc1(fus_bn(cat_f))))
            else:  # gated_v1 R-GFN
                def grb(x, fc, norm):
                    return norm(x + x * torch.sigmoid(fc(x)))
                cat_f = torch.cat([grb(img_pooled, *gates["img_gate"]),
                                   grb(text_flat, *gates["text_gate"]),
                                   grb(e_temp, *gates["dummy_gate"])], 1)
                ctx = torch.relu(fus_fc(cat_f))

        tgt = (h_sales + ctx).unsqueeze(0)
        if variant == "gated_v1":
            t2_ = v1_sa(tgt, tgt, tgt)[0]
            x = v1_norm[0](tgt + t2_)
            ca = v1_ca_mha(x, memory, memory)[0]
            ca = ca * torch.sigmoid(v1_gate(x))
            x = v1_norm[1](x + ca)
            x = v1_norm[2](x + v1_ff[1](torch.relu(v1_ff[0](x))))
            out = x
        else:
            out = dec_layer(tgt, memory)
        t_pred = decoder_fc(out).transpose(0, 1).reshape(n, 12).numpy()

    # ---- our side with converted weights.
    rn = _backbone_variables(cnn)
    img_params = {"backbone": rn["params"],
                  "projection": {"kernel": np.transpose(
                      t2n(projection.weight), (2, 3, 1, 0)),
                      "bias": t2n(projection.bias)}}
    if m4ft_style:
        img_params["final_proj"] = linear_params(final_proj)
        text_params = dict({nm: _embedding_params(e) for nm, e in
                            zip(("cat", "col", "fab", "store"), embs)},
                           proj=linear_params(text_proj))
        temp_params = dict({nm: linear_params(l) for nm, l in
                            zip(("day", "week", "month", "year"), temp_lins)},
                           proj=linear_params(temp_proj))
        temp_key = "temporal_encoder"
    else:
        text_params = {nm: _embedding_params(e) for nm, e in
                       zip(("cat", "col", "fab", "store"), embs)}
        temp_params = dict({nm: linear_params(l) for nm, l in
                            zip(("day", "week", "month", "year"), temp_lins)},
                           fusion=linear_params(temp_proj))
        temp_key = "dummy_encoder"

    fusion_stats = {}
    if variant == "gtm":
        bn_p, bn_s = _bn_params(fus_bn)
        fusion_params = {"bn": bn_p, "fc1": linear_params(fus_fc1),
                         "fc2": linear_params(fus_fc2)}
        fusion_stats = {"bn": bn_s}
    elif variant == "m4ft":
        fusion_params, fusion_stats = {}, {}
        for k, blk in blocks.items():
            p, s = blk.params()
            fusion_params[k], fusion_stats[k] = p, s
    elif variant == "gated_v1":
        fusion_params = {k: {"gate_fc": linear_params(fc),
                             "norm": _ln_params(norm)}
                         for k, (fc, norm) in gates.items()}
        fusion_params["fusion_fc"] = linear_params(fus_fc)
    else:
        p, s = final_block.params()
        fusion_params = {"gate_fc1": linear_params(g1),
                         "gate_fc2": linear_params(g2), "fusion_final": p}
        fusion_stats = {"fusion_final": s}

    if variant == "gated_v1":
        dec_params = {"layer0": {
            "self_attn": mha_params(v1_sa),
            "cross_attn": {"mha": mha_params(v1_ca_mha),
                           "gate_proj": linear_params(v1_gate)},
            "ffn": {"linear1": linear_params(v1_ff[0]),
                    "linear2": linear_params(v1_ff[1])},
            "norm1": _ln_params(v1_norm[0]),
            "norm2": _ln_params(v1_norm[1]),
            "norm3": _ln_params(v1_norm[2]),
        }}
    else:
        dec_params = {"layer0": decoder_layer_params(dec_layer)}

    params = {
        "gtrend_encoder": {
            "input_linear": linear_params(gt_input),
            "encoder": {f"layer{i}": encoder_layer_params(l)
                        for i, l in enumerate(enc_layers_t)},
        },
        "text_encoder": text_params,
        "image_encoder": img_params,
        temp_key: temp_params,
        "sales_encoder": {"gru": gru_params(sales_gru)},
        "fusion": fusion_params,
        "decoder": dec_params,
        "decoder_fc": linear_params(decoder_fc),
    }
    batch_stats = {"image_encoder": {"backbone": rn["batch_stats"]}}
    if fusion_stats:
        batch_stats["fusion"] = fusion_stats
    variables = jax.tree_util.tree_map(
        jnp.asarray, {"params": params, "batch_stats": batch_stats})

    model = build(variant, vocab=VOCAB, output_len=12,
                  embedding_dim=E, hidden_dim=E, image_arch="tiny")
    pred, _ = model.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(pred), t_pred, atol=1e-4, rtol=1e-4)


def test_gtm_v1_whole_model_matches_torch():
    """Original VISUELLE-1 GTM end to end (GTM.py:235-294): BERT-featurized
    text -> Linear, fully-frozen backbone, BN concat fusion, memory-only
    decoder layer that skips self-attention (GTM.py:199-232)."""
    torch.manual_seed(23)
    n = 4
    batch = _batch(n=n, demand=True)
    rng = np.random.default_rng(5)
    batch["text_features"] = rng.standard_normal((n, 768)).astype(np.float32)

    cnn = _tiny_resnet().eval()
    text_fc = torch.nn.Linear(768, E)
    dummy_lins = [torch.nn.Linear(1, E) for _ in range(4)]
    dummy_fusion = torch.nn.Linear(4 * E, E)
    gt_input = torch.nn.Linear(3, E)
    enc_layers_t = [torch.nn.TransformerEncoderLayer(E, 4, dropout=0.2).eval()
                    for _ in range(2)]
    img_linear = torch.nn.Linear(2048, E)
    fus_bn = torch.nn.BatchNorm1d(3 * E).eval()
    with torch.no_grad():
        fus_bn.running_mean.uniform_(-0.3, 0.3)
        fus_bn.running_var.uniform_(0.7, 1.3)
    fus_fc1 = torch.nn.Linear(3 * E, 3 * E, bias=False)
    fus_fc2 = torch.nn.Linear(3 * E, E)
    dec_ca = torch.nn.MultiheadAttention(E, 4, dropout=0.1).eval()
    dec_l1, dec_l2 = torch.nn.Linear(E, 4 * E), torch.nn.Linear(4 * E, E)
    dec_n2, dec_n3 = torch.nn.LayerNorm(E), torch.nn.LayerNorm(E)
    decoder_fc = torch.nn.Linear(E, 12)

    pos = torch.zeros(52, E)
    position = torch.arange(0, 52, dtype=torch.float).unsqueeze(1)
    div = torch.exp(torch.arange(0, E, 2).float() * (-np.log(10000.0) / E))
    pos[:, 0::2] = torch.sin(position * div)
    pos[:, 1::2] = torch.cos(position * div)

    with torch.no_grad():
        # gcd(52, 12) = 4 block mask; hidden_dim == E here.
        mask = torch.full((52, 52), float("-inf"))
        for i in range(0, 52, 4):
            mask[i:i + 4, i:i + 4] = 0.0
        g = gt_input(torch.tensor(batch["gtrends"]).permute(0, 2, 1))
        memory = g.permute(1, 0, 2) + pos[:, None, :]
        for layer in enc_layers_t:
            memory = layer(memory, src_mask=mask)

        feats = cnn(_normalized_images(batch["images"]))  # [n, 2048, 1, 1]
        text = text_fc(torch.tensor(batch["text_features"]))
        d = torch.cat([l(torch.tensor(batch["temporal"][:, i:i + 1]))
                       for i, l in enumerate(dummy_lins)], dim=1)
        dummy = dummy_fusion(d)
        condensed = img_linear(feats.mean(dim=(2, 3)))
        cat_f = torch.cat([condensed, text, dummy], dim=1)
        ctx = fus_fc2(torch.relu(fus_fc1(fus_bn(cat_f))))

        tgt = ctx.unsqueeze(0)
        t2_, _ = dec_ca(tgt, memory, memory)
        x = dec_n2(tgt + t2_)
        x = dec_n3(x + dec_l2(torch.relu(dec_l1(x))))
        t_pred = decoder_fc(x[0]).reshape(n, 12).numpy()

    rn = _backbone_variables(cnn)
    variables = {
        "params": {
            "image_encoder": {"backbone": rn["params"]},
            "text_fc": linear_params(text_fc),
            "dummy_encoder": dict(
                {nm: linear_params(l)
                 for nm, l in zip(("day", "week", "month", "year"),
                                  dummy_lins)},
                fusion=linear_params(dummy_fusion)),
            "gtrend_encoder": {
                "input_linear": linear_params(gt_input),
                "encoder": {f"layer{i}": encoder_layer_params(l)
                            for i, l in enumerate(enc_layers_t)},
            },
            "static_feature_encoder": {
                "img_linear": linear_params(img_linear),
                "bn": _bn_params(fus_bn)[0],
                "fc1": linear_params(fus_fc1),
                "fc2": linear_params(fus_fc2),
            },
            "decoder0": {
                "multihead_attn": mha_params(dec_ca),
                "linear1": linear_params(dec_l1),
                "linear2": linear_params(dec_l2),
                "norm2": _ln_params(dec_n2),
                "norm3": _ln_params(dec_n3),
            },
            "decoder_fc": linear_params(decoder_fc),
        },
        "batch_stats": {
            "image_encoder": {"backbone": rn["batch_stats"]},
            "static_feature_encoder": {"bn": _bn_params(fus_bn)[1]},
        },
    }
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    from visuelle2_tpu.models.gtm_v1 import GTMv1

    model = GTMv1(embedding_dim=E, hidden_dim=E, output_len=12,
                  image_arch="tiny")
    pred, attn = model.apply(variables, batch, train=False)
    assert attn is not None
    np.testing.assert_allclose(np.asarray(pred), t_pred, atol=1e-4, rtol=1e-4)


def test_gated_v4_autoregressive_whole_model_matches_torch():
    """The AR decode mode (Proposed_model_v4.py:276-283): 12-token target
    (position 0 = fused context), sinusoidal positions, causal mask,
    Linear(H -> 1) head — only shape-tested until now."""
    torch.manual_seed(29)
    n, T = 4, 12
    batch = _batch(n=n, demand=True)

    cnn = _tiny_resnet().eval()
    projection = torch.nn.Conv2d(2048, E, 1)
    input_linear = torch.nn.Linear(3, E)
    enc_layers = [torch.nn.TransformerEncoderLayer(E, 4, dropout=0.2).eval()
                  for _ in range(2)]
    embs = [torch.nn.Embedding(v, E)
            for v in (VOCAB.num_cat, VOCAB.num_col, VOCAB.num_fab,
                      VOCAB.num_store)]
    sales_gru = torch.nn.GRU(1, E, batch_first=True)
    dummy_lins = [torch.nn.Linear(1, E) for _ in range(4)]
    dummy_fusion = torch.nn.Linear(4 * E, E)
    img_gate = torch.nn.Linear(5 * E, E)
    dummy_gate = torch.nn.Linear(5 * E, E)
    fusion_fc = torch.nn.Linear(6 * E, E)
    fusion_norm = torch.nn.LayerNorm(E)
    dec_layer = torch.nn.TransformerDecoderLayer(E, 4, dim_feedforward=4 * E,
                                                 dropout=0.1).eval()
    decoder_fc = torch.nn.Linear(E, 1)  # AR: per-token scalar head

    def sinusoid(max_len):
        pe = torch.zeros(max_len, E)
        position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
        div = torch.exp(torch.arange(0, E, 2).float() * (-np.log(10000.0) / E))
        pe[:, 0::2] = torch.sin(position * div)
        pe[:, 1::2] = torch.cos(position * div)
        return pe

    with torch.no_grad():
        mask = torch.full((52, 52), float("-inf"))
        for i in range(0, 52, 4):
            mask[i:i + 4, i:i + 4] = 0.0
        g = input_linear(torch.tensor(batch["gtrends"]).permute(0, 2, 1))
        memory = g.permute(1, 0, 2) + sinusoid(52)[:, None, :]
        for layer in enc_layers:
            memory = layer(memory, src_mask=mask)

        h_text = torch.stack([e(torch.tensor(batch[k].astype(np.int64)))
                              for e, k in zip(embs, ("cat", "col", "fab",
                                                     "store"))], dim=1)
        feats = cnn(_normalized_images(batch["images"]))
        h_img = projection(feats).mean(dim=(2, 3))
        d = torch.cat([l(torch.tensor(batch["temporal"][:, i:i + 1]))
                       for i, l in enumerate(dummy_lins)], dim=1)
        h_dummy = dummy_fusion(d)
        h_sales = sales_gru(torch.zeros(n, 2, 1))[0][:, -1, :]
        text_flat = h_text.reshape(n, -1)
        gi = torch.sigmoid(img_gate(torch.cat([text_flat, h_img], 1)))
        gd = torch.sigmoid(dummy_gate(torch.cat([text_flat, h_dummy], 1)))
        fused = torch.cat([h_img + h_img * gi, text_flat,
                           h_dummy + h_dummy * gd], 1)
        static_ctx = torch.relu(fusion_norm(fusion_fc(fused)))

        # AR decode (:276-283): tgt[0] = decoder_input, + positions, causal.
        tgt = torch.zeros(T, n, E)
        tgt[0] = h_sales + static_ctx
        tgt = tgt + sinusoid(T)[:, None, :]
        causal = torch.triu(torch.full((T, T), float("-inf")), diagonal=1)
        out = dec_layer(tgt, memory, tgt_mask=causal)
        t_pred = decoder_fc(out)[..., 0].transpose(0, 1).reshape(n, T).numpy()

    rn = _backbone_variables(cnn)
    variables = {
        "params": {
            "gtrend_encoder": {
                "input_linear": linear_params(input_linear),
                "encoder": {f"layer{i}": encoder_layer_params(l)
                            for i, l in enumerate(enc_layers)},
            },
            "text_encoder": {nm: _embedding_params(e)
                             for nm, e in zip(("cat", "col", "fab", "store"),
                                              embs)},
            "image_encoder": {
                "backbone": rn["params"],
                "projection": {
                    "kernel": np.transpose(t2n(projection.weight), (2, 3, 1, 0)),
                    "bias": t2n(projection.bias)},
            },
            "dummy_encoder": dict(
                {nm: linear_params(l)
                 for nm, l in zip(("day", "week", "month", "year"),
                                  dummy_lins)},
                fusion=linear_params(dummy_fusion)),
            "sales_encoder": {"gru": gru_params(sales_gru)},
            "fusion": {
                "img_gate_fc": linear_params(img_gate),
                "dummy_gate_fc": linear_params(dummy_gate),
                "fusion_fc": linear_params(fusion_fc),
                "fusion_norm": {"scale": t2n(fusion_norm.weight),
                                "bias": t2n(fusion_norm.bias)},
            },
            "decoder": {"layer0": decoder_layer_params(dec_layer)},
            "decoder_fc": linear_params(decoder_fc),
        },
        "batch_stats": {"image_encoder": {"backbone": rn["batch_stats"]}},
    }
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    model = build("gated_v4", vocab=VOCAB, output_len=T, autoregressive=True,
                  embedding_dim=E, hidden_dim=E, image_arch="tiny")
    pred, _ = model.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(pred), t_pred, atol=1e-4, rtol=1e-4)
