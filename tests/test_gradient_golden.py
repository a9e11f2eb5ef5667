"""Whole-model GRADIENT golden vs torch autograd.

The forward goldens (test_whole_model_golden.py) prove eval-mode forecast
parity; this proves the BACKWARD path: the same gated_v4 composition in raw
torch (``/root/reference/models/Proposed_model_v4.py:245-289`` math), an MSE
loss against the demand target, torch ``loss.backward()`` vs ``jax.grad`` —
every parameter gradient through the ResNet backbone, trend transformer
encoder (gcd mask), gated fusion, GRU, and transformer decoder must match.
Gradients convert with the SAME weight-mapping functions as the forward
goldens, applied to gradient-shadow modules (deepcopy with ``.grad`` swapped
into ``.data``).
"""

import copy

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.test_whole_model_golden import (
    E,
    VOCAB,
    _backbone_variables,
    _batch,
    _embedding_params,
    _normalized_images,
    _tiny_resnet,
)
from tests.torch_ref import (
    decoder_layer_params,
    encoder_layer_params,
    gru_params,
    linear_params,
    t2n,
)
from visuelle2_tpu.models import build


def _grad_shadow(module):
    """A deepcopy of ``module`` whose params hold the original's gradients,
    so the forward goldens' weight converters convert gradients verbatim."""
    gm = copy.deepcopy(module)
    for p_dst, p_src in zip(gm.parameters(), module.parameters()):
        p_dst.data = (p_src.grad.detach().clone() if p_src.grad is not None
                      else torch.zeros_like(p_src))
    return gm


def test_gated_v4_gradient_matches_torch_autograd():
    torch.manual_seed(23)
    n = 4
    batch = _batch(n=n, demand=True, seed=9)

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

    pos = torch.zeros(52, E)
    position = torch.arange(0, 52, dtype=torch.float).unsqueeze(1)
    div = torch.exp(torch.arange(0, E, 2).float() * (-np.log(10000.0) / E))
    pos[:, 0::2] = torch.sin(position * div)
    pos[:, 1::2] = torch.cos(position * div)

    # ---- torch forward (grad-enabled) + backward.
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
    h_sales = sales_gru(torch.zeros(n, 2, 1))[0][:, -1, :]

    text_flat = h_text.reshape(n, -1)
    gi = torch.sigmoid(img_gate(torch.cat([text_flat, h_img], 1)))
    gd = torch.sigmoid(dummy_gate(torch.cat([text_flat, h_dummy], 1)))
    fused = torch.cat([h_img + h_img * gi, text_flat,
                       h_dummy + h_dummy * gd], 1)
    static_ctx = torch.relu(fusion_norm(fusion_fc(fused)))

    tgt = (h_sales + static_ctx).unsqueeze(0)
    out = dec_layer(tgt, memory)
    t_pred = decoder_fc(out).transpose(0, 1).reshape(n, 12)

    target = torch.tensor(batch["ts"])
    t_loss = torch.nn.functional.mse_loss(t_pred, target)
    t_loss.backward()

    # ---- one mapping used twice: weights -> variables, grads -> expected.
    def param_tree(cnn, projection, input_linear, enc_layers, embs, sales_gru,
                   dummy_lins, dummy_fusion, img_gate, dummy_gate, fusion_fc,
                   fusion_norm, dec_layer, decoder_fc):
        rn = _backbone_variables(cnn)
        return rn, {
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
        }

    mods = (cnn, projection, input_linear, enc_layers, embs, sales_gru,
            dummy_lins, dummy_fusion, img_gate, dummy_gate, fusion_fc,
            fusion_norm, dec_layer, decoder_fc)
    rn, params = param_tree(*mods)
    shadow = tuple(
        [_grad_shadow(x) for x in m] if isinstance(m, list)
        else _grad_shadow(m) for m in mods)
    _, want_grads = param_tree(*shadow)

    variables = jax.tree_util.tree_map(jnp.asarray, {
        "params": params,
        "batch_stats": {"image_encoder": {"backbone": rn["batch_stats"]}}})
    model = build("gated_v4", vocab=VOCAB, output_len=12,
                  embedding_dim=E, hidden_dim=E, image_arch="tiny")

    def loss_fn(p):
        pred, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            batch, train=False)
        return jnp.mean((pred - jnp.asarray(batch["ts"])) ** 2)

    j_loss, j_grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-5)

    flat_want = {jax.tree_util.keystr(k): v for k, v in
                 jax.tree_util.tree_leaves_with_path(want_grads)}
    flat_got = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(j_grads)}
    assert set(flat_want) == set(flat_got)
    for k in sorted(flat_want):
        np.testing.assert_allclose(
            np.asarray(flat_got[k]), np.asarray(flat_want[k]),
            atol=5e-5, rtol=1e-3, err_msg=k)


def test_cross_attn_rnn_21_gradient_matches_torch_autograd():
    """Backward parity for the CrossAttnRNN family: additive attention,
    window flatten + repeat_interleave, MHA, and the dual GRUs
    (``/root/reference/models/CrossAttnRNN21.py:121-211`` math)."""
    from tests.test_whole_model_golden import _additive, _additive_params
    from tests.torch_ref import mha_params

    torch.manual_seed(31)
    n, W = 4, 10
    batch = _batch(n=n, windows=W, seed=13)

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

    # ---- torch forward (grad-enabled) + backward.
    X = torch.tensor(batch["X"]).reshape(n * W, 2, 1)
    feats = cnn(_normalized_images(batch["images"]))
    img_enc = img_fc(feats.flatten(2).permute(0, 2, 1))
    trend_enc = trend_gru(torch.tensor(batch["gtrends"]).permute(0, 2, 1))[0]
    dummy = sum(l(torch.tensor(batch["temporal"][:, i:i + 1]))
                for i, l in enumerate(temp_lins))
    attr = sum(e(torch.tensor(batch[k].astype(np.int64)))
               for e, k in zip(embs, ("cat", "col", "fab", "store")))
    rep = lambda t: t.repeat_interleave(W, dim=0)
    img_enc, trend_enc = rep(img_enc), rep(trend_enc)
    dummy, attr = rep(dummy), rep(attr)
    trend_enc = self_attn(*([trend_enc.permute(1, 0, 2)] * 3))[0]
    _, hidden = sales_gru(X)
    hidden = hidden.squeeze(0)
    att_img, _ = _additive(*adds["img"], img_enc, hidden)
    att_img = att_img.sum(1)
    att_tr, _ = _additive(*adds["ts"], trend_enc.permute(1, 0, 2), hidden)
    att_tr = trend_linear(att_tr.reshape(n * W, -1))
    mm_in = torch.stack([dummy, att_img, attr, att_tr], dim=1)
    att_mm, _ = _additive(*adds["mm"], mm_in, hidden)
    ctx = mm_embedder((mm_in + att_mm).sum(1))
    t_pred = decoder_fc(ctx)

    target = torch.tensor(batch["y"]).reshape(n * W, 1)
    t_loss = torch.nn.functional.mse_loss(t_pred, target)
    t_loss.backward()

    temp_names = ("day", "week", "month", "year")

    def param_tree(cnn, img_fc, trend_gru, temp_lins, embs, sales_gru,
                   self_attn, adds, trend_linear, mm_embedder, decoder_fc):
        rn = _backbone_variables(cnn)
        return rn, {
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
        }

    def shadow_adds(a):
        return {k: tuple(_grad_shadow(l) for l in v) for k, v in a.items()}

    rn, params = param_tree(cnn, img_fc, trend_gru, temp_lins, embs,
                            sales_gru, self_attn, adds, trend_linear,
                            mm_embedder, decoder_fc)
    _, want_grads = param_tree(
        _grad_shadow(cnn), _grad_shadow(img_fc), _grad_shadow(trend_gru),
        [_grad_shadow(l) for l in temp_lins], [_grad_shadow(e) for e in embs],
        _grad_shadow(sales_gru), _grad_shadow(self_attn), shadow_adds(adds),
        _grad_shadow(trend_linear), _grad_shadow(mm_embedder),
        _grad_shadow(decoder_fc))

    variables = jax.tree_util.tree_map(jnp.asarray, {
        "params": params,
        "batch_stats": {"static": {"image_encoder": {
            "backbone": rn["batch_stats"]}}}})
    model = build("cross_attn_rnn_21", vocab=VOCAB, out_len=1,
                  attention_dim=E, embedding_dim=E, hidden_dim=E,
                  image_arch="tiny")

    def loss_fn(p):
        pred, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            batch, train=False)
        return jnp.mean((pred.reshape(n * W, 1)
                         - jnp.asarray(batch["y"]).reshape(n * W, 1)) ** 2)

    j_loss, j_grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-5)

    flat_want = {jax.tree_util.keystr(k): v for k, v in
                 jax.tree_util.tree_leaves_with_path(want_grads)}
    flat_got = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(j_grads)}
    assert set(flat_want) == set(flat_got)
    for k in sorted(flat_want):
        np.testing.assert_allclose(
            np.asarray(flat_got[k]), np.asarray(flat_want[k]),
            atol=5e-5, rtol=1e-3, err_msg=k)


def test_cross_attn_rnn_demand_gradient_matches_torch_autograd():
    """Backward parity through the scan decode: jax.grad through 12
    ``nn.scan`` steps (projected-h_j attention + GRU cell each step) vs
    torch autograd through the reference's Python loop
    (``CrossAttnRNNDemand.py:247-349``)."""
    from tests.test_whole_model_golden import _additive_params, _additive_proj
    from tests.torch_ref import mha_params

    torch.manual_seed(41)
    n, T = 4, 12
    batch = _batch(n=n, demand=True, seed=17)

    cnn = _tiny_resnet().eval()
    img_fc = torch.nn.Linear(2048, E)
    trend_gru = torch.nn.GRU(3, E, batch_first=True)
    day_lin = torch.nn.Linear(1, E)
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

    # ---- torch forward (grad-enabled) + backward through the decode loop.
    feats = cnn(_normalized_images(batch["images"]))
    img_enc = img_fc(feats.flatten(2).permute(0, 2, 1))
    trend_enc = trend_gru(torch.tensor(batch["gtrends"]).permute(0, 2, 1))[0]
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
    t_pred = torch.stack(outs, dim=1)  # [n, 12, 1]

    # Reference loss: MSE(ts, forecast) (CrossAttnRNNDemand.py:380).
    target = torch.tensor(batch["ts"])
    t_loss = torch.nn.functional.mse_loss(t_pred[..., 0], target)
    t_loss.backward()

    def param_tree(cnn, img_fc, trend_gru, day_lin, embs, self_attn, adds,
                   trend_linear, mm_embedder, dec_gru, decoder_fc):
        rn = _backbone_variables(cnn)
        return rn, {
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
        }

    def shadow_adds(a):
        return {k: tuple(_grad_shadow(l) for l in v) for k, v in a.items()}

    rn, params = param_tree(cnn, img_fc, trend_gru, day_lin, embs, self_attn,
                            adds, trend_linear, mm_embedder, dec_gru,
                            decoder_fc)
    _, want_grads = param_tree(
        _grad_shadow(cnn), _grad_shadow(img_fc), _grad_shadow(trend_gru),
        _grad_shadow(day_lin), [_grad_shadow(e) for e in embs],
        _grad_shadow(self_attn), shadow_adds(adds),
        _grad_shadow(trend_linear), _grad_shadow(mm_embedder),
        _grad_shadow(dec_gru), _grad_shadow(decoder_fc))

    variables = jax.tree_util.tree_map(jnp.asarray, {
        "params": params,
        "batch_stats": {"static": {"image_encoder": {
            "backbone": rn["batch_stats"]}}}})
    model = build("cross_attn_rnn_demand", vocab=VOCAB, out_len=12,
                  attention_dim=E, embedding_dim=E, hidden_dim=E,
                  image_arch="tiny", faithful_temporal_bug=True)

    def loss_fn(p):
        pred, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            batch, train=False)
        return jnp.mean((pred[..., 0] - jnp.asarray(batch["ts"])) ** 2)

    j_loss, j_grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-5)

    flat_want = {jax.tree_util.keystr(k): v for k, v in
                 jax.tree_util.tree_leaves_with_path(want_grads)}
    flat_got = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(j_grads)}
    assert set(flat_want) == set(flat_got)
    for k in sorted(flat_want):
        np.testing.assert_allclose(
            np.asarray(flat_got[k]), np.asarray(flat_want[k]),
            atol=5e-5, rtol=1e-3, err_msg=k)


def test_cross_attn_rnn_210_gradient_matches_torch_autograd():
    """Backward parity through the SO-fore 2-10 decode scan: jax.grad
    through the sales-GRU-initialized 10-step ``nn.scan`` with own-pred
    feedback (the recurrent gradient chain the TF branch would cut) vs
    torch autograd through the reference loop
    (``CrossAttnRNN210.py:191-226``), TF off (eval semantics)."""
    from tests.test_whole_model_golden import _additive, _additive_params
    from tests.torch_ref import mha_params

    torch.manual_seed(59)
    n, W, T = 4, 1, 10
    batch = _batch(n=n, windows=W, horizon=T, seed=33)

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

    # ---- torch forward (grad-enabled) + backward through the decode loop.
    X = torch.tensor(batch["X"]).reshape(n * W, 2, 1)
    feats = cnn(_normalized_images(batch["images"]))
    img_enc = img_fc(feats.flatten(2).permute(0, 2, 1))
    trend_enc = trend_gru(torch.tensor(batch["gtrends"]).permute(0, 2, 1))[0]
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
        dec_out = decoder_fc(out)  # fed back: grads chain through all steps
        outs.append(dec_out[:, 0, 0])
    t_pred = torch.stack(outs, dim=1)  # [N, 10]

    target = torch.tensor(batch["y"]).reshape(n * W, T)
    t_loss = torch.nn.functional.mse_loss(t_pred, target)
    t_loss.backward()

    temp_names = ("day", "week", "month", "year")

    def param_tree(cnn, img_fc, trend_gru, temp_lins, embs, sales_gru,
                   self_attn, adds, trend_linear, mm_embedder, dec_gru,
                   decoder_fc):
        rn = _backbone_variables(cnn)
        return rn, {
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
        }

    def shadow_adds(a):
        return {k: tuple(_grad_shadow(l) for l in v) for k, v in a.items()}

    rn, params = param_tree(cnn, img_fc, trend_gru, temp_lins, embs,
                            sales_gru, self_attn, adds, trend_linear,
                            mm_embedder, dec_gru, decoder_fc)
    _, want_grads = param_tree(
        _grad_shadow(cnn), _grad_shadow(img_fc), _grad_shadow(trend_gru),
        [_grad_shadow(l) for l in temp_lins], [_grad_shadow(e) for e in embs],
        _grad_shadow(sales_gru), _grad_shadow(self_attn), shadow_adds(adds),
        _grad_shadow(trend_linear), _grad_shadow(mm_embedder),
        _grad_shadow(dec_gru), _grad_shadow(decoder_fc))

    variables = jax.tree_util.tree_map(jnp.asarray, {
        "params": params,
        "batch_stats": {"static": {"image_encoder": {
            "backbone": rn["batch_stats"]}}}})
    model = build("cross_attn_rnn_210", vocab=VOCAB, out_len=T,
                  attention_dim=E, embedding_dim=E, hidden_dim=E,
                  image_arch="tiny", use_teacher_forcing=False)

    def loss_fn(p):
        pred, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            batch, train=False)
        return jnp.mean((pred - jnp.asarray(target.numpy())) ** 2)

    j_loss, j_grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-5)

    flat_want = {jax.tree_util.keystr(k): v for k, v in
                 jax.tree_util.tree_leaves_with_path(want_grads)}
    flat_got = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(j_grads)}
    assert set(flat_want) == set(flat_got)
    for k in sorted(flat_want):
        np.testing.assert_allclose(
            np.asarray(flat_got[k]), np.asarray(flat_want[k]),
            atol=5e-5, rtol=1e-3, err_msg=k)


def test_cross_attn_rnn_210_teacher_forced_gradient(monkeypatch):
    """Backward parity through the TEACHER-FORCED scan: coins forced
    deterministic (ratio=1.0 -> Bernoulli always true), so every decode step
    consumes the ground-truth sale and the TF branch of the ``jnp.where``
    input-select carries the gradient cut (``CrossAttnRNN210.py:216-225``).
    TF only activates in train mode, which would also enable dropout; the
    test neutralizes dropout on both sides (flax ``nn.Dropout`` -> identity,
    MHA prob-dropout -> deterministic; torch modules stay ``.eval()``) and
    drops the image branch (``use_img=False``) so no train-mode BatchNorm
    is involved — the scheduled-sampling wiring is the subject here."""
    import flax.linen as fnn

    from tests.test_whole_model_golden import _additive, _additive_params
    from tests.torch_ref import mha_params
    from visuelle2_tpu.ops import attention as attention_mod

    # Neutralize dropout deterministically on the jax side.
    monkeypatch.setattr(
        fnn.Dropout, "__call__",
        lambda self, inputs, deterministic=True, rng=None: inputs)
    orig_dot = attention_mod._dot_attention
    monkeypatch.setattr(
        attention_mod, "_dot_attention",
        lambda q, k, v, *, scale, mask=None, dropout_rate=0.0,
        deterministic=True, dropout_rng=None:
        orig_dot(q, k, v, scale=scale, mask=mask, dropout_rate=0.0,
                 deterministic=True))

    torch.manual_seed(61)
    n, W, T = 4, 1, 10
    batch = _batch(n=n, windows=W, horizon=T, seed=37)

    trend_gru = torch.nn.GRU(3, E, batch_first=True)
    temp_lins = [torch.nn.Linear(1, E) for _ in range(4)]
    embs = [torch.nn.Embedding(v, E)
            for v in (VOCAB.num_cat, VOCAB.num_col, VOCAB.num_fab,
                      VOCAB.num_store)]
    sales_gru = torch.nn.GRU(1, E, batch_first=True)
    self_attn = torch.nn.MultiheadAttention(E, 4, dropout=0.1).eval()
    adds = {k: (torch.nn.Linear(E, E, bias=False),
                torch.nn.Linear(E, E, bias=False),
                torch.nn.Linear(E, 1)) for k in ("ts", "mm")}
    trend_linear = torch.nn.Linear(52 * E, E)
    mm_embedder = torch.nn.Linear(E, E)
    dec_gru = torch.nn.GRU(E + 1, E, batch_first=True)
    decoder_fc = torch.nn.Linear(E, 1)

    # ---- torch: decode loop with ground truth fed at EVERY step.
    X = torch.tensor(batch["X"]).reshape(n * W, 2, 1)
    y_flat = torch.tensor(batch["y"]).reshape(n * W, T)
    trend_enc = trend_gru(torch.tensor(batch["gtrends"]).permute(0, 2, 1))[0]
    dummy = sum(l(torch.tensor(batch["temporal"][:, i:i + 1]))
                for i, l in enumerate(temp_lins))
    attr = sum(e(torch.tensor(batch[k].astype(np.int64)))
               for e, k in zip(embs, ("cat", "col", "fab", "store")))
    trend_sa = self_attn(*([trend_enc.permute(1, 0, 2)] * 3))[0]
    trend_sa = trend_sa.permute(1, 0, 2)

    _, h = sales_gru(X)
    hidden = h.squeeze(0)
    dec_out = X[:, -1, :].unsqueeze(1)
    outs = []
    for t in range(T):
        a_tr, _ = _additive(*adds["ts"], trend_sa, hidden)
        a_tr = trend_linear(a_tr.reshape(n * W, -1))
        mm_in = torch.stack([dummy, attr, a_tr], dim=1)  # no img token
        a_mm, _ = _additive(*adds["mm"], mm_in, hidden)
        ctx = mm_embedder((mm_in + a_mm).sum(1))
        x = torch.cat([ctx.unsqueeze(1), dec_out], dim=2)
        out, h2 = dec_gru(x, hidden.unsqueeze(0))
        hidden = h2.squeeze(0)
        outs.append(decoder_fc(out)[:, 0, 0])
        # TF (coin true): next input is the ground-truth sale for step t.
        dec_out = y_flat[:, t].detach()[:, None, None]
    t_pred = torch.stack(outs, dim=1)

    t_loss = torch.nn.functional.mse_loss(t_pred, y_flat)
    t_loss.backward()

    temp_names = ("day", "week", "month", "year")

    def param_tree(trend_gru, temp_lins, embs, sales_gru, self_attn, adds,
                   trend_linear, mm_embedder, dec_gru, decoder_fc):
        return {
            "static": {
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
                    "ts_attention": _additive_params(*adds["ts"]),
                    "multimodal_attention": _additive_params(*adds["mm"]),
                    "trend_linear": linear_params(trend_linear),
                    "multimodal_embedder": linear_params(mm_embedder),
                },
                "decoder_cell": gru_params(dec_gru),
                "decoder_fc": linear_params(decoder_fc),
            },
        }

    def shadow_adds(a):
        return {k: tuple(_grad_shadow(l) for l in v) for k, v in a.items()}

    params = param_tree(trend_gru, temp_lins, embs, sales_gru, self_attn,
                        adds, trend_linear, mm_embedder, dec_gru, decoder_fc)
    want_grads = param_tree(
        _grad_shadow(trend_gru), [_grad_shadow(l) for l in temp_lins],
        [_grad_shadow(e) for e in embs], _grad_shadow(sales_gru),
        _grad_shadow(self_attn), shadow_adds(adds),
        _grad_shadow(trend_linear), _grad_shadow(mm_embedder),
        _grad_shadow(dec_gru), _grad_shadow(decoder_fc))

    variables = jax.tree_util.tree_map(jnp.asarray, {"params": params})
    model = build("cross_attn_rnn_210", vocab=VOCAB, out_len=T,
                  attention_dim=E, embedding_dim=E, hidden_dim=E,
                  use_img=False, image_arch="tiny",
                  use_teacher_forcing=True, teacher_forcing_ratio=1.0)

    def loss_fn(p):
        pred, _ = model.apply(
            {"params": p}, batch, train=True,
            rngs={"dropout": jax.random.key(0),
                  "sampling": jax.random.key(1)})
        return jnp.mean((pred - jnp.asarray(y_flat.numpy())) ** 2)

    j_loss, j_grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-5)

    flat_want = {jax.tree_util.keystr(k): v for k, v in
                 jax.tree_util.tree_leaves_with_path(want_grads)}
    flat_got = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(j_grads)}
    assert set(flat_want) == set(flat_got)
    for k in sorted(flat_want):
        np.testing.assert_allclose(
            np.asarray(flat_got[k]), np.asarray(flat_want[k]),
            atol=5e-5, rtol=1e-3, err_msg=k)


def test_gtm_v1_gradient_matches_torch_autograd():
    """Backward parity for gtm_v1's two structural one-offs: the FULLY
    frozen image tower (``GTM.py:155-175`` — ``stop_gradient`` in jax must
    equal requires_grad(False) in torch: exactly-zero backbone grads, with
    the pooled-feature path still feeding nonzero fusion grads) and the
    memory-only decoder layer without self-attention (``GTM.py:199-232``)."""
    from tests.test_whole_model_golden import _bn_params, _ln_params
    from tests.torch_ref import decoder_layer_params, encoder_layer_params

    torch.manual_seed(67)
    n = 4
    batch = _batch(n=n, demand=True, seed=41)
    rng = np.random.default_rng(43)
    batch["text_features"] = rng.standard_normal((n, 768)).astype(np.float32)

    cnn = _tiny_resnet().eval()
    cnn.requires_grad_(False)  # frozen tower: no backbone grads, like jax
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

    # ---- torch forward (grad-enabled) + backward.
    mask = torch.full((52, 52), float("-inf"))
    for i in range(0, 52, 4):  # gcd(52, 12) = 4 block mask
        mask[i:i + 4, i:i + 4] = 0.0
    g = gt_input(torch.tensor(batch["gtrends"]).permute(0, 2, 1))
    memory = g.permute(1, 0, 2) + pos[:, None, :]
    for layer in enc_layers_t:
        memory = layer(memory, src_mask=mask)

    feats = cnn(_normalized_images(batch["images"]))
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
    t_pred = decoder_fc(x[0]).reshape(n, 12)

    target = torch.tensor(batch["ts"])
    t_loss = torch.nn.functional.mse_loss(t_pred, target)
    t_loss.backward()

    from tests.torch_ref import mha_params

    def param_tree(cnn, text_fc, dummy_lins, dummy_fusion, gt_input,
                   enc_layers_t, img_linear, fus_bn, fus_fc1, fus_fc2,
                   dec_ca, dec_l1, dec_l2, dec_n2, dec_n3, decoder_fc):
        rn = _backbone_variables(cnn)
        return rn, {
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
        }

    mods = (cnn, text_fc, dummy_lins, dummy_fusion, gt_input, enc_layers_t,
            img_linear, fus_bn, fus_fc1, fus_fc2, dec_ca, dec_l1, dec_l2,
            dec_n2, dec_n3, decoder_fc)
    rn, params = param_tree(*mods)
    shadow = tuple(
        [_grad_shadow(x) for x in m] if isinstance(m, list)
        else _grad_shadow(m) for m in mods)
    _, want_grads = param_tree(*shadow)

    variables = jax.tree_util.tree_map(jnp.asarray, {
        "params": params,
        "batch_stats": {
            "image_encoder": {"backbone": rn["batch_stats"]},
            "static_feature_encoder": {"bn": _bn_params(fus_bn)[1]},
        }})

    from visuelle2_tpu.models.gtm_v1 import GTMv1

    model = GTMv1(embedding_dim=E, hidden_dim=E, output_len=12,
                  image_arch="tiny")

    def loss_fn(p):
        pred, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            batch, train=False)
        return jnp.mean((pred - jnp.asarray(batch["ts"])) ** 2)

    j_loss, j_grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-5)

    flat_want = {jax.tree_util.keystr(k): v for k, v in
                 jax.tree_util.tree_leaves_with_path(want_grads)}
    flat_got = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(j_grads)}
    assert set(flat_want) == set(flat_got)
    # The frozen tower must contribute EXACTLY zero gradient (stop_gradient
    # vs requires_grad(False)), not merely matching small values.
    bb = [k for k in flat_got if "backbone" in k]
    assert bb and all(not np.any(np.asarray(flat_got[k])) for k in bb)
    for k in sorted(flat_want):
        np.testing.assert_allclose(
            np.asarray(flat_got[k]), np.asarray(flat_want[k]),
            atol=5e-5, rtol=1e-3, err_msg=k)


def test_gated_v2_gradient_matches_torch_autograd():
    """Backward parity for the hand-rolled gated attention: jax.grad
    through HeadSpecificGatedAttention (encoder) and
    PureGatedMultiheadAttention (decoder cross-attn) — sigmoid gates on
    q-heads / concat output with the +2.0 bias init
    (``Proposed_model_v2.py:546-602,643-690``) — vs torch autograd."""
    from tests.test_whole_model_golden import (
        _TorchPureGatedMHA,
        _gated_mha_params,
    )
    from tests.torch_ref import mha_params

    torch.manual_seed(47)
    n = 4
    batch = _batch(n=n, demand=True, seed=21)

    cnn = _tiny_resnet().eval()
    projection = torch.nn.Conv2d(2048, E, 1)
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

    # ---- torch forward (grad-enabled) + backward.
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
    t_pred = decoder_fc(tgt).transpose(0, 1).reshape(n, 12)

    target = torch.tensor(batch["ts"])
    t_loss = torch.nn.functional.mse_loss(t_pred, target)
    t_loss.backward()

    def _ln(m):
        return {"scale": t2n(m.weight), "bias": t2n(m.bias)}

    def param_tree(cnn, projection, embs, sales_gru, dummy_lins,
                   dummy_fusion, gt_input, enc_sa, enc_norm, enc_ff,
                   gate_fc, fusion_fc, dec_sa, dec_ca, dec_norm, dec_ff,
                   decoder_fc):
        rn = _backbone_variables(cnn)
        enc_layers = {}
        for i, (sa, (n1, n2), (l1, l2)) in enumerate(
                zip(enc_sa, enc_norm, enc_ff)):
            enc_layers[f"layer{i}"] = {
                "self_attn": _gated_mha_params(sa),
                "ffn": {"linear1": linear_params(l1),
                        "linear2": linear_params(l2)},
                "norm1": _ln(n1), "norm2": _ln(n2),
            }
        return rn, {
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
                "norm1": _ln(dec_norm[0]), "norm2": _ln(dec_norm[1]),
                "norm3": _ln(dec_norm[2]),
            }},
            "decoder_fc": linear_params(decoder_fc),
        }

    mods = (cnn, projection, embs, sales_gru, dummy_lins, dummy_fusion,
            gt_input, enc_sa, enc_norm, enc_ff, gate_fc, fusion_fc, dec_sa,
            dec_ca, dec_norm, dec_ff, decoder_fc)
    rn, params = param_tree(*mods)

    def shadow(m):
        if isinstance(m, (list, tuple)):
            return type(m)(shadow(x) for x in m)
        return _grad_shadow(m)

    _, want_grads = param_tree(*(shadow(m) for m in mods))

    variables = jax.tree_util.tree_map(jnp.asarray, {
        "params": params,
        "batch_stats": {"image_encoder": {"backbone": rn["batch_stats"]}}})
    model = build("gated_v2", vocab=VOCAB, output_len=12,
                  embedding_dim=E, hidden_dim=E, image_arch="tiny")

    def loss_fn(p):
        pred, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            batch, train=False)
        return jnp.mean((pred - jnp.asarray(batch["ts"])) ** 2)

    j_loss, j_grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-5)

    flat_want = {jax.tree_util.keystr(k): v for k, v in
                 jax.tree_util.tree_leaves_with_path(want_grads)}
    flat_got = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(j_grads)}
    assert set(flat_want) == set(flat_got)
    for k in sorted(flat_want):
        np.testing.assert_allclose(
            np.asarray(flat_got[k]), np.asarray(flat_want[k]),
            atol=5e-5, rtol=1e-3, err_msg=k)


import pytest


@pytest.mark.parametrize("variant", ["gtm", "m4ft", "gated_v1", "gated_v3"])
def test_seq2seq_variant_gradients_match_torch_autograd(variant):
    """Backward parity for the remaining GTM-family variants: BN concat
    fusion (gtm), hierarchical BN FusionBlocks (m4ft), R-GFN gated residual
    blocks + gated cross-attn decoder (gated_v1), TARG context gates
    (gated_v3) — torch loss.backward() vs jax.grad, every parameter."""
    from tests.test_whole_model_golden import (
        _TorchFusionBlock,
        _bn_params,
        _ln_params,
    )
    from tests.torch_ref import mha_params

    torch.manual_seed(53)
    n = 4
    batch = _batch(n=n, demand=True, seed=29)
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
    temp_proj = torch.nn.Linear(4 * E, E)
    gt_input = torch.nn.Linear(3, E)
    enc_layers_t = [torch.nn.TransformerEncoderLayer(E, 4, dropout=0.2).eval()
                    for _ in range(2)]
    dec_layer = torch.nn.TransformerDecoderLayer(
        E, 4, dim_feedforward=4 * E, dropout=0.1).eval()
    decoder_fc = torch.nn.Linear(E, 12)

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
    else:  # gated_v3
        g1 = torch.nn.Linear(2 * E, E)
        g2 = torch.nn.Linear(2 * E, E)
        final_block = _TorchFusionBlock(E)

    pos = torch.zeros(52, E)
    position = torch.arange(0, 52, dtype=torch.float).unsqueeze(1)
    div = torch.exp(torch.arange(0, E, 2).float() * (-np.log(10000.0) / E))
    pos[:, 0::2] = torch.sin(position * div)
    pos[:, 1::2] = torch.cos(position * div)

    # ---- torch forward (grad-enabled) + backward.
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
        else:
            gate1 = torch.sigmoid(g1(torch.cat([e_text, e_vis], 1)))
            gate2 = torch.sigmoid(g2(torch.cat([e_text, e_temp], 1)))
            ctx = final_block(e_text + e_vis * gate1 + e_temp * gate2)
    else:
        text_flat = e_stack.reshape(n, -1)
        if variant == "gtm":
            cat_f = torch.cat([img_pooled, text_flat, e_temp], 1)
            ctx = fus_fc2(torch.relu(fus_fc1(fus_bn(cat_f))))
        else:
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
    t_pred = decoder_fc(out).transpose(0, 1).reshape(n, 12)

    target = torch.tensor(batch["ts"])
    t_loss = torch.nn.functional.mse_loss(t_pred, target)
    t_loss.backward()

    # ---- one param-tree builder applied to the live modules (weights) and
    # to grad-shadows (expected gradients).
    def param_tree(T):
        rn = _backbone_variables(T(cnn))
        img_params = {"backbone": rn["params"],
                      "projection": {"kernel": np.transpose(
                          t2n(T(projection).weight), (2, 3, 1, 0)),
                          "bias": t2n(T(projection).bias)}}
        if m4ft_style:
            img_params["final_proj"] = linear_params(T(final_proj))
            text_params = dict({nm: _embedding_params(T(e)) for nm, e in
                                zip(("cat", "col", "fab", "store"), embs)},
                               proj=linear_params(T(text_proj)))
            temp_params = dict({nm: linear_params(T(l)) for nm, l in
                                zip(("day", "week", "month", "year"),
                                    temp_lins)},
                               proj=linear_params(T(temp_proj)))
            temp_key = "temporal_encoder"
        else:
            text_params = {nm: _embedding_params(T(e)) for nm, e in
                           zip(("cat", "col", "fab", "store"), embs)}
            temp_params = dict({nm: linear_params(T(l)) for nm, l in
                                zip(("day", "week", "month", "year"),
                                    temp_lins)},
                               fusion=linear_params(T(temp_proj)))
            temp_key = "dummy_encoder"

        if variant == "gtm":
            bn_p, _bn_s = _bn_params(T(fus_bn))
            fusion_params = {"bn": bn_p, "fc1": linear_params(T(fus_fc1)),
                             "fc2": linear_params(T(fus_fc2))}
        elif variant == "m4ft":
            fusion_params = {k: T(blk).params()[0]
                             for k, blk in blocks.items()}
        elif variant == "gated_v1":
            fusion_params = {k: {"gate_fc": linear_params(T(fc)),
                                 "norm": _ln_params(T(norm))}
                             for k, (fc, norm) in gates.items()}
            fusion_params["fusion_fc"] = linear_params(T(fus_fc))
        else:
            fusion_params = {"gate_fc1": linear_params(T(g1)),
                             "gate_fc2": linear_params(T(g2)),
                             "fusion_final": T(final_block).params()[0]}

        if variant == "gated_v1":
            dec_params = {"layer0": {
                "self_attn": mha_params(T(v1_sa)),
                "cross_attn": {"mha": mha_params(T(v1_ca_mha)),
                               "gate_proj": linear_params(T(v1_gate))},
                "ffn": {"linear1": linear_params(T(v1_ff[0])),
                        "linear2": linear_params(T(v1_ff[1]))},
                "norm1": _ln_params(T(v1_norm[0])),
                "norm2": _ln_params(T(v1_norm[1])),
                "norm3": _ln_params(T(v1_norm[2])),
            }}
        else:
            dec_params = {"layer0": decoder_layer_params(T(dec_layer))}

        return rn, {
            "gtrend_encoder": {
                "input_linear": linear_params(T(gt_input)),
                "encoder": {f"layer{i}": encoder_layer_params(T(l))
                            for i, l in enumerate(enc_layers_t)},
            },
            "text_encoder": text_params,
            "image_encoder": img_params,
            temp_key: temp_params,
            "sales_encoder": {"gru": gru_params(T(sales_gru))},
            "fusion": fusion_params,
            "decoder": dec_params,
            "decoder_fc": linear_params(T(decoder_fc)),
        }

    rn, params = param_tree(lambda m: m)
    _, want_grads = param_tree(_grad_shadow)

    batch_stats = {"image_encoder": {"backbone": rn["batch_stats"]}}
    if variant == "gtm":
        batch_stats["fusion"] = {"bn": _bn_params(fus_bn)[1]}
    elif variant == "m4ft":
        batch_stats["fusion"] = {k: blk.params()[1]
                                 for k, blk in blocks.items()}
    elif variant == "gated_v3":
        batch_stats["fusion"] = {"fusion_final": final_block.params()[1]}
    variables = jax.tree_util.tree_map(
        jnp.asarray, {"params": params, "batch_stats": batch_stats})

    model = build(variant, vocab=VOCAB, output_len=12,
                  embedding_dim=E, hidden_dim=E, image_arch="tiny")

    def loss_fn(p):
        pred, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            batch, train=False)
        return jnp.mean((pred - jnp.asarray(batch["ts"])) ** 2)

    j_loss, j_grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    # gated_v1 accumulates ~4e-5 relative loss noise through the gated
    # cross-attention (forward goldens tolerate 1e-4 per element).
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-4)

    flat_want = {jax.tree_util.keystr(k): v for k, v in
                 jax.tree_util.tree_leaves_with_path(want_grads)}
    flat_got = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(j_grads)}
    assert set(flat_want) == set(flat_got)
    # gated_v1's sigmoid-gated residual/cross-attn chains carry the most
    # f32 forward noise (see loss rtol above); its gradients inherit it.
    atol = 2e-4 if variant == "gated_v1" else 5e-5
    for k in sorted(flat_want):
        np.testing.assert_allclose(
            np.asarray(flat_got[k]), np.asarray(flat_want[k]),
            atol=atol, rtol=1e-3, err_msg=k)
