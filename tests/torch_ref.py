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


# ---------------------------------------------------------------------------
# Hand-built torch InceptionV3 with torchvision's exact module/attribute
# naming (torchvision is not installed here), so state_dict() keys match what
# `inception_params_from_torch` expects.  Structure per torchvision
# `inception_v3(aux_logits=False)`; backs the reference's legacy encoder
# (/root/reference/models/modules.py:65-94).
# ---------------------------------------------------------------------------

class TorchBasicConv2d(torch.nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = torch.nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return torch.nn.functional.relu(self.bn(self.conv(x)))


class TorchInceptionA(torch.nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TorchBasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = TorchBasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = TorchBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TorchBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TorchBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TorchBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TorchBasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        p = torch.nn.functional.avg_pool2d(x, 3, stride=1, padding=1)
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(p)], 1)


class TorchInceptionB(torch.nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TorchBasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TorchBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TorchBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TorchBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            torch.nn.functional.max_pool2d(x, 3, stride=2)], 1)


class TorchInceptionC(torch.nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TorchBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = TorchBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = TorchBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TorchBasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TorchBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TorchBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TorchBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TorchBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TorchBasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TorchBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        p = torch.nn.functional.avg_pool2d(x, 3, stride=1, padding=1)
        return torch.cat([self.branch1x1(x), b7, bd, self.branch_pool(p)], 1)


class TorchInceptionD(torch.nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TorchBasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = TorchBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TorchBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TorchBasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TorchBasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TorchBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3, self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)), b7,
            torch.nn.functional.max_pool2d(x, 3, stride=2)], 1)


class TorchInceptionE(torch.nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = TorchBasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = TorchBasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = TorchBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TorchBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TorchBasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TorchBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TorchBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TorchBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TorchBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        p = torch.nn.functional.avg_pool2d(x, 3, stride=1, padding=1)
        return torch.cat([self.branch1x1(x), b3, bd, self.branch_pool(p)], 1)


class TorchInception3(torch.nn.Module):
    """Backbone only (stem + Mixed_5b..7c), matching
    visuelle2_tpu.models.inception.InceptionV3Backbone."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TorchBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TorchBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TorchBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TorchBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TorchBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TorchInceptionA(192, 32)
        self.Mixed_5c = TorchInceptionA(256, 64)
        self.Mixed_5d = TorchInceptionA(288, 64)
        self.Mixed_6a = TorchInceptionB(288)
        self.Mixed_6b = TorchInceptionC(768, 128)
        self.Mixed_6c = TorchInceptionC(768, 160)
        self.Mixed_6d = TorchInceptionC(768, 160)
        self.Mixed_6e = TorchInceptionC(768, 192)
        self.Mixed_7a = TorchInceptionD(768)
        self.Mixed_7b = TorchInceptionE(1280)
        self.Mixed_7c = TorchInceptionE(2048)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = torch.nn.functional.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = torch.nn.functional.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return x
