"""ResNet-v1 backbone (ResNet-50/101) in flax, NHWC, torchvision-compatible.

The reference takes ``torchvision.models.resnet101(pretrained=True)`` minus
avgpool/fc as a patch extractor (``/root/reference/models/CrossAttnRNN21.py:61``,
``GTM_Visuelle2.py:113``), freezing everything except the last two stages
(``children()[6:]`` = layer3, layer4 — ``CrossAttnRNN21.py:63-65``).

TPU notes:

* NHWC layout (XLA's native conv layout on TPU) with channels-last BatchNorm.
* Returns the final feature map ``[B, H/32, W/32, C_out]`` — callers choose
  patch-flatten (CrossAttnRNN) or 1x1-project + global-pool (GTM/M4FT).
* ``frozen_stages`` reproduces the reference's finetune split via a parameter
  label tree (see :func:`trainable_mask`): gradients flow only into layer3,
  layer4 and the head, while BatchNorm *statistics* still update everywhere in
  train mode — exactly torch's ``requires_grad=False`` + ``module.train()``
  behaviour.
* ``param_dtype`` stays float32; ``dtype`` may be bfloat16 for MXU throughput.

``params_from_torch`` converts a torchvision ``state_dict`` (pretrained or
otherwise) into this module's pytree; golden tests validate the conversion
against torch outputs with random weights.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

STAGE_BLOCKS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    # One bottleneck per stage: same code paths/strides/channels at toy cost,
    # for tests and CPU smoke runs.
    "tiny": (1, 1, 1, 1),
}


class BatchNorm(nn.Module):
    """torch-semantics BatchNorm2d (momentum 0.1) over NHWC."""

    features: int
    dtype: Any = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, *, use_running_average: bool = True):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            mean = x32.mean(axis=(0, 1, 2))
            var = x32.var(axis=(0, 1, 2))
            if not self.is_initializing():
                momentum = 0.1
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = (1 - momentum) * ra_mean.value + momentum * mean
                ra_var.value = (1 - momentum) * ra_var.value + momentum * unbiased
        inv = jnp.asarray(scale, self.dtype) * jnp.asarray(
            1.0 / jnp.sqrt(var + self.eps), self.dtype)
        return x * inv + jnp.asarray(bias - mean * scale / jnp.sqrt(var + self.eps),
                                     self.dtype)


def _conv(features, kernel, stride, name, dtype):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(kernel // 2, kernel // 2)] * 2, use_bias=False,
                   dtype=dtype, name=name)


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 → 3x3(stride) → 1x1(×4) + downsample."""

    features: int  # bottleneck width; output is 4×
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = not train
        out = _conv(self.features, 1, 1, "conv1", self.dtype)(x)
        out = BatchNorm(self.features, self.dtype, name="bn1")(out, use_running_average=ura)
        out = nn.relu(out)
        out = _conv(self.features, 3, self.stride, "conv2", self.dtype)(out)
        out = BatchNorm(self.features, self.dtype, name="bn2")(out, use_running_average=ura)
        out = nn.relu(out)
        out = _conv(self.features * 4, 1, 1, "conv3", self.dtype)(out)
        out = BatchNorm(self.features * 4, self.dtype, name="bn3")(out, use_running_average=ura)
        if self.downsample:
            sc = _conv(self.features * 4, 1, self.stride, "ds_conv", self.dtype)(x)
            sc = BatchNorm(self.features * 4, self.dtype, name="ds_bn")(sc, use_running_average=ura)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNetBackbone(nn.Module):
    """conv1..layer4 of torchvision ResNet (children()[:-2] equivalent).

    Input NHWC float; output [B, H/32, W/32, 2048].
    """

    blocks: Sequence[int] = STAGE_BLOCKS["resnet101"]
    dtype: Any = jnp.float32
    # Rematerialize each bottleneck on backward: trades FLOPs for HBM, letting
    # large train batches fit (jax.checkpoint; no effect on inference).
    remat: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        ura = not train
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(64, self.dtype, name="bn1")(x, use_running_average=ura)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        widths = (64, 128, 256, 512)
        block_cls = nn.remat(Bottleneck, static_argnums=(2,)) if self.remat else Bottleneck
        for stage, (n_blocks, w) in enumerate(zip(self.blocks, widths)):
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = block_cls(w, stride=stride, downsample=(b == 0),
                              dtype=self.dtype,
                              name=f"layer{stage + 1}_{b}")(x, train)
        return x


# The reference freeze split (finetune layer3/layer4 only,
# CrossAttnRNN21.py:63-65) is applied by the optimizer — see
# visuelle2_tpu.train.optim.partition_trainable.

# --------------------------------------------------------------------------
# torchvision state_dict conversion
# --------------------------------------------------------------------------

def _cv(w):
    """torch conv weight [O, I, kh, kw] -> flax [kh, kw, I, O]."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _bn(sd, prefix):
    return (
        {"scale": np.asarray(sd[prefix + ".weight"]),
         "bias": np.asarray(sd[prefix + ".bias"])},
        {"mean": np.asarray(sd[prefix + ".running_mean"]),
         "var": np.asarray(sd[prefix + ".running_var"])},
    )


def params_from_torch(state_dict, arch: str = "resnet101"):
    """torchvision resnet state_dict -> {'params': ..., 'batch_stats': ...}."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in state_dict.items()}
    params: Dict = {"conv1": {"kernel": _cv(sd["conv1.weight"])}}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")

    for stage, n_blocks in enumerate(STAGE_BLOCKS[arch]):
        for b in range(n_blocks):
            t = f"layer{stage + 1}.{b}"
            o = f"layer{stage + 1}_{b}"
            p: Dict = {}
            s: Dict = {}
            for i in (1, 2, 3):
                p[f"conv{i}"] = {"kernel": _cv(sd[f"{t}.conv{i}.weight"])}
                p[f"bn{i}"], s[f"bn{i}"] = _bn(sd, f"{t}.bn{i}")
            if f"{t}.downsample.0.weight" in sd:
                p["ds_conv"] = {"kernel": _cv(sd[f"{t}.downsample.0.weight"])}
                p["ds_bn"], s["ds_bn"] = _bn(sd, f"{t}.downsample.1")
            params[o] = p
            stats[o] = s
    return {"params": params, "batch_stats": stats}
