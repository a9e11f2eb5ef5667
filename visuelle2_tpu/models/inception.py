"""InceptionV3 backbone in flax, NHWC, torchvision-compatible.

Backs the legacy ``modules.py`` ImageEncoder
(``/root/reference/models/modules.py:65-94``), which feeds 299x299 images
through ``torchvision.models.inception_v3`` (avgpool/dropout/fc replaced by
Identity) to get an 8x8x2048 map reshaped to 64 patch tokens.

Structure mirrors torchvision ``inception_v3(aux_logits=False,
transform_input=False)``: BasicConv2d = conv(bias=False) + BN(eps=1e-3) +
ReLU; stem then Mixed_5b..7c.  ``inception_params_from_torch`` converts a
torchvision state_dict.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from visuelle2_tpu.models.resnet import BatchNorm


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train=False):
        x = nn.Conv(self.features, self.kernel,
                    strides=(self.stride, self.stride),
                    padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = BatchNorm(self.features, self.dtype, eps=1e-3, name="bn")(
            x, use_running_average=not train)
        return nn.relu(x)


def _avgpool3(x):
    # torch AvgPool2d(3, stride=1, padding=1), count_include_pad=True
    s = nn.pool(x, 0.0, jnp.add, (3, 3), (1, 1), [(1, 1), (1, 1)])
    return s / 9.0


def _maxpool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train=False):
        d = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=d, name="branch1x1")(x, train=train)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name="branch5x5_1")(x, train=train)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=d, name="branch5x5_2")(b5, train=train)
        b3 = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train=train)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(b3, train=train)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_3")(b3, train=train)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=d, name="branch_pool")(
            _avgpool3(x), train=train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train=False):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), stride=2, dtype=d, name="branch3x3")(x, train=train)
        bd = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train=train)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(bd, train=train)
        bd = BasicConv2d(96, (3, 3), stride=2, dtype=d, name="branch3x3dbl_3")(bd, train=train)
        return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train=False):
        d, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=d, name="branch1x1")(x, train=train)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7_1")(x, train=train)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7_2")(b7, train=train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7_3")(b7, train=train)
        bd = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x, train=train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_2")(bd, train=train)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_3")(bd, train=train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_4")(bd, train=train)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_5")(bd, train=train)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(_avgpool3(x), train=train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train=False):
        d = self.dtype
        b3 = BasicConv2d(192, (1, 1), dtype=d, name="branch3x3_1")(x, train=train)
        b3 = BasicConv2d(320, (3, 3), stride=2, dtype=d, name="branch3x3_2")(b3, train=train)
        b7 = BasicConv2d(192, (1, 1), dtype=d, name="branch7x7x3_1")(x, train=train)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7x3_2")(b7, train=train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7x3_3")(b7, train=train)
        b7 = BasicConv2d(192, (3, 3), stride=2, dtype=d, name="branch7x7x3_4")(b7, train=train)
        return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train=False):
        d = self.dtype
        b1 = BasicConv2d(320, (1, 1), dtype=d, name="branch1x1")(x, train=train)
        b3 = BasicConv2d(384, (1, 1), dtype=d, name="branch3x3_1")(x, train=train)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3_2a")(b3, train=train),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3_2b")(b3, train=train),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train=train)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(bd, train=train)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3dbl_3a")(bd, train=train),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3dbl_3b")(bd, train=train),
        ], axis=-1)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(_avgpool3(x), train=train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Backbone(nn.Module):
    """Stem + Mixed_5b..7c; input NHWC (299x299 -> [B, 8, 8, 2048])."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train=False):
        d = self.dtype
        x = BasicConv2d(32, (3, 3), stride=2, dtype=d, name="Conv2d_1a_3x3")(x, train=train)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x, train=train)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=d, name="Conv2d_2b_3x3")(x, train=train)
        x = _maxpool3s2(x)
        x = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x, train=train)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x, train=train)
        x = _maxpool3s2(x)
        x = InceptionA(32, dtype=d, name="Mixed_5b")(x, train=train)
        x = InceptionA(64, dtype=d, name="Mixed_5c")(x, train=train)
        x = InceptionA(64, dtype=d, name="Mixed_5d")(x, train=train)
        x = InceptionB(dtype=d, name="Mixed_6a")(x, train=train)
        x = InceptionC(128, dtype=d, name="Mixed_6b")(x, train=train)
        x = InceptionC(160, dtype=d, name="Mixed_6c")(x, train=train)
        x = InceptionC(160, dtype=d, name="Mixed_6d")(x, train=train)
        x = InceptionC(192, dtype=d, name="Mixed_6e")(x, train=train)
        x = InceptionD(dtype=d, name="Mixed_7a")(x, train=train)
        x = InceptionE(dtype=d, name="Mixed_7b")(x, train=train)
        x = InceptionE(dtype=d, name="Mixed_7c")(x, train=train)
        return x


def inception_params_from_torch(state_dict):
    """torchvision inception_v3 state_dict -> {'params', 'batch_stats'}
    (BasicConv2d leaves: conv.weight + bn.{weight,bias,running_*})."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for key in sd:
        if not key.endswith("conv.weight"):
            continue
        if key.startswith("AuxLogits."):
            # torchvision's pretrained inception_v3 ships with aux_logits
            # classifier convs; the backbone (this module) has no AuxLogits
            # subtree, so leaking them would make every splice reject the
            # artifact on a structure mismatch.
            continue
        prefix = key[: -len(".conv.weight")]  # e.g. Mixed_5b.branch1x1
        path = prefix.split(".")
        put(params, path + ["conv", "kernel"],
            np.transpose(sd[f"{prefix}.conv.weight"], (2, 3, 1, 0)))
        put(params, path + ["bn", "scale"], sd[f"{prefix}.bn.weight"])
        put(params, path + ["bn", "bias"], sd[f"{prefix}.bn.bias"])
        put(stats, path + ["bn", "mean"], sd[f"{prefix}.bn.running_mean"])
        put(stats, path + ["bn", "var"], sd[f"{prefix}.bn.running_var"])
    return {"params": params, "batch_stats": stats}
