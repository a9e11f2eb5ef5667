"""w8a8 int8 serving engine for the ResNet backbone.

Why this exists (measured on the TPU v5 lite, round 4): the serve-time
model is the backbone (29.18 of 29.79 ms/batch — docs/backbone_iso_r4.json)
and the backbone's early-stage 1x1 convs are traffic-bound, not
compute-bound: int8 operands double their throughput (48.1 -> 94.5 and
94.2 -> 182.0 TF/s on the two worst shapes, docs/convfloor_r4.json) while
f32 runs at bf16 wall time.  Weight-only int8 (eval/export.py) buys
artifact size but zero runtime on these shapes because the traffic is
ACTIVATIONS (a 369 MB stage-1 input vs 32 KB of weights) — so this module
keeps the whole residual skeleton in the int8 domain: every inter-op
tensor between the stem and the final feature map is a per-tensor-scaled
int8 array, convs run int8 x int8 -> int32 on the MXU, and the
BN-fold + ReLU + requantize epilogue fuses into each conv's output.

Quantization scheme (standard TFLite-style static symmetric):

* weights   — per-output-channel symmetric int8 (exactly the scheme the
  weight-only exporter uses), BN folded into the epilogue affine;
* activations — per-tensor symmetric int8 with scales calibrated by one
  float forward pass over calibration batches (absmax); post-ReLU
  tensors use the non-negative half [0, 127] (ReLU becomes the
  requantize clamp, free);
* residual adds — performed in f32 epilogue units of the BLOCK OUTPUT
  scale and re-quantized once, so a non-downsample bottleneck reads its
  input twice (conv1 + shortcut) and writes its output once, all int8 —
  exactly half the bf16 path's bytes.

This is an EVAL/SERVING path only: training, checkpoints, and the
default forecast path stay bf16/f32, and the engine consumes the
unmodified float parameter tree (quantization happens inside the jitted
function, so it constant-folds at export and hoists out of benchmark
scans).  Reference parity context: the backbone reproduces torchvision
resnet50/101 eval semantics used at /root/reference/models/
CrossAttnRNN21.py:61 and GTM_Visuelle2.py:113; the reference has no
quantized serving path (this is a TPU-native addition, gated behind
``--quantize w8a8``).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from visuelle2_tpu.models.resnet import ResNetBackbone

_EPS = 1e-5  # torch BatchNorm2d default, matches resnet.BatchNorm
_DN = ("NHWC", "HWIO", "NHWC")

# Measured win region of this engine vs the bf16 path (TPU v5 lite, r4,
# docs/perf_dedup_series.json): 1.18x at image-duplication d=1, 1.05x at
# d=4, 0.81x at d=10.  Image dedup shrinks exactly the byte-bound
# early-stage activations the int8 traffic win lives on, until the convs
# stop being byte-bound and the requantize epilogue chain is pure overhead.
# ``--quantize auto`` therefore picks w8a8 only at or below this measured
# duplication factor; above it the float path is faster.
W8A8_AUTO_MAX_DUPLICATION = 4.0


def resolve_auto_mode(*, duplication: float,
                      has_resnet_backbone: bool) -> str:
    """The concrete engine ``--quantize auto`` resolves to: "w8a8" or "".

    ``duplication`` is the static per-batch image-duplication factor
    (batch rows / unique-image slots; 1.0 without dedup).  Pure policy —
    the thresholds are the measured crossover above, so callers never
    re-litigate the roofline at serve time.
    """
    if not has_resnet_backbone:
        return ""
    return "w8a8" if duplication <= W8A8_AUTO_MAX_DUPLICATION else ""


def _block_specs(blocks: Sequence[int]):
    """(name, width, stride, downsample) for every bottleneck, in order."""
    widths = (64, 128, 256, 512)
    for stage, (n_blocks, w) in enumerate(zip(blocks, widths)):
        for b in range(n_blocks):
            yield (f"layer{stage + 1}_{b}", w,
                   2 if (stage > 0 and b == 0) else 1, b == 0)


def _conv(x, w, stride: int, pad: int, ptype=None):
    return lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=_DN, preferred_element_type=ptype)


def _affine(bn_params, bn_stats):
    """Fold eval-mode BatchNorm into y = x*a + b (f32)."""
    a = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + _EPS)
    return a, bn_params["bias"] - bn_stats["mean"] * a


# ---------------------------------------------------------------------------
# Float reference forward (also the calibration pass)
# ---------------------------------------------------------------------------

def float_forward(variables, x, blocks: Sequence[int],
                  record: Optional[Dict[str, Any]] = None):
    """f32 eval forward identical to ResNetBackbone(train=False).

    With ``record`` (a dict), also stores the absmax of every tensor the
    int8 path will quantize, keyed by the scale names ``prepare`` expects.
    """
    p, st = variables["params"], variables["batch_stats"]

    def rec(name, t):
        if record is not None:
            m = jnp.max(jnp.abs(t))
            record[name] = jnp.maximum(record.get(name, 0.0), m)

    x = x.astype(jnp.float32)
    rec("input", x)
    a, b = _affine(p["bn1"], st["bn1"])
    y = nn.relu(_conv(x, p["conv1"]["kernel"].astype(jnp.float32), 2, 3) * a + b)
    y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    rec("stem", y)
    for name, _w, stride, ds in _block_specs(blocks):
        bp, bs = p[name], st[name]
        a1, b1 = _affine(bp["bn1"], bs["bn1"])
        h1 = nn.relu(_conv(y, bp["conv1"]["kernel"].astype(jnp.float32), 1, 0) * a1 + b1)
        rec(f"{name}.h1", h1)
        a2, b2 = _affine(bp["bn2"], bs["bn2"])
        h2 = nn.relu(_conv(h1, bp["conv2"]["kernel"].astype(jnp.float32), stride, 1) * a2 + b2)
        rec(f"{name}.h2", h2)
        a3, b3 = _affine(bp["bn3"], bs["bn3"])
        f3 = _conv(h2, bp["conv3"]["kernel"].astype(jnp.float32), 1, 0) * a3 + b3
        if ds:
            ad, bd = _affine(bp["ds_bn"], bs["ds_bn"])
            sc = _conv(y, bp["ds_conv"]["kernel"].astype(jnp.float32), stride, 0) * ad + bd
        else:
            sc = y
        y = nn.relu(f3 + sc)
        rec(f"{name}.out", y)
    return y


# ---------------------------------------------------------------------------
# Prepare: float tree + calibrated scales -> int8 kernels + fused epilogues
# ---------------------------------------------------------------------------

def _qweight(w):
    """Per-output-channel symmetric int8 (same scheme as export weight-only)."""
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=(0, 1, 2)) / 127.0
    s = jnp.where(s == 0.0, 1.0, s)
    return jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8), s


def prepare(variables, calib: Dict[str, float], blocks: Sequence[int]):
    """Build the int8 execution tree.

    ``calib`` maps scale names (see ``float_forward``) to absmax floats.
    Pure jnp: run it inside jit (hoists out of scans, constant-folds at
    export) or eagerly once.
    """
    p, st = variables["params"], variables["batch_stats"]

    def s_act(name):
        return max(float(calib[name]), 1e-12) / 127.0

    qt: Dict[str, Any] = {"blocks": tuple(blocks)}
    s_in = s_act("input")
    s_stem = s_act("stem")
    qw, sw = _qweight(p["conv1"]["kernel"])
    a, b = _affine(p["bn1"], st["bn1"])
    qt["input_scale"] = s_in
    qt["stem"] = {"qw": qw, "m": s_in * sw * a / s_stem, "z": b / s_stem}
    s_prev = s_stem
    for name, _w, stride, ds in _block_specs(blocks):
        bp, bs = p[name], st[name]
        s1, s2, s_out = s_act(f"{name}.h1"), s_act(f"{name}.h2"), s_act(f"{name}.out")
        e: Dict[str, Any] = {"stride": stride}
        qw1, sw1 = _qweight(bp["conv1"]["kernel"])
        a1, b1 = _affine(bp["bn1"], bs["bn1"])
        e["conv1"] = {"qw": qw1, "m": s_prev * sw1 * a1 / s1, "z": b1 / s1}
        qw2, sw2 = _qweight(bp["conv2"]["kernel"])
        a2, b2 = _affine(bp["bn2"], bs["bn2"])
        e["conv2"] = {"qw": qw2, "m": s1 * sw2 * a2 / s2, "z": b2 / s2}
        qw3, sw3 = _qweight(bp["conv3"]["kernel"])
        a3, b3 = _affine(bp["bn3"], bs["bn3"])
        e["conv3"] = {"qw": qw3, "m": s2 * sw3 * a3 / s_out, "z": b3 / s_out}
        if ds:
            qwd, swd = _qweight(bp["ds_conv"]["kernel"])
            ad, bd = _affine(bp["ds_bn"], bs["ds_bn"])
            e["ds"] = {"qw": qwd, "m": s_prev * swd * ad / s_out, "z": bd / s_out}
        else:
            # identity shortcut, rescaled into block-output units
            e["sc_ratio"] = s_prev / s_out
        qt[name] = e
        s_prev = s_out
    qt["out_scale"] = s_prev
    return qt


# ---------------------------------------------------------------------------
# int8 execution
# ---------------------------------------------------------------------------

def _requant_relu(acc_i32, m, z, extra=None):
    """int32 conv acc -> fused BN-fold + [add] + ReLU + round -> int8 [0,127].

    The clamp-at-0 IS the ReLU (post-ReLU scales are non-negative), so the
    whole epilogue is one fused elementwise chain on the conv output.
    """
    f = acc_i32.astype(jnp.float32) * m + z
    if extra is not None:
        f = f + extra
    return jnp.clip(jnp.round(f), 0, 127).astype(jnp.int8)


def apply_quantized(qt, x, dtype=jnp.float32):
    """Run the int8 backbone on a normalized float image batch [B,H,W,3].

    Returns the final feature map in ``dtype`` (same contract as
    ResNetBackbone.__call__ with train=False).
    """
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / qt["input_scale"]),
                 -127, 127).astype(jnp.int8)
    st = qt["stem"]
    q = _requant_relu(_conv(q, st["qw"], 2, 3, jnp.int32), st["m"], st["z"])
    q = nn.max_pool(q, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    for name, _w, stride, ds in _block_specs(qt["blocks"]):
        e = qt[name]
        q1 = _requant_relu(_conv(q, e["conv1"]["qw"], 1, 0, jnp.int32),
                           e["conv1"]["m"], e["conv1"]["z"])
        q2 = _requant_relu(_conv(q1, e["conv2"]["qw"], stride, 1, jnp.int32),
                           e["conv2"]["m"], e["conv2"]["z"])
        a3 = _conv(q2, e["conv3"]["qw"], 1, 0, jnp.int32)
        if ds:
            ad = _conv(q, e["ds"]["qw"], stride, 0, jnp.int32)
            sc = ad.astype(jnp.float32) * e["ds"]["m"] + e["ds"]["z"]
        else:
            sc = q.astype(jnp.float32) * e["sc_ratio"]
        q = _requant_relu(a3, e["conv3"]["m"], e["conv3"]["z"], extra=sc)
    return q.astype(dtype) * jnp.asarray(qt["out_scale"], dtype)


# ---------------------------------------------------------------------------
# Model-level integration (flax method interception — zero model changes)
# ---------------------------------------------------------------------------

def _backbone_interceptor(run):
    """Intercept ResNetBackbone.__call__ and delegate to ``run(module, x)``."""
    def interceptor(next_fn, args, kwargs, context):
        if (isinstance(context.module, ResNetBackbone)
                and context.method_name == "__call__"):
            if kwargs.get("train", False):
                raise ValueError(
                    "quantized backbone is an eval/serving path; train=True "
                    "must use the float backbone")
            return run(context.module, args[0])
        return next_fn(*args, **kwargs)
    return interceptor


def calibrate_model(model, variables, batches: Iterable[dict]) -> Dict[str, float]:
    """One float pass per calibration batch; returns {scale name: absmax}.

    ``batches`` are loader batch dicts (uint8 images inside); the model's
    own apply drives the backbone so normalization/dedup-gather semantics
    are exactly the serving path's.  The per-batch pass is jitted (one
    compile, reused across batches) — an eager apply would dispatch
    op-by-op over the TPU relay's ~28 ms round trip.
    """
    import jax

    @jax.jit
    def one_batch(variables, batch):
        record: Dict[str, Any] = {}

        def run(module, x):
            return float_forward(module.variables, x, module.blocks,
                                 record=record).astype(x.dtype)

        with nn.intercept_methods(_backbone_interceptor(run)):
            model.apply(variables, batch, train=False)
        return record

    merged: Dict[str, float] = {}
    for batch in batches:
        # ONE batched host transfer per calibration batch: per-scale float(v)
        # fetches would pay ~100 sequential ~28 ms relay round trips each.
        record = jax.device_get(one_batch(variables, batch))
        for k, v in record.items():
            merged[k] = max(merged.get(k, 0.0), float(v))
    return merged


def build_serving_path(model, variables, calib_batches: Iterable[dict]):
    """Calibrate and return ``(apply_fn, calib)`` — the CLI entry point.

    Raises when calibration records nothing, i.e. the model's forward never
    ran a ``ResNetBackbone`` (``use_img=0``, or a non-ResNet
    ``--image_arch``): silently falling back to float would report w8a8
    numbers for a float path.
    """
    calib = calibrate_model(model, variables, calib_batches)
    if not calib:
        raise ValueError(
            "--quantize w8a8 needs a ResNet image backbone in the forward "
            "path (use_img=1 and --image_arch resnet50/resnet101); this "
            "model never invoked one during calibration")
    return quantized_apply_fn(model, calib), calib


def quantized_apply_fn(model, calib: Dict[str, float]):
    """``apply(variables, batch, train=False)`` with the int8 backbone.

    Drop-in for ``model.apply`` in eval flows (forecast/export/serve/bench):
    same variables, same batch dict, same ``(forecast, aux)`` return — only
    the backbone executes w8a8.  ``prepare`` runs inside the traced
    function, so weight quantization constant-folds at export and hoists
    out of benchmark scans.
    """
    def apply_fn(variables, batch, train: bool = False, **kwargs):
        if train:
            raise ValueError("quantized_apply_fn is eval-only")

        def run(module, x):
            qt = prepare(module.variables, calib, module.blocks)
            return apply_quantized(qt, x, dtype=x.dtype)

        with nn.intercept_methods(_backbone_interceptor(run)):
            return model.apply(variables, batch, train=False, **kwargs)
    return apply_fn
