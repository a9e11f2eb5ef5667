"""w8a8 int8 backbone engine (models/quantized_resnet.py).

Covers: float-engine parity with the flax backbone (the engine's BN-fold
must reproduce eval semantics exactly, or every int8 number is built on
sand), quantization error bounds with random weights (worst case — real
pretrained weights quantize better), the model-level interceptor path on
the flagship family, calibration merging, and the eval-only guard.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visuelle2_tpu.models import VocabSizes, build
from visuelle2_tpu.models import quantized_resnet as qr
from visuelle2_tpu.models.resnet import ResNetBackbone

VOCAB = VocabSizes(5, 6, 5, 126)
# (2,1,1,1): block layer1_1 has an identity shortcut, so BOTH residual
# paths (ds conv + sc_ratio rescale) execute; "tiny" is all-downsample.
BLOCKS = (2, 1, 1, 1)


@pytest.fixture(scope="module")
def backbone_vars():
    rng = np.random.default_rng(11)
    bb = ResNetBackbone(BLOCKS, dtype=jnp.float32)
    x = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)
    variables = bb.init(jax.random.key(0), x, train=False)
    # Randomize params and batch_stats: fresh-init BN (mean 0, var 1) would
    # make the fold trivial and hide scale/bias mistakes.
    v = {"params": jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.asarray(a) +
            rng.standard_normal(a.shape).astype(np.float32) * 0.05),
        variables["params"]),
        "batch_stats": jax.tree_util.tree_map(
        lambda a: jnp.abs(jnp.asarray(
            np.asarray(a) + rng.random(a.shape).astype(np.float32) * 0.3)),
        variables["batch_stats"])}
    return bb, v, x


def test_float_engine_matches_flax_backbone(backbone_vars):
    bb, variables, x = backbone_vars
    ref = bb.apply(variables, x, train=False)
    got = qr.float_forward(variables, x, BLOCKS)
    assert np.max(np.abs(np.asarray(ref) - np.asarray(got))) < 1e-4 * float(
        jnp.max(jnp.abs(ref)))


def test_quantized_backbone_error_bounded(backbone_vars):
    bb, variables, x = backbone_vars
    ref = np.asarray(bb.apply(variables, x, train=False))
    rec = {}
    qr.float_forward(variables, x, BLOCKS, record=rec)
    calib = {k: float(v) for k, v in rec.items()}
    qt = qr.prepare(variables, calib, BLOCKS)
    got = np.asarray(qr.apply_quantized(qt, x))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    # Random weights are the worst case for per-channel int8; measured
    # ~0.04 rel l2.  A broken scale/fold shows up as O(1).
    assert rel < 0.10, rel
    assert got.dtype == ref.dtype and got.shape == ref.shape


def test_quantized_out_of_range_inputs_saturate(backbone_vars):
    """Inputs beyond the calibration range clamp, not wrap/explode."""
    bb, variables, x = backbone_vars
    rec = {}
    qr.float_forward(variables, x, BLOCKS, record=rec)
    calib = {k: float(v) for k, v in rec.items()}
    qt = qr.prepare(variables, calib, BLOCKS)
    got = np.asarray(qr.apply_quantized(qt, jnp.asarray(x) * 10.0))
    assert np.all(np.isfinite(got))


@pytest.fixture(scope="module")
def flagship():
    from __graft_entry__ import _synthetic_batch

    model = build("gated_v4", vocab=VOCAB, output_len=12, embedding_dim=16,
                  hidden_dim=16, image_arch="tiny")
    batch = _synthetic_batch(8, 64)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    return model, variables, batch


def test_model_level_quantized_apply(flagship):
    from __graft_entry__ import _synthetic_batch

    model, variables, batch = flagship
    calib = qr.calibrate_model(model, variables,
                               [batch, _synthetic_batch(8, 64, seed=5)])
    assert set(calib) >= {"input", "stem"} and len(calib) == 2 + 3 * sum(
        (1, 1, 1, 1))
    qapply = qr.quantized_apply_fn(model, calib)
    f_ref, _ = model.apply(variables, batch, train=False)
    f_q, aux = qapply(variables, batch)
    assert f_q.shape == f_ref.shape
    rel = float(jnp.linalg.norm(f_q - f_ref) / jnp.linalg.norm(f_ref))
    assert rel < 0.05, rel
    # jit-compatible (the serving/export/bench path).  Eager and jit are
    # NOT bitwise-equal: jit constant-folds `prepare` (and fuses the
    # epilogue chain) with different float rounding, so requant values
    # sitting exactly on a .5 boundary flip by one int8 step — bound the
    # wobble at a fraction of the quantization error instead.
    f_jit = jax.jit(lambda v, b: qapply(v, b)[0])(variables, batch)
    jit_wobble = float(jnp.linalg.norm(f_jit - f_q) / jnp.linalg.norm(f_q))
    assert jit_wobble < 0.02, jit_wobble
    rel_jit = float(jnp.linalg.norm(f_jit - f_ref) / jnp.linalg.norm(f_ref))
    assert rel_jit < 0.05, rel_jit


def test_quantized_apply_is_eval_only(flagship):
    model, variables, batch = flagship
    calib = qr.calibrate_model(model, variables, [batch])
    with pytest.raises(ValueError, match="eval"):
        qr.quantized_apply_fn(model, calib)(variables, batch, train=True)


def test_build_serving_path_requires_resnet_backbone():
    """A model that never runs a ResNetBackbone (use_img=0) must error at
    calibration, not silently score the float path under a w8a8 label."""
    from __graft_entry__ import _synthetic_batch

    model = build("gated_v4", vocab=VOCAB, output_len=12, embedding_dim=16,
                  hidden_dim=16, image_arch="tiny", use_img=False)
    batch = _synthetic_batch(8, 64)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, train=False)
    with pytest.raises(ValueError, match="ResNet"):
        qr.build_serving_path(model, variables, [batch])


def test_calibration_merges_batches(flagship):
    from __graft_entry__ import _synthetic_batch

    model, variables, batch = flagship
    b2 = _synthetic_batch(8, 64, seed=9)
    c1 = qr.calibrate_model(model, variables, [batch])
    c2 = qr.calibrate_model(model, variables, [b2])
    merged = qr.calibrate_model(model, variables, [batch, b2])
    for k in merged:
        assert merged[k] == pytest.approx(max(c1[k], c2[k]), rel=1e-6)


def test_auto_mode_policy_thresholds():
    """`--quantize auto` picks w8a8 exactly in its measured win region
    (docs/perf_dedup_series.json: 1.18x at d=1, 1.05x at d=4, 0.81x at
    d=10) and never without a ResNet backbone to quantize."""
    assert qr.resolve_auto_mode(duplication=1.0,
                                has_resnet_backbone=True) == "w8a8"
    assert qr.resolve_auto_mode(duplication=4.0,
                                has_resnet_backbone=True) == "w8a8"
    assert qr.resolve_auto_mode(duplication=9.8,
                                has_resnet_backbone=True) == ""
    assert qr.resolve_auto_mode(duplication=1.0,
                                has_resnet_backbone=False) == ""


def test_cli_resolve_quantize(capsys):
    """CLI-level resolution: duplication from the loader's static slot
    count, explicit modes pass through untouched."""
    import argparse

    from visuelle2_tpu.cli.common import resolve_quantize

    class Loader:
        batch_size = 128

        def __init__(self, slots):
            self.image_slots = slots

    args = argparse.Namespace(quantize="auto", use_img=1,
                              image_arch="resnet101")
    # d = 128/64 = 2 -> inside the win region.
    assert resolve_quantize(args, Loader(64)) == "w8a8"
    # d = 128/13 ~ 9.8 -> float path.
    assert resolve_quantize(args, Loader(13)) == ""
    # No dedup (slots=0) -> d = 1 -> w8a8.
    assert resolve_quantize(args, Loader(0)) == "w8a8"
    # No ResNet in the forward -> float path regardless of duplication.
    args_no_img = argparse.Namespace(quantize="auto", use_img=0,
                                     image_arch="resnet101")
    assert resolve_quantize(args_no_img, Loader(64)) == ""
    args_tiny = argparse.Namespace(quantize="auto", use_img=1,
                                   image_arch="tiny")
    assert resolve_quantize(args_tiny, Loader(64)) == ""
    # Explicit modes are never second-guessed.
    for mode in ("", "none", "int8", "w8a8"):
        args_m = argparse.Namespace(quantize=mode)
        assert resolve_quantize(args_m, Loader(13)) == mode
    # Duplication must come from the UNPADDED unique-image count: padded
    # slots (device-count multiple / artifact signature) understate d near
    # the crossover (ADVICE r4).  Padded d = 128/40 = 3.2 (would pick w8a8);
    # true d = 128/26 ~ 4.9 -> float.
    padded = Loader(40)
    padded.unique_image_slots = 26
    assert resolve_quantize(args, padded) == ""
    # Any production STAGE_BLOCKS arch qualifies (not a hard-coded list).
    args_r50 = argparse.Namespace(quantize="auto", use_img=1,
                                  image_arch="resnet50")
    assert resolve_quantize(args_r50, Loader(64)) == "w8a8"
    out = capsys.readouterr().out
    assert "[quantize auto]" in out and "win region" in out


def test_build_w8a8_serving_path_split_selection(monkeypatch, capsys):
    """The shared calibration prologue honors --calib_split/--calib_batches
    and falls back to test when the requested split wasn't loaded."""
    import argparse

    from visuelle2_tpu.cli.common import build_w8a8_serving_path

    calls = {}

    def fake(model, variables, batches):
        calls["n"] = len(batches)
        return "APPLY", {"scale": 1.0}

    monkeypatch.setattr(
        "visuelle2_tpu.models.quantized_resnet.build_serving_path", fake)
    loaders = {"train": [1, 2, 3, 4], "test": [5, 6]}
    args = argparse.Namespace(calib_split="train", calib_batches=3)
    assert build_w8a8_serving_path("M", "V", loaders, args) == "APPLY"
    assert calls["n"] == 3
    assert "3 train batches" in capsys.readouterr().out
    args = argparse.Namespace(calib_split="train", calib_batches=2)
    assert build_w8a8_serving_path("M", "V", {"test": [5, 6]}, args) == "APPLY"
    out = capsys.readouterr().out
    assert "using test" in out and "2 test batches" in out


def test_serve_w8a8_dedup_advisory():
    """Serving an explicitly-forced w8a8 artifact outside the measured win
    region prints an advisory; inside it (or on float artifacts) nothing."""
    from visuelle2_tpu.cli.serve import w8a8_dedup_advisory

    hq = {"quantize": "w8a8"}
    note = w8a8_dedup_advisory(hq, batch_size=128, slots=13)  # d ~ 9.8
    assert note and "SLOWER" in note
    assert w8a8_dedup_advisory(hq, batch_size=128, slots=64) is None  # d=2
    assert w8a8_dedup_advisory(hq, batch_size=128, slots=0) is None  # no dedup
    assert w8a8_dedup_advisory({}, batch_size=128, slots=13) is None  # float
