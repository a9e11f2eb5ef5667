"""Pallas kernels vs their XLA reference implementations (interpret mode on
CPU; the same kernels compile with Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visuelle2_tpu.ops.attention import AdditiveAttention
from visuelle2_tpu.ops.gru import GRU
from visuelle2_tpu.ops.pallas import (
    fused_additive_attention,
    fused_gated_residual,
    fused_gru_sequence,
)


@pytest.mark.parametrize("weight_on", ["inputs", "projected"])
def test_fused_additive_attention_parity(rng, weight_on):
    B, L, De, Dd, A = 10, 52, 32, 24, 32
    enc = rng.standard_normal((B, L, De)).astype(np.float32)
    dec = rng.standard_normal((B, Dd)).astype(np.float32)

    module = AdditiveAttention(A, weight_on=weight_on)
    variables = module.init(jax.random.key(0), jnp.asarray(enc), jnp.asarray(dec))
    want, want_alpha = module.apply(variables, jnp.asarray(enc), jnp.asarray(dec))

    p = variables["params"]
    got, got_alpha = fused_additive_attention(
        jnp.asarray(enc), jnp.asarray(dec),
        p["encoder_linear"]["kernel"], p["decoder_linear"]["kernel"],
        p["attn_linear"]["kernel"], p["attn_linear"]["bias"],
        weight_on=weight_on, block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_alpha), np.asarray(want_alpha), atol=1e-5)


@pytest.mark.parametrize("residual", [True, False])
def test_fused_gated_residual_parity(rng, residual):
    B, D, C = 37, 48, 96
    x = rng.standard_normal((B, D)).astype(np.float32)
    ctx = rng.standard_normal((B, C)).astype(np.float32)
    wx = (rng.standard_normal((D, D)) * 0.1).astype(np.float32)
    wc = (rng.standard_normal((C, D)) * 0.1).astype(np.float32)
    b = rng.standard_normal((D,)).astype(np.float32)

    g = jax.nn.sigmoid(x @ wx + ctx @ wc + b)
    want = x + x * g if residual else x * g
    got = fused_gated_residual(jnp.asarray(x), jnp.asarray(ctx), wx, wc, b,
                               residual=residual, block_b=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_gru_sequence_parity(rng):
    B, T, I, H = 9, 12, 8, 16
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    module = GRU(H)
    variables = module.init(jax.random.key(0), jnp.asarray(x))
    want, want_h = module.apply(variables, jnp.asarray(x))

    p = variables["params"]
    got, got_h = fused_gru_sequence(
        jnp.asarray(x), p["w_i"], p["w_h"], p["b_i"], p["b_h"],
        block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h), atol=1e-5)


def test_models_pallas_path_matches_xla(rng):
    """AdditiveAttention / GRU modules with use_pallas=True (interpret mode)
    reproduce the XLA path with the same params."""
    from jax.experimental.pallas import tpu as pltpu

    B, L, De, Dd, A = 6, 13, 16, 16, 16
    enc = jnp.asarray(rng.standard_normal((B, L, De)).astype(np.float32))
    dec = jnp.asarray(rng.standard_normal((B, Dd)).astype(np.float32))
    ref = AdditiveAttention(A)
    variables = ref.init(jax.random.key(0), enc, dec)
    want, want_a = ref.apply(variables, enc, dec)
    with pltpu.force_tpu_interpret_mode():
        got, got_a = AdditiveAttention(A, use_pallas=True).apply(variables, enc, dec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    x = jnp.asarray(rng.standard_normal((5, 7, 9)).astype(np.float32))
    gref = GRU(12)
    gvars = gref.init(jax.random.key(1), x)
    wo, wh = gref.apply(gvars, x)
    with pltpu.force_tpu_interpret_mode():
        go, gh = GRU(12, use_pallas=True).apply(gvars, x)
    np.testing.assert_allclose(np.asarray(go), np.asarray(wo), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(wh), atol=1e-5)


def test_tg_fusion_pallas_path_matches_xla(rng):
    from jax.experimental.pallas import tpu as pltpu

    from visuelle2_tpu.models.fusion import TextGuidedFusionNetwork

    img = jnp.asarray(rng.standard_normal((6, 16)).astype(np.float32))
    text = jnp.asarray(rng.standard_normal((6, 4, 16)).astype(np.float32))
    dummy = jnp.asarray(rng.standard_normal((6, 16)).astype(np.float32))
    ref = TextGuidedFusionNetwork(16, 16)
    variables = ref.init(jax.random.key(0), img, text, dummy)
    want = ref.apply(variables, img, text, dummy)
    with pltpu.force_tpu_interpret_mode():
        got = TextGuidedFusionNetwork(16, 16, use_pallas=True).apply(
            variables, img, text, dummy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("variant", ["pure", "head"])
@pytest.mark.parametrize("masked", [False, True])
def test_fused_gated_mha_parity(rng, variant, masked):
    """The fused gated-MHA kernel (SURVEY §2.4 item 2) reproduces the XLA
    gated modules exactly, with and without the gcd block mask."""
    from jax.experimental.pallas import tpu as pltpu

    from visuelle2_tpu.ops.attention import (HeadSpecificGatedAttention,
                                             PureGatedMultiHeadAttention)
    from visuelle2_tpu.ops.masks import gcd_block_mask

    cls = (PureGatedMultiHeadAttention if variant == "pure"
           else HeadSpecificGatedAttention)
    B, L, D = 11, 52, 32
    q = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    kv = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    mask = gcd_block_mask(L, 12) if masked else None

    ref = cls(D, 4, dropout=0.1)
    variables = ref.init(jax.random.key(0), q, kv, kv, mask=mask)
    want = ref.apply(variables, q, kv, kv, mask=mask)
    with pltpu.force_tpu_interpret_mode():
        got = cls(D, 4, dropout=0.1, use_pallas=True).apply(
            variables, q, kv, kv, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_gated_v2_model_pallas_path_matches_xla(rng):
    """Whole gated_v2 forward (gated trend encoder + PureGated decoder
    cross-attn) with use_pallas=True matches the XLA path end to end."""
    from jax.experimental.pallas import tpu as pltpu

    from visuelle2_tpu.models import VocabSizes, build

    b = {
        "ts": rng.random((6, 12)).astype(np.float32),
        "cat": rng.integers(0, 5, 6).astype(np.int32),
        "col": rng.integers(0, 6, 6).astype(np.int32),
        "fab": rng.integers(0, 5, 6).astype(np.int32),
        "store": rng.integers(0, 126, 6).astype(np.int32),
        "temporal": rng.random((6, 4)).astype(np.float32),
        "gtrends": rng.random((6, 3, 52)).astype(np.float32),
        "images": rng.integers(0, 255, (6, 32, 32, 3)).astype(np.uint8),
    }
    kw = dict(vocab=VocabSizes(5, 6, 5, 126), output_len=12,
              embedding_dim=16, hidden_dim=16, image_arch="tiny")
    ref = build("gated_v2", **kw)
    variables = ref.init({"params": jax.random.key(0),
                          "dropout": jax.random.key(1)}, b, train=False)
    want, _ = ref.apply(variables, b, train=False)
    with pltpu.force_tpu_interpret_mode():
        got, _ = build("gated_v2", use_pallas=True, **kw).apply(
            variables, b, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)
