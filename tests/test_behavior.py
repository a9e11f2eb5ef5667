"""Behavioral semantics tests: gate initialization and scheduled sampling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visuelle2_tpu.models import VocabSizes, build
from visuelle2_tpu.ops.attention import (
    HeadSpecificGatedAttention,
    PureGatedMultiHeadAttention,
)

VOCAB = VocabSizes(5, 6, 5, 126)


def _zero_tree(t):
    return jax.tree_util.tree_map(jnp.zeros_like, t)


def test_gate_bias_plus_two_starts_open(rng):
    """v2 gate bias init +2.0 -> σ(2.0) ≈ 0.88 of the signal passes when the
    gate kernel contributes nothing (Proposed_model_v2.py:565-568)."""
    B, L, D, h = 2, 4, 16, 4
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    mod = PureGatedMultiHeadAttention(D, h, dropout=0.0)
    variables = mod.init(jax.random.key(0), x, x, x)
    p = jax.device_get(variables["params"])
    assert np.allclose(p["gate_proj"]["bias"], 2.0)
    hs = HeadSpecificGatedAttention(D, h, dropout=0.0)
    v2 = hs.init(jax.random.key(0), x, x, x)
    assert np.allclose(jax.device_get(v2["params"])["gate_proj"]["bias"], 2.0)

    # Zero the gate kernel: output must be exactly σ(2.0)·(ungated path).
    p["gate_proj"]["kernel"] = np.zeros_like(p["gate_proj"]["kernel"])
    gated = mod.apply({"params": p}, x, x, x)
    p_open = dict(p)
    p_open["gate_proj"] = {"kernel": p["gate_proj"]["kernel"],
                           "bias": np.full_like(p["gate_proj"]["bias"], 1e6)}
    open_out = mod.apply({"params": p_open}, x, x, x)
    # out_proj is linear with bias b: gated = W(s·a) + b vs open = W(a) + b.
    b = p["out_proj"]["bias"]
    s = 1.0 / (1.0 + np.exp(-2.0))
    np.testing.assert_allclose(
        np.asarray(gated) - b, (np.asarray(open_out) - b) * s, atol=1e-5)


def test_v3_v4_gates_init_neutral():
    """TARG / TG-Fusion gate biases init 0.0 (σ=0.5 neutral) —
    Proposed_model_v3.py:192-193, Proposed_model_v4.py:170-171."""
    from visuelle2_tpu.models.fusion import TARGFusionNetwork, TextGuidedFusionNetwork

    e = jnp.ones((2, 16))
    targ = TARGFusionNetwork(16)
    v = targ.init(jax.random.key(0), e, e, e)
    p = jax.device_get(v["params"])
    assert np.allclose(p["gate_fc1"]["bias"], 0.0)
    assert np.allclose(p["gate_fc2"]["bias"], 0.0)

    text = jnp.ones((2, 4, 16))
    tg = TextGuidedFusionNetwork(16, 16)
    v = tg.init(jax.random.key(0), e, text, e)
    p = jax.device_get(v["params"])
    assert np.allclose(p["img_gate_fc"]["bias"], 0.0)
    assert np.allclose(p["dummy_gate_fc"]["bias"], 0.0)


@pytest.fixture(scope="module")
def stfore10_batch(synthetic_dataset):
    from visuelle2_tpu.data.images import ImageStore
    from visuelle2_tpu.data.loader import BatchLoader
    from visuelle2_tpu.data.pipeline import load_visuelle2

    arrays = load_visuelle2(synthetic_dataset, "train", demand=False, output_len=10)
    store = ImageStore.build(synthetic_dataset + "/images", arrays.image_paths, size=32)
    return next(iter(BatchLoader(arrays, store, 8, drop_remainder=True)))


def test_scheduled_sampling_uses_ground_truth_only_in_train(stfore10_batch):
    """TF ratio 1.0: train-mode predictions must react to y (ground truth fed
    back, CrossAttnRNN210.py:216-225); eval mode must ignore y entirely."""
    model = build("cross_attn_rnn_210", vocab=VOCAB, out_len=10,
                  use_teacher_forcing=True, teacher_forcing_ratio=1.0,
                  attention_dim=16, embedding_dim=16, hidden_dim=16,
                  image_arch="tiny")
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "sampling": jax.random.key(2)}
    variables = model.init(rngs, stfore10_batch, train=False)

    batch2 = dict(stfore10_batch, y=stfore10_batch["y"] + 1.0)
    run_rngs = {"dropout": jax.random.key(3), "sampling": jax.random.key(4)}

    (p1, _), _ = model.apply(variables, stfore10_batch, train=True,
                             rngs=run_rngs, mutable=["batch_stats"])
    (p2, _), _ = model.apply(variables, batch2, train=True,
                             rngs=run_rngs, mutable=["batch_stats"])
    # First step can't see y yet; later steps must differ.
    assert not np.allclose(np.asarray(p1)[:, 1:], np.asarray(p2)[:, 1:])
    np.testing.assert_allclose(np.asarray(p1)[:, 0], np.asarray(p2)[:, 0],
                               atol=1e-6)

    (e1, _) = model.apply(variables, stfore10_batch, train=False)
    (e2, _) = model.apply(variables, batch2, train=False)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)
