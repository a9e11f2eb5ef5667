"""Pretrained-backbone artifact round trip: convert -> .npz -> splice.

Covers the zero-egress workflow (scripts/convert_pretrained.py run elsewhere,
artifact consumed here) end to end with a random-weight torch net standing in
for torchvision's pretrained ResNet (the converter itself is golden-tested
in test_models.py / test_whole_model_golden.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scripts.convert_pretrained import load_variables, save_variables
from tests.test_whole_model_golden import _tiny_resnet
from visuelle2_tpu.models import VocabSizes, build
from visuelle2_tpu.models.pretrained import load_backbone_npz, splice_backbone
from visuelle2_tpu.models.resnet import params_from_torch

VOCAB = VocabSizes(5, 6, 5, 126)


def _demand_batch(n=4):
    rng = np.random.default_rng(0)
    return {
        "ts": rng.random((n, 12)).astype(np.float32),
        "cat": rng.integers(0, 5, n).astype(np.int32),
        "col": rng.integers(0, 6, n).astype(np.int32),
        "fab": rng.integers(0, 5, n).astype(np.int32),
        "store": rng.integers(0, 126, n).astype(np.int32),
        "temporal": rng.random((n, 4)).astype(np.float32),
        "gtrends": rng.random((n, 3, 52)).astype(np.float32),
        "images": rng.integers(0, 255, (n, 32, 32, 3)).astype(np.uint8),
    }


def test_backbone_npz_roundtrip_and_splice(tmp_path):
    import torch

    torch.manual_seed(0)
    net = _tiny_resnet()
    converted = params_from_torch(net.state_dict(), arch="tiny")
    path = str(tmp_path / "bb.npz")
    save_variables(converted, path)
    loaded = load_backbone_npz(path)

    # Exact round trip through the .npz.
    for coll in ("params", "batch_stats"):
        want = jax.tree_util.tree_leaves(converted[coll])
        got = jax.tree_util.tree_leaves(loaded[coll])
        assert len(want) == len(got)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    assert load_variables(path).keys() == {"params", "batch_stats"}

    model = build("gated_v4", vocab=VOCAB, output_len=12,
                  embedding_dim=16, hidden_dim=16, image_arch="tiny")
    batch = _demand_batch()
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, batch, train=False)
    before, _ = model.apply(variables, batch, train=False)

    spliced = splice_backbone(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, loaded)
    bb = spliced["params"]["image_encoder"]["backbone"]
    np.testing.assert_array_equal(
        np.asarray(bb["conv1"]["kernel"]),
        np.asarray(converted["params"]["conv1"]["kernel"]))
    after, _ = model.apply(spliced, batch, train=False)
    # Forward still runs and the backbone actually changed the output.
    assert np.isfinite(np.asarray(after)).all()
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_cli_apply_pretrained_backbone(tmp_path):
    """The CLI splice path: init_state -> apply_pretrained_backbone keeps
    dtypes and swaps backbone leaves (incl. a bf16 backbone model)."""
    import argparse
    import torch

    from visuelle2_tpu.cli.common import apply_pretrained_backbone
    from visuelle2_tpu.train.loop import TrainConfig, Trainer

    torch.manual_seed(0)
    path = str(tmp_path / "bb.npz")
    save_variables(params_from_torch(_tiny_resnet().state_dict(), arch="tiny"),
                   path)

    model = build("cross_attn_rnn_21", vocab=VOCAB, out_len=1,
                  attention_dim=16, embedding_dim=16, hidden_dim=16,
                  image_arch="tiny", image_dtype=jnp.bfloat16)
    batch = dict(_demand_batch())
    del batch["ts"]
    rng = np.random.default_rng(1)
    batch["X"] = rng.random((4, 10, 2)).astype(np.float32)
    batch["y"] = rng.random((4, 10, 1)).astype(np.float32)

    trainer = Trainer(model, TrainConfig(epochs=1, batch_size=4))
    state = trainer.init_state(batch)
    args = argparse.Namespace(pretrained_backbone=path)
    new = apply_pretrained_backbone(state, args)
    old_k = state.params["static"]["image_encoder"]["backbone"]["conv1"]["kernel"]
    new_k = new.params["static"]["image_encoder"]["backbone"]["conv1"]["kernel"]
    assert new_k.dtype == old_k.dtype
    assert not np.allclose(np.asarray(old_k, np.float32),
                           np.asarray(new_k, np.float32))
    # Non-backbone params untouched.
    np.testing.assert_array_equal(
        np.asarray(state.params["decoder_fc"]["kernel"]),
        np.asarray(new.params["decoder_fc"]["kernel"]))


def test_inception_artifact_filters_auxlogits_and_splices(tmp_path):
    """torchvision's pretrained inception ships AuxLogits convs; the
    converter must drop them or every splice rejects the artifact — and the
    legacy Inception encoder must expose a 'backbone' subtree to receive it."""
    import torch

    from tests.torch_ref import TorchInception3
    from visuelle2_tpu.models.inception import inception_params_from_torch
    from visuelle2_tpu.models.legacy import LegacyImageEncoder

    torch.manual_seed(0)
    net = TorchInception3()
    sd = dict(net.state_dict())
    # Simulate aux_logits=True: classifier convs the backbone doesn't have.
    sd["AuxLogits.conv0.conv.weight"] = torch.zeros(128, 768, 1, 1)
    sd["AuxLogits.conv0.bn.weight"] = torch.zeros(128)
    sd["AuxLogits.conv0.bn.bias"] = torch.zeros(128)
    sd["AuxLogits.conv0.bn.running_mean"] = torch.zeros(128)
    sd["AuxLogits.conv0.bn.running_var"] = torch.ones(128)
    converted = inception_params_from_torch(sd)
    assert "AuxLogits" not in converted["params"]
    assert "AuxLogits" not in converted["batch_stats"]

    path = str(tmp_path / "inc.npz")
    save_variables(converted, path)
    loaded = load_backbone_npz(path)

    enc = LegacyImageEncoder(embedding_dim=8)
    imgs = np.zeros((1, 299, 299, 3), np.uint8)
    variables = enc.init({"params": jax.random.key(0)}, imgs)
    spliced = splice_backbone(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, loaded)
    out = enc.apply(jax.tree_util.tree_map(jnp.asarray, spliced), imgs)
    assert out.shape == (1, 64, 8)


def test_gtm_v1_accepts_pretrained_backbone(tmp_path):
    """gtm_v1's fully-frozen tower is the model that needs the splice most;
    its CNN child is named 'backbone' so the flag actually reaches it."""
    import torch

    from visuelle2_tpu.models.gtm_v1 import GTMv1

    torch.manual_seed(0)
    converted = params_from_torch(_tiny_resnet().state_dict(), arch="tiny")
    batch = dict(_demand_batch())
    batch["text_features"] = np.zeros((4, 768), np.float32)
    model = GTMv1(embedding_dim=16, hidden_dim=16, output_len=12,
                  image_arch="tiny")
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, batch, train=False)
    spliced = splice_backbone(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, converted)
    np.testing.assert_array_equal(
        np.asarray(spliced["params"]["image_encoder"]["backbone"]["conv1"]["kernel"]),
        np.asarray(converted["params"]["conv1"]["kernel"]))
    pred, _ = model.apply(spliced, batch, train=False)
    assert np.isfinite(np.asarray(pred)).all()


def test_splice_rejects_mismatched_or_missing_backbone(tmp_path):
    import torch

    torch.manual_seed(0)
    converted = params_from_torch(_tiny_resnet().state_dict(), arch="tiny")

    # Ablated image branch -> no backbone to splice into.
    model = build("gtm", vocab=VOCAB, output_len=12, use_img=False,
                  embedding_dim=16, hidden_dim=16, image_arch="tiny")
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           _demand_batch(), train=False)
    with pytest.raises(ValueError, match="no 'backbone'"):
        splice_backbone({"params": variables["params"]}, converted)

    # Wrong-shape artifact -> loud error, not silent garbage.
    bad = jax.tree_util.tree_map(lambda x: x[..., :1], converted["params"])
    model2 = build("gtm", vocab=VOCAB, output_len=12,
                   embedding_dim=16, hidden_dim=16, image_arch="tiny")
    v2 = model2.init({"params": jax.random.key(0),
                      "dropout": jax.random.key(1)},
                     _demand_batch(), train=False)
    with pytest.raises(ValueError, match="does not match"):
        splice_backbone({"params": v2["params"]},
                        {"params": bad, "batch_stats": converted["batch_stats"]})


def test_manifest_verifies_real_init_tree(tmp_path):
    """The drop-in kit's structural gate (scripts/pretrained_manifest.json +
    convert_pretrained.py --verify): an artifact whose tree comes from a real
    resnet50 init (NOT from the manifest — catches manifest drift vs the
    model definition) passes; a shape-corrupted one is rejected with a
    precise diff."""
    from scripts.convert_pretrained import verify_artifact
    from visuelle2_tpu.models.resnet import STAGE_BLOCKS, ResNetBackbone

    mod = ResNetBackbone(STAGE_BLOCKS["resnet50"])
    variables = jax.jit(
        lambda: mod.init(jax.random.key(0),
                         jnp.zeros((1, 64, 64, 3), jnp.float32),
                         train=False))()
    variables = jax.tree_util.tree_map(np.asarray, dict(variables))
    path = str(tmp_path / "rn50.npz")
    save_variables(variables, path)
    digest = verify_artifact(path, "resnet50")
    assert len(digest) == 64

    bad = dict(variables)
    bad["params"] = jax.tree_util.tree_map(lambda x: x, variables["params"])
    bad["params"]["conv1"]["kernel"] = np.zeros((3, 3, 3, 64), np.float32)
    bad_path = str(tmp_path / "bad.npz")
    save_variables(bad, bad_path)
    with pytest.raises(SystemExit, match="does NOT match"):
        verify_artifact(bad_path, "resnet50")
