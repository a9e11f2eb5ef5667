"""Model construction + forward smoke/shape tests for all families, plus the
ResNet conversion golden test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visuelle2_tpu.data.images import ImageStore
from visuelle2_tpu.data.loader import BatchLoader
from visuelle2_tpu.data.pipeline import load_visuelle2
from visuelle2_tpu.models import VocabSizes, build

SMALL = dict(attention_dim=16, embedding_dim=16, hidden_dim=16,
             image_arch="tiny")
SMALL_GTM = dict(embedding_dim=16, hidden_dim=16, image_arch="tiny")
VOCAB = VocabSizes(5, 6, 5, 126)


def _batch(synthetic_dataset, demand, output_len, n=8):
    arrays = load_visuelle2(synthetic_dataset, "train", demand=demand,
                            output_len=output_len)
    store = ImageStore.build(synthetic_dataset + "/images", arrays.image_paths,
                             size=32)
    loader = BatchLoader(arrays, store, batch_size=n, drop_remainder=True)
    return next(iter(loader))


@pytest.fixture(scope="module")
def stfore1(synthetic_dataset):
    return _batch(synthetic_dataset, False, 1)


@pytest.fixture(scope="module")
def stfore10(synthetic_dataset):
    return _batch(synthetic_dataset, False, 10)


@pytest.fixture(scope="module")
def demand12(synthetic_dataset):
    return _batch(synthetic_dataset, True, 12)


def _init_and_run(model, batch, train=False):
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "sampling": jax.random.key(2)}
    variables = model.init(rngs, batch, train=False)
    if train:
        out, mutated = model.apply(
            variables, batch, train=True,
            rngs={"dropout": jax.random.key(3), "sampling": jax.random.key(4)},
            mutable=["batch_stats"])
        return out
    return model.apply(variables, batch, train=False)


def test_cross_attn_rnn_21_shapes(stfore1):
    model = build("cross_attn_rnn_21", vocab=VOCAB, out_len=1, **SMALL)
    (pred, aux) = _init_and_run(model, stfore1)
    assert pred.shape == (8, 10, 1)
    assert np.isfinite(np.asarray(pred)).all()


def test_cross_attn_rnn_210_shapes_and_tf(stfore10):
    model = build("cross_attn_rnn_210", vocab=VOCAB, out_len=10,
                  use_teacher_forcing=True, **SMALL)
    (pred, _) = _init_and_run(model, stfore10)
    assert pred.shape == (8 * 1, 10)
    (pred_t, _) = _init_and_run(model, stfore10, train=True)
    assert np.isfinite(np.asarray(pred_t)).all()


def test_cross_attn_rnn_demand_shapes_and_toggles(demand12):
    model = build("cross_attn_rnn_demand", vocab=VOCAB, out_len=12, **SMALL)
    (pred, _) = _init_and_run(model, demand12)
    assert pred.shape == (8, 12, 1)
    # Modality toggles produce a smaller fusion token set but same output.
    model2 = build("cross_attn_rnn_demand", vocab=VOCAB, out_len=12,
                   use_img=False, use_trends=False, **SMALL)
    (pred2, _) = _init_and_run(model2, demand12)
    assert pred2.shape == (8, 12, 1)


@pytest.mark.parametrize("name", ["gtm", "m4ft", "gated_v1", "gated_v2",
                                  "gated_v3", "gated_v4"])
def test_seq2seq_demand_forward(name, demand12):
    model = build(name, vocab=VOCAB, output_len=12, **SMALL_GTM)
    (pred, _) = _init_and_run(model, demand12)
    assert pred.shape == (8, 12)
    assert np.isfinite(np.asarray(pred)).all()
    # Train mode exercises BatchNorm batch stats + dropout rngs.
    (pred_t, _) = _init_and_run(model, demand12, train=True)
    assert np.isfinite(np.asarray(pred_t)).all()


def test_seq2seq_stfore_windows(stfore1):
    model = build("gtm", vocab=VOCAB, output_len=1, **SMALL_GTM)
    (pred, _) = _init_and_run(model, stfore1)
    assert pred.shape == (8 * 10, 1)


def test_seq2seq_autoregressive(demand12):
    model = build("gated_v4", vocab=VOCAB, output_len=12, autoregressive=True,
                  **SMALL_GTM)
    (pred, _) = _init_and_run(model, demand12)
    assert pred.shape == (8, 12)


@pytest.mark.parametrize("qm", ["text", "image", "temporal"])
def test_targ_query_modalities(qm, demand12):
    model = build("gated_v3", vocab=VOCAB, output_len=12, query_modality=qm,
                  **SMALL_GTM)
    (pred, _) = _init_and_run(model, demand12)
    assert pred.shape == (8, 12)


@pytest.mark.parametrize("name", ["gtm", "m4ft", "gated_v1", "gated_v2",
                                  "gated_v3", "gated_v4"])
def test_seq2seq_use_img_ablation(name, demand12):
    """use_img=False must actually drop the image branch (no backbone params,
    no backbone compute) — the reference family parses these flags but
    ignores them (GTM_Visuelle2.py:179); we give them GTM.py:54-88 semantics."""
    model = build(name, vocab=VOCAB, output_len=12, use_img=False, **SMALL_GTM)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, demand12, train=False)
    assert "image_encoder" not in variables["params"], name
    (pred, _) = model.apply(variables, demand12, train=False)
    assert pred.shape == (8, 12)
    assert np.isfinite(np.asarray(pred)).all()


@pytest.mark.parametrize("name", ["gtm", "m4ft", "gated_v1", "gated_v2"])
def test_seq2seq_use_text_ablation(name, demand12):
    model = build(name, vocab=VOCAB, output_len=12, use_text=False, **SMALL_GTM)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, demand12, train=False)
    assert "text_encoder" not in variables["params"], name
    (pred, _) = model.apply(variables, demand12, train=False)
    assert pred.shape == (8, 12)


def test_text_anchored_variants_reject_use_text_false(demand12):
    """gated_v4 (TG-Fusion) and gated_v3 with a text anchor are text-anchored:
    ablating text must fail loudly, never silently train the wrong model."""
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    for kw in (dict(), dict(query_modality="text")):
        name = "gated_v4" if not kw else "gated_v3"
        model = build(name, vocab=VOCAB, output_len=12, use_text=False,
                      **SMALL_GTM)
        with pytest.raises(ValueError):
            model.init(rngs, demand12, train=False)
    # ...but a non-text anchor works with text ablated.
    model = build("gated_v3", vocab=VOCAB, output_len=12, use_text=False,
                  query_modality="temporal", **SMALL_GTM)
    variables = model.init(rngs, demand12, train=False)
    (pred, _) = model.apply(variables, demand12, train=False)
    assert pred.shape == (8, 12)


def test_resnet_conversion_matches_torch(rng):
    """Golden: flax backbone with converted random torch weights == torch
    forward (eval mode), validating params_from_torch exactly."""
    import torch

    from visuelle2_tpu.models.resnet import ResNetBackbone, params_from_torch

    # Build a tiny torch ResNet with the torchvision Bottleneck layout.
    class TBottleneck(torch.nn.Module):
        expansion = 4

        def __init__(self, cin, width, stride, downsample):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(width)
            self.conv2 = torch.nn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(width)
            self.conv3 = torch.nn.Conv2d(width, width * 4, 1, bias=False)
            self.bn3 = torch.nn.BatchNorm2d(width * 4)
            self.downsample = downsample
            self.relu = torch.nn.ReLU()

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + idn)

    class TNet(torch.nn.Module):
        def __init__(self, blocks=(1, 1, 1, 1)):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(64)
            self.relu = torch.nn.ReLU()
            self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
            cin = 64
            for i, (n, w) in enumerate(zip(blocks, (64, 128, 256, 512))):
                layers = []
                for b in range(n):
                    stride = 2 if (i > 0 and b == 0) else 1
                    ds = None
                    if b == 0:
                        ds = torch.nn.Sequential(
                            torch.nn.Conv2d(cin, w * 4, 1, stride, bias=False),
                            torch.nn.BatchNorm2d(w * 4))
                    layers.append(TBottleneck(cin, w, stride, ds))
                    cin = w * 4
                setattr(self, f"layer{i + 1}", torch.nn.Sequential(*layers))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for i in range(4):
                x = getattr(self, f"layer{i + 1}")(x)
            return x

    tnet = TNet()
    tnet.eval()
    # Randomize BN running stats so conversion of statistics is exercised.
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    # Rename downsample.{0,1} keys into torchvision's naming for the converter.
    sd = {k: v for k, v in tnet.state_dict().items()}

    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.tensor(x)).numpy()  # NCHW

    variables = params_from_torch(sd, arch="tiny")
    net = ResNetBackbone(blocks=(1, 1, 1, 1))
    out = net.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(t_out, (0, 2, 3, 1)), atol=1e-3, rtol=1e-3)


def test_inception_conversion_matches_torch(rng):
    """Golden: flax InceptionV3 backbone with converted random torch weights
    == torch forward (eval mode), exercising inception_params_from_torch on
    every block type (stem, A, B, C, D, E) exactly like the ResNet test."""
    import torch

    from tests.torch_ref import TorchInception3
    from visuelle2_tpu.models.inception import (InceptionV3Backbone,
                                                inception_params_from_torch)

    torch.manual_seed(0)
    tnet = TorchInception3()
    tnet.eval()
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    # 75x75 is torchvision's minimum legal input; keeps CPU time small.
    x = rng.standard_normal((1, 3, 75, 75)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.tensor(x)).numpy()  # NCHW

    variables = inception_params_from_torch(tnet.state_dict())
    net = InceptionV3Backbone()
    out = net.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(t_out, (0, 2, 3, 1)), atol=2e-3, rtol=2e-3)


def test_gtm_v1_hashed_text_stable_digest():
    """The zero-egress text fallback must be reproducible across processes
    (training vs later inference): crc32-seeded, NOT salted Python hash().
    Hard-coded expectations pin the digest."""
    from visuelle2_tpu.models.gtm_v1 import TextFeaturizer

    feat = TextFeaturizer({"shirt": 0}, {"red": 0}, {"wool": 0}, use_bert=False)
    vec = feat._hashed("red wool shirt")
    assert vec.shape == (768,)
    # crc32("red")=0x40f480cd etc. — these values must never change, or
    # previously trained gtm_v1 checkpoints break on reload.
    np.testing.assert_allclose(
        vec[:4],
        [0.13996342, -0.03222408, 0.21693845, -0.41637173],
        rtol=1e-5, atol=1e-6)


def test_gtm_v1_with_text_featurizer(demand12):
    from visuelle2_tpu.models.gtm_v1 import GTMv1, TextFeaturizer

    feat = TextFeaturizer({"a": 0, "b": 1, "c": 2, "d": 3, "e": 4},
                          {f"c{i}": i for i in range(6)},
                          {f"f{i}": i for i in range(5)}, use_bert=False)
    tf = feat(demand12["cat"], demand12["col"], demand12["fab"])
    assert tf.shape == (8, 768)
    # Deterministic across calls.
    np.testing.assert_array_equal(tf, feat(demand12["cat"], demand12["col"],
                                           demand12["fab"]))

    batch = dict(demand12)
    batch["text_features"] = tf.astype(np.float32)
    model = GTMv1(embedding_dim=16, hidden_dim=16, output_len=12,
                  image_arch="tiny")
    (pred, attn) = _init_and_run(model, batch)
    assert pred.shape == (8, 12)
    assert attn is not None  # GTM returns decoder attention weights
    (pred_t, _) = _init_and_run(model, batch, train=True)
    assert np.isfinite(np.asarray(pred_t)).all()


def test_inception_backbone_shape_and_legacy_encoder(rng):
    import jax
    from visuelle2_tpu.models.legacy import LegacyImageEncoder

    imgs = rng.integers(0, 255, (1, 299, 299, 3), dtype=np.uint8)
    enc = LegacyImageEncoder(embedding_dim=16)
    variables = enc.init({"params": jax.random.key(0)}, imgs)
    out = enc.apply(variables, imgs)
    # 299 -> 8x8 = 64 patches (modules.py:91 view(-1, 64, 2048))
    assert out.shape == (1, 64, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_image_remat_preserves_forward_and_grad():
    """image_remat (jax.checkpoint over backbone blocks) is a pure
    memory/FLOPs trade: identical eval forward; train-mode gradients equal
    up to recompute rounding.  NOTE the tolerance asymmetry: the backward
    recompute is compiled separately from the primal, so its f32 rounding
    differs, and train-mode BatchNorm amplifies that by 1/batch-var — at
    degenerate test dims (1x1 feature maps, batch-var over 4 samples) the
    plain-vs-remat gradient gap is ~1e-2 while both are ~1e-5 from the f64
    truth at realistic spatial dims (measured; see docs/RESULTS_r2.md)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from visuelle2_tpu.models import VocabSizes, build

    batch = _synthetic_batch(4, 64)  # 64x64 -> 2x2 maps: BN not degenerate
    kw = dict(vocab=VocabSizes(5, 6, 5, 126), output_len=12,
              embedding_dim=16, hidden_dim=16, image_arch="tiny")
    plain = build("gated_v4", **kw)
    remat = build("gated_v4", image_remat=True, **kw)
    variables = plain.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, batch, train=False)

    # Eval forward: bitwise-level agreement (no recompute on forward).
    f1, _ = plain.apply(variables, batch, train=False)
    f2, _ = remat.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-6)

    def loss(model):
        def f(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(2),
                      "sampling": jax.random.key(3)})
            (pred, _aux) = out[0], out[1]
            return jnp.mean(pred ** 2)
        return jax.jit(jax.value_and_grad(f))(variables["params"])

    l1, g1 = loss(plain)
    l2, g2 = loss(remat)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=5e-3), g1, g2)


def test_dump_attention_demand_and_none_for_gtm(tmp_path):
    """dump_attention exposes the Demand model's per-step alphas (the
    reference collects then discards them, CrossAttnRNNDemand.py:280-321)
    and reports None for models without attention aux."""
    import jax

    from __graft_entry__ import _synthetic_batch
    from visuelle2_tpu.eval.forecast import dump_attention
    from visuelle2_tpu.models import VocabSizes, build

    batch = _synthetic_batch(4, 32)
    kw = dict(vocab=VocabSizes(5, 6, 5, 126), embedding_dim=16,
              hidden_dim=16, image_arch="tiny")
    demand = build("cross_attn_rnn_demand", out_len=12, attention_dim=16,
                   use_teacher_forcing=False, **kw)
    v = demand.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, batch, train=False)
    p = str(tmp_path / "attn.npz")
    keys = dump_attention(demand, v, batch, p)
    assert keys == ["img", "multimodal", "trend"]
    data = np.load(p)
    assert data["multimodal"].shape[0] == 12  # per-step, stacked by scan
    # Alphas are softmax rows: sum to 1 over the attended axis.
    np.testing.assert_allclose(np.asarray(data["multimodal"]).sum(-1), 1.0,
                               atol=1e-5)

    gtm = build("gtm", output_len=12, **kw)
    v2 = gtm.init({"params": jax.random.key(0),
                   "dropout": jax.random.key(1)}, batch, train=False)
    assert dump_attention(gtm, v2, batch, str(tmp_path / "n.npz")) is None
