"""Harness for importing the ACTUAL reference model sources (VERDICT r4 #1).

``/root/reference/models/*.py`` import three packages absent from this
container at module top (``pytorch_lightning``, ``fairseq.optim.adafactor``,
``torchvision.models`` — e.g. ``CrossAttnRNN210.py:1-6``).  This module
installs minimal stubs for exactly those seams so the reference files execute
unmodified, letting goldens run the reference's own ``forward()`` instead of
a hand-built re-composition of its math:

* ``pytorch_lightning.LightningModule`` -> ``nn.Module`` shim with the
  attributes the reference constructors/forwards touch (``save_hyperparameters``,
  ``log``, ``device``).  Trainer machinery is never exercised (eval forward
  only).
* ``fairseq.optim.adafactor.Adafactor`` -> import-only placeholder
  (``configure_optimizers`` is never called at eval).
* ``torchvision.models.resnet101/resnet50`` -> a randomly-initialized
  torchvision-LAYOUT Bottleneck ResNet with blocks (1,1,1,1): the exact
  child order/naming ``ImageEncoder`` slices (``children()[:-2]``,
  ``CrossAttnRNN21.py:61``) and ``params_from_torch`` converts, at toy cost.
  No pretrained weights exist in this container (zero egress), and random
  weights are what the goldens want anyway.

Two torch-version shims (the reference targeted torch 1.x; this container
has torch 2.13, whose ``nn.TransformerEncoder/Decoder`` pass ``is_causal``
kwargs the reference's custom layers do not accept and probe
``layers[0].self_attn`` attributes the custom layers lack):

* :func:`patch_legacy_transformer` replaces a container's ``forward`` with
  the torch-1.x semantics loop (same math, classic kwargs only).
* GTM.py's ``_generate_encoder_mask`` hardcodes ``.to('cuda:N')``
  (``GTM.py:106``); :func:`patch_cpu_mask` re-binds it with the identical
  mask math minus the device move.

None of the shims carry reference code beyond reproducing documented
torch-1.x container semantics.
"""

import importlib.machinery
import importlib.util
import os
import sys
import types
import zlib

import numpy as np
import torch

REF_MODELS = "/root/reference/models"

__all__ = [
    "REF_MODELS",
    "install_stubs",
    "load_reference_module",
    "patch_legacy_transformer",
    "patch_cpu_mask",
    "patch_cpu_text_embedder",
    "make_fake_bert_pipeline",
    "fake_bert_features",
    "randomize_batchnorm_stats",
    "resnet_variables_from_sequential",
]


# ---------------------------------------------------------------------------
# torchvision-layout tiny ResNet (children order: conv1, bn1, relu, maxpool,
# layer1..4, avgpool, fc — what `list(resnet.children())[:-2]` relies on).
# ---------------------------------------------------------------------------

class _Bottleneck(torch.nn.Module):
    def __init__(self, cin, width, stride):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(width)
        self.conv2 = torch.nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(width)
        self.conv3 = torch.nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(width * 4)
        self.downsample = torch.nn.Sequential(
            torch.nn.Conv2d(cin, width * 4, 1, stride, bias=False),
            torch.nn.BatchNorm2d(width * 4))

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        return torch.relu(self.bn3(self.conv3(out)) + self.downsample(x))


class TorchvisionLayoutResNet(torch.nn.Module):
    """Blocks (1,1,1,1) — the torch counterpart of ResNetBackbone('tiny'),
    with torchvision's full child list so reference slicing works."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU(inplace=True)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, w in enumerate((64, 128, 256, 512)):
            setattr(self, f"layer{i + 1}",
                    torch.nn.Sequential(_Bottleneck(cin, w, 2 if i else 1)))
            cin = w * 4
        self.avgpool = torch.nn.AdaptiveAvgPool2d((1, 1))
        self.fc = torch.nn.Linear(2048, 1000)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        return self.fc(torch.flatten(self.avgpool(x), 1))


# ---------------------------------------------------------------------------
# Stub installation
# ---------------------------------------------------------------------------

def _stub_module(name):
    """ModuleType with a real ModuleSpec — transformers' lazy import machinery
    probes ``find_spec`` on already-imported modules and raises ValueError on
    the default ``__spec__ = None``."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


def install_stubs():
    """Install (or extend) the pytorch_lightning / fairseq / torchvision
    stubs.  Cooperative with test_reference_pipeline_golden's torchvision
    transforms stub: attaches ``models`` to any existing module."""

    if "pytorch_lightning" not in sys.modules:
        pl = _stub_module("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            def save_hyperparameters(self, *a, **k):
                pass

            def log(self, *a, **k):
                pass

            @property
            def device(self):
                return torch.device("cpu")

        pl.LightningModule = LightningModule
        sys.modules["pytorch_lightning"] = pl

    if "fairseq.optim.adafactor" not in sys.modules:
        fairseq = _stub_module("fairseq")
        optim = _stub_module("fairseq.optim")
        ada = _stub_module("fairseq.optim.adafactor")

        class Adafactor:  # noqa: D401 - import-only placeholder
            def __init__(self, *a, **k):
                raise RuntimeError("reference optimizer is not exercised in "
                                   "eval-forward goldens")

        ada.Adafactor = Adafactor
        fairseq.optim = optim
        optim.adafactor = ada
        sys.modules["fairseq"] = fairseq
        sys.modules["fairseq.optim"] = optim
        sys.modules["fairseq.optim.adafactor"] = ada

    tv = sys.modules.get("torchvision")
    if tv is not None and tv.__spec__ is None:
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    if tv is None:
        tv = _stub_module("torchvision")
        sys.modules["torchvision"] = tv
    if "torchvision.models" not in sys.modules:
        models = _stub_module("torchvision.models")

        def _resnet(pretrained=False, **kw):
            return TorchvisionLayoutResNet()

        models.resnet101 = _resnet
        models.resnet50 = _resnet
        tv.models = models
        sys.modules["torchvision.models"] = models


def load_reference_module(filename):
    """Execute ``/root/reference/models/<filename>`` with stubs installed."""
    install_stubs()
    name = "ref_model_" + filename.replace(".py", "")
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_MODELS, filename))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# torch-1.x compatibility shims (instance-level, math-preserving)
# ---------------------------------------------------------------------------

def patch_legacy_transformer(container):
    """Re-bind a ``nn.TransformerEncoder``/``Decoder`` instance's forward to
    the torch-1.x layer-loop semantics.

    Needed when the container wraps the reference's CUSTOM layers
    (``GatedTransformerDecoderLayer``, ``HeadSpecificGatedAttention`` encoder
    layers, GTM.py's tuple-returning decoder layer): torch 2.x containers
    pass ``is_causal`` hints those layers don't accept and introspect
    ``layers[0].self_attn.batch_first`` which they lack.  The replacement is
    the documented torch-1.x loop — identical math for these call sites.
    """
    if isinstance(container, torch.nn.TransformerEncoder):
        def forward(self, src, mask=None, src_key_padding_mask=None):
            out = src
            for mod in self.layers:
                out = mod(out, src_mask=mask,
                          src_key_padding_mask=src_key_padding_mask)
            if self.norm is not None:
                out = self.norm(out)
            return out
    elif isinstance(container, torch.nn.TransformerDecoder):
        def forward(self, tgt, memory, tgt_mask=None, memory_mask=None,
                    tgt_key_padding_mask=None, memory_key_padding_mask=None):
            out = tgt
            for mod in self.layers:
                out = mod(out, memory, tgt_mask=tgt_mask,
                          memory_mask=memory_mask,
                          tgt_key_padding_mask=tgt_key_padding_mask,
                          memory_key_padding_mask=memory_key_padding_mask)
            if self.norm is not None:
                out = self.norm(out)
            return out
    else:
        raise TypeError(f"not a transformer container: {type(container)}")
    container.forward = types.MethodType(forward, container)
    return container


def _fake_bert_tokens(text, hidden=768, tokens=6):
    """Deterministic per-description token matrix standing in for BERT output
    (zero egress: bert-base-uncased is not downloadable here).  Seeded by
    crc32 of the text so both the fake pipeline and the precomputed
    ``text_features`` side derive identical values."""
    rng = np.random.default_rng(zlib.crc32(text.encode("utf-8")))
    return rng.standard_normal((tokens, hidden)).astype(np.float32)


def fake_bert_features(text, hidden=768, tokens=6):
    """The ``x[0][1:-1].mean(axis=0)`` reduction GTM.py:147 applies, computed
    from the same fake token matrix the pipeline stub returns."""
    return _fake_bert_tokens(text, hidden, tokens)[1:-1].mean(axis=0)


def make_fake_bert_pipeline(hidden=768, tokens=6):
    """Replacement for ``transformers.pipeline('feature-extraction', ...)``
    (GTM.py:131) with the same output format: per text, ``[0][seq][768]``
    nested lists."""

    class _FakeBert:
        def __call__(self, texts):
            return [[_fake_bert_tokens(t, hidden, tokens).tolist()]
                    for t in texts]

    def _pipeline(task, model=None, **kw):
        assert task == "feature-extraction"
        return _FakeBert()

    return _pipeline


def patch_cpu_text_embedder(text_embedder):
    """GTM.py:148 moves the stacked BERT means to ``'cuda:N'`` uncondition-
    ally; re-bind the instance forward with identical math minus the device
    move (this container's torch is CPU-only)."""

    def forward(self, category, color, fabric):
        textual_description = [
            self.col_dict[color.detach().cpu().numpy().tolist()[i]] + " "
            + self.fab_dict[fabric.detach().cpu().numpy().tolist()[i]] + " "
            + self.cat_dict[category.detach().cpu().numpy().tolist()[i]]
            for i in range(len(category))]
        word_embeddings = self.word_embedder(textual_description)
        word_embeddings = [torch.FloatTensor(x[0][1:-1]).mean(axis=0)
                           for x in word_embeddings]
        word_embeddings = torch.stack(word_embeddings)
        return self.dropout(self.fc(word_embeddings))

    text_embedder.forward = types.MethodType(forward, text_embedder)
    return text_embedder


def patch_cpu_mask(gtrend_embedder):
    """GTM.py:101-107 hardcodes ``.to('cuda:N')`` on the encoder mask; this
    re-binds the instance method with the identical gcd-block mask math on
    CPU (the reference never ran CPU-only)."""
    import math

    def _generate_encoder_mask(self, size, forecast_horizon):
        mask = torch.zeros((size, size))
        split = math.gcd(size, forecast_horizon)
        for i in range(0, size, split):
            mask[i:i + split, i:i + split] = 1
        return mask.float().masked_fill(mask == 0, float("-inf")).masked_fill(
            mask == 1, float(0.0))

    gtrend_embedder._generate_encoder_mask = types.MethodType(
        _generate_encoder_mask, gtrend_embedder)
    return gtrend_embedder


# ---------------------------------------------------------------------------
# Weight plumbing
# ---------------------------------------------------------------------------

def randomize_batchnorm_stats(model, seed=0):
    """Perturb running stats away from the (0, 1) init so eval-mode BN is a
    real test of the statistics plumbing, as the hand-built goldens do."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.uniform_(-0.2, 0.2, generator=g)
                m.running_var.uniform_(0.8, 1.2, generator=g)


_SEQ_TO_TORCHVISION = {"0": "conv1", "1": "bn1", "4": "layer1",
                       "5": "layer2", "6": "layer3", "7": "layer4"}


def resnet_variables_from_sequential(cnn):
    """Reference ImageEncoders wrap ``children()[:-2]`` in ``nn.Sequential``
    (keys ``0.weight``, ``4.0.conv1.weight``, ...); rename back to
    torchvision naming and convert through the production weight map."""
    from visuelle2_tpu.models.resnet import params_from_torch

    sd = {}
    for k, v in cnn.state_dict().items():
        idx, rest = k.split(".", 1)
        name = _SEQ_TO_TORCHVISION.get(idx)
        if name is not None:
            sd[f"{name}.{rest}"] = v
    return params_from_torch(sd, arch="tiny")
