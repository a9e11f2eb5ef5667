"""One-time pretrained-weight conversion: torchvision/BERT -> local artifacts.

The reference finetunes a *pretrained* ResNet-101 (and the legacy encoder an
InceptionV3) from torchvision (``/root/reference/models/CrossAttnRNN21.py:61``,
``modules.py:69``) and runs a frozen BERT text featurizer
(``/root/reference/models/GTM.py:136-148``).  This container is zero-egress,
so the weights cannot be downloaded here; run this script ONCE on any machine
with internet, copy the artifacts next to your dataset, and the framework
picks them up.

**On the egress machine** (torch + torchvision + transformers installed):

    python scripts/convert_pretrained.py --arch resnet101 --out resnet101.npz
    python scripts/convert_pretrained.py --arch inception_v3 --out inception.npz
    python scripts/convert_pretrained.py --arch bert --out bert_cache/

**Anywhere** (this container included — validates an artifact against the
shipped structural manifest and prints its SHA-256 for the drop record):

    python scripts/convert_pretrained.py --verify resnet101.npz --arch resnet101

**Back here**: pass ``--pretrained_backbone resnet101.npz`` to any train CLI
(cli/common.py splices it into every image encoder), and export
``VISUELLE2_BERT_PATH=bert_cache/`` so gtm_v1's TextFeaturizer loads the
local BERT snapshot instead of its hashed fallback.

The CNN converters (``models/resnet.py::params_from_torch``,
``models/inception.py::inception_params_from_torch``) are golden-tested
against torch with random weights, so a successful conversion is numerically
exact by construction; the manifest check (``scripts/pretrained_manifest.json``,
regenerate with ``--write_manifest``) proves an artifact produced elsewhere
is structurally what ``--pretrained_backbone`` expects BEFORE a training run
is burned on it.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# The npz codec lives in the package so the writer (here) and the reader
# (models/pretrained.py, used by --pretrained_backbone) can never drift.
from visuelle2_tpu.models.pretrained import (  # noqa: E402
    flatten_tree,
    load_backbone_npz as load_variables,
    save_backbone_npz as save_variables,
)

MANIFEST_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "pretrained_manifest.json")
CNN_ARCHS = ("resnet101", "resnet50", "inception_v3")


def expected_flat_spec(arch: str):
    """npz key -> {shape, dtype} for a converted ``arch`` artifact, derived
    from the framework's own flax backbone via ``jax.eval_shape`` (no
    compute, no torch).  The golden converter tests pin that
    ``params_from_torch`` output trees equal these init trees."""
    import jax
    import jax.numpy as jnp

    if arch == "inception_v3":
        from visuelle2_tpu.models.inception import InceptionV3Backbone

        mod = InceptionV3Backbone()
        x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    else:
        from visuelle2_tpu.models.resnet import STAGE_BLOCKS, ResNetBackbone

        mod = ResNetBackbone(STAGE_BLOCKS[arch])
        x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: mod.init(jax.random.key(0), x, train=False))

    def _flatten(tree, prefix):
        out = {}
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else str(k)
            if hasattr(v, "items"):
                out.update(_flatten(v, key))
            else:
                out[key] = {"shape": list(v.shape), "dtype": str(v.dtype)}
        return out

    flat = {}
    for coll, sub in variables.items():
        flat.update(_flatten(sub, coll))
    return flat


def write_manifest(path: str = MANIFEST_PATH):
    manifest = {arch: expected_flat_spec(arch) for arch in CNN_ARCHS}
    with open(path, "w") as f:
        json.dump(manifest, f, indent=0, sort_keys=True)
    for arch, spec in manifest.items():
        print(f"{arch}: {len(spec)} arrays")
    print(f"manifest -> {path}")


def verify_artifact(npz_path: str, arch: str,
                    manifest_path: str = MANIFEST_PATH) -> str:
    """Validate ``npz_path`` against the shipped manifest; returns the
    artifact's SHA-256 (record it with the drop).  Raises SystemExit with a
    precise diff on any structural mismatch."""
    with open(manifest_path) as f:
        want = json.load(f)[arch]
    with np.load(npz_path) as z:
        got = {k: {"shape": list(z[k].shape), "dtype": str(z[k].dtype)}
               for k in z.files}
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    bad = sorted(k for k in set(want) & set(got) if want[k] != got[k])
    if missing or extra or bad:
        raise SystemExit(
            f"{npz_path} does NOT match the {arch} manifest:\n"
            f"  missing ({len(missing)}): {missing[:5]}\n"
            f"  extra ({len(extra)}): {extra[:5]}\n"
            f"  shape/dtype mismatch ({len(bad)}): "
            f"{[(k, want[k], got[k]) for k in bad[:3]]}")
    h = hashlib.sha256()
    with open(npz_path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    digest = h.hexdigest()
    print(f"{npz_path}: matches {arch} manifest "
          f"({len(want)} arrays)  sha256={digest}")
    return digest


def snapshot_bert(out_dir: str):
    """Save bert-base-uncased (model + tokenizer) into ``out_dir``; point
    ``VISUELLE2_BERT_PATH`` at it on the zero-egress machine."""
    from transformers import AutoModel, AutoTokenizer

    AutoModel.from_pretrained("bert-base-uncased").save_pretrained(out_dir)
    AutoTokenizer.from_pretrained("bert-base-uncased").save_pretrained(out_dir)
    print(f"wrote BERT snapshot -> {out_dir} "
          f"(export VISUELLE2_BERT_PATH={out_dir})")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", choices=list(CNN_ARCHS) + ["bert"],
                   default="resnet101")
    p.add_argument("--out", default="")
    p.add_argument("--verify", default="",
                   help="validate an .npz against the shipped manifest and "
                        "print its sha256 (no torch needed)")
    p.add_argument("--write_manifest", action="store_true",
                   help="regenerate scripts/pretrained_manifest.json from "
                        "the framework's own backbone definitions")
    args = p.parse_args()

    if args.write_manifest:
        return write_manifest()
    if args.verify:
        return verify_artifact(args.verify, args.arch)
    if not args.out:
        sys.exit("--out is required for conversion")
    if args.arch == "bert":
        return snapshot_bert(args.out)

    try:
        import torchvision.models as tvm
    except ImportError:
        sys.exit("torchvision is required (run this on a machine with "
                 "internet + torchvision, then copy the .npz here)")

    if args.arch == "inception_v3":
        from visuelle2_tpu.models.inception import inception_params_from_torch

        net = tvm.inception_v3(weights="DEFAULT", aux_logits=True)
        variables = inception_params_from_torch(net.state_dict())
    else:
        from visuelle2_tpu.models.resnet import params_from_torch

        net = getattr(tvm, args.arch)(weights="DEFAULT")
        variables = params_from_torch(net.state_dict(), arch=args.arch)
    save_variables(variables, args.out)
    n = sum(v.size for v in flatten_tree(variables["params"]).values())
    print(f"wrote {args.out}: {n/1e6:.1f}M params ({args.arch})")
    if os.path.isfile(MANIFEST_PATH):
        verify_artifact(args.out, args.arch)


if __name__ == "__main__":
    main()
