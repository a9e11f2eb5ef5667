"""One-time pretrained-backbone conversion: torchvision -> .npz artifact.

The reference finetunes a *pretrained* ResNet-101 (and the legacy encoder an
InceptionV3) from torchvision (``/root/reference/models/CrossAttnRNN21.py:61``,
``modules.py:69``).  This container is zero-egress, so the weights cannot be
downloaded here; run this script ONCE on any machine with torchvision +
internet, copy the ``.npz`` next to your dataset, and every image encoder
picks it up via ``--pretrained_backbone <path>`` (see cli/common.py).

    python scripts/convert_pretrained.py --arch resnet101 --out resnet101.npz
    python scripts/convert_pretrained.py --arch inception_v3 --out inception.npz

The converters themselves (``models/resnet.py::params_from_torch``,
``models/inception.py::inception_params_from_torch``) are golden-tested
against torch with random weights in tests/test_models.py, so a successful
conversion here is numerically exact by construction.
"""

from __future__ import annotations

import argparse
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", choices=["resnet101", "resnet50", "inception_v3"],
                   default="resnet101")
    p.add_argument("--out", required=True)
    args = p.parse_args()

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


if __name__ == "__main__":
    main()
