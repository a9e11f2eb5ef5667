"""One-time baseline measurement: reference-equivalent torch-CPU forward.

The container has no GPU and no torchvision/lightning/fairseq, so the
reference's own numbers can't be reproduced here.  As a transparent stand-in,
this measures a torch-CPU forward of the reference Demand architecture's
dominant compute — ResNet-101 at 299x299 (>99% of FLOPs,
``/root/reference/models/Proposed_model_v4.py:204-289`` uses the same
backbone) plus a v4-scale head — and records forecasts/sec into
``BASELINE_MEASURED.json`` for bench.py's ``vs_baseline``.  See BASELINE.md.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import torch


class Bottleneck(torch.nn.Module):
    def __init__(self, cin, width, stride, downsample):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(width)
        self.conv2 = torch.nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(width)
        self.conv3 = torch.nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(width * 4)
        self.downsample = downsample
        self.relu = torch.nn.ReLU(inplace=True)

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idn)


def resnet_backbone(blocks=(3, 4, 23, 3)):
    layers = [
        torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False),
        torch.nn.BatchNorm2d(64),
        torch.nn.ReLU(inplace=True),
        torch.nn.MaxPool2d(3, 2, 1),
    ]
    cin = 64
    for i, (n, w) in enumerate(zip(blocks, (64, 128, 256, 512))):
        for b in range(n):
            stride = 2 if (i > 0 and b == 0) else 1
            ds = None
            if b == 0:
                ds = torch.nn.Sequential(
                    torch.nn.Conv2d(cin, w * 4, 1, stride, bias=False),
                    torch.nn.BatchNorm2d(w * 4))
            layers.append(Bottleneck(cin, w, stride, ds))
            cin = w * 4
    return torch.nn.Sequential(*layers)


class DemandForward(torch.nn.Module):
    """ResNet-101 + 1x1 proj + pool + v4-scale fusion/decoder head."""

    def __init__(self, emb=32, hidden=64):
        super().__init__()
        self.backbone = resnet_backbone()
        self.proj = torch.nn.Conv2d(2048, emb, 1)
        self.head = torch.nn.Sequential(
            torch.nn.Linear(emb, hidden), torch.nn.ReLU(),
            torch.nn.Linear(hidden, 12))

    def forward(self, img):
        f = self.backbone(img)
        f = self.proj(f).mean(dim=(2, 3))
        return self.head(f)


def main():
    torch.set_num_threads(os.cpu_count() or 8)
    model = DemandForward().eval()
    bs = 8
    x = torch.randn(bs, 3, 299, 299)
    with torch.no_grad():
        model(x)  # warmup
        iters = 3
        t0 = time.perf_counter()
        for i in range(iters):
            model(x + i * 0.01)
        dt = (time.perf_counter() - t0) / iters
    fps = bs / dt
    out = {
        "torch_cpu_forecasts_per_sec": round(fps, 3),
        "batch_size": bs,
        "threads": torch.get_num_threads(),
        "note": "reference-equivalent Demand forward (ResNet-101 @299, v4 head) "
                "on torch CPU; no GPU/torchvision in this container",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
