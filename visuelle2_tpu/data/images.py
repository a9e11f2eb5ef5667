"""Image store: decode-once JPEG cache + on-device normalization.

The reference decodes, resizes and ImageNet-normalizes every JPEG on every
``__getitem__`` inside DataLoader worker processes
(``/root/reference/dataset.py:51-66``).  TPU-native redesign:

* JPEGs are decoded **once** at ingest to a ``uint8 [N, 299, 299, 3]`` memmap
  (NHWC, the natural TPU conv layout).  Random-access batch assembly is then a
  pure memory gather — no per-step PIL work.
* The ``÷255`` + ImageNet mean/std normalization runs **on device**, fused by
  XLA into the first convolution's input (see ``normalize_images``), so only
  uint8 bytes cross the host->device boundary (4x less PCIe/DMA traffic than
  shipping float32).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

IMAGE_SIZE = 299  # reference dataset.py:55 (Resize((299, 299)))
IMAGENET_MEAN = (0.485, 0.456, 0.406)  # reference dataset.py:57
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_images(uint8_nhwc, dtype=None):
    """uint8 [..., H, W, 3] -> normalized float [..., H, W, 3].

    Runs under jit; XLA fuses the scale/shift into the consumer conv.
    Matches torchvision ``ToTensor`` + ``Normalize`` (dataset.py:56-57).
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    x = uint8_nhwc.astype(dtype) / jnp.asarray(255.0, dtype)
    mean = jnp.asarray(IMAGENET_MEAN, dtype)
    std = jnp.asarray(IMAGENET_STD, dtype)
    return (x - mean) / std


class ImageStore:
    """Decode-once memmapped uint8 image cache.

    ``build`` decodes the JPEG tree once (PIL, bilinear resize to 299x299 —
    same resampling as torchvision ``Resize((299,299))``) and writes a
    ``.npy`` memmap next to the dataset.  ``gather`` assembles a batch by
    integer indexing into the memmap.
    """

    def __init__(self, pixels: np.ndarray):
        assert pixels.dtype == np.uint8 and pixels.ndim == 4
        self.pixels = pixels

    def __len__(self) -> int:
        return int(self.pixels.shape[0])

    def gather(self, indices) -> np.ndarray:
        return np.ascontiguousarray(self.pixels[np.asarray(indices)])

    @staticmethod
    def cache_path(dataset_path: str, split: str) -> str:
        return os.path.join(dataset_path, f"images_{split}_{IMAGE_SIZE}.npy")

    @classmethod
    def build(cls, img_root: str, image_paths: Sequence[str],
              cache_file: Optional[str] = None,
              size: int = IMAGE_SIZE) -> "ImageStore":
        if cache_file and os.path.isfile(cache_file):
            return cls(np.load(cache_file, mmap_mode="r"))

        from PIL import Image, ImageFile

        ImageFile.LOAD_TRUNCATED_IMAGES = True  # reference dataset.py:11

        n = len(image_paths)
        if cache_file:
            pixels = np.lib.format.open_memmap(
                cache_file, mode="w+", dtype=np.uint8, shape=(n, size, size, 3))
        else:
            pixels = np.zeros((n, size, size, 3), np.uint8)
        for i, rel in enumerate(image_paths):
            img = Image.open(os.path.join(img_root, rel)).convert("RGB")
            img = img.resize((size, size), Image.BILINEAR)
            pixels[i] = np.asarray(img, dtype=np.uint8)
        if cache_file:
            pixels.flush()
        return cls(pixels)
