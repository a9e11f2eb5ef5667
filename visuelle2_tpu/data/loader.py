"""Host-side batch assembly and device sharding.

Replaces the reference's ``torch.utils.data.DataLoader`` with worker processes
(``/root/reference/train_dl.py:84-90``): batches here are pure numpy gathers
from the preprocessed arrays + the uint8 image memmap, padded to a static batch
size (XLA traces once per shape) and placed on device with a batch-axis
``NamedSharding`` so per-chip shards transfer directly over ICI-attached HBM.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import numpy as np

from visuelle2_tpu.data.images import ImageStore
from visuelle2_tpu.data.pipeline import Visuelle2Arrays

Batch = Dict[str, np.ndarray]


def _pad_to(a: np.ndarray, n: int) -> np.ndarray:
    if a.shape[0] == n:
        return a
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad)


class BatchLoader:
    """Iterates static-shape batches over a Visuelle2Arrays split.

    Yields dict batches with a ``mask`` marking real rows (the tail batch is
    zero-padded to keep shapes static under jit).  Shuffling matches the
    reference semantics (``DataLoader(shuffle=True)``, reseeded per epoch).
    """

    def __init__(self, arrays: Visuelle2Arrays, images: Optional[ImageStore],
                 batch_size: int, *, shuffle: bool = False, seed: int = 21,
                 drop_remainder: bool = False, native_prefetch: bool = True,
                 extras: Optional[Dict[str, np.ndarray]] = None,
                 dedup_images: bool = False, image_slots_multiple: int = 1,
                 image_slots: int = 0):
        self.arrays = arrays
        self.images = images
        if images is not None and len(images) != len(arrays):
            raise ValueError(
                f"ImageStore maps {len(images)} rows but the split has "
                f"{len(arrays)} — a stale image cache (different subset or "
                f"--image_size)? Delete it so it rebuilds")
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        # Unique-image batches: VISUELLE2 rows are per (product, store) and
        # share product photos, so a batch of B rows covers far fewer than B
        # distinct images.  With dedup_images the loader orders rows by
        # image, ships each batch's UNIQUE images in a fixed number of slots
        # plus an ``img_idx`` row->slot map, and the model encodes each image
        # once (encoders gather features by img_idx).  Outputs are
        # numerically identical; backbone FLOPs drop by the duplication
        # factor.  ``image_slots_multiple`` rounds the slot count up so the
        # image axis stays divisible by the mesh's data axis when sharded.
        #
        # With ``shuffle=True`` (training) each epoch permutes the *group*
        # order (rows sharing a photo stay contiguous) and the rows within
        # each group — a grouped sampler, vs the reference's uniform row
        # shuffle (train_dl.py:84).  Per-row losses and the gather's
        # scatter-add gradients are exactly those of the duplicate-encode
        # batch, up to two train-mode deviations: (a) BatchNorm batch
        # statistics weight each unique photo once instead of by its
        # multiplicity, and (b) dropout inside the image encoder runs before
        # the img_idx gather, so rows sharing a photo see the SAME dropout
        # mask on their image features (independent masks per row in the
        # duplicate-encode batch).  Opt-in on the train CLIs for that reason.
        self.dedup_images = bool(dedup_images and images is not None)
        self.image_slots = 0
        # Pre-padding unique-image requirement: `image_slots` is rounded up
        # to a device-count multiple (or forced by an artifact signature), so
        # policies that need the TRUE duplication factor (cli/common.py
        # resolve_quantize) must read this, not image_slots.
        self.unique_image_slots = 0
        if self.dedup_images:
            self._dedup_order = np.argsort(images.row_to_img, kind="stable")
            if shuffle:
                # Static slot count must hold for every possible group
                # permutation: a window of B consecutive rows over contiguous
                # groups intersects at most 2 boundary groups plus however
                # many of the smallest groups fit fully in the remaining
                # B - 2 rows.
                sizes = np.sort(np.bincount(images.row_to_img))
                sizes = sizes[sizes > 0]
                interior = int(np.searchsorted(np.cumsum(sizes),
                                               batch_size - 2, side="right"))
                slots = min(len(sizes), batch_size, interior + 2)
                split = np.split(self._dedup_order, np.unique(
                    images.row_to_img[self._dedup_order], return_index=True)[1][1:])
                self._groups = split
            else:
                blocks = self._split_blocks(self._dedup_order)
                slots = max((len(np.unique(images.image_indices(b)))
                             for b in blocks), default=1)
            self.unique_image_slots = int(slots)
            if image_slots:
                # Forced slot count (e.g. serving an exported dedup artifact
                # whose signature was compiled with the exporting host's slot
                # count — cli/serve.py reads it from the artifact header, so
                # the local device topology never changes the shapes).
                if image_slots < slots:
                    raise ValueError(
                        f"image_slots={image_slots} < the {slots} unique-"
                        f"image slots this split/batch-size requires")
                self.image_slots = int(image_slots)
            else:
                m = max(1, int(image_slots_multiple))
                self.image_slots = -(-slots // m) * m
        # Per-item side arrays gathered/padded alongside the batch (e.g.
        # gtm_v1's ingest-time text_features [N, 768]).
        self.extras = extras or {}
        for k, v in self.extras.items():
            assert len(v) == len(arrays), (k, len(v), len(arrays))
        self._epoch = 0
        self._engine = None
        if native_prefetch and images is not None:
            # Image gather dominates batch assembly (~34 MB per 128x299x299x3
            # batch); route it through the C++ thread pool when available.
            from visuelle2_tpu import native

            if native.is_available():
                self._engine = native.shared_engine()

    def __len__(self) -> int:
        n = len(self.arrays)
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        """Pin the next iteration's shuffle to (seed, epoch) — the torch
        ``DistributedSampler.set_epoch`` analogue.  ``Trainer.fit`` calls
        this at every epoch start so a RESUMED process replays exactly the
        epoch orders the uninterrupted run would have used (required for
        exact mid-epoch resume, train/loop.py); bare iteration without it
        keeps the internal auto-incrementing counter."""
        self._epoch = int(epoch)

    @property
    def num_examples(self) -> int:
        return len(self.arrays)

    def _gather_no_images(self, idx: np.ndarray, pad_to: int) -> Batch:
        a = self.arrays
        batch: Batch = {
            "cat": a.cat[idx], "col": a.col[idx], "fab": a.fab[idx],
            "store": a.store[idx], "temporal": a.temporal[idx],
            "gtrends": a.gtrends[idx],
        }
        if a.demand:
            batch["ts"] = a.ts[idx]
        else:
            batch["X"] = a.X[idx]
            batch["y"] = a.y[idx]
        for k, v in self.extras.items():
            batch[k] = v[idx]
        mask = np.zeros(pad_to, np.float32)
        mask[: len(idx)] = 1.0
        batch = {k: _pad_to(v, pad_to) for k, v in batch.items()}
        batch["mask"] = mask
        return batch

    def _gather(self, idx: np.ndarray, pad_to: int) -> Batch:
        batch = self._gather_no_images(idx, pad_to)
        if self.images is None:
            return batch
        if self.dedup_images:
            uniq, inv = np.unique(self.images.image_indices(idx),
                                  return_inverse=True)
            assert len(uniq) <= self.image_slots, (len(uniq), self.image_slots)
            if len(uniq) < self.image_slots:
                # Fill spare slots with cyclic repeats of the batch's real
                # images, not zeros: their features are never gathered
                # (img_idx only addresses real slots), but train-mode
                # BatchNorm statistics run over every slot and must stay
                # in-distribution.
                uniq = uniq[np.resize(np.arange(len(uniq)), self.image_slots)]
            batch["images"] = self.images.pixels[uniq]
            img_idx = np.zeros(pad_to, np.int32)
            img_idx[: len(inv)] = inv.astype(np.int32)
            batch["img_idx"] = img_idx
        else:
            batch["images"] = _pad_to(self.images.gather(idx), pad_to)
        return batch

    def _split_blocks(self, order: np.ndarray):
        n = len(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_remainder else n
        return [order[s: s + self.batch_size] for s in range(0, stop, self.batch_size)]

    def _epoch_index_blocks(self):
        if self.dedup_images:
            if not self.shuffle:
                return self._split_blocks(self._dedup_order)
            rng = np.random.default_rng(self.seed + self._epoch)
            self._epoch += 1
            parts = [rng.permutation(self._groups[g])
                     for g in rng.permutation(len(self._groups))]
            order = np.concatenate(parts) if parts else np.zeros(0, np.int64)
            return self._split_blocks(order)
        order = np.arange(len(self.arrays))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
            self._epoch += 1
        return self._split_blocks(order)

    def __iter__(self) -> Iterator[Batch]:
        return self.iter_from(0)

    def iter_from(self, skip_blocks: int) -> Iterator[Batch]:
        """Iterate the epoch starting at batch ``skip_blocks`` — the
        skipped batches are never assembled (no image gather, no padding),
        which makes mid-epoch resume (train/loop.py ``skip_steps``)
        near-instant instead of replaying the epoch's data assembly."""
        blocks = self._epoch_index_blocks()[skip_blocks:]
        if not blocks:
            return
        # Deduped batches gather only the unique images — too small to be
        # worth the native double-buffer path.
        if self._engine is None or self.images is None or self.dedup_images:
            for idx in blocks:
                yield self._gather(idx, self.batch_size)
            return
        # Double-buffered: the native pool assembles batch t+1's image gather
        # while batch t is being consumed (device compute overlaps host IO).
        src = self.images.pixels
        pending = None

        def submit(idx):
            img_idx = np.ascontiguousarray(self.images.image_indices(idx), np.int64)
            out = np.empty((len(img_idx),) + src.shape[1:], np.uint8)
            return idx, self._engine.submit(src, img_idx, out)

        try:
            # The first submit sits inside the try: an exception between
            # submit() returning and ``pending`` being consumed must still
            # reach the finally-wait — C++ workers write into ``out``.
            pending = submit(blocks[0])
            for nxt in blocks[1:] + [None]:
                idx, handle = pending
                pending = None
                images = self._engine.wait(handle)
                batch = self._gather_no_images(idx, self.batch_size)
                batch["images"] = _pad_to(images, self.batch_size)
                pending = submit(nxt) if nxt is not None else None
                yield batch
        finally:
            # If the consumer abandons the iterator (e.g. next(iter(loader))),
            # the in-flight gather must complete before its output buffer is
            # garbage-collected — C++ workers write into it.
            if pending is not None:
                self._engine.wait(pending[1])


def shard_batch(batch: Batch, sharding=None) -> Batch:
    """Place a host batch on device, sharded over the batch axis.

    With ``sharding=None`` this is a plain ``device_put`` (single chip).
    """
    if sharding is None:
        return jax.device_put(batch)
    return jax.device_put(batch, sharding)
