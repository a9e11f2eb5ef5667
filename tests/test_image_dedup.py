"""Unique-image batches (loader ``dedup_images``): identical outputs with the
backbone run once per distinct product photo.

VISUELLE2 rows are per (product, store) and share product photos
(reference re-decodes and re-encodes the same JPEG for every row,
``/root/reference/dataset.py:51-66``).  With ``dedup_images`` the loader
ships each batch's unique images in fixed slots plus an ``img_idx``
row->slot map, and every image encoder gathers features by ``img_idx``
after encoding — numerically identical forecasts at 1/duplication of the
backbone FLOPs.
"""

import numpy as np
import pytest

from visuelle2_tpu.data.images import ImageStore
from visuelle2_tpu.data.loader import BatchLoader
from visuelle2_tpu.data.pipeline import load_visuelle2

DUP = 4  # rows sharing one photo


@pytest.fixture(scope="module")
def arrays_and_store(synthetic_dataset):
    arrays = load_visuelle2(synthetic_dataset, "train", demand=True,
                            output_len=12)
    n = len(arrays)
    u = -(-n // DUP)
    rng = np.random.default_rng(3)
    pixels = rng.integers(0, 255, (u, 32, 32, 3), dtype=np.uint8)
    store = ImageStore(pixels, row_to_img=np.arange(n) // DUP)
    return arrays, store


def test_loader_dedup_batches_are_equivalent(arrays_and_store):
    arrays, store = arrays_and_store
    bs = 16
    plain = BatchLoader(arrays, store, bs, native_prefetch=False)
    dedup = BatchLoader(arrays, store, bs, native_prefetch=False,
                        dedup_images=True, image_slots_multiple=8)

    assert dedup.image_slots % 8 == 0
    assert dedup.image_slots <= bs  # duplication actually shrinks the batch

    # The dedup loader iterates rows grouped by image: image-order blocks.
    order = np.argsort(store.row_to_img, kind="stable")
    for i, b in enumerate(dedup):
        assert b["images"].shape[0] == dedup.image_slots
        real = b["mask"].astype(bool)
        rows = order[i * bs: i * bs + int(real.sum())]
        expanded = b["images"][b["img_idx"]]
        # Each real row's expanded image equals its own store image.
        np.testing.assert_array_equal(expanded[real], store.gather(rows))
        # Non-image fields come from the same rows.
        np.testing.assert_array_equal(b["cat"][real], arrays.cat[rows])


@pytest.mark.parametrize("name", ["gated_v4", "cross_attn_rnn_demand"])
def test_model_forward_identical_with_dedup(arrays_and_store, name):
    import jax

    from visuelle2_tpu.models import VocabSizes, build

    arrays, store = arrays_and_store
    loader = BatchLoader(arrays, store, 16, native_prefetch=False,
                         dedup_images=True)
    batch = next(iter(loader))
    expanded = dict(batch)
    expanded["images"] = batch["images"][batch["img_idx"]]
    del expanded["img_idx"]

    kwargs = dict(vocab=VocabSizes(5, 6, 5, 126), embedding_dim=16,
                  hidden_dim=16, image_arch="tiny")
    if name == "gated_v4":
        model = build(name, output_len=12, **kwargs)
    else:
        model = build(name, out_len=12, attention_dim=16,
                      use_teacher_forcing=False, **kwargs)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, expanded,
                           train=False)
    f_plain, _ = model.apply(variables, expanded, train=False)
    f_dedup, _ = model.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(f_dedup), np.asarray(f_plain),
                               atol=1e-6)


def test_score_split_metrics_invariant_to_dedup(arrays_and_store):
    import jax

    from visuelle2_tpu.eval.forecast import score_split
    from visuelle2_tpu.models import VocabSizes, build

    arrays, store = arrays_and_store
    model = build("gated_v4", vocab=VocabSizes(5, 6, 5, 126), output_len=12,
                  embedding_dim=16, hidden_dim=16, image_arch="tiny")
    batch0 = next(iter(BatchLoader(arrays, store, 16, native_prefetch=False)))
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, batch0, train=False)

    plain = score_split(
        model, variables, BatchLoader(arrays, store, 16, native_prefetch=False),
        measure_throughput=False)
    dedup = score_split(
        model, variables,
        BatchLoader(arrays, store, 16, native_prefetch=False,
                    dedup_images=True, image_slots_multiple=8),
        measure_throughput=False)
    assert dedup.num_forecasts == plain.num_forecasts
    np.testing.assert_allclose(dedup.wape, plain.wape, rtol=1e-5)
    np.testing.assert_allclose(dedup.mae, plain.mae, rtol=1e-5)
    # The accounted FLOPs/sample must actually drop.  At these tiny test dims
    # the backbone is only ~half the model's FLOPs (slots 8 vs batch 16 ->
    # ~0.6x total); at production dims the backbone is ~99% and the ratio
    # approaches slots/batch.
    assert dedup.gflops_per_sample < 0.75 * plain.gflops_per_sample
