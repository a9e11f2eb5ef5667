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


def test_loader_forced_image_slots(arrays_and_store):
    """``image_slots=N`` pins the slot count exactly (serving an exported
    dedup artifact must reproduce the exporting host's slot count regardless
    of the local device topology — cli/serve.py); an insufficient forced
    count is rejected up front."""
    arrays, store = arrays_and_store
    bs = 16
    auto = BatchLoader(arrays, store, bs, native_prefetch=False,
                       dedup_images=True)
    forced = BatchLoader(arrays, store, bs, native_prefetch=False,
                         dedup_images=True,
                         image_slots=auto.image_slots + 3)
    assert forced.image_slots == auto.image_slots + 3
    for b in forced:
        assert b["images"].shape[0] == forced.image_slots
    with pytest.raises(ValueError, match="image_slots"):
        BatchLoader(arrays, store, bs, native_prefetch=False,
                    dedup_images=True, image_slots=1)


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
    # one_pass (whole split in one lax.scan dispatch) composes with dedup
    # batches: images [nb, slots, ...] shard their slot axis over data.
    one = score_split(
        model, variables,
        BatchLoader(arrays, store, 16, native_prefetch=False,
                    dedup_images=True, image_slots_multiple=8),
        measure_throughput=False, one_pass=True)
    np.testing.assert_allclose(one.wape, plain.wape, rtol=1e-5)
    assert one.num_forecasts == plain.num_forecasts
    # The accounted FLOPs/sample must actually drop.  At these tiny test dims
    # the backbone is only ~half the model's FLOPs (slots 8 vs batch 16 ->
    # ~0.6x total); at production dims the backbone is ~99% and the ratio
    # approaches slots/batch.
    assert dedup.gflops_per_sample < 0.75 * plain.gflops_per_sample


# ------------------------------------------------------------------ training


def test_train_dedup_grouped_shuffle_covers_every_row(arrays_and_store):
    """Shuffled dedup epochs: rows grouped by photo, full coverage, a fresh
    group permutation per epoch, and every block within the static slot
    bound."""
    arrays, store = arrays_and_store
    loader = BatchLoader(arrays, store, 16, native_prefetch=False,
                         shuffle=True, drop_remainder=True,
                         dedup_images=True)
    n = len(arrays)
    orders = []
    for _ in range(3):
        blocks = loader._epoch_index_blocks()
        order = np.concatenate(blocks)
        # drop_remainder trims the tail; the retained prefix is duplicate-free
        assert len(np.unique(order)) == len(order) <= n
        # rows sharing a photo are contiguous: group changes only at group
        # boundaries -> number of distinct runs == number of distinct photos
        imgs = store.row_to_img[order]
        runs = 1 + int(np.sum(imgs[1:] != imgs[:-1]))
        assert runs == len(np.unique(imgs))
        for b in blocks:
            assert len(np.unique(store.image_indices(b))) <= loader.image_slots
        orders.append(order)
    assert not np.array_equal(orders[0], orders[1])  # reshuffled per epoch


def test_train_dedup_slot_bound_is_tight_and_safe():
    """The static worst-case slot bound holds for adversarial group layouts."""
    rng = np.random.default_rng(0)
    for trial in range(5):
        sizes = rng.integers(1, 9, size=40)
        row_to_img = np.repeat(np.arange(len(sizes)), sizes)
        n = len(row_to_img)
        pixels = np.zeros((len(sizes), 4, 4, 3), np.uint8)
        store = ImageStore(pixels, row_to_img=row_to_img)

        class _A:  # minimal arrays stand-in
            demand = True

            def __len__(self):
                return n

        a = _A()
        a.cat = np.zeros(n, np.int32); a.col = np.zeros(n, np.int32)
        a.fab = np.zeros(n, np.int32); a.store = np.zeros(n, np.int32)
        a.temporal = np.zeros((n, 4), np.float32)
        a.gtrends = np.zeros((n, 3, 8), np.float32)
        a.ts = np.zeros((n, 12), np.float32)
        loader = BatchLoader(a, store, 16, native_prefetch=False,
                             shuffle=True, dedup_images=True)
        for _ in range(4):  # different group permutations each epoch
            for b in loader:  # _gather asserts uniques <= image_slots
                assert b["images"].shape[0] == loader.image_slots


def test_dedup_gradient_parity_through_gather(synthetic_dataset):
    """The feature gather's scatter-add backward against an exact oracle.

    Duplication 1 with a shuffled block: img_idx is a REAL (non-identity)
    permutation, so the gradient must route each row's contribution back to
    its slot.  Dropout/BN-stat noise is excluded by differentiating the
    eval-mode loss (dropout is drawn on the slot axis pre-gather, so
    train-mode masks cannot align between the two layouts — that path is
    covered by the convergence test below)."""
    import jax
    import jax.numpy as jnp

    from visuelle2_tpu.models import VocabSizes, build
    from visuelle2_tpu.train.loop import mse_loss, target_and_pred

    arrays = load_visuelle2(synthetic_dataset, "train", demand=True,
                            output_len=12)
    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 255, (len(arrays), 32, 32, 3), dtype=np.uint8)
    store = ImageStore(pixels)  # row_to_img = identity -> duplication 1

    dedup = next(iter(BatchLoader(arrays, store, 16, native_prefetch=False,
                                  shuffle=True, seed=3, dedup_images=True)))
    assert dedup["images"].shape[0] == 16  # d=1: slots == batch
    assert np.any(dedup["img_idx"] != np.arange(16))  # genuinely permuted
    expanded = dict(dedup)
    expanded["images"] = dedup["images"][dedup["img_idx"]]
    del expanded["img_idx"]

    model = build("gated_v4", vocab=VocabSizes(5, 6, 5, 126), output_len=12,
                  embedding_dim=16, hidden_dim=16, image_arch="tiny")
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, expanded,
                           train=False)

    def loss_fn(params, batch):
        out, _ = model.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             batch, train=False)
        target, pred = target_and_pred(batch, out)
        return mse_loss(target, pred, batch["mask"])

    grad = jax.jit(jax.grad(loss_fn))
    g1 = grad(variables["params"], expanded)
    g2 = grad(variables["params"], dedup)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6),
        g1, g2)


def test_train_loop_converges_with_dedup(arrays_and_store):
    """End-to-end: a few dedup-sampled epochs at duplication 4 train the
    flagship (loss finite and decreasing)."""
    import jax

    from visuelle2_tpu.models import VocabSizes, build
    from visuelle2_tpu.train.loop import TrainConfig, Trainer

    arrays, store = arrays_and_store
    loader = BatchLoader(arrays, store, 16, native_prefetch=False,
                         shuffle=True, drop_remainder=True, dedup_images=True,
                         image_slots_multiple=jax.device_count())
    assert loader.image_slots < 16  # duplication actually shrinks the batch
    model = build("gated_v4", vocab=VocabSizes(5, 6, 5, 126), output_len=12,
                  embedding_dim=16, hidden_dim=16, image_arch="tiny")
    trainer = Trainer(model, TrainConfig(batch_size=16, learning_rate=5e-3,
                                         epochs=3))
    state = trainer.init_state(next(iter(loader)))
    key = jax.random.key(0)
    losses = []
    for _ in range(3):
        for batch in loader:
            state, m = trainer.train_step(state, batch, key)
            losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
