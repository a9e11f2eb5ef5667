"""Serving-export round trip: StableHLO artifact == live model."""

import numpy as np
import pytest


@pytest.mark.parametrize("with_dedup", [False, True])
def test_export_roundtrip_matches_live_model(tmp_path, with_dedup):
    import jax

    from __graft_entry__ import _synthetic_batch
    from visuelle2_tpu.eval.export import export_forecaster, load_forecaster
    from visuelle2_tpu.models import VocabSizes, build

    model = build("gated_v4", vocab=VocabSizes(5, 6, 5, 126), output_len=12,
                  embedding_dim=16, hidden_dim=16, image_arch="tiny")
    batch = _synthetic_batch(8, 32)
    if with_dedup:
        # Unique-image serving batch: 4 slots feeding 8 rows.
        batch["img_idx"] = (np.arange(8) // 2).astype(np.int32)
        batch["images"] = batch["images"][:4]
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, batch, train=False)

    path = str(tmp_path / "gated_v4.v2tpu")
    size = export_forecaster(model, variables, batch, path)
    assert size > 0

    forecast_fn, header = load_forecaster(path)
    assert header["version"] == 1
    got = np.asarray(forecast_fn(batch))
    want, _ = model.apply(variables, batch, train=False)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)

    # A fresh batch through the artifact (not just the example it was traced
    # with).
    b2 = _synthetic_batch(8, 32, seed=5)
    if with_dedup:
        b2["img_idx"] = batch["img_idx"]
        b2["images"] = b2["images"][:4]
    got2 = np.asarray(forecast_fn(b2))
    want2, _ = model.apply(variables, b2, train=False)
    np.testing.assert_allclose(got2, np.asarray(want2), atol=1e-5)


def test_export_rejects_wrong_file(tmp_path):
    from visuelle2_tpu.eval.export import load_forecaster

    p = tmp_path / "junk.bin"
    p.write_bytes(b"not an export")
    with pytest.raises(AssertionError, match="not a visuelle2_tpu export"):
        load_forecaster(str(p))
