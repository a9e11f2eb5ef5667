"""CLI entry points end-to-end on the synthetic dataset (in-process)."""

import numpy as np
import pytest

from visuelle2_tpu.cli import forecast_dl, forecast_stat, train_dl, train_transformer


def test_forecast_stat_cli(synthetic_dataset, capsys):
    args = forecast_stat.build_parser().parse_args([
        "--dataset_path", synthetic_dataset, "--method", "ses",
        "--use_teacher_forcing", "1", "--image_size", "32", "--batch_size", "16",
    ])
    wape, mae = forecast_stat.run(args)
    assert np.isfinite(wape) and np.isfinite(mae)
    out = capsys.readouterr().out
    assert "Results for ses" in out


def test_forecaster_num_layers_alias():
    """The reference forecasters spell the decoder-depth flag --num_layers
    (forecast_GTM.py:279) while its trainers say --num_hidden_layers
    (train_GTM_visuelle2.py:168); both must parse into the same dest so
    reference forecast commands drop in unchanged."""
    from visuelle2_tpu.cli import forecast_transformer

    p = forecast_transformer.build_parser
    assert p().parse_args(["--num_layers", "3"]).num_hidden_layers == 3
    assert p().parse_args(["--num_hidden_layers", "2"]).num_hidden_layers == 2
    assert p().parse_args([]).num_hidden_layers == 1



@pytest.fixture(scope="module")
def trained_ck21(synthetic_dataset, tmp_path_factory):
    """One task-0 CrossAttnRNN21 training shared by every test that only
    needs *a* trained checkpoint (suite-time: one training instead of one
    per test).  Returns (manager_root, best_step_path)."""
    root = str(tmp_path_factory.mktemp("ck") / "ckpt21")
    train_args = train_dl.build_parser().parse_args([
        "--dataset_path", synthetic_dataset, "--task_mode", "0",
        "--output_len", "1", "--epochs", "1", "--batch_size", "16",
        "--embedding_dim", "16", "--attention_dim", "16", "--hidden_dim", "16",
        "--image_arch", "tiny", "--image_size", "32",
        "--ckpt_dir", root,
    ])
    best = train_dl.run(train_args)
    assert best is not None and best.rstrip("/").split("/")[-1].isdigit()
    return root, best


def test_train_then_forecast_dl_cli(synthetic_dataset, tmp_path, trained_ck21):
    root, _best = trained_ck21

    fc_args = forecast_dl.build_parser().parse_args([
        "--dataset_path", synthetic_dataset, "--task_mode", "0",
        "--batch_size", "16",
        "--embedding_dim", "16", "--attention_dim", "16", "--hidden_dim", "16",
        "--image_arch", "tiny", "--image_size", "32",
        "--ckpt_path", root,
        "--export", str(tmp_path / "model.v2tpu"),
        "--metrics_out", str(tmp_path / "metrics.json"),
    ])
    result = forecast_dl.run(fc_args)
    assert np.isfinite(result.wape) and np.isfinite(result.mae)
    assert result.forecasts_per_sec_per_chip > 0
    import json

    with open(tmp_path / "metrics.json") as f:
        m = json.load(f)
    assert m["wape"] == result.wape and m["num_forecasts"] > 0

    # Serving: the exported artifact alone reproduces the checkpoint's
    # metrics (no model code / checkpoint restore on the serve side).
    from visuelle2_tpu.cli import serve

    sv = serve.build_parser().parse_args([
        "--dataset_path", synthetic_dataset, "--output_len", "1",
        "--batch_size", "16", "--image_arch", "tiny", "--image_size", "32",
        "--artifact", str(tmp_path / "model.v2tpu"),
    ])
    served = serve.run(sv)
    np.testing.assert_allclose(served["wape"], result.wape, rtol=1e-4)
    np.testing.assert_allclose(served["mae"], result.mae, rtol=1e-4)


def test_train_then_forecast_transformer_cli(synthetic_dataset, tmp_path):
    """Transformer train -> forecast handoff.  Regression: forecast must not
    need the training opt_state structure (grad-clip chain) to restore, and
    the restored WAPE must equal the training-time val_wWAPE.  Exercises the
    --use_img 0 ablation end-to-end too."""
    from visuelle2_tpu.cli import forecast_transformer

    common = ["--dataset_path", synthetic_dataset, "--model", "gated_v4",
              "--demand", "1", "--output_len", "12",
              "--batch_size", "16", "--embedding_dim", "16",
              "--hidden_dim", "16", "--image_arch", "tiny",
              "--image_size", "32", "--use_img", "0"]
    args = train_transformer.build_parser().parse_args(
        common + ["--epochs", "1", "--ckpt_dir", str(tmp_path / "ckptv4")])
    best = train_transformer.run(args)
    assert best is not None

    fc_args = forecast_transformer.build_parser().parse_args(
        common + ["--ckpt_path", str(tmp_path / "ckptv4")])
    result = forecast_transformer.run(fc_args)
    assert np.isfinite(result.wape) and np.isfinite(result.mae)

    # Dataset-free export: checkpoint -> artifact with a synthesized example
    # batch (vocab read from label dicts here; --vocab c,l,f works without
    # any dataset).  The artifact must load and run standalone.
    from visuelle2_tpu.cli import export as export_cli
    from visuelle2_tpu.eval.export import load_forecaster

    out = str(tmp_path / "v4.v2tpu")
    ex_args = export_cli.build_parser().parse_args([
        "--dataset_path", synthetic_dataset, "--model", "gated_v4",
        "--demand", "1", "--output_len", "12", "--batch_size", "16",
        "--embedding_dim", "16", "--hidden_dim", "16",
        "--image_arch", "tiny", "--image_size", "32", "--use_img", "0",
        "--ckpt_path", str(tmp_path / "ckptv4"), "--out", out,
    ])
    assert export_cli.run(ex_args) == out
    fn, header = load_forecaster(out)
    from visuelle2_tpu.cli.common import build_loaders

    loaders, _, _ = build_loaders(fc_args, demand=True, output_len=12,
                                  splits=("test",))
    got = np.asarray(fn(next(iter(loaders["test"]))))
    assert got.shape == (16, 12) and np.all(np.isfinite(got))


@pytest.mark.slow
def test_train_then_forecast_gtm_v1_cli(synthetic_dataset, tmp_path):
    """gtm_v1 (original VISUELLE-1 GTM) end to end: ingest-time text
    featurization attaches as a batch extra, trains, and forecasts from the
    checkpoint."""
    from visuelle2_tpu.cli import forecast_transformer

    common = ["--dataset_path", synthetic_dataset, "--model", "gtm_v1",
              "--demand", "1", "--output_len", "12",
              "--batch_size", "16", "--embedding_dim", "16",
              "--hidden_dim", "16", "--image_arch", "tiny",
              "--image_size", "32"]
    args = train_transformer.build_parser().parse_args(
        common + ["--epochs", "1", "--ckpt_dir", str(tmp_path / "ckv1")])
    best = train_transformer.run(args)
    assert best is not None

    art = tmp_path / "v1.v2tpu"
    fc_args = forecast_transformer.build_parser().parse_args(
        common + ["--ckpt_path", str(tmp_path / "ckv1"),
                  "--export", str(art)])
    result = forecast_transformer.run(fc_args)
    assert np.isfinite(result.wape) and np.isfinite(result.mae)

    # Artifact-serve path: serve must detect the text_features input key,
    # build the features locally, and reproduce the checkpoint's metrics.
    from visuelle2_tpu.cli import serve as serve_cli

    sv = serve_cli.build_parser().parse_args([
        "--dataset_path", synthetic_dataset, "--artifact", str(art),
        "--demand", "1", "--output_len", "12", "--image_arch", "tiny",
        "--image_size", "32"])
    served = serve_cli.run(sv)
    np.testing.assert_allclose(served["wape"], result.wape, rtol=1e-4)

    # Featurizer fingerprint guard, serve side: an artifact exported with
    # BERT features must refuse a crc32-fallback host (tamper the artifact
    # header's provenance to simulate).
    import json

    from visuelle2_tpu.eval.export import _MAGIC

    raw = art.read_bytes()
    n = int.from_bytes(raw[len(_MAGIC):len(_MAGIC) + 8], "little")
    hdr = json.loads(raw[len(_MAGIC) + 8:len(_MAGIC) + 8 + n])
    assert hdr["provenance"]["text_fingerprint"] == "hashed-crc32-v1"
    hdr["provenance"]["text_fingerprint"] = "bert-base-uncased"
    enc = json.dumps(hdr).encode()
    art.write_bytes(_MAGIC + len(enc).to_bytes(8, "little") + enc
                    + raw[len(_MAGIC) + 8 + n:])
    with pytest.raises(SystemExit, match="text featurizer mismatch"):
        serve_cli.run(sv)

    # Featurizer fingerprint guard, forecast side (hparams.json manifest).
    hp_path = tmp_path / "ckv1" / "hparams.json"
    hp = json.loads(hp_path.read_text())
    assert hp["text_fingerprint"] == "hashed-crc32-v1"
    hp["text_fingerprint"] = "bert-base-uncased"
    hp_path.write_text(json.dumps(hp))
    with pytest.raises(SystemExit, match="text featurizer mismatch"):
        forecast_transformer.run(fc_args)


def test_score_split_one_pass_matches_batched(synthetic_dataset):
    """The single-dispatch scan over the whole split must reproduce the
    per-batch scorer exactly, data-sharded over the 8-device mesh."""
    import jax

    from visuelle2_tpu.data.images import ImageStore
    from visuelle2_tpu.data.loader import BatchLoader
    from visuelle2_tpu.data.pipeline import load_visuelle2
    from visuelle2_tpu.eval.forecast import score_split
    from visuelle2_tpu.models import VocabSizes, build
    from visuelle2_tpu.parallel.mesh import make_mesh

    arrays = load_visuelle2(synthetic_dataset, "test", demand=True, output_len=12)
    store = ImageStore.build(synthetic_dataset + "/images", arrays.image_paths,
                             size=32)
    loader = BatchLoader(arrays, store, 16)
    model = build("gated_v4", vocab=VocabSizes(5, 6, 5, 126), output_len=12,
                  embedding_dim=16, hidden_dim=16, image_arch="tiny")
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           next(iter(loader)), train=False)
    mesh = make_mesh(data=8, model=1)
    r1 = score_split(model, variables, loader, mesh=mesh,
                     measure_throughput=False, one_pass=False)
    r2 = score_split(model, variables, loader, mesh=mesh,
                     measure_throughput=False, one_pass=True)
    assert abs(r1.wape - r2.wape) < 1e-3
    assert abs(r1.mae - r2.mae) < 1e-4
    # The compiled eval batch reports its XLA buffer assignment: peak
    # device memory must cover at least one device's share of the inputs.
    in_bytes = sum(np.asarray(v).nbytes for v in next(iter(loader)).values())
    assert r1.peak_hbm_bytes and r1.peak_hbm_bytes >= in_bytes // 8
    assert f"peak HBM {r1.peak_hbm_bytes / 2**30:.2f} GiB" in r1.summary()

    # Default (auto): small splits go one-pass; a split whose stacked bytes
    # exceed the HBM budget falls back to the per-batch loop.  Both rails
    # of the auto decision must land on the same metrics.
    from unittest import mock

    from visuelle2_tpu.eval import forecast as forecast_mod

    r_auto = score_split(model, variables, loader, mesh=mesh,
                         measure_throughput=False)
    assert abs(r_auto.wape - r2.wape) < 1e-3
    with mock.patch.object(forecast_mod, "ONE_PASS_HBM_BUDGET_BYTES", 1):
        r_fallback = forecast_mod.score_split(
            model, variables, loader, mesh=mesh, measure_throughput=False)
    assert abs(r_fallback.wape - r1.wape) < 1e-3

    # w8a8 runtime path through the same scorer (the --quantize w8a8 rail):
    # apply_fn swaps execution to the int8 backbone, metrics stay within
    # quantization distance of the float path.
    from visuelle2_tpu.models import quantized_resnet as qr

    qapply, _calib = qr.build_serving_path(model, variables,
                                           [next(iter(loader))])
    rq = score_split(model, variables, loader, mesh=mesh,
                     measure_throughput=False, one_pass=False,
                     apply_fn=qapply)
    assert np.isfinite(rq.wape) and np.isfinite(rq.mae)
    assert abs(rq.wape - r1.wape) < 0.2 * max(1.0, abs(r1.wape))


def test_forecast_zero_dim_flags_via_hparams(synthetic_dataset, trained_ck21):
    """The VERDICT-2 acceptance: after a non-default-dim training (dims 16,
    tiny arch — the trained_ck21 fixture), ``forecast_dl --ckpt_path <dir>``
    with ZERO dim flags must rebuild the right model from hparams.json
    instead of erroring on an orbax tree mismatch (reference:
    load_from_checkpoint, forecast_Gated.py:67-79)."""
    root, _best = trained_ck21
    argv = ["--dataset_path", synthetic_dataset, "--batch_size", "16",
            "--image_size", "32", "--ckpt_path", root]
    result = forecast_dl.main(argv)
    assert np.isfinite(result.wape) and np.isfinite(result.mae)

    # An explicitly conflicting structural flag is an ERROR (a silently
    # wrong-dim model when the trees happen to match would be worse).
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="hidden_dim=512 vs checkpoint"):
        forecast_dl.main(argv + ["--hidden_dim", "512"])

    import json as _json
    import os as _os

    with open(_os.path.join(root, "hparams.json")) as f:
        hp = _json.load(f)
    assert hp["model"] == "cross_attn_rnn_21" and hp["hidden_dim"] == 16
    assert hp["vocab"]["num_cat"] >= 2 and hp["norm_scalar"] > 0


def test_forecast_accepts_step_path(synthetic_dataset, trained_ck21):
    """run_all hands forecast the best *step* directory (what train prints);
    the resolver must accept both that and the manager root."""
    _root, best = trained_ck21

    fc_args = forecast_dl.build_parser().parse_args([
        "--dataset_path", synthetic_dataset, "--task_mode", "0",
        "--batch_size", "16",
        "--embedding_dim", "16", "--attention_dim", "16", "--hidden_dim", "16",
        "--image_arch", "tiny", "--image_size", "32",
        "--ckpt_path", best,
    ])
    result = forecast_dl.run(fc_args)
    assert np.isfinite(result.wape)
