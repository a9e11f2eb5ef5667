"""Checkpoint hyperparameter manifest (train/hparams.py).

Reference parity: ``self.save_hyperparameters()`` + ``load_from_checkpoint``
(``/root/reference/models/CrossAttnRNN21.py:106``,
``forecast_Gated.py:67-79``) — forecast commands rebuild the model from the
checkpoint, never from re-typed dim flags.  Pure-unit coverage here; the
end-to-end zero-dim-flags forecast lives in test_cli.py (shares the
trained_ck21 fixture's compile).
"""

import json
import os

import pytest

from visuelle2_tpu.train import hparams as hp_lib


def _dl_parser():
    from visuelle2_tpu.cli.forecast_dl import build_parser

    return build_parser()


def test_save_load_roundtrip(tmp_path):
    d = str(tmp_path / "ck")
    hp_lib.save_hparams(d, {"model": "x", "hidden_dim": 16})
    assert hp_lib.load_hparams(d) == {"model": "x", "hidden_dim": 16}
    # A step directory (what best_model_path returns) resolves to the root.
    os.makedirs(os.path.join(d, "3"))
    assert hp_lib.load_hparams(os.path.join(d, "3"))["hidden_dim"] == 16
    assert hp_lib.load_hparams(str(tmp_path / "nope")) is None


def test_explicit_cli_dests():
    p = _dl_parser()
    explicit = hp_lib.explicit_cli_dests(
        p, ["--hidden_dim", "32", "--ckpt_path", "c"])
    assert "hidden_dim" in explicit and "ckpt_path" in explicit
    assert "embedding_dim" not in explicit and "task_mode" not in explicit
    # Parser state must be restored: defaults still apply afterwards.
    args = p.parse_args([])
    assert args.embedding_dim == 512 and args.task_mode == 0


def test_explicit_cli_dests_alias_and_set_defaults():
    """--num_layers (forecaster spelling) maps to num_hidden_layers, and
    parser-level set_defaults (dedup_images=1) must not read as explicit."""
    from visuelle2_tpu.cli.forecast_transformer import build_parser

    p = build_parser()
    explicit = hp_lib.explicit_cli_dests(p, ["--num_layers", "3"])
    assert "num_hidden_layers" in explicit
    assert "dedup_images" not in explicit
    assert p.parse_args([]).dedup_images == 1  # restored


def _write_manifest(tmp_path, **over):
    d = str(tmp_path / "ck")
    hp = {"cli": "train_dl", "model": "cross_attn_rnn_21", "demand": 0,
          "task_mode": 0, "output_len": 1, "embedding_dim": 16,
          "attention_dim": 24, "hidden_dim": 16, "use_img": 1,
          "image_arch": "tiny"}
    hp.update(over)
    hp_lib.save_hparams(d, hp)
    return d


def test_apply_fills_unpassed_structural_flags(tmp_path):
    d = _write_manifest(tmp_path)
    p = _dl_parser()
    args = p.parse_args(["--ckpt_path", d])
    out = hp_lib.apply_ckpt_hparams(args, p, hp_lib.DL_STRUCTURAL,
                                    ["--ckpt_path", d])
    assert out is not None
    assert args.embedding_dim == 16 and args.attention_dim == 24
    assert args.hidden_dim == 16 and args.image_arch == "tiny"
    assert args.new_product == 0  # manifest key "demand" -> dest new_product


def test_apply_errors_on_explicit_conflict(tmp_path):
    d = _write_manifest(tmp_path)
    p = _dl_parser()
    argv = ["--ckpt_path", d, "--hidden_dim", "99"]
    args = p.parse_args(argv)
    with pytest.raises(SystemExit, match="hidden_dim=99 vs checkpoint"):
        hp_lib.apply_ckpt_hparams(args, p, hp_lib.DL_STRUCTURAL, argv)


def test_apply_accepts_matching_explicit_flag(tmp_path):
    d = _write_manifest(tmp_path)
    p = _dl_parser()
    argv = ["--ckpt_path", d, "--hidden_dim", "16"]
    args = p.parse_args(argv)
    hp_lib.apply_ckpt_hparams(args, p, hp_lib.DL_STRUCTURAL, argv)
    assert args.hidden_dim == 16 and args.attention_dim == 24


def test_apply_noop_without_manifest_or_ckpt(tmp_path):
    p = _dl_parser()
    # No checkpoint at all.
    args = p.parse_args([])
    assert hp_lib.apply_ckpt_hparams(args, p, hp_lib.DL_STRUCTURAL, []) is None
    # Pre-manifest checkpoint directory: flags stay authoritative.
    d = str(tmp_path / "old_ck")
    os.makedirs(d)
    argv = ["--ckpt_path", d, "--hidden_dim", "99"]
    args = p.parse_args(argv)
    assert hp_lib.apply_ckpt_hparams(args, p, hp_lib.DL_STRUCTURAL,
                                     argv) is None
    assert args.hidden_dim == 99 and args.embedding_dim == 512


def test_transformer_manifest_mapping(tmp_path):
    from visuelle2_tpu.cli.forecast_transformer import build_parser

    d = str(tmp_path / "ckv4")
    hp_lib.save_hparams(d, {
        "cli": "train_transformer", "model": "gated_v3", "demand": 1,
        "output_len": 12, "embedding_dim": 24, "hidden_dim": 48,
        "num_attn_heads": 2, "num_hidden_layers": 2, "use_img": 0,
        "use_text": 1, "use_encoder_mask": 0, "autoregressive": 1,
        "query_modality": "image", "image_arch": "tiny"})
    p = build_parser()
    argv = ["--ckpt_path", d]
    args = p.parse_args(argv)
    hp_lib.apply_ckpt_hparams(args, p, hp_lib.TRANSFORMER_STRUCTURAL, argv)
    assert args.model == "gated_v3" and args.query_modality == "image"
    assert args.num_hidden_layers == 2 and args.autoregressive == 1
    assert args.use_img == 0 and args.use_encoder_mask == 0
    # The forecaster --num_layers alias counts as explicit for the dest.
    argv = ["--ckpt_path", d, "--num_layers", "5"]
    args = p.parse_args(argv)
    with pytest.raises(SystemExit, match="num_hidden_layers=5"):
        hp_lib.apply_ckpt_hparams(args, p, hp_lib.TRANSFORMER_STRUCTURAL,
                                  argv)


def test_manifest_is_valid_json_with_vocab(tmp_path):
    d = str(tmp_path / "ck")
    hp_lib.save_hparams(d, {"vocab": {"num_cat": 5}, "norm_scalar": 53.0})
    with open(os.path.join(d, hp_lib.HPARAMS_FILE)) as f:
        raw = json.load(f)
    assert raw["vocab"]["num_cat"] == 5


def test_check_dataset_compat(capsys):
    """Dataset-derived manifest halves: vocab mismatch errors precisely,
    norm-scalar mismatch warns, matches and pre-manifest ckpts are silent."""
    from visuelle2_tpu.models.base import VocabSizes

    vocab = VocabSizes(5, 6, 5, 126)
    hp = {"vocab": {"num_cat": 5, "num_col": 6, "num_fab": 5,
                    "num_store": 126}, "norm_scalar": 53.0}
    hp_lib.check_dataset_compat(hp, vocab, 53.0)  # exact match: silent
    hp_lib.check_dataset_compat(None, vocab, 99.0)  # pre-manifest: silent
    assert capsys.readouterr().out == ""

    with pytest.raises(SystemExit, match="num_cat: dataset 9"):
        hp_lib.check_dataset_compat(hp, VocabSizes(9, 6, 5, 126), 53.0)

    hp_lib.check_dataset_compat(hp, vocab, 65.0)
    out = capsys.readouterr().out
    assert "WARNING" in out and "53.0" in out and "65.0" in out
