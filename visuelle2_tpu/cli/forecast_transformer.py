"""Evaluate a GTM-family checkpoint — counterpart of the reference's
``forecast_GTM.py`` / ``forecast_M4FT.py`` / ``forecast_Gated*.py``
(``/root/reference/forecast_Gated.py:143-159`` flags), consolidated behind
``--model``.  Prints WAPE / MAE / GFLOPs and forecasts/sec/chip from the
one-pass sharded scorer.
"""

from __future__ import annotations

import argparse

from visuelle2_tpu.cli.common import (
    add_quantize_calib_args,
    build_loaders,
    build_w8a8_serving_path,
    resolve_quantize,
)
from visuelle2_tpu.cli.train_transformer import make_model
from visuelle2_tpu.eval.forecast import score_split
from visuelle2_tpu.train.checkpoint import CheckpointManager, resolve_ckpt_path
from visuelle2_tpu.train.hparams import (
    TRANSFORMER_STRUCTURAL,
    apply_ckpt_hparams,
    check_dataset_compat,
    load_hparams,
)
from visuelle2_tpu.train.loop import Trainer, TrainConfig


def run(args):
    print(args)
    demand = bool(args.demand)
    if args.model == "gtm_v1" and not demand:
        raise SystemExit("gtm_v1 is demand-only; use --demand 1")
    splits = (("train", "test")
              if (getattr(args, "quantize", "") in ("w8a8", "auto")
                  and getattr(args, "calib_split", "test") == "train")
              else ("test",))
    loaders, vocab, norm_scalar = build_loaders(
        args, demand=demand, output_len=args.output_len, splits=splits,
        text_features=(args.model == "gtm_v1"),
        dedup_eval_images=bool(getattr(args, "dedup_images", 1)))
    # Dataset-derived halves of the manifest (vocab sizes, norm scalar):
    # error/warn on a checkpoint-vs-dataset mismatch (train/hparams.py).
    check_dataset_compat(load_hparams(args.ckpt_path)
                         if args.ckpt_path else None, vocab, norm_scalar)
    if args.model == "gtm_v1" and args.ckpt_path:
        # Checkpoint-compat guard: features from frozen BERT and from the
        # zero-egress crc32 fallback are mutually garbage — a fingerprint
        # mismatch between training (hparams.json) and this host must be an
        # error, not a silently terrible WAPE (models/gtm_v1.py).
        hp = load_hparams(args.ckpt_path) or {}
        want = hp.get("text_fingerprint")
        have = getattr(loaders["test"], "text_fingerprint", None)
        if want and have and want != have:
            raise SystemExit(
                f"gtm_v1 text featurizer mismatch: the checkpoint was "
                f"trained on '{want}' features but this host produces "
                f"'{have}'. Provide the same featurizer (e.g. set "
                f"VISUELLE2_BERT_PATH to a local BERT snapshot from "
                f"scripts/convert_pretrained.py --arch bert) or retrain.")
    model = make_model(args, vocab)

    trainer = Trainer(model, TrainConfig(norm_scalar=norm_scalar))
    state = trainer.init_state(next(iter(loaders["test"])))
    if args.ckpt_path:
        root, step = resolve_ckpt_path(args.ckpt_path)
        ckpt = CheckpointManager(root, read_only=True)
        # Partial restore: forecast doesn't know (or need) the training-time
        # optimizer structure (grad-clip chain etc.).
        state = ckpt.restore_for_eval(state, step=step)
        ckpt.close()

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    apply_fn = None
    quantize = resolve_quantize(args, loaders["test"])
    if quantize == "w8a8":
        apply_fn = build_w8a8_serving_path(model, variables, loaders, args)
    if getattr(args, "export", ""):
        from visuelle2_tpu.eval.export import export_forecaster

        size = export_forecaster(
            model, variables, next(iter(loaders["test"])), args.export,
            quantize=quantize, apply_fn=apply_fn,
            extra_header={"model": args.model,
                          **({"text_fingerprint": getattr(
                              loaders["test"], "text_fingerprint", None)}
                             if args.model == "gtm_v1" else {})})
        print(f"Exported serving artifact: {args.export} ({size / 1e6:.1f} MB)")
    if getattr(args, "dump_attention", ""):
        from visuelle2_tpu.eval.forecast import dump_attention

        keys = dump_attention(model, variables,
                              next(iter(loaders["test"])),
                              args.dump_attention)
        print(f"Attention weights -> {args.dump_attention}: "
              f"{keys if keys else 'model returns no attention aux'}")
    op = getattr(args, "one_pass", "auto")
    result = score_split(model, variables, loaders["test"],
                         norm_scalar=norm_scalar,
                         one_pass=None if op == "auto" else bool(int(op)),
                         apply_fn=apply_fn)
    if getattr(args, "metrics_out", ""):
        import json

        with open(args.metrics_out, "w") as f:
            json.dump({"wape": result.wape, "mae": result.mae,
                       "num_forecasts": result.num_forecasts,
                       "forecasts_per_sec_per_chip":
                           result.forecasts_per_sec_per_chip,
                       "gflops_per_sample": result.gflops_per_sample,
                       "peak_hbm_bytes": result.peak_hbm_bytes}, f)
    print(result.summary())
    print(f"WAPE: {result.wape}")
    print(f"MAE: {result.mae}")
    return result


def build_parser(default_model="gtm"):
    from visuelle2_tpu.cli.train_transformer import build_parser as train_parser

    p = train_parser(default_model)
    p.add_argument("--ckpt_path", type=str, default="")
    # The reference FORECASTERS call this flag --num_layers while its
    # trainers say --num_hidden_layers (forecast_GTM.py:279 vs
    # train_GTM_visuelle2.py:168); accept both so reference forecast
    # commands drop in unchanged.
    p.add_argument("--num_layers", dest="num_hidden_layers", type=int,
                   default=argparse.SUPPRESS,
                   help="alias of --num_hidden_layers (reference "
                        "forecaster spelling)")
    p.add_argument("--export", type=str, default="",
                   help="write a self-contained StableHLO serving artifact")
    add_quantize_calib_args(p)
    p.add_argument("--quantize", type=str, default="",
                   choices=["", "none", "int8", "w8a8", "auto"],
                   help="int8: weight-only artifact storage (~4x smaller; "
                        "eval/export.py).  w8a8: ALSO run (and export) the "
                        "int8 backbone serving engine — activations "
                        "calibrated on --calib_batches batches of "
                        "--calib_split, metrics/throughput "
                        "then reflect the quantized path "
                        "(models/quantized_resnet.py).  auto: w8a8 only in "
                        "its measured win region (image duplication <= 4, "
                        "docs/perf_dedup_series.json), float otherwise; "
                        "--export bakes the resolved mode")
    p.add_argument("--dump_attention", type=str, default="",
                   help="save the first test batch's attention weights "
                        "(.npz); gtm_v1's memory-only decoder returns them")
    # --dedup_images comes from the train parser (default 0 there); eval
    # dedup is identical-output, so it defaults ON for forecasting.
    p.set_defaults(dedup_images=1)
    p.add_argument("--metrics_out", type=str, default="",
                   help="also write WAPE/MAE/throughput/GFLOPs as JSON")
    p.add_argument("--one_pass", choices=["auto", "0", "1"], default="auto",
                   help="score the whole split in one jitted scan dispatch "
                        "(the north-star mode). Default 'auto': one-pass "
                        "unless the stacked split exceeds the documented "
                        "HBM budget (eval/forecast.py "
                        "ONE_PASS_HBM_BUDGET_BYTES), then per-batch loop")
    return p


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    # Rebuild the model configuration from the checkpoint's hparams.json:
    # unpassed structural flags are filled from it, explicit conflicts are
    # errors (train/hparams.py; load_from_checkpoint parity).
    apply_ckpt_hparams(args, parser, TRANSFORMER_STRUCTURAL, argv)
    return run(args)


if __name__ == "__main__":
    main()
