"""Evaluate a trained CrossAttnRNN checkpoint — counterpart of the reference's
``forecast_dl.py`` (``/root/reference/forecast_dl.py:201-228`` flags).

Prints WAPE / MAE / GFLOPs-per-sample / forecasts-per-sec-per-chip; the whole
test split is scored in one sharded compiled pass (SURVEY.md §7.8) instead of
a host-side no_grad loop.  Horizon auto-selection matches
``forecast_dl.py:222-226``: demand -> 12, task 2-10 -> 10.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from visuelle2_tpu.cli.common import (
    add_common_args,
    add_quantize_calib_args,
    build_loaders,
    build_w8a8_serving_path,
    resolve_quantize,
)
from visuelle2_tpu.eval.forecast import score_split
from visuelle2_tpu.models import build
from visuelle2_tpu.train.checkpoint import CheckpointManager, resolve_ckpt_path
from visuelle2_tpu.train.hparams import (
    DL_STRUCTURAL,
    apply_ckpt_hparams,
    check_dataset_compat,
    load_hparams,
)
from visuelle2_tpu.train.loop import Trainer, TrainConfig


def run(args):
    print(args)
    demand = bool(args.new_product)
    output_len = getattr(args, "output_len", 1)
    if demand:
        output_len = 12  # forecast_dl.py:223-224
    elif output_len == 1:
        # Flag left at its default: horizon from the checkpoint manifest
        # when present (a nonstandard-horizon 2-10 training must decode the
        # same scan length; load_from_checkpoint parity), else the
        # reference's task auto-bump (forecast_dl.py:225-226).
        hp = load_hparams(args.ckpt_path) if args.ckpt_path else None
        if hp and "output_len" in hp:
            output_len = int(hp["output_len"])
            if output_len != 1:
                print(f"[hparams] output_len={output_len} from manifest")
        elif args.task_mode == 1:
            output_len = 10
    splits = (("train", "test")
              if (getattr(args, "quantize", "") in ("w8a8", "auto")
                  and getattr(args, "calib_split", "test") == "train")
              else ("test",))
    loaders, vocab, norm_scalar = build_loaders(
        args, demand=demand, output_len=output_len, splits=splits,
        dedup_eval_images=bool(getattr(args, "dedup_images", 1)))
    # Dataset-derived halves of the manifest (vocab sizes, norm scalar):
    # error/warn on a checkpoint-vs-dataset mismatch (train/hparams.py).
    check_dataset_compat(load_hparams(args.ckpt_path)
                         if args.ckpt_path else None, vocab, norm_scalar)

    dims = dict(attention_dim=args.attention_dim,
                embedding_dim=args.embedding_dim, hidden_dim=args.hidden_dim,
                vocab=vocab, use_img=bool(args.use_img),
                image_arch=args.image_arch,
                image_dtype=jnp.bfloat16 if args.bf16_backbone else jnp.float32)
    if demand:
        model = build("cross_attn_rnn_demand", out_len=12,
                      use_teacher_forcing=False, **dims)
    elif args.task_mode == 0:
        model = build("cross_attn_rnn_21", out_len=output_len, **dims)
    else:
        model = build("cross_attn_rnn_210", out_len=output_len,
                      use_teacher_forcing=False, **dims)

    # Init a template then restore checkpointed params into it.
    trainer = Trainer(model, TrainConfig(norm_scalar=norm_scalar))
    state = trainer.init_state(next(iter(loaders["test"])))
    if args.ckpt_path:
        root, step = resolve_ckpt_path(args.ckpt_path)
        ckpt = CheckpointManager(root, read_only=True)
        # Partial restore (params + batch_stats): forecast doesn't need —
        # and must not have to reconstruct — the training opt_state.
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
            extra_header={"model": model.__class__.__name__})
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
    if result.gflops_per_sample is not None:
        print(f"GFLOPS: {result.gflops_per_sample}")
    return result


def build_parser():
    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--new_product", type=int, default=0)
    p.add_argument("--embedding_dim", type=int, default=512)
    p.add_argument("--attention_dim", type=int, default=512)
    p.add_argument("--hidden_dim", type=int, default=512)
    p.add_argument("--use_img", type=int, default=1)
    p.add_argument("--task_mode", type=int, default=0, help="0->2-1, 1->2-10")
    p.add_argument("--output_len", type=int, default=1,
                   help="forecast horizon; default auto-selects from the "
                        "checkpoint manifest / task (demand->12, 2-10->10; "
                        "forecast_dl.py:222-226)")
    # Accepted for reference CLI parity (forecast_dl.py:215-216); inference
    # never teacher-forces (the reference hardcodes it off, :113-115).
    p.add_argument("--use_teacher_forcing", action="store_true")
    p.add_argument("--teacher_forcing_ratio", type=float, default=0.3)
    p.add_argument("--ckpt_path", type=str, default="",
                   help="checkpoint directory written by train_dl")
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
                        "(.npz) — per-step img/trend/multimodal alphas "
                        "for the Demand model")
    p.add_argument("--dedup_images", type=int, default=1,
                   help="encode each unique product photo once per batch "
                        "(identical outputs; FLOPs / duplication factor)")
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
    apply_ckpt_hparams(args, parser, DL_STRUCTURAL, argv)
    return run(args)


if __name__ == "__main__":
    main()
