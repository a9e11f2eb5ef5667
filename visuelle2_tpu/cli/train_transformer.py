"""Train a GTM-family transformer model (GTM / M4FT / Gated v1–v4).

Consolidates the reference's six copy-paste trainers
(``/root/reference/train_GTM_visuelle2.py``, ``train_M4FT_visuelle2.py``,
``train_Gated_visuelle2{,_v2,_v3,_v4}.py``) behind one ``--model`` flag while
keeping every hyperparameter flag (``train_GTM_visuelle2.py:151-175``) and the
v3-only ``--query_modality`` (``train_Gated_visuelle2_v3.py:165-170``).
Transformer family trains with gradient_clip 0.5
(``train_GTM_visuelle2.py:139``) and save_top_k=1 (``:124``).
"""

from __future__ import annotations

import argparse
import os
import time

import jax.numpy as jnp

from visuelle2_tpu.cli.common import JsonlLogger, add_common_args, build_loaders
from visuelle2_tpu.models import build
from visuelle2_tpu.train.checkpoint import CheckpointManager
from visuelle2_tpu.train.loop import TrainConfig, Trainer

TRANSFORMER_MODELS = ["gtm", "m4ft", "gated_v1", "gated_v2", "gated_v3",
                      "gated_v4", "gtm_v1"]


def make_model(args, vocab):
    kw = dict(
        embedding_dim=args.embedding_dim,
        hidden_dim=args.hidden_dim,
        output_len=args.output_len,
        num_heads=args.num_attn_heads,
        num_layers=args.num_hidden_layers,
        use_encoder_mask=bool(args.use_encoder_mask),
        autoregressive=bool(args.autoregressive),
        use_text=bool(args.use_text),
        use_img=bool(args.use_img),
        image_arch=args.image_arch,
        image_dtype=jnp.bfloat16 if args.bf16_backbone else jnp.float32,
        image_remat=bool(getattr(args, "remat", False)),
    )
    if args.model == "gtm_v1":
        # Original VISUELLE-1 GTM: BERT-featurized text at ingest (batch
        # extra "text_features"), fully-frozen backbone, no vocab/query args.
        return build("gtm_v1", **kw)
    return build(args.model, vocab=vocab,
                 query_modality=args.query_modality, **kw)


def run(args):
    print(args)
    demand = bool(args.demand)
    if args.model == "gtm_v1" and not demand:
        raise SystemExit("gtm_v1 is demand-only (the original VISUELLE-1 GTM "
                         "has no windowed stfore path); use --demand 1")
    loaders, vocab, norm_scalar = build_loaders(
        args, demand=demand, output_len=args.output_len,
        text_features=(args.model == "gtm_v1"),
        dedup_train_images=bool(getattr(args, "dedup_images", 0)),
        dedup_eval_images=True)  # identical outputs; faster per-epoch val
    model = make_model(args, vocab)

    trainer = Trainer(model, TrainConfig(
        epochs=args.epochs, batch_size=args.batch_size, seed=args.seed,
        grad_clip=0.5, norm_scalar=norm_scalar,
        trace_dir=getattr(args, "trace_dir", "") or None,
        accum_steps=getattr(args, "accum_steps", 1),
        autosave_minutes=getattr(args, "autosave_minutes", 0.0),
        early_stop_patience=getattr(args, "early_stop_patience", 0),
        early_stop_min_delta=getattr(args, "early_stop_min_delta", 0.0),
        learning_rate=getattr(args, "learning_rate", None) or None))
    ckpt = CheckpointManager(args.ckpt_dir, save_top_k=1)
    # save_hyperparameters() parity (forecast_Gated.py:67-79 rebuilds the
    # model from the checkpoint): forecast/export consume this manifest.
    # For gtm_v1 it also pins WHICH text featurizer produced the training
    # features (BERT vs the zero-egress crc32 fallback) — mixing them at
    # forecast time scores garbage, so it's checked there.
    from visuelle2_tpu.train.hparams import save_hparams

    save_hparams(args.ckpt_dir, {
        "cli": "train_transformer", "model": args.model,
        "demand": int(args.demand), "output_len": int(args.output_len),
        "embedding_dim": int(args.embedding_dim),
        "hidden_dim": int(args.hidden_dim),
        "num_attn_heads": int(args.num_attn_heads),
        "num_hidden_layers": int(args.num_hidden_layers),
        "use_img": int(args.use_img), "use_text": int(args.use_text),
        "use_encoder_mask": int(args.use_encoder_mask),
        "autoregressive": int(args.autoregressive),
        "query_modality": args.query_modality,
        "image_arch": args.image_arch,
        "vocab": {"num_cat": vocab.num_cat, "num_col": vocab.num_col,
                  "num_fab": vocab.num_fab, "num_store": vocab.num_store},
        "norm_scalar": float(norm_scalar),
        **({"text_fingerprint": getattr(loaders["train"], "text_fingerprint",
                                        None)}
           if args.model == "gtm_v1" else {}),
    })
    log = JsonlLogger(os.path.join(args.ckpt_dir, "metrics.jsonl"), wandb_args=args)

    from visuelle2_tpu.cli.common import prepare_initial_state

    state, start_epoch, skip_steps = prepare_initial_state(trainer, loaders, args)

    t0 = time.time()
    trainer.fit(loaders["train"], loaders["test"], state=state,
                checkpointer=ckpt, log_fn=log, start_epoch=start_epoch,
                skip_steps=skip_steps)
    if trainer.history and trainer.history[-1].get("preempted"):
        # Exit 143 (128+SIGTERM): stop pipelines in the grace window
        # instead of forecasting a half-trained model.
        print(f"[Training Preempted] state saved at epoch "
              f"{trainer.history[-1]['epoch']}; continue with "
              f"--resume_from {args.ckpt_dir}")
        raise SystemExit(143)
    print(f"[Training Completed] Time: {(time.time() - t0)/60:.2f} minutes")
    print(f"Best Model Path: {ckpt.best_model_path}")
    return ckpt.best_model_path


def build_parser(default_model="gtm"):
    p = argparse.ArgumentParser(description="GTM-family trainer on Visuelle 2.0")
    add_common_args(p)
    p.add_argument("--model", type=str, default=default_model,
                   choices=TRANSFORMER_MODELS)
    p.add_argument("--ckpt_dir", type=str, default="ckpt_gtm/")
    p.add_argument("--demand", type=int, default=1)
    p.add_argument("--output_len", type=int, default=12)
    p.add_argument("--embedding_dim", type=int, default=32)
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--num_attn_heads", type=int, default=4)
    p.add_argument("--num_hidden_layers", type=int, default=1)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--use_img", type=int, default=1)
    p.add_argument("--use_text", type=int, default=1)
    p.add_argument("--use_encoder_mask", type=int, default=1)
    p.add_argument("--autoregressive", type=int, default=0)
    p.add_argument("--query_modality", type=str, default="text",
                   choices=["text", "image", "temporal"])
    p.add_argument("--dedup_images", type=int, default=0,
                   help="grouped-shuffle training batches encoding each "
                        "unique product photo once (FLOPs / duplication "
                        "factor; BatchNorm stats weight unique photos)")
    p.add_argument("--resume_from", type=str, default="",
                   help="checkpoint directory to resume training from; 'auto' resumes from --ckpt_dir when it holds a checkpoint (idempotent restart)")
    p.add_argument("--autosave_minutes", type=float, default=0.0,
                   help="periodic autosave into the last checkpoint slot "
                        "(bounds work lost to hard failures; 0 = off)")
    p.add_argument("--early_stop_patience", type=int, default=0,
                   help="stop after N epochs without val_wWAPE improving "
                        "(Lightning EarlyStopping analogue; 0 = off)")
    p.add_argument("--early_stop_min_delta", type=float, default=0.0,
                   help="minimum val_wWAPE improvement that resets the "
                        "early-stop patience counter")
    p.add_argument("--learning_rate", type=float, default=0.0,
                   help="fixed Adafactor learning rate; 0 = the reference's "
                        "relative-step fairseq schedule (lr~1e-6*step "
                        "warmup -> 1/sqrt(step) decay)")
    return p


def main():
    run(build_parser().parse_args())


if __name__ == "__main__":
    main()
