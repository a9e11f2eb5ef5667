"""Train CrossAttnRNN{21,210,Demand} — CLI-compatible with the reference's
``train_dl.py`` (``/root/reference/train_dl.py:187-216`` flag surface):
``--task_mode 0`` -> 2-1, ``--task_mode 1`` -> 2-10, ``--demand 1`` -> Demand.

Differences by design: single JAX train loop + orbax checkpoints; the best
checkpoint path is printed AND returned from ``run`` (replacing run_all.sh's
stdout grep, ``run_all.sh:6``).
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


def run(args):
    print(args)
    demand = bool(args.demand)
    output_len = 12 if demand else args.output_len
    loaders, vocab, norm_scalar = build_loaders(
        args, demand=demand, output_len=output_len,
        dedup_train_images=bool(getattr(args, "dedup_images", 0)),
        dedup_eval_images=True)  # identical outputs; faster per-epoch val
    print(f"Completed dataset loading procedure. Train batches: "
          f"{len(loaders['train'])}, test batches: {len(loaders['test'])}")

    dims = dict(attention_dim=args.attention_dim,
                embedding_dim=args.embedding_dim, hidden_dim=args.hidden_dim,
                vocab=vocab, use_img=bool(args.use_img),
                image_arch=args.image_arch,
                image_dtype=jnp.bfloat16 if args.bf16_backbone else jnp.float32,
                image_remat=bool(getattr(args, "remat", False)))
    if demand:
        model_name = "cross_attn_rnn_demand"
        model = build(model_name, out_len=12,
                      use_teacher_forcing=bool(args.use_teacher_forcing),
                      teacher_forcing_ratio=args.teacher_forcing_ratio, **dims)
    elif args.task_mode == 0:
        print("Initializing Full-Feature 2-1 Model...")
        model_name = "cross_attn_rnn_21"
        model = build(model_name, out_len=args.output_len, **dims)
    else:
        model_name = "cross_attn_rnn_210"
        model = build(model_name, out_len=args.output_len,
                      use_teacher_forcing=bool(args.use_teacher_forcing),
                      teacher_forcing_ratio=args.teacher_forcing_ratio, **dims)

    trainer = Trainer(model, TrainConfig(
        epochs=args.epochs, batch_size=args.batch_size, seed=args.seed,
        norm_scalar=norm_scalar,
        trace_dir=getattr(args, "trace_dir", "") or None,
        accum_steps=getattr(args, "accum_steps", 1),
        autosave_minutes=getattr(args, "autosave_minutes", 0.0),
        early_stop_patience=getattr(args, "early_stop_patience", 0),
        early_stop_min_delta=getattr(args, "early_stop_min_delta", 0.0),
        learning_rate=getattr(args, "learning_rate", None) or None))
    ckpt = CheckpointManager(args.ckpt_dir, save_top_k=2)  # train_dl.py:156
    # save_hyperparameters() parity (CrossAttnRNN21.py:106): the forecast /
    # export CLIs rebuild the model from this manifest so non-default dims
    # never have to be re-passed (train/hparams.py).
    from visuelle2_tpu.train.hparams import save_hparams

    save_hparams(args.ckpt_dir, {
        "cli": "train_dl", "model": model_name,
        "demand": int(demand), "task_mode": int(args.task_mode),
        "output_len": int(12 if demand else args.output_len),
        "embedding_dim": int(args.embedding_dim),
        "attention_dim": int(args.attention_dim),
        "hidden_dim": int(args.hidden_dim),
        "use_img": int(args.use_img),
        "image_arch": args.image_arch,
        "use_teacher_forcing": int(args.use_teacher_forcing),
        "teacher_forcing_ratio": float(args.teacher_forcing_ratio),
        "vocab": {"num_cat": vocab.num_cat, "num_col": vocab.num_col,
                  "num_fab": vocab.num_fab, "num_store": vocab.num_store},
        "norm_scalar": float(norm_scalar),
    })
    log = JsonlLogger(os.path.join(args.ckpt_dir, "metrics.jsonl"), wandb_args=args)

    # Pretrained-backbone splice and/or mid-training resume (the reference
    # never wires ckpt_path into fit; we support both — SURVEY.md §5).
    from visuelle2_tpu.cli.common import prepare_initial_state

    state, start_epoch, skip_steps = prepare_initial_state(trainer, loaders, args)

    t0 = time.time()
    trainer.fit(loaders["train"], loaders["test"], state=state,
                checkpointer=ckpt, log_fn=log, start_epoch=start_epoch,
                skip_steps=skip_steps)
    elapsed = time.time() - t0
    if trainer.history and trainer.history[-1].get("preempted"):
        # Exit 143 (128+SIGTERM) so pipelines (run_all, cluster managers)
        # stop instead of forecasting a half-trained model in the
        # preemption grace window.
        print(f"[Training Preempted] state saved at epoch "
              f"{trainer.history[-1]['epoch']}; continue with "
              f"--resume_from {args.ckpt_dir}")
        raise SystemExit(143)
    print(f"[Training Completed] Time: {elapsed/60:.2f} minutes ({elapsed:.2f} seconds)")
    print(ckpt.best_model_path)
    return ckpt.best_model_path


def build_parser():
    p = argparse.ArgumentParser()
    add_common_args(p)
    # The reference spells this --new_product on the train CLI and maps it
    # to demand internally (train_dl.py:96-114); accept both.
    p.add_argument("--demand", "--new_product", type=int, default=0)
    p.add_argument("--embedding_dim", type=int, default=512)
    p.add_argument("--attention_dim", type=int, default=512)
    p.add_argument("--hidden_dim", type=int, default=512)
    p.add_argument("--output_len", type=int, default=10)
    p.add_argument("--use_img", type=int, default=1)
    p.add_argument("--task_mode", type=int, default=0, help="0->2-1, 1->2-10")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--use_teacher_forcing", action="store_true")
    p.add_argument("--teacher_forcing_ratio", type=float, default=0.5)
    p.add_argument("--dedup_images", type=int, default=0,
                   help="grouped-shuffle training batches encoding each "
                        "unique product photo once (FLOPs / duplication "
                        "factor; BatchNorm stats weight unique photos)")
    p.add_argument("--ckpt_dir", type=str, default="ckpt_CrossAttnRNN210/")
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
