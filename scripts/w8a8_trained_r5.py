"""Trained-weight w8a8 accuracy sign-off (VERDICT r4 #4).

Round 4 bounded the int8 serving engine's accuracy only with random weights
(rel_l2 0.0128, docs/w8a8_r4.json).  This script produces the trained-weight
evidence in-container: a short synthetic train at REAL dims (CrossAttnRNN21,
ResNet-50 @299, dims 512, lr override for visible convergence), then the
same checkpoint scored through the float path and the ``--quantize w8a8``
path, recording WAPE/MAE deltas plus the forecast rel_l2 between the two
paths over the full test split.

    python scripts/w8a8_trained_r5.py [--out docs/w8a8_r5.json] [--smoke]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/w8a8_r5.json")
    ap.add_argument("--workdir", default="/tmp/w8a8_trained_r5")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny dims on CPU (harness check only)")
    opts = ap.parse_args()

    if opts.smoke:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        arch, image, dims, batch, epochs = "tiny", 32, 16, 16, 1
        n_train, n_test = 64, 32
    else:
        arch, image, dims, batch, epochs = "resnet50", 299, 512, 128, 3
        n_train, n_test = 512, 256

    import jax

    from visuelle2_tpu.data.synthetic import make_synthetic_dataset

    data = os.path.join(opts.workdir, "data")
    ck = os.path.join(opts.workdir, "ck")
    if not os.path.isdir(data):
        make_synthetic_dataset(data, num_train=n_train, num_test=n_test,
                               image_size=image)

    common = ["--dataset_path", data, "--batch_size", str(batch),
              "--image_size", str(image), "--image_arch", arch,
              "--task_mode", "0", "--output_len", "1",
              "--embedding_dim", str(dims), "--attention_dim", str(dims),
              "--hidden_dim", str(dims)]

    from visuelle2_tpu.cli import forecast_dl, train_dl

    train_dl.run(train_dl.build_parser().parse_args(
        common + ["--epochs", str(epochs), "--learning_rate", "5e-3",
                  "--ckpt_dir", ck]))

    r_f = forecast_dl.run(forecast_dl.build_parser().parse_args(
        common + ["--ckpt_path", ck]))
    r_q = forecast_dl.run(forecast_dl.build_parser().parse_args(
        common + ["--ckpt_path", ck, "--quantize", "w8a8"]))

    # rel_l2 between the two execution paths on the SAME restored weights,
    # over the whole test split (mask-weighted).
    import jax.numpy as jnp

    from visuelle2_tpu.cli.common import build_loaders
    from visuelle2_tpu.models import build
    from visuelle2_tpu.models import quantized_resnet as qr
    from visuelle2_tpu.train.checkpoint import (
        CheckpointManager,
        resolve_ckpt_path,
    )
    from visuelle2_tpu.train.loop import TrainConfig, Trainer

    fargs = forecast_dl.build_parser().parse_args(
        common + ["--ckpt_path", ck])
    loaders, vocab, norm_scalar = build_loaders(
        fargs, demand=False, output_len=1, splits=("test",),
        dedup_eval_images=True)
    model = build("cross_attn_rnn_21", out_len=1, vocab=vocab,
                  attention_dim=dims, embedding_dim=dims, hidden_dim=dims,
                  image_arch=arch, image_dtype=jnp.bfloat16)
    trainer = Trainer(model, TrainConfig(norm_scalar=norm_scalar))
    state = trainer.init_state(next(iter(loaders["test"])))
    root, step = resolve_ckpt_path(ck)
    mgr = CheckpointManager(root, read_only=True)
    state = mgr.restore_for_eval(state, step=step)
    mgr.close()
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    calib_batches = [b for b, _ in zip(iter(loaders["test"]), range(2))]
    qapply, _ = qr.build_serving_path(model, variables, calib_batches)

    num = den = 0.0
    max_abs = 0.0
    for b in loaders["test"]:
        m = np.asarray(b["mask"], np.float32) if "mask" in b else None
        f_ref = np.asarray(model.apply(variables, b, train=False)[0],
                           np.float32)
        f_q = np.asarray(qapply(variables, b)[0], np.float32)
        if m is not None:
            w = m.reshape((-1,) + (1,) * (f_ref.ndim - 1))
            reps = f_ref.shape[0] // m.shape[0]
            if reps > 1:
                w = np.repeat(w, reps, axis=0)
            f_ref, f_q = f_ref * w, f_q * w
        num += float(np.sum((f_q - f_ref) ** 2))
        den += float(np.sum(f_ref ** 2))
        max_abs = max(max_abs, float(np.max(np.abs(f_q - f_ref))))
    rel_l2 = float(np.sqrt(num / max(den, 1e-30)))

    res = {
        "device": jax.devices()[0].device_kind,
        "arch": arch, "image": image, "dims": dims, "batch": batch,
        "train_epochs": epochs, "learning_rate": 5e-3,
        "float": {"wape": r_f.wape, "mae": r_f.mae},
        "w8a8": {"wape": r_q.wape, "mae": r_q.mae},
        "wape_delta": round(r_q.wape - r_f.wape, 4),
        "mae_delta": round(r_q.mae - r_f.mae, 4),
        "forecast_rel_l2_trained": round(rel_l2, 5),
        "forecast_max_abs_trained": round(max_abs, 5),
    }
    print(json.dumps(res, indent=1), flush=True)
    with open(opts.out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"-> {opts.out}", flush=True)


if __name__ == "__main__":
    main()
