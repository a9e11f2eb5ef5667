"""End-to-end TPU training demo: synthetic VISUELLE2 at full resolution.

Generates a synthetic dataset (299x299 JPEGs), trains the flagship Gated-v4
demand model for a few epochs on the TPU (bf16 backbone, native prefetch,
orbax checkpoints), and reports eval metrics + throughput.  This is the
integration proof for the whole train path on real hardware; results land in
docs/RESULTS_r1.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from visuelle2_tpu.cli.common import JsonlLogger
from visuelle2_tpu.data.images import ImageStore
from visuelle2_tpu.data.loader import BatchLoader
from visuelle2_tpu.data.pipeline import load_visuelle2
from visuelle2_tpu.data.synthetic import make_synthetic_dataset
from visuelle2_tpu.eval.forecast import score_split
from visuelle2_tpu.models import VocabSizes, build
from visuelle2_tpu.train.checkpoint import CheckpointManager
from visuelle2_tpu.train.loop import TrainConfig, Trainer


def main(root="/tmp/vis2_demo", epochs=4, batch_size=64, image_size=299):
    t_all = time.time()
    if not os.path.isfile(os.path.join(root, "stfore_train.csv")):
        print("generating synthetic dataset...")
        make_synthetic_dataset(root, num_train=1024, num_test=256,
                               image_size=image_size)
    tr = load_visuelle2(root, "train", demand=True, output_len=12)
    te = load_visuelle2(root, "test", demand=True, output_len=12)
    store_tr = ImageStore.build(os.path.join(root, "images"), tr.image_paths,
                                cache_file=ImageStore.cache_path(root, "train", image_size),
                                size=image_size)
    store_te = ImageStore.build(os.path.join(root, "images"), te.image_paths,
                                cache_file=ImageStore.cache_path(root, "test", image_size),
                                size=image_size)
    train_loader = BatchLoader(tr, store_tr, batch_size, shuffle=True,
                               drop_remainder=True)
    val_loader = BatchLoader(te, store_te, batch_size)
    print(f"data ready in {time.time()-t_all:.1f}s; "
          f"{len(train_loader)} train batches")

    vocab = VocabSizes(5, 6, 5, 126)
    model = build("gated_v4", vocab=vocab, output_len=12,
                  image_arch="resnet101", image_dtype=jnp.bfloat16)
    trainer = Trainer(model, TrainConfig(epochs=epochs, batch_size=batch_size,
                                         grad_clip=0.5))
    ckpt = CheckpointManager("/tmp/vis2_demo_ckpt", save_top_k=1)
    log = JsonlLogger(None)

    t0 = time.time()
    state = trainer.fit(train_loader, val_loader, checkpointer=ckpt, log_fn=log)
    train_s = time.time() - t0

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    result = score_split(model, variables, val_loader, measure_throughput=False)
    steps = epochs * len(train_loader)
    out = {
        "model": "gated_v4 demand (ResNet-101 @299, bf16 backbone)",
        "epochs": epochs,
        "batch_size": batch_size,
        "train_wall_s": round(train_s, 1),
        "steps_per_sec": round(steps / train_s, 3),
        "final_val_wape": round(result.wape, 3),
        "final_val_mae": round(result.mae, 3),
        "gflops_per_sample_eval": result.gflops_per_sample and round(
            result.gflops_per_sample, 2),
        "history": trainer.history,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "history"}))
    with open(os.path.join(REPO, "docs", "demo_train_tpu.json"), "w") as f:
        json.dump(out, f, indent=1, default=float)


if __name__ == "__main__":
    os.makedirs(os.path.join(REPO, "docs"), exist_ok=True)
    main()
