"""Model-matrix convergence check: every registry model trains on the
synthetic dataset and improves.

CPU-friendly (tiny backbone, 32px images); produces docs/train_matrix.json —
the per-family integration evidence for the parity map in README.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")

from visuelle2_tpu.data.images import ImageStore
from visuelle2_tpu.data.loader import BatchLoader
from visuelle2_tpu.data.pipeline import load_visuelle2
from visuelle2_tpu.data.synthetic import make_synthetic_dataset
from visuelle2_tpu.models import VocabSizes, build
from visuelle2_tpu.parallel.mesh import make_mesh
from visuelle2_tpu.train.loop import TrainConfig, Trainer

SMALL = dict(embedding_dim=16, hidden_dim=16, image_arch="tiny")
VOCAB = VocabSizes(5, 6, 5, 126)

TASKS = {
    # (model kwargs, demand, output_len, grad_clip)
    "cross_attn_rnn_21": (dict(attention_dim=16, out_len=1, **SMALL), False, 1, None),
    "cross_attn_rnn_210": (dict(attention_dim=16, out_len=10,
                                use_teacher_forcing=True, **SMALL), False, 10, None),
    "cross_attn_rnn_demand": (dict(attention_dim=16, out_len=12, **SMALL), True, 12, None),
    "gtm": (dict(output_len=12, **SMALL), True, 12, 0.5),
    "m4ft": (dict(output_len=12, **SMALL), True, 12, 0.5),
    "gated_v1": (dict(output_len=12, **SMALL), True, 12, 0.5),
    "gated_v2": (dict(output_len=12, **SMALL), True, 12, 0.5),
    "gated_v3": (dict(output_len=12, **SMALL), True, 12, 0.5),
    "gated_v4": (dict(output_len=12, **SMALL), True, 12, 0.5),
    # Original VISUELLE-1 GTM: needs ingest-time text features (see below).
    "gtm_v1": (dict(output_len=12, **SMALL), True, 12, 0.5),
}


def _text_extras(root, arrays):
    from visuelle2_tpu.data.pipeline import load_label_dicts
    from visuelle2_tpu.models.gtm_v1 import TextFeaturizer

    cat_d, col_d, fab_d = load_label_dicts(root)
    feat = TextFeaturizer(cat_d, col_d, fab_d)
    import numpy as np

    return {"text_features": feat(arrays.cat, arrays.col,
                                  arrays.fab).astype(np.float32)}


def main(root="/tmp/vis2_matrix", epochs=int(os.environ.get("MATRIX_EPOCHS", 5))):
    if not os.path.isfile(os.path.join(root, "stfore_train.csv")):
        make_synthetic_dataset(root, num_train=256, num_test=64, image_size=32)

    mesh = make_mesh(data=8, model=1)
    results = {}
    for name, (kw, demand, out_len, clip) in TASKS.items():
        tr = load_visuelle2(root, "train", demand=demand, output_len=out_len)
        te = load_visuelle2(root, "test", demand=demand, output_len=out_len)
        store_tr = ImageStore.build(os.path.join(root, "images"), tr.image_paths, size=32)
        store_te = ImageStore.build(os.path.join(root, "images"), te.image_paths, size=32)
        ex_tr = _text_extras(root, tr) if name == "gtm_v1" else None
        ex_te = _text_extras(root, te) if name == "gtm_v1" else None
        train_loader = BatchLoader(tr, store_tr, 32, shuffle=True,
                                   drop_remainder=True, extras=ex_tr)
        val_loader = BatchLoader(te, store_te, 32, extras=ex_te)
        if name == "gtm_v1":
            model = build(name, **kw)
        else:
            model = build(name, vocab=VOCAB, **kw)
        trainer = Trainer(model, TrainConfig(
            epochs=epochs, batch_size=32, grad_clip=clip, learning_rate=5e-3),
            mesh=mesh)
        t0 = time.time()
        trainer.fit(train_loader, val_loader)
        h = trainer.history
        results[name] = {
            "train_loss_first": round(h[0]["train_loss"], 4),
            "train_loss_last": round(h[-1]["train_loss"], 4),
            "val_wape_first": round(h[0]["val_wWAPE"], 2),
            "val_wape_best": round(min(x["val_wWAPE"] for x in h), 2),
            "wall_s": round(time.time() - t0, 1),
            "improved": h[-1]["train_loss"] < h[0]["train_loss"],
        }
        print(name, results[name], flush=True)

    with open(os.path.join(REPO, "docs", "train_matrix.json"), "w") as f:
        json.dump(results, f, indent=1)
    bad = [k for k, v in results.items() if not v["improved"]]
    print("ALL IMPROVED" if not bad else f"NOT IMPROVED: {bad}")


if __name__ == "__main__":
    main()
