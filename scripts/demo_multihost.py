"""Multi-host (multi-process) training demo on a hybrid dcn x data x model mesh.

Launch one instance per process (the reference has no distributed path at
all, SURVEY.md §2.4 — this is the framework's scale-out story):

    python scripts/demo_multihost.py --coordinator 127.0.0.1:9911 \
        --num_processes 2 --process_id 0 &
    python scripts/demo_multihost.py --coordinator 127.0.0.1:9911 \
        --num_processes 2 --process_id 1

Each process owns ``--devices_per_process`` devices (virtual CPU devices
here; TPU slices on a pod) and feeds ONLY its own rows of every batch;
gradients all-reduce across the ``dcn`` axis via gloo (CPU) / DCN (pods),
tensor parallelism stays on the innermost ``model`` axis.  Prints one JSON
line with the per-step losses and eval metrics — bitwise-comparable across
processes and against a single-process run on the same global batch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_global_batch(n, image_size=64, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "ts": rng.random((n, 12)).astype(np.float32),
        "cat": rng.integers(0, 5, n).astype(np.int32),
        "col": rng.integers(0, 6, n).astype(np.int32),
        "fab": rng.integers(0, 5, n).astype(np.int32),
        "store": rng.integers(0, 126, n).astype(np.int32),
        "temporal": rng.random((n, 4)).astype(np.float32),
        "gtrends": rng.random((n, 3, 52)).astype(np.float32),
        "images": rng.integers(0, 255, (n, image_size, image_size, 3)).astype(np.uint8),
        "mask": np.ones((n,), np.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None,
                    help="host:port; omit for single-process")
    ap.add_argument("--num_processes", type=int, default=1)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--devices_per_process", type=int, default=4)
    ap.add_argument("--model_axis", type=int, default=2)
    ap.add_argument("--global_batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    from visuelle2_tpu.parallel import distributed

    if args.num_processes > 1:
        distributed.initialize(args.coordinator, args.num_processes,
                               args.process_id,
                               cpu_devices_per_process=args.devices_per_process)
    else:
        # Single-process control run: same code path, dcn axis of size 1.
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.devices_per_process}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from visuelle2_tpu.models import VocabSizes, build
    from visuelle2_tpu.train.loop import TrainConfig, Trainer

    mesh = distributed.make_hybrid_mesh(model=args.model_axis)
    gb = synthetic_global_batch(args.global_batch)
    per = args.global_batch // jax.process_count()
    lo = args.process_id * per
    local = {k: v[lo:lo + per] for k, v in gb.items()}

    model = build("gated_v4", vocab=VocabSizes(5, 6, 5, 126), output_len=12,
                  embedding_dim=32, hidden_dim=64, image_arch="tiny")
    trainer = Trainer(model, TrainConfig(batch_size=args.global_batch,
                                         grad_clip=0.5, tp_min_dim=32),
                      mesh=mesh)
    state = trainer.init_state(local)
    losses = []
    for _ in range(args.steps):
        state, m = trainer.train_step(state, local, jax.random.key(0))
        losses.append(round(float(m["loss"]), 6))
    sums = trainer.eval_step(state, local)
    sums = {k: round(float(v), 5) for k, v in sums.items()}
    print(json.dumps({
        "process": args.process_id,
        "processes": jax.process_count(),
        "mesh": dict(mesh.shape),
        "losses": losses,
        "eval_sums": sums,
    }), flush=True)


if __name__ == "__main__":
    main()
