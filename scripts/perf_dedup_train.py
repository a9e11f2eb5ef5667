"""Training throughput with unique-image dedup batches on the real chip.

Full gated_v4 train step (fwd + bwd + Adafactor + BN stats) at production
dims, sweeping the product-photo duplication factor: each batch of 128 rows
ships 128/dup unique images plus an img_idx map (data/loader.py grouped
sampler), so the dominant backbone fwd+bwd amortizes over ``dup`` rows.
dup=1 reproduces scripts/perf_train_step.py.

Relay-safe (CLAUDE.md "Benchmark integrity"): ONE jitted lax.scan whose
carry is the TrainState — steps serialize through the optimizer update by
construction; distinct per-step image batches; host fetch is the barrier.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
IMAGE = 299
ITERS = 4


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--dups", type=int, nargs="+", default=[1, 4, 10])
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize backbone blocks (large batches)")
    opts = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from visuelle2_tpu.models import VocabSizes, build
    from visuelle2_tpu.train.loop import TrainConfig, Trainer, expand_mask, \
        mse_loss, target_and_pred

    BATCH_, ITERS_ = opts.batch, opts.iters
    model = build("gated_v4", vocab=VocabSizes(5, 6, 5, 126), output_len=12,
                  image_arch="resnet101", image_dtype=jnp.bfloat16,
                  image_remat=opts.remat)
    trainer = Trainer(model, TrainConfig(batch_size=BATCH_, grad_clip=0.5))
    base = _synthetic_batch(BATCH_, IMAGE, seed=1)

    results = {}
    rng = np.random.default_rng(7)
    for dup in opts.dups:
        slots = -(-BATCH_ // dup)
        batch = dict(base, img_idx=(np.arange(BATCH_) // dup).astype(np.int32),
                     images=base["images"][:slots])
        state = trainer.init_state(batch)

        @jax.jit
        def scan_train(state, batch, image_stack):
            def body(state, images_t):
                b = dict(batch, images=images_t)

                def loss_fn(params):
                    variables = {"params": params,
                                 "batch_stats": state.batch_stats}
                    (f, _aux), mut = model.apply(
                        variables, b, train=True,
                        rngs={"dropout": jax.random.key(0),
                              "sampling": jax.random.key(1)},
                        mutable=["batch_stats"])
                    target, pred = target_and_pred(b, f)
                    return mse_loss(target, pred, expand_mask(b, target)), \
                        mut["batch_stats"]

                (loss, stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                return state.apply_gradients(grads, stats), loss

            return jax.lax.scan(body, state, image_stack)

        warm = jax.device_put(rng.integers(
            0, 255, (ITERS_, slots, IMAGE, IMAGE, 3)).astype(np.uint8))
        timed = jax.device_put(rng.integers(
            0, 255, (ITERS_, slots, IMAGE, IMAGE, 3)).astype(np.uint8))
        batch = jax.device_put(batch)

        state2, losses = scan_train(state, batch, warm)
        np.asarray(losses)
        t0 = time.perf_counter()
        _, losses = scan_train(state2, batch, timed)
        np.asarray(losses)
        dt = (time.perf_counter() - t0) / ITERS_
        results[f"dup{dup}"] = {
            "slots": slots, "step_ms": round(dt * 1000, 1),
            "train_samples_per_sec_per_chip": round(
                BATCH_ / dt / max(1, len(jax.devices())), 1),
        }
        print(json.dumps({f"dup{dup}": results[f"dup{dup}"]}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()


