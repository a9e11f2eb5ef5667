"""Train-step roofline: attribute the full training step the way
perf_roofline.py attributed the forward pass.

Round 3 proved the forward pass runs AT the sum of its per-shape conv
floors (docs/RESULTS_r3.md).  The train step (~106 ms at batch 128,
docs/perf_dedup_series.json dup1) has no such attribution yet: this script
decomposes it into measured components and checks the backward pass against
per-shape conv VJP floors, so "training is/isn't at speed-of-light" becomes
a measurement rather than an extrapolation.

Components (gated_v4 @ ResNet-101/299 bf16, batch 128 — the flagship
training config, /root/reference/train_Gated_visuelle2.py pattern):

1. ``fwd_eval``   — apply(train=False): the inference forward (ties this
                    run to the roofline/dedup-series numbers).
2. ``fwd_train``  — apply(train=True, mutable batch_stats): adds train-mode
                    BatchNorm statistics + dropout mask cost.
3. ``grads``      — the Trainer's exact loss (stop_frozen_gradients
                    included) under value_and_grad, grads kept alive via a
                    global-norm consumer: adds the backward pass.
4. ``full_step``  — grads + Adafactor update chained through the scan carry
                    (the real train step): adds the optimizer.
5. Per-shape conv VJPs for the TRAINABLE stages (layer3/layer4 — the frozen
   stages' backward is DCE'd, optim.py): fwd+dgrad+wgrad time per shape,
   wgrad/dgrad split for the heaviest.  Σ(bwd × multiplicity) is the
   per-shape floor the measured backward (3 − 2) must meet.

Relay-safe methodology throughout (CLAUDE.md benchmark integrity): one
jitted ``lax.scan`` per measurement over fully distinct per-step batches
(model measurements) or carry-chained derived inputs (conv measurements),
host fetch as the barrier, the measured ~28 ms round-trip floor subtracted.

    python scripts/perf_train_roofline.py --out docs/train_roofline_r3.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
IMAGE = 299


def _model_scan_time(fn_step, stacks, floor):
    """Time one jitted scan over pre-stacked distinct batches; secs/step."""
    import jax

    warm, timed = stacks
    np.asarray(fn_step(warm))
    t0 = time.perf_counter()
    np.asarray(fn_step(timed))
    iters = jax.tree_util.tree_leaves(timed)[0].shape[0]
    return (time.perf_counter() - t0 - floor) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--fwd_iters", type=int, default=40)
    ap.add_argument("--step_iters", type=int, default=16)
    ap.add_argument("--skip_convs", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: tiny backbone/shapes, validates "
                         "every code path without TPU hardware")
    opts = ap.parse_args()

    global BATCH, IMAGE
    if opts.tiny:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
        BATCH, IMAGE = 8, 64

    import jax
    import jax.numpy as jnp
    import optax

    import perf_dedup_series as pds
    from perf_dedup_series import _rt_floor, _stack_batches

    pds.BATCH, pds.IMAGE = BATCH, IMAGE  # _stack_batches reads its globals
    from perf_roofline import RESNET101_CONVS, _time_scan, conv_out_dim
    from visuelle2_tpu.models import VocabSizes, build
    from visuelle2_tpu.train import optim as optim_lib
    from visuelle2_tpu.train.loop import (TrainConfig, Trainer, expand_mask,
                                          mse_loss, target_and_pred)

    model = build("gated_v4", vocab=VocabSizes(5, 6, 5, 126), output_len=12,
                  image_arch="tiny" if opts.tiny else "resnet101",
                  image_dtype=jnp.bfloat16)
    trainer = Trainer(model, TrainConfig(batch_size=BATCH, grad_clip=0.5))

    def stacks(iters, seed0):
        _, warm = _stack_batches(iters, seed0, dup=1)
        _, timed = _stack_batches(iters, seed0 + 5_000, dup=1)
        return jax.device_put(warm), jax.device_put(timed)

    base = jax.tree_util.tree_map(lambda x: x[0], stacks(1, 1)[0])
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, base)
    variables = jax.device_put(variables)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    floor = _rt_floor()
    results = {"device": jax.devices()[0].device_kind, "batch": BATCH,
               "rt_floor_ms": round(floor * 1e3, 2), "model": {}}

    # --- 1. fwd_eval ------------------------------------------------------
    @jax.jit
    def scan_fwd_eval(stack):
        def body(_, b):
            f, _aux = model.apply(variables, b, train=False)
            return 0, jnp.mean(f)
        return jax.lax.scan(body, 0, stack)[1]

    ms = _model_scan_time(scan_fwd_eval, stacks(opts.fwd_iters, 11_000),
                          floor) * 1e3
    results["model"]["fwd_eval_ms"] = round(ms, 2)
    print(json.dumps({"fwd_eval_ms": results["model"]["fwd_eval_ms"]}),
          flush=True)

    # --- 2. fwd_train (BN stats + dropout, no backward) --------------------
    @jax.jit
    def scan_fwd_train(stack):
        def body(_, b):
            (f, _aux), mut = model.apply(
                variables, b, train=True,
                rngs={"dropout": jax.random.key(0),
                      "sampling": jax.random.key(1)},
                mutable=["batch_stats"])
            # Consume the mutated stats so the BN statistics updates stay
            # live (they are the thing being measured here).
            stats_sum = sum(jnp.sum(x) for x in
                            jax.tree_util.tree_leaves(mut["batch_stats"]))
            return 0, jnp.mean(f) + stats_sum * 1e-20
        return jax.lax.scan(body, 0, stack)[1]

    ms = _model_scan_time(scan_fwd_train, stacks(opts.fwd_iters, 12_000),
                          floor) * 1e3
    results["model"]["fwd_train_ms"] = round(ms, 2)
    print(json.dumps({"fwd_train_ms": results["model"]["fwd_train_ms"]}),
          flush=True)

    # --- 3. grads (the Trainer's loss under value_and_grad) ----------------
    def loss_fn(p, b):
        vs = {"params": optim_lib.stop_frozen_gradients(p)}
        if batch_stats:
            vs["batch_stats"] = batch_stats
        (f, _aux), mut = model.apply(
            vs, b, train=True,
            rngs={"dropout": jax.random.key(0), "sampling": jax.random.key(1)},
            mutable=["batch_stats"])
        target, pred = target_and_pred(b, f)
        return mse_loss(target, pred, expand_mask(b, target)), \
            mut["batch_stats"]

    @jax.jit
    def scan_grads(stack):
        def body(_, b):
            (loss, _stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, b)
            # Global norm keeps every grad leaf alive (what grad-clip does in
            # the real step) without adding an optimizer.
            return 0, loss + optax.global_norm(grads) * 1e-20
        return jax.lax.scan(body, 0, stack)[1]

    ms = _model_scan_time(scan_grads, stacks(opts.step_iters, 13_000),
                          floor) * 1e3
    results["model"]["grads_ms"] = round(ms, 2)
    print(json.dumps({"grads_ms": results["model"]["grads_ms"]}), flush=True)

    # --- 4. full step (grads + Adafactor), carry-chained -------------------
    state = trainer.init_state(base)

    @jax.jit
    def scan_step(state, stack):
        def body(st, b):
            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params, b)
            return st.apply_gradients(grads, stats), loss
        return jax.lax.scan(body, state, stack)

    warm, timed = stacks(opts.step_iters, 14_000)
    st2, losses = scan_step(state, warm)
    np.asarray(losses)
    t0 = time.perf_counter()
    _, losses = scan_step(st2, timed)
    np.asarray(losses)
    ms = (time.perf_counter() - t0 - floor) / opts.step_iters * 1e3
    results["model"]["full_step_ms"] = round(ms, 2)
    print(json.dumps({"full_step_ms": results["model"]["full_step_ms"]}),
          flush=True)

    m = results["model"]
    results["deltas"] = {
        "bn_stats_dropout_ms": round(m["fwd_train_ms"] - m["fwd_eval_ms"], 2),
        "backward_ms": round(m["grads_ms"] - m["fwd_train_ms"], 2),
        "optimizer_ms": round(m["full_step_ms"] - m["grads_ms"], 2),
    }
    print(json.dumps({"deltas": results["deltas"]}), flush=True)

    # --- 5. per-shape conv VJPs for the trainable stages --------------------
    if not opts.skip_convs:
        from jax import lax

        def conv_fn(x, w, k, stride):
            # Mirrors the model's flax Conv(dtype=bfloat16): bf16 in/out, no
            # f32 preferred accumulation type (models/resnet.py:75-78), so
            # the VJP convs are bf16 like the real backward pass.
            return lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                window_strides=(stride, stride),
                padding=[(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        results["convs_bwd"] = {}
        trainable = [c for c in RESNET101_CONVS
                     if c[0].startswith(("s3_", "s4_"))]
        heavy = {"s3_1x1a_wide", "s3_3x3", "s3_1x1b"}
        if opts.tiny:  # one small shape exercises the whole code path
            trainable = [("s3_1x1b_tiny", 8, 32, 64, 1, 1, 1)]
            heavy = {"s3_1x1b_tiny"}
        for name, hin, cin, cout, k, stride, count in trainable:
            hout = conv_out_dim(hin, k, stride)
            rng = np.random.default_rng(0)
            W = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * .05
            dy = rng.standard_normal(
                (BATCH, hout, hout, cout)).astype(np.float32)

            def make_input(i, hin=hin, cin=cin):
                r = np.random.default_rng(3000 + i)
                return r.standard_normal(
                    (BATCH, hin, hin, cin)).astype(np.float32)

            def fwd_only(x, w, dy, k=k, s=stride):
                return jnp.sum((conv_fn(x, w, k, s) *
                                dy.astype(jnp.bfloat16)).astype(jnp.float32))

            def fwd_bwd(x, w, dy, k=k, s=stride):
                dx, dw = jax.grad(fwd_only, argnums=(0, 1))(x, w, dy)
                return jnp.mean(dx) + jnp.mean(dw)

            t_f = _time_scan(fwd_only, make_input, W, dy)
            t_fb = _time_scan(fwd_bwd, make_input, W, dy)
            entry = {"count": count,
                     "fwd_ms": round(t_f * 1e3, 3),
                     "fwd_bwd_ms": round(t_fb * 1e3, 3),
                     "bwd_ms": round((t_fb - t_f) * 1e3, 3)}
            if name in heavy:
                def wgrad_only(x, w, dy, k=k, s=stride):
                    return jnp.mean(jax.grad(fwd_only, argnums=1)(x, w, dy))

                def dgrad_only(x, w, dy, k=k, s=stride):
                    return jnp.mean(jax.grad(fwd_only, argnums=0)(x, w, dy))

                entry["fwd_wgrad_ms"] = round(
                    _time_scan(wgrad_only, make_input, W, dy) * 1e3, 3)
                entry["fwd_dgrad_ms"] = round(
                    _time_scan(dgrad_only, make_input, W, dy) * 1e3, 3)
            results["convs_bwd"][name] = entry
            print(json.dumps({name: entry}), flush=True)

        floor_bwd = sum(e["bwd_ms"] * e["count"]
                        for e in results["convs_bwd"].values())
        results["attribution"] = {
            "sum_trainable_conv_bwd_ms": round(floor_bwd, 2),
            "measured_backward_ms": results["deltas"]["backward_ms"],
            "backward_over_conv_floor": round(
                results["deltas"]["backward_ms"] / max(floor_bwd, 1e-9), 3),
        }
        print(json.dumps({"attribution": results["attribution"]}), flush=True)

    print(json.dumps(results))
    if opts.out:
        with open(opts.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"-> {opts.out}")


if __name__ == "__main__":
    main()
