"""Optimizer: Adafactor matching the reference's fairseq configuration.

Every neural model in the reference uses
``Adafactor(scale_parameter=True, relative_step=True, warmup_init=True,
lr=None)`` (``/root/reference/models/CrossAttnRNN21.py:213-214``).  fairseq's
relative-step schedule with warmup_init is ``lr_t = min(1e-6·t, 1/√t)``; the
parameter-scale multiplier and the β₂ schedule ``1 − t^−0.8`` map to optax's
``multiply_by_parameter_scale=True`` and ``decay_rate=0.8``.

``partition_trainable`` reproduces the ResNet freeze split
(``CrossAttnRNN21.py:63-65``): only layer3/layer4 of the backbone + all
non-backbone params receive updates; frozen params get ``set_to_zero``
(BatchNorm *statistics* still update through the mutable collection, matching
torch's requires_grad=False + train-mode BN).

Transformer-family trainers add global-norm clipping at 0.5
(``train_GTM_visuelle2.py:139``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def fairseq_relative_step_schedule(step):
    t = step.astype(jnp.float32) + 1.0
    return jnp.minimum(1e-6 * t, jax.lax.rsqrt(t))


def adafactor(grad_clip: Optional[float] = None,
              learning_rate=None) -> optax.GradientTransformation:
    """``learning_rate=None`` -> the fairseq relative-step warmup schedule
    (reference parity); pass a float/schedule to override (the warmup reaches
    lr 1e-2 only at step 10k, far too slow for smoke tests)."""
    tx = optax.adafactor(
        # `is None` (not `or`): an explicit learning_rate=0.0 must mean a
        # frozen optimizer, not silently fall back to the schedule.
        learning_rate=(fairseq_relative_step_schedule
                       if learning_rate is None else learning_rate),
        multiply_by_parameter_scale=True,
        decay_rate=0.8,
        clipping_threshold=1.0,
        min_dim_size_to_factor=128,
    )
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def current_lr(step: int, learning_rate=None) -> float:
    """Learning rate applied at the most recent optimizer update.

    The reference prints the running Adafactor LR every validation epoch
    (``/root/reference/models/CrossAttnRNN210.py:278-286``) — its main
    train-time observability signal.  Computed host-side (no device
    dispatch): optax's schedule is evaluated with the pre-increment update
    count, so after ``step`` completed updates the last applied LR is the
    schedule at ``step - 1``."""
    t = float(max(1, int(step)))  # update count of the latest step
    if learning_rate is None:
        return min(1e-6 * t, t ** -0.5)
    if callable(learning_rate):
        return float(learning_rate(t - 1.0))
    return float(learning_rate)


FROZEN_BACKBONE_PREFIXES = ("conv1", "bn1", "layer1_", "layer2_")


def _is_frozen(path) -> bool:
    keys = [p.key if hasattr(p, "key") else str(p) for p in path]
    for i, k in enumerate(keys):
        if k == "backbone" and i + 1 < len(keys):
            nxt = keys[i + 1]
            return any(nxt.startswith(pfx) for pfx in FROZEN_BACKBONE_PREFIXES)
    return False


def partition_trainable(params):
    """Label tree: 'train' everywhere except the frozen backbone stages."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "freeze" if _is_frozen(path) else "train", params)


def stop_frozen_gradients(params):
    """stop_gradient on the frozen backbone leaves.

    Applied inside the loss function so the frozen stages' backward can
    never be emitted.  Measured effect on the fully-jitted train step: none
    (117.8 ms/step at batch 128 either way) — XLA already dead-code-
    eliminates the dW computations because ``set_to_zero`` leaves them
    unused within the same jit.  Kept as a guarantee for any future caller
    that differentiates outside the fused train step.  BatchNorm
    *statistics* still update through the mutable collection, matching
    torch's requires_grad=False + train-mode BN.
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.lax.stop_gradient(x) if _is_frozen(path) else x,
        params)


def make_optimizer(params, grad_clip: Optional[float] = None,
                   learning_rate=None):
    """Adafactor with the reference freeze split applied."""
    labels = partition_trainable(params)
    return optax.multi_transform(
        {"train": adafactor(grad_clip, learning_rate),
         "freeze": optax.set_to_zero()}, labels)
