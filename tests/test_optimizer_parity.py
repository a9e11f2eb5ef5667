"""Adafactor parity vs a from-scratch numpy implementation of fairseq's
update rule (SURVEY.md "hard parts": the reference trains every model with
``Adafactor(scale_parameter=True, relative_step=True, warmup_init=True,
lr=None)``, ``/root/reference/models/CrossAttnRNN21.py:213-214``; WAPE parity
is sensitive to the schedule and the factored-RMS math).

The numpy reference implements the published fairseq/T5 Adafactor algorithm
(Shazeer & Stern 2018, as shipped in fairseq.optim.adafactor) — written from
the algorithm, fairseq itself is not installed here.

Known, documented divergences from fairseq (both second-moment bookkeeping
details, not schedule/update-scale):
* fairseq factors ANY >=2-D param; optax only when the two largest dims
  >= min_dim_size_to_factor (128 here) — small kernels keep a full second
  moment (strictly more accurate).
* for >2-D params fairseq factors over the last two axes, optax over the
  two largest; conv-kernel axes also differ by NCHW->HWIO layout anyway.
At the reference's production dims every Dense/embedding >=128 factors the
same way; these differences affect only tiny-dim configs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visuelle2_tpu.train.optim import adafactor, fairseq_relative_step_schedule

EPS0, EPS1 = 1e-30, 1e-3  # fairseq eps tuple
DECAY = 0.8
CLIP = 1.0


def _rms(x):
    return np.sqrt(np.mean(np.square(x)))


class NumpyFairseqAdafactor:
    """scale_parameter=True, relative_step=True, warmup_init=True, lr=None."""

    def __init__(self, param, factored):
        self.t = 0
        self.factored = factored
        if factored:
            self.r = np.zeros(param.shape[:-1], np.float32)   # row stats
            self.c = np.zeros(param.shape[:-2] + param.shape[-1:], np.float32)
        else:
            self.v = np.zeros_like(param)

    def step(self, p, g):
        self.t += 1
        t = self.t
        # warmup_init relative-step schedule: min(1e-6*t, 1/sqrt(t))
        rel_step = min(1e-6 * t, 1.0 / np.sqrt(t))
        alpha = max(EPS1, _rms(p)) * rel_step   # scale_parameter
        beta2t = 1.0 - t ** (-DECAY)
        g2 = np.square(g) + EPS0
        if self.factored:
            self.r = beta2t * self.r + (1 - beta2t) * g2.mean(axis=-1)
            self.c = beta2t * self.c + (1 - beta2t) * g2.mean(axis=-2)
            r_factor = 1.0 / np.sqrt(
                self.r / self.r.mean(axis=-1, keepdims=True))
            c_factor = 1.0 / np.sqrt(self.c)
            update = g * r_factor[..., None] * c_factor[..., None, :]
        else:
            self.v = beta2t * self.v + (1 - beta2t) * g2
            update = g / np.sqrt(self.v)
        update = update / max(1.0, _rms(update) / CLIP)
        return p - alpha * update


@pytest.mark.parametrize("shape,factored", [((256, 192), True), ((192,), False)])
def test_adafactor_matches_fairseq_reference(rng, shape, factored):
    tx = adafactor()  # reference config: relative-step warmup schedule
    p0 = rng.standard_normal(shape).astype(np.float32)
    p_jax = jnp.asarray(p0)
    opt_state = tx.init(p_jax)
    ref = NumpyFairseqAdafactor(p0, factored)
    p_np = p0.copy()

    for step in range(5):
        g = rng.standard_normal(shape).astype(np.float32) * (0.1 + step)
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, p_jax)
        p_jax = p_jax + updates
        p_np = ref.step(p_np, g)
        np.testing.assert_allclose(
            np.asarray(p_jax), p_np, rtol=2e-5, atol=1e-7,
            err_msg=f"diverged at step {step}")


def test_relative_step_schedule_values():
    """lr_t = min(1e-6 t, 1/sqrt(t)): warmup crosses over at t = 1e4."""
    for t, want in [(1, 1e-6), (100, 1e-4), (10**4, 1e-2),
                    (4 * 10**4, 5e-3)]:
        got = float(fairseq_relative_step_schedule(jnp.asarray(t - 1)))
        np.testing.assert_allclose(got, want, rtol=1e-5)
