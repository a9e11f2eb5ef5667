"""visuelle2_tpu — a TPU-native JAX framework for multimodal fast-fashion sales
forecasting, with the full capability surface of the VISUELLE 2.0 multimodal-fusion
reference stack (jeonghoya/visuelle2-multimodal-fusion).

The framework forecasts weekly sales of fashion items from four modalities:

* product images (ResNet-101 features),
* text attributes (category / color / fabric / store embeddings),
* release-date temporal features,
* Google-Trends exogenous series (52-week windows).

It supports the reference's three benchmark tasks:

* **SO-fore 2-1**  — 2-week history, 1-week horizon (sliding windows),
* **SO-fore 2-10** — 2-week history, 10-week autoregressive horizon,
* **Demand**       — new-product forecasting with no history, 12-week horizon,

plus the statistical baselines (naive / SES / Holt).

Design stance (TPU-first, not a port):

* One vectorized data pipeline (``visuelle2_tpu.data``) replacing the reference's
  per-item Python loops (``/root/reference/dataset.py:68-171``) with numpy
  ``cumsum``/stride tricks, plus an image store that keeps decoded ``uint8``
  pixels on disk and fuses resize/normalize into the jitted step.
* One registry of flax models (``visuelle2_tpu.models``) sharing a common
  ``apply(params, batch) -> (forecast, aux)`` contract.
* One training loop (``visuelle2_tpu.train``) — jit-compiled train/eval steps
  sharded over a ``jax.sharding.Mesh``, ``optax`` Adafactor, orbax checkpoints.
* Pallas TPU kernels for the hot fused ops (``visuelle2_tpu.ops.pallas``).
"""

__version__ = "0.1.0"
