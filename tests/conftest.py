"""Test config: force an 8-device virtual CPU mesh.

This is the JAX-native fake backend (SURVEY.md §4): multi-chip sharding tests
run on host CPU devices, no TPU required.

Note: the harness's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon, so mutating the env var here is too late — we must go
through ``jax.config.update``.  XLA_FLAGS is still honored because no backend
has been initialized yet when conftest runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# NOTE: do NOT enable jax_compilation_cache_dir here.  Tried as a suite-time
# optimization; on this host XLA:CPU AOT cache entries load with mismatched
# machine-feature sets across processes ("+prefer-no-scatter is not
# supported on the host machine ... could lead to execution errors such as
# SIGILL") and produced silently WRONG numerics (row-shifted model outputs
# in test_export.py).  Compile time is the price of correctness.

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", "tests must not run on the real TPU"


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    from visuelle2_tpu.data.synthetic import make_synthetic_dataset

    path = tmp_path_factory.mktemp("vis2")
    return make_synthetic_dataset(str(path), num_train=48, num_test=24, image_size=32)


@pytest.fixture()
def rng():
    return np.random.default_rng(21)
