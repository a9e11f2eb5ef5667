"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

This is the JAX-native fake backend (SURVEY.md §4): multi-chip sharding tests
run on host CPU devices, no TPU required.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    from visuelle2_tpu.data.synthetic import make_synthetic_dataset

    path = tmp_path_factory.mktemp("vis2")
    return make_synthetic_dataset(str(path), num_train=48, num_test=24, image_size=32)


@pytest.fixture()
def rng():
    return np.random.default_rng(21)
