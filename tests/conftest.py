"""Test configuration: force the CPU backend with an 8-device virtual mesh so
sharding tests run without TPU hardware.

Note: this environment's sitecustomize registers an ``axon`` TPU plugin and
forces ``jax_platforms="axon,cpu"`` via jax.config (env vars alone don't win),
so we must override through jax.config before any backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
