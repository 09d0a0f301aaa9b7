"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors SURVEY.md §4's prescription: multi-device tests run on virtual CPU
devices via `--xla_force_host_platform_device_count`, no TPU pod needed.

Note: this environment's sitecustomize registers a remote TPU ("axon")
backend and pins JAX_PLATFORMS=axon, so we must override the config *after*
importing jax, before any backend is initialized.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
