"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices (the standard way to
exercise multi-chip sharding logic without TPU hardware) and with 64-bit
floats enabled, since golden-file parity against the reference's
double-precision C++ output requires f64 DP.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)

import pathlib

import pytest


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return pathlib.Path(__file__).parent / "data"
