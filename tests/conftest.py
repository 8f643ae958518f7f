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

# the axon TPU plugin ignores the JAX_PLATFORMS env var; force the CPU
# backend through the config instead
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: the big banded-DP scans compile slowly on
# the CPU backend; cache them across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pathlib

import pytest


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return pathlib.Path(__file__).parent / "data"


@pytest.fixture(autouse=True)
def _isolate_logger_state():
    """Snapshot/restore the module-level logger singleton around every test.

    CLI tests mutate the singleton (-v*/-log/-nocolor); without this, a
    test that raises verbosity leaks extra stderr into later byte-parity
    tests (e.g. the dpmatrix oracle dump)."""
    from quaff_tpu.logger import logger

    saved = (logger.verbosity, set(logger.tags), logger.use_color)
    thread_names = dict(logger._thread_names)
    try:
        yield
    finally:
        logger.verbosity, logger.tags, logger.use_color = saved[0], saved[1], saved[2]
        logger._thread_names = thread_names
        logger._last_owner = None
