"""Scoped float64 enablement.

Golden-parity computations (XLA fills feeding tracebacks and text output)
require f64; the Pallas production kernels require the default 32-bit
mode (Mosaic rejects 64-bit values).  On CPU backends x64 is simply on
globally; on accelerator backends parity computations run on the CPU
device inside this scope.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def x64_scope():
    import jax

    if jax.config.jax_enable_x64:
        yield
        return
    try:
        from jax._src.config import enable_x64

        with enable_x64(True):
            yield
        return
    except ImportError:
        pass
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)
