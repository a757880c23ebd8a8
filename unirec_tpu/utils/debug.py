"""Debugging aids (SURVEY.md §5 "race detection/sanitizers": the JAX-native
equivalents are NaN/Inf checks and disabled-jit tracing)."""

from __future__ import annotations

import contextlib

import jax


def enable_nan_checks(enable: bool = True) -> None:
    """Raise on NaN/Inf produced by any jitted computation."""
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


@contextlib.contextmanager
def nan_checks():
    prev_nan = jax.config.jax_debug_nans
    prev_inf = jax.config.jax_debug_infs
    enable_nan_checks(True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nan)
        jax.config.update("jax_debug_infs", prev_inf)


@contextlib.contextmanager
def eager_mode():
    """Run without jit for step-through debugging."""
    with jax.disable_jit():
        yield
