"""Shared helpers for the Pallas op library: platform detection and tiling."""
from __future__ import annotations

import functools
import os

import jax


@functools.cache
def default_backend() -> str:
    return jax.default_backend()


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (incl. tunneled 'axon')."""
    if os.environ.get("ENHANCING_TPU_FORCE_XLA_OPS"):
        return False
    backend = default_backend()
    return backend in ("tpu", "axon")


def interpret_mode() -> bool:
    """True when Pallas kernels should run in interpreter mode (CPU testing)."""
    return bool(os.environ.get("ENHANCING_TPU_PALLAS_INTERPRET"))


def use_pallas(impl: str | None) -> bool:
    """Resolve an ``impl`` argument ('auto' | 'pallas' | 'xla') to a decision."""
    if impl in (None, "auto"):
        return on_tpu()
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    raise ValueError(f"unknown impl {impl!r}; expected 'auto', 'pallas' or 'xla'")


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m
