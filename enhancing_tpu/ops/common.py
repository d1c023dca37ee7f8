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


_FORCE_XLA_DEPTH = 0


class force_xla_ops:
    """Trace-time context: dispatch all ops to their pure-XLA paths.

    custom_vjp kernels fix their first-order VJP and cannot be differentiated
    twice; regions needing higher-order AD (e.g. the R1 gradient penalty,
    which differentiates grad_x D(x) w.r.t. the discriminator params) trace
    under this context — the TPU-native equivalent of the reference switching
    conv implementations for R1 (op/conv2d_gradfix.py:12-19).
    """

    def __enter__(self):
        global _FORCE_XLA_DEPTH
        _FORCE_XLA_DEPTH += 1
        return self

    def __exit__(self, *exc):
        global _FORCE_XLA_DEPTH
        _FORCE_XLA_DEPTH -= 1
        return False


_SCANNED_WEIGHTS_DEPTH = 0


class scanned_weights:
    """Trace-time context: the region is a scan-over-layers body whose WEIGHT
    operands are dynamic slices of stacked (L, ...) arrays.

    Pallas custom calls force XLA to MATERIALIZE such a slice — a full copy
    of that layer's weight tile per scan step (per token in decode), the
    weight-side twin of the stacked-KV-cache rule in ops/cache.py. Plain XLA
    dots fuse the slice into the operand read instead. Weight-consuming ops
    (ops/int8) consult this to default to their XLA impl here: measured on
    the 24L flagship int8 decode, 86 -> 184 tok/s (251 -> 536 GB/s) from
    this routing alone. Ops whose sliced operands the kernel itself indexes
    (decode_attention_stacked's BlockSpec layer select) are NOT affected —
    they take the stack whole.
    """

    def __enter__(self):
        global _SCANNED_WEIGHTS_DEPTH
        _SCANNED_WEIGHTS_DEPTH += 1
        return self

    def __exit__(self, *exc):
        global _SCANNED_WEIGHTS_DEPTH
        _SCANNED_WEIGHTS_DEPTH -= 1
        return False


def in_scanned_weights() -> bool:
    return _SCANNED_WEIGHTS_DEPTH > 0


def use_pallas(impl: str | None) -> bool:
    """Resolve an ``impl`` argument ('auto' | 'pallas' | 'xla') to a decision."""
    if _FORCE_XLA_DEPTH > 0:
        return False
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
