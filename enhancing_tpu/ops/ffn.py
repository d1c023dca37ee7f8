"""Fused position-wise FFN: (x @ W1 + b1) -> act -> (@ W2 + b2) in one kernel.

XLA materialises the (tokens, mlp_dim) hidden activation in HBM between the
two matmuls (~400MB round trip per ViT-base layer at batch 64). This kernel
keeps both weight matrices resident in VMEM and streams token blocks through
the full MLP, so the hidden never leaves the chip.

Forward-only Pallas (custom_vjp backward = VJP of the identical XLA path,
same pattern as ops/attention.py).

MEASURED (v5e, ViT-base encode+decode @ batch 64): the fused kernel is ~2%
SLOWER than XLA's unfused matmul pair (282 vs 277 ms/iter) — at 819GB/s the
hidden's HBM round trip costs less than the kernel loses to XLA's better
matmul scheduling. The op therefore defaults to the XLA path on 'auto';
set ENHANCING_TPU_FUSED_FFN=1 (or impl='pallas') to opt in — it may win on
hardware with a different FLOPs:bandwidth ratio.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import cdiv, interpret_mode, use_pallas


def _act(h, activation: str):
    if activation == "tanh":
        return jnp.tanh(h)
    if activation == "sqrelu":
        return jnp.square(jax.nn.relu(h))
    if activation == "gelu":
        return jax.nn.gelu(h)
    raise ValueError(f"unknown activation {activation!r}")


def _ffn_xla(x, w1, b1, w2, b2, activation):
    # match nn.Dense exactly: plain dots in the compute dtype. Forcing
    # preferred_element_type=f32 + astype costs an extra convert pass over
    # the (tokens, mlp_dim) hidden (measured +7ms on the ViT-base headline);
    # the MXU accumulates bf16 products in fp32 internally regardless.
    h = _act(jnp.dot(x, w1) + b1.astype(x.dtype), activation)
    return jnp.dot(h, w2) + b2.astype(x.dtype)


_H_CHUNK = 512  # hidden-dim tile: keeps the fp32 hidden slab small


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                activation: str, h_total: int, h_chunk: int):
    """Chunk the hidden dim: for each slab of W1/W2 columns/rows, compute
    act(x @ W1[:, s]) @ W2[s, :] and accumulate — the fp32 hidden stays a
    (block_m, h_chunk) tile instead of (block_m, mlp_dim)."""
    x = x_ref[:]
    n_chunks = h_total // h_chunk
    acc = None
    for c in range(n_chunks):
        sl = slice(c * h_chunk, (c + 1) * h_chunk)
        h = jax.lax.dot_general(x, w1_ref[:, sl], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = _act(h + b1_ref[0, sl].astype(jnp.float32), activation)
        o = jax.lax.dot_general(h.astype(x.dtype), w2_ref[sl, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = o if acc is None else acc + o
    o_ref[:] = (acc + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _ffn_pallas(x, w1, b1, w2, b2, activation):
    m, d = x.shape
    h = w1.shape[1]
    h_chunk = min(_H_CHUNK, h)
    assert h % h_chunk == 0, "hidden dim must tile evenly"
    # VMEM: weights resident + per-block x/out (double-buffered) + chunked
    # fp32 hidden + fp32 accumulator
    itemsize = x.dtype.itemsize
    weight_bytes = 2 * d * h * itemsize
    budget = 14 * 1024 * 1024 - weight_bytes
    per_row = (d * itemsize) * 4 + h_chunk * 4 + d * 4
    block_m = max(8, min(1024, budget // max(per_row, 1)))
    block_m = (block_m // 8) * 8 or 8
    block_m = min(block_m, m)

    return pl.pallas_call(
        functools.partial(_ffn_kernel, activation=activation, h_total=h,
                          h_chunk=h_chunk),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        grid=(cdiv(m, block_m),),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * h,
            bytes_accessed=(x.size + 2 * d * h + m * d) * itemsize,
            transcendentals=m * h,
        ),
        interpret=interpret_mode(),
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _ffn_fused(x, w1, b1, w2, b2, activation):
    return _ffn_pallas(x, w1, b1, w2, b2, activation)


def _ffn_fused_fwd(x, w1, b1, w2, b2, activation):
    return _ffn_pallas(x, w1, b1, w2, b2, activation), (x, w1, b1, w2, b2)


def _ffn_fused_bwd(activation, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda x_, w1_, b1_, w2_, b2_: _ffn_xla(x_, w1_, b1_, w2_, b2_,
                                                activation),
        x, w1, b1, w2, b2)
    return vjp(g)


_ffn_fused.defvjp(_ffn_fused_fwd, _ffn_fused_bwd)

# weights must fit VMEM alongside a token block
_MAX_WEIGHT_BYTES = 12 * 1024 * 1024


def fused_ffn(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
              b2: jax.Array, activation: str = "tanh", *,
              impl: str | None = "auto") -> jax.Array:
    """y = act(x @ w1 + b1) @ w2 + b2 with the hidden kept on-chip.

    x: (..., d); w1: (d, h); w2: (h, d). Falls back to the XLA path when the
    weights don't fit VMEM or off-TPU.
    """
    batch_shape = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    weight_bytes = (w1.size + w2.size) * x.dtype.itemsize
    if impl in (None, "auto") and not os.environ.get("ENHANCING_TPU_FUSED_FFN"):
        impl = "xla"  # measured slower than XLA on v5e; see module docstring
    if (use_pallas(impl) and x2.shape[0] >= 8
            and weight_bytes <= _MAX_WEIGHT_BYTES
            and d % 128 == 0
            and w1.shape[1] % min(_H_CHUNK, w1.shape[1]) == 0
            and w1.shape[1] % 128 == 0):
        out = _ffn_fused(x2, w1.astype(x.dtype), b1, w2.astype(x.dtype), b2,
                         activation)
    else:
        out = _ffn_xla(x2, w1.astype(x.dtype), b1, w2.astype(x.dtype), b2,
                       activation)
    return out.reshape(*batch_shape, d)
