"""Fused bias + leaky-ReLU with sqrt(2) gain (StyleGAN FusedLeakyReLU).

TPU-native replacement for the reference CUDA op
(reference: enhancing/losses/op/fused_bias_act_kernel.cu:40-64 and the
autograd wrapper enhancing/losses/op/fused_act.py:20-127):
``y = scale * leaky_relu(x + bias, slope)`` with slope 0.2 and scale sqrt(2).

The Pallas kernel fuses bias-broadcast + activation in one VMEM pass; the
custom VJP reproduces the CUDA kernel's trick of computing the gradient from
the saved *output* sign (act*10+grad case 31 in the reference): for slope>0,
y > 0 iff x + b > 0, so only y needs saving.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import interpret_mode, use_pallas
from .partition import partitioned

SLOPE = 0.2
SCALE = math.sqrt(2.0)


def _fused_xla(x: jax.Array, bias: jax.Array, slope: float, scale: float
               ) -> jax.Array:
    t = x + bias.reshape((1,) * (x.ndim - 1) + (-1,)).astype(x.dtype)
    return scale * jnp.where(t >= 0, t, slope * t)


def _kernel(x_ref, b_ref, o_ref, *, slope: float, scale: float):
    t = x_ref[:] + b_ref[:].astype(x_ref.dtype)
    # Mosaic rejects sub-f32 comparisons on v5e ("Target does not support
    # this comparison" with a bf16 x); predicate in f32 — same VPU pass
    pred = t.astype(jnp.float32) >= 0
    o_ref[:] = (scale * jnp.where(pred, t, slope * t)).astype(o_ref.dtype)


def _fused_pallas2d(x2: jax.Array, b2: jax.Array, slope: float, scale: float
                    ) -> jax.Array:
    """Local-shape dispatch for the SPMD partitioner (ops/partition.py):
    rows and channels shard freely; misaligned local blocks take XLA."""
    m, c = x2.shape
    if m < 8 or c % 8 != 0:
        t = x2 + b2.astype(x2.dtype)
        return scale * jnp.where(t >= 0, t, slope * t)
    # VMEM budget: in + out blocks, double-buffered, fp32 worst case
    budget = 4 * 1024 * 1024
    block_m = max(8, min(m, budget // (c * 4 * 4)))
    block_m = (block_m // 8) * 8 or 8
    out = pl.pallas_call(
        functools.partial(_kernel, slope=slope, scale=scale),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        grid=(pl.cdiv(m, block_m),),
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(x2, b2)
    return out


# rows and channels both shard (bias rides the channel factor with x).
_fused2d_part = partitioned(_fused_pallas2d, "m c, u c -> m c",
                            need_replication=("u",), static_argnums=(2, 3))


def _fused_pallas(x: jax.Array, bias: jax.Array, slope: float, scale: float
                  ) -> jax.Array:
    orig_shape = x.shape
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    b2 = jnp.broadcast_to(bias.astype(jnp.float32)[None, :], (1, c))
    return _fused2d_part(x2, b2, slope, scale).reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_op(x, bias, slope, scale):
    return _fused_pallas(x, bias, slope, scale)


def _fused_op_fwd(x, bias, slope, scale):
    y = _fused_pallas(x, bias, slope, scale)
    return y, y  # gradient depends only on sign(y) (reference case 31)


def _fused_op_bwd(slope, scale, y, g):
    dt = jnp.where(y >= 0, scale, scale * slope).astype(g.dtype) * g
    db = jnp.sum(dt, axis=tuple(range(dt.ndim - 1))).astype(jnp.float32)
    return dt, db


_fused_op.defvjp(_fused_op_fwd, _fused_op_bwd)


def fused_leaky_relu(x: jax.Array, bias: jax.Array, slope: float = SLOPE,
                     scale: float = SCALE, *, impl: str | None = "auto"
                     ) -> jax.Array:
    """y = scale * leaky_relu(x + bias) with bias broadcast over the last dim.

    The reference broadcasts bias over channel dim 1 (NCHW); here images are
    NHWC so bias rides the last (lane) dimension.
    """
    if use_pallas(impl) and x.shape[-1] % 8 == 0 and x.size >= 8 * 128:
        return _fused_op(x, bias, float(slope), float(scale))
    return _fused_xla(x, bias, float(slope), float(scale))
