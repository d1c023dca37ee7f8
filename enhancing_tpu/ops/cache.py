"""In-place KV-cache row writes for the autoregressive decode loop.

Why this op exists: the sampling loop carries the stacked KV caches
(L, B, ctx, C) through a ``lax.scan``. Writing the new token's row with
``dynamic_update_slice`` lets XLA's layout assigner pick a write-optimal
while-carry layout ({3,1,2,0}, ctx outermost-minor) that CONFLICTS with the
default layout the Pallas decode-attention custom call requires — the
compiler then inserts full-cache layout-conversion copies inside the loop
body: 4 copies x 262MB per decoded token for the shipped prior (~1GB/step,
measured 4.3k -> would-be 8k+ tok/s). Writing through a Pallas kernel with
``input_output_aliases`` pins BOTH producers and consumers of the cache to
the default layout, so the carry stays default and the copies vanish; the
kernel itself touches only the 8-row tile containing the written row.

Mosaic's trailing-dims rule forbids a bare 1-row block, so the kernel
read-modify-writes an aligned (8, C) tile: block index ctx//8, the row
selected with an iota mask.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import interpret_mode, use_pallas

ROWS = 8  # sublane-aligned tile height (bf16/f32; int8 tiles are 32 rows)


def _tile_rows(dtype) -> int:
    """Sublane-aligned tile height: int8 arrays tile (32, 128) on TPU."""
    return 32 if jnp.dtype(dtype).itemsize == 1 else ROWS


def _row_write_kernel(cur_ref, news_ref, cache_ref, out_ref, *, rows: int):
    cur = cur_ref[pl.program_id(1)]              # this batch row's position
    row_in_tile = cur % rows
    tile = cache_ref[0, 0]                       # (rows, C)
    new = news_ref[0, 0]                         # (1, C)
    row_ix = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0)
    out_ref[0, 0] = jnp.where(row_ix == row_in_tile,
                              jnp.broadcast_to(new, tile.shape), tile)


def _cache_row_update_pallas(cache: jax.Array, news: jax.Array,
                             cur_len: jax.Array) -> jax.Array:
    l, b, ctx, c = cache.shape
    rows = _tile_rows(cache.dtype)
    # per-row positions (a scalar broadcasts — the lockstep sampler)
    cur = jnp.broadcast_to(
        jnp.asarray(cur_len, jnp.int32).reshape(-1), (b,))

    def tile_index(i, j, cur_ref):
        return (i, j, cur_ref[j] // rows, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(l, b),
        in_specs=[
            pl.BlockSpec((1, 1, 1, c), lambda i, j, cur_ref: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, c), tile_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rows, c), tile_index,
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_row_write_kernel, rows=rows),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        grid_spec=grid_spec,
        # operand indices count the scalar-prefetch arg: 0=cur, 1=news,
        # 2=cache; aliasing cache -> output makes the write in-place
        input_output_aliases={2: 0},
        interpret=interpret_mode(),
    )(cur, news.astype(cache.dtype), cache)


def cache_row_update(cache: jax.Array, news: jax.Array, cur_len: jax.Array,
                     *, impl: str | None = "auto") -> jax.Array:
    """Write one ctx row into the stacked KV cache, in place on TPU.

    Args:
      cache: (L, B, ctx, C) stacked cache (any dtype).
      news: (L, B, 1, C) the new token's per-layer rows.
      cur_len: int32 scalar position to write, or a (B,) vector of per-row
        positions (ragged batch — continuous-batching serving).
    Returns the updated cache (the same buffer on TPU — donated via
    input_output_aliases).
    """
    if (use_pallas(impl) and cache.shape[2] % _tile_rows(cache.dtype) == 0
            and cache.shape[3] % 128 == 0):
        return _cache_row_update_pallas(cache, news, cur_len)
    if jnp.ndim(cur_len):
        # XLA twin for the ragged case: one masked select over ctx
        pos = jnp.arange(cache.shape[2])
        hit = pos[None, :] == jnp.asarray(cur_len, jnp.int32)[:, None]
        return jnp.where(hit[None, :, :, None], news.astype(cache.dtype),
                         cache)
    return jax.lax.dynamic_update_slice(
        cache, news.astype(cache.dtype), (0, 0, cur_len, 0))


def scale_row_update(scales: jax.Array, news: jax.Array,
                     cur_len: jax.Array) -> jax.Array:
    """Write one ctx position of the (L, B, ctx) per-row dequant scales
    (int8 KV cache). Plain XLA on purpose: these arrays are a few MB, so
    any while-carry layout copies are negligible next to the int8 caches
    they describe (the layout-pinning argument above applies only to the
    multi-hundred-MB k/v stacks).

    news: (L, B, 1); cur_len: int32 scalar or (B,) ragged positions."""
    if jnp.ndim(cur_len):
        pos = jnp.arange(scales.shape[2])
        hit = pos[None, :] == jnp.asarray(cur_len, jnp.int32)[:, None]
        return jnp.where(hit[None], news.astype(scales.dtype), scales)
    return jax.lax.dynamic_update_slice(
        scales, news.astype(scales.dtype), (0, 0, cur_len))
