"""Fused vector-quantization codebook search (nearest-neighbour argmin).

The reference materialises the full (B*N_tokens, n_embed) distance matrix in
HBM and argmins over it (reference: enhancing/modules/stage1/quantizers.py:74-92).
On TPU that matrix (e.g. 8192-wide fp32 per token) is pure HBM-bandwidth waste:
this kernel tiles tokens × codebook, keeps each (block_m, block_n) score tile
in VMEM, and carries a running (min-distance, argmin-index) pair across
codebook tiles — the full matrix never exists.

Distance: ||z||^2 + ||e||^2 - 2 z.e. The ||z||^2 term is constant per row and
dropped inside the kernel (it cannot change the argmin).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import cdiv, interpret_mode, round_up, use_pallas
from .partition import partitioned


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Row-normalize like torch.nn.functional.normalize(dim=-1)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


# ---------------------------------------------------------------------------
# XLA reference path.
# ---------------------------------------------------------------------------

def _nearest_xla(z: jax.Array, codebook: jax.Array) -> jax.Array:
    """z: (M, D), codebook: (N, D) -> (M,) int32 indices of nearest codes."""
    # -2 z.e + ||e||^2 ; the ||z||^2 row constant is irrelevant for argmin.
    scores = (-2.0 * jnp.dot(z, codebook.T, preferred_element_type=jnp.float32)
              + jnp.sum(jnp.square(codebook.astype(jnp.float32)), axis=-1)[None, :])
    return jnp.argmin(scores, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Pallas fused kernel.
# ---------------------------------------------------------------------------

def _vq_kernel(z_ref, e_ref, esq_ref, idx_ref, best_val, best_idx, *,
               block_n: int, n_total: int):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    z = z_ref[:].astype(jnp.float32)            # (bm, D)
    e = e_ref[:].astype(jnp.float32)            # (bn, D)
    esq = esq_ref[:]                             # (1, bn) fp32

    s = jax.lax.dot_general(z, e, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = esq - 2.0 * s                            # (bm, bn)

    # Mask out codebook padding when n_embed is not a block multiple.
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_n
    s = jnp.where(col < n_total, s, jnp.inf)

    tile_min = jnp.min(s, axis=1, keepdims=True)                   # (bm, 1)
    is_min = s <= tile_min
    big = jnp.int32(n_total)
    tile_arg = jnp.min(jnp.where(is_min, col, big), axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        best_val[:] = tile_min
        best_idx[:] = tile_arg

    @pl.when(j > 0)
    def _():
        better = tile_min < best_val[:]
        best_val[:] = jnp.where(better, tile_min, best_val[:])
        best_idx[:] = jnp.where(better, tile_arg, best_idx[:])

    @pl.when(j == n_j - 1)
    def _():
        idx_ref[:] = best_idx[:]


def _nearest_pallas(z: jax.Array, codebook: jax.Array,
                    block_m: int = 1024, block_n: int = 2048) -> jax.Array:
    m, d = z.shape
    n = codebook.shape[0]
    block_m = min(block_m, round_up(m, 8))
    block_n = min(block_n, round_up(n, 128))

    esq = jnp.sum(jnp.square(codebook.astype(jnp.float32)), axis=-1)[None, :]

    grid = (cdiv(m, block_m), cdiv(n, block_n))
    idx = pl.pallas_call(
        functools.partial(_vq_kernel, block_n=block_n, n_total=n),
        out_shape=jax.ShapeDtypeStruct((m, 1), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_m, 1), jnp.float32),
            pltpu.VMEM((block_m, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * d,
            bytes_accessed=(z.size + codebook.size) * 4 + m * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(z, codebook, esq)
    return idx[:, 0]


def _nearest_impl(z2, codebook):
    """Local-shape dispatch for the SPMD partitioner (ops/partition.py):
    query rows shard freely over the mesh; tiny local blocks take the XLA
    path."""
    if z2.shape[0] >= 8:
        return _nearest_pallas(z2, codebook)
    return _nearest_xla(z2, codebook)


# query rows (m) shard; every shard needs the whole codebook (n, d).
_nearest_part = partitioned(_nearest_impl, "m d, n d -> m",
                            need_replication=("n", "d"))


def nearest_codebook_indices(z: jax.Array, codebook: jax.Array, *,
                             impl: str | None = "auto") -> jax.Array:
    """Indices of the nearest codebook row (L2) for each row of ``z``.

    Args:
      z: (..., D) query vectors (normalize beforehand if desired).
      codebook: (n_embed, D).
    Returns:
      int32 indices shaped like ``z`` minus its last dim.
    """
    batch_shape = z.shape[:-1]
    # argmin indices are piecewise-constant in the inputs (zero derivative);
    # cut the tangent path explicitly — pallas_call has no JVP rule, so
    # differentiating a training loss through this op would otherwise fail.
    z2 = jax.lax.stop_gradient(z.reshape(-1, z.shape[-1]))
    codebook = jax.lax.stop_gradient(codebook)
    if use_pallas(impl) and z2.shape[0] >= 8:
        idx = _nearest_part(z2, codebook)
    else:
        idx = _nearest_xla(z2, codebook)
    return idx.reshape(batch_shape)


def codebook_distances(z: jax.Array, codebook: jax.Array) -> jax.Array:
    """Full (..., n_embed) squared-L2 distance matrix (needed by Gumbel logits).

    reference: enhancing/modules/stage1/quantizers.py:111-114 — here the full
    matrix is semantically required (gumbel softmax over all codes), so it is
    computed as one XLA matmul.
    """
    zsq = jnp.sum(jnp.square(z), axis=-1, keepdims=True)
    esq = jnp.sum(jnp.square(codebook), axis=-1)
    cross = jnp.einsum("...d,nd->...n", z, codebook,
                       preferred_element_type=jnp.float32)
    return zsq + esq - 2.0 * cross
