"""Fused LayerNorm -> GEMM (+bias, +activation): y = act(LN(x) @ W + b).

Why: on TPU, XLA fuses elementwise ops into a dot's *output* but not into
its *operands* — a pre-norm transformer therefore pays a full HBM round
trip (read x, write LN(x), read LN(x) again) for every LayerNorm feeding a
projection. Measured on the stage-1 headline step (ViT d=768, N=1024,
b=128 on v5e): the two block LayerNorms cost 16.4 us/img/layer = ~12% of
the whole step. This kernel computes the row statistics on the fly from
the x block already resident in VMEM for the GEMM, so the normalized
activation never exists in HBM.

The reference has no analogue (PyTorch eager pays the same round trip and
more; reference: enhancing/modules/stage1/layers.py:85-150 applies
nn.LayerNorm then Linear as separate CUDA launches).

Forward-only Pallas (custom_vjp backward = VJP of the identical XLA twin,
same pattern as ops/attention.py). The XLA twin reproduces flax
nn.LayerNorm numerics exactly: fp32 statistics (fast variance), fp32
normalize + affine, cast to the compute dtype, then a plain dot.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import cdiv, interpret_mode, use_pallas
from .partition import partitioned


def _act(h, activation: str | None):
    if activation in (None, "none"):
        return h
    if activation == "tanh":
        return jnp.tanh(h)
    if activation == "sqrelu":
        return jnp.square(jax.nn.relu(h))
    if activation == "gelu":
        return jax.nn.gelu(h)
    raise ValueError(f"unknown activation {activation!r}")


def layernorm_xla(x, gamma, beta, eps: float = 1e-5):
    """flax nn.LayerNorm numerics: fp32 fast-variance stats, fp32 affine,
    result cast back to x.dtype."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (x32 - mean) * (jax.lax.rsqrt(var + eps)
                        * gamma.astype(jnp.float32)) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def _ln_gemm_xla(x, gamma, beta, w, b, activation, eps):
    h = jnp.dot(layernorm_xla(x, gamma, beta, eps), w)
    if b is not None:
        h = h + b.astype(h.dtype)
    return _act(h, activation)


def _ln_gemm_kernel(x_ref, g_ref, bt_ref, w_ref, b_ref, o_ref, *,
                    activation: str | None, eps: float):
    x32 = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=1, keepdims=True) - mean * mean, 0.0)
    xn = (x32 - mean) * (jax.lax.rsqrt(var + eps)
                         * g_ref[0].astype(jnp.float32)) \
        + bt_ref[0].astype(jnp.float32)
    out = jax.lax.dot_general(xn.astype(x_ref.dtype), w_ref[:],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out + b_ref[0].astype(jnp.float32)
    o_ref[:] = _act(out, activation).astype(o_ref.dtype)


def _pick_blocks(m, d, n, itemsize):
    """Measured-best policy (v5e; see the r3 sweep note below): 1024-row
    blocks with a ~1024-wide n block. ENHANCING_TPU_LNGEMM_BLOCKS="bm,bn"
    overrides for tuning."""
    import os
    env = os.environ.get("ENHANCING_TPU_LNGEMM_BLOCKS")
    if env:
        bm, bn = (int(t) for t in env.split(","))
        return min(bm, m), min(bn, n)
    # r3 re-sweep (chained-pair methodology, d=768 n=3072, v5e):
    # 1024x1024 -> 220 TF/s vs 512x1536 -> 169 and 512x3072 -> 175 — the
    # weight matrix is re-read once per ROW block (m/bm times), so doubling
    # bm halves W traffic; bn then shrinks to keep the W tile + fp32
    # accumulator in VMEM (2048-row and 12MB-accumulator configs crash the
    # Mosaic compiler). Deep-d (flagship 6144) keeps bm at 512 so the
    # full-d x block stays ~3MB.
    block_m = 1024 if d * 1024 * itemsize <= 3 * 1024 * 1024 else 512
    block_m = min(block_m, m)
    block_n = min(n, 1024)
    while (block_n > 512 and block_n % 2 == 0
           and (d * block_n * itemsize > 4 * 1024 * 1024
                or block_m * block_n * 4 > 4 * 1024 * 1024)):
        block_n //= 2
    if n % block_n:
        # A block_n that does not divide n pads the last grid step with dead
        # columns the MXU still computes: the qkv GEMM (n=2304) at bn=1024
        # ran 3 blocks covering 3072 columns — 33% wasted MACs, measured
        # 3.60 ms vs 2.70 ms at the even bn=768 split (v5e, m=131k d=768).
        # Prefer the largest 128-multiple <= the padded choice that divides n.
        for bn in range(block_n - 128, 127, -128):
            if n % bn == 0:
                return block_m, bn
    return block_m, block_n


def _supported(m, d, n, dtype):
    return (m >= 8 and d % 128 == 0 and n % 128 == 0
            and dtype in (jnp.bfloat16, jnp.float32)
            and d * dtype.itemsize <= 8 * 1024 * 1024)


def _ln_gemm_pallas(x, gamma, beta, w, b, activation, eps):
    m, d = x.shape
    n = w.shape[1]
    block_m, block_n = _pick_blocks(m, d, n, x.dtype.itemsize)
    kernel = functools.partial(_ln_gemm_kernel, activation=activation, eps=eps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(cdiv(m, block_m), cdiv(n, block_n)),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * d * n,
            bytes_accessed=(m * d + d * n + m * n) * x.dtype.itemsize,
            transcendentals=m * n if activation not in (None, "none") else 0,
        ),
        interpret=interpret_mode(),
    )(x, gamma.reshape(1, -1), beta.reshape(1, -1), w,
      b.reshape(1, -1))


def _ln_gemm_impl(x, gamma, beta, w, b, activation, eps, impl):
    m, d = x.shape
    if use_pallas(impl) and _supported(m, d, w.shape[1], x.dtype):
        return _ln_gemm_pallas(x, gamma, beta, w, b, activation, eps)
    return _ln_gemm_xla(x, gamma, beta, w, b, activation, eps)


# rows (m) shard freely (dp/sp); columns (n) shard with the weight
# (Megatron column parallel); LN needs each row's full feature axis (d).
_ln_gemm_part = partitioned(
    _ln_gemm_impl, "m d, d, d, d n, n -> m n",
    need_replication=("d",), static_argnums=(5, 6, 7))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _ln_gemm(x, gamma, beta, w, b, activation, eps, impl):
    return _ln_gemm_part(x, gamma, beta, w, b, activation, eps, impl)


def _ln_gemm_fwd(x, gamma, beta, w, b, activation, eps, impl):
    return (_ln_gemm_part(x, gamma, beta, w, b, activation, eps, impl),
            (x, gamma, beta, w, b))


def _ln_gemm_bwd(activation, eps, impl, res, g):
    x, gamma, beta, w, b = res
    _, vjp = jax.vjp(
        lambda x_, g_, bt_, w_, b_: _ln_gemm_xla(x_, g_, bt_, w_, b_,
                                                 activation, eps),
        x, gamma, beta, w, b)
    return vjp(g)


_ln_gemm.defvjp(_ln_gemm_fwd, _ln_gemm_bwd)


def fused_ln_gemm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                  w: jax.Array, b: jax.Array | None = None, *,
                  activation: str | None = None, eps: float = 1e-5,
                  impl: str | None = "auto") -> jax.Array:
    """y = act(LayerNorm(x; gamma, beta) @ w + b), LN never touching HBM.

    x: (..., d); gamma/beta: (d,); w: (d, n); b: (n,) or None.
    Falls back to the exact-flax XLA twin off-TPU, under force_xla_ops, or
    when the local block misses the Mosaic tiling grid.
    """
    batch_shape = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    w = w.astype(x.dtype)
    bz = jnp.zeros((w.shape[1],), jnp.float32) if b is None else b
    out = _ln_gemm(x2, gamma, beta, w, bz, activation, eps, impl)
    return out.reshape(*batch_shape, w.shape[1])


# ---------------------------------------------------------------------------
# Decode-path variant: LN -> RWKV token-shift -> GEMM in ONE kernel, with
# the LN output as a second result (the sampler carries it as the next
# token's shift state). The per-token decode step is DISPATCH-bound (~8
# kernels/layer/token through a relay with ~100us-scale dispatch gaps), so
# folding LayerNorm + the shift blend + the qkv/fc1 GEMM into one Pallas
# call removes 2 kernels per layer per token; bandwidth is unchanged (the
# (B, C) activations are tiny next to the weights).
#
# y = act((LN(x) * tm + prev * (1 - tm)) @ w + b),  xn = LN(x)
# With tm = None the shift is skipped (plain LN -> GEMM, but still
# returning xn for callers that need the normalized rows).
# ---------------------------------------------------------------------------


def _ln_shift_gemm_xla(x, gamma, beta, tm, prev, w, b, activation, eps):
    xn = layernorm_xla(x, gamma, beta, eps)
    mixed = xn * tm.astype(xn.dtype) + prev.astype(xn.dtype) \
        * (1.0 - tm.astype(xn.dtype)) if tm is not None else xn
    h = jnp.dot(mixed, w)
    if b is not None:
        h = h + b.astype(h.dtype)
    return _act(h, activation), xn


def _ln_shift_gemm_kernel(x_ref, g_ref, bt_ref, tm_ref, prev_ref, w_ref,
                          b_ref, o_ref, xn_ref, *, activation: str | None,
                          eps: float, with_shift: bool):
    x32 = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=1, keepdims=True) - mean * mean, 0.0)
    xn32 = (x32 - mean) * (jax.lax.rsqrt(var + eps)
                           * g_ref[0].astype(jnp.float32)) \
        + bt_ref[0].astype(jnp.float32)
    xn = xn32.astype(x_ref.dtype)
    xn_ref[:] = xn.astype(xn_ref.dtype)
    if with_shift:
        # mix in the COMPUTE dtype — the XLA twin (and the unfused module
        # path) blends the bf16 LN output, not the fp32 statistics
        tm = tm_ref[0].astype(x_ref.dtype)
        mixed = xn * tm + prev_ref[:].astype(x_ref.dtype) * (1.0 - tm)
    else:
        mixed = xn
    out = jax.lax.dot_general(mixed, w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out + b_ref[0].astype(jnp.float32)
    o_ref[:] = _act(out, activation).astype(o_ref.dtype)


def _ln_shift_gemm_pallas(x, gamma, beta, tm, prev, w, b, activation, eps,
                          with_shift):
    m, d = x.shape
    n = w.shape[1]
    block_m, block_n = _pick_blocks(m, d, n, x.dtype.itemsize)
    kernel = functools.partial(_ln_shift_gemm_kernel, activation=activation,
                               eps=eps, with_shift=with_shift)
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((m, n), x.dtype),
                   jax.ShapeDtypeStruct((m, d), x.dtype)],
        grid=(cdiv(m, block_m), cdiv(n, block_n)),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        # every n-block step rewrites the same xn rows (identical values) —
        # harmless at the decode shapes this kernel exists for (n/bn = 1-3)
        out_specs=[pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((block_m, d), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * d * n,
            bytes_accessed=(2 * m * d + d * n + m * n) * x.dtype.itemsize,
            transcendentals=m * n if activation not in (None, "none") else 0,
        ),
        interpret=interpret_mode(),
    )(x, gamma.reshape(1, -1), beta.reshape(1, -1), tm.reshape(1, -1),
      prev, w, b.reshape(1, -1))


def _ln_shift_gemm_impl(x, gamma, beta, tm, prev, w, b, activation, eps,
                        with_shift, impl):
    m, d = x.shape
    if use_pallas(impl) and _supported(m, d, w.shape[1], x.dtype):
        return tuple(_ln_shift_gemm_pallas(x, gamma, beta, tm, prev, w, b,
                                           activation, eps, with_shift))
    return _ln_shift_gemm_xla(x, gamma, beta, tm if with_shift else None,
                              prev, w, b, activation, eps)


# rows (m) shard freely (the batcher's sharded slots); columns (n) shard
# with the weight; LN and the shift need each row's full feature axis (d).
_ln_shift_gemm_part = partitioned(
    _ln_shift_gemm_impl, "m d, d, d, d, m d, d n, n -> m n, m d",
    need_replication=("d",), static_argnums=(7, 8, 9, 10))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _ln_shift_gemm(x, gamma, beta, tm, prev, w, b, activation, eps,
                   with_shift, impl):
    return _ln_shift_gemm_part(x, gamma, beta, tm, prev, w, b, activation,
                               eps, with_shift, impl)


def _ln_shift_gemm_fwd(x, gamma, beta, tm, prev, w, b, activation, eps,
                       with_shift, impl):
    return (_ln_shift_gemm_part(x, gamma, beta, tm, prev, w, b, activation,
                                eps, with_shift, impl),
            (x, gamma, beta, tm, prev, w, b))


def _ln_shift_gemm_bwd(activation, eps, with_shift, impl, res, g):
    x, gamma, beta, tm, prev, w, b = res
    _, vjp = jax.vjp(
        lambda x_, g_, bt_, tm_, p_, w_, b_: _ln_shift_gemm_xla(
            x_, g_, bt_, tm_ if with_shift else None, p_, w_, b_, activation,
            eps),
        x, gamma, beta, tm, prev, w, b)
    return vjp(g)


_ln_shift_gemm.defvjp(_ln_shift_gemm_fwd, _ln_shift_gemm_bwd)


def fused_ln_shift_gemm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                        tm: jax.Array | None, prev: jax.Array | None,
                        w: jax.Array, b: jax.Array | None = None, *,
                        activation: str | None = None, eps: float = 1e-5,
                        impl: str | None = "auto"
                        ) -> tuple[jax.Array, jax.Array]:
    """(act((LN(x)*tm + prev*(1-tm)) @ w + b), LN(x)) in one kernel.

    x: (..., d); gamma/beta: (d,); tm: (d,) RWKV time_mix (None skips the
    shift blend); prev: (..., d) the previous token's LN output; w: (d, n);
    b: (n,) or None. Returns (out (..., n), xn (..., d)) — ``xn`` is the LN
    output this token contributes as the NEXT token's ``prev``.
    Built for the dispatch-bound decode step; numerics match the unfused
    LayerNorm -> token-shift -> Dense module chain exactly (same XLA-twin
    pattern as fused_ln_gemm).
    """
    batch_shape = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    w = w.astype(x.dtype)
    bz = jnp.zeros((w.shape[1],), jnp.float32) if b is None else b
    with_shift = tm is not None
    if tm is None:
        tm = jnp.zeros((d,), jnp.float32)
    prev2 = (jnp.zeros_like(x2) if prev is None
             else prev.reshape(-1, d).astype(x.dtype))
    out, xn = _ln_shift_gemm(x2, gamma, beta, tm.reshape(-1), prev2, w, bz,
                             activation, eps, with_shift, impl)
    return (out.reshape(*batch_shape, w.shape[1]),
            xn.reshape(*batch_shape, d))


# ---------------------------------------------------------------------------
# Standalone fused LayerNorm (single read -> stats -> normalize -> single
# write). Used where no GEMM follows to fuse into (the transformer stacks'
# FINAL LayerNorm feeds the tiny pre_quant / to_pixel projections whose n is
# not 128-aligned). XLA's own LN emission for that op ran at ~122 GB/s on
# the v5e headline step (3.3 ms for a 201 MB bf16 (128,1024,768) tensor,
# profiled r3) — a single-pass VMEM-blocked kernel runs it at HBM speed.
# ---------------------------------------------------------------------------


def _ln_kernel(x_ref, g_ref, bt_ref, o_ref, *, eps: float):
    x32 = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=1, keepdims=True) - mean * mean, 0.0)
    o_ref[:] = ((x32 - mean) * (jax.lax.rsqrt(var + eps)
                                * g_ref[0].astype(jnp.float32))
                + bt_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _layernorm_pallas(x, gamma, beta, eps):
    m, d = x.shape
    block_m = min(m, 1024)
    while block_m > 256 and block_m * d * 4 > 4 * 1024 * 1024:
        block_m //= 2
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        grid=(cdiv(m, block_m),),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=8 * m * d,
            bytes_accessed=2 * m * d * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(x, gamma.reshape(1, -1), beta.reshape(1, -1))


def _layernorm_impl(x, gamma, beta, eps, impl):
    m, d = x.shape
    if use_pallas(impl) and m >= 8 and d % 128 == 0 \
            and x.dtype in (jnp.bfloat16, jnp.float32):
        return _layernorm_pallas(x, gamma, beta, eps)
    return layernorm_xla(x, gamma, beta, eps)


# rows shard freely; LN needs the full feature axis per row
_layernorm_part = partitioned(
    _layernorm_impl, "m d, d, d -> m d",
    need_replication=("d",), static_argnums=(3, 4))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _layernorm(x, gamma, beta, eps, impl):
    return _layernorm_part(x, gamma, beta, eps, impl)


def _layernorm_fwd(x, gamma, beta, eps, impl):
    return _layernorm_part(x, gamma, beta, eps, impl), (x, gamma, beta)


def _layernorm_bwd(eps, impl, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x_, g_, b_: layernorm_xla(x_, g_, b_, eps), x, gamma, beta)
    return vjp(g)


_layernorm.defvjp(_layernorm_fwd, _layernorm_bwd)


def fused_layernorm(x: jax.Array, gamma: jax.Array, beta: jax.Array, *,
                    eps: float = 1e-5, impl: str | None = "auto") -> jax.Array:
    """LayerNorm(x; gamma, beta) as one single-pass Pallas kernel.

    Numerics identical to flax ``nn.LayerNorm`` (fp32 fast-variance stats,
    fp32 affine, cast back to ``x.dtype``). Falls back to the XLA twin
    off-TPU, under ``force_xla_ops``, or on unsupported shapes.
    """
    batch_shape = x.shape[:-1]
    d = x.shape[-1]
    out = _layernorm(x.reshape(-1, d), gamma, beta, eps, impl)
    return out.reshape(*batch_shape, d)
