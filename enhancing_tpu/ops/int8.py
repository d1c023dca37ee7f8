"""Weights-only int8 GEMMs for the bandwidth-bound decode path.

Why: autoregressive decode re-reads every matmul weight once per token —
the README's decode table shows the bf16 samplers running at 58-66% of the
HBM roofline with params the dominant traffic term. Symmetric per-output-
channel int8 weights halve that term; the MXU still multiplies in bf16
(the int8 tile is cast in VMEM after the DMA), so this is a pure HBM-read
optimization: y = (x @ w_q) * scale + b, exact in the scale factorization
because the scale is constant along the contraction axis.

The quantization itself runs ONCE, outside the jitted sampler
(``quantize_channelwise`` / models/stage2/quantize.py) — the int8 tensors
are real buffers, not a loop-invariant XLA rewrite the while-loop LICM
might fail to hoist.

The reference has no quantization anywhere (its sampler runs fp16 autocast,
enhancing/modules/stage2/layers.py:268-303). Kernels follow the library
pattern: XLA twin for CPU/fallback, Shardy partition rule, Pallas on TPU.
Inference-only (no custom_vjp): nothing in the decode loop is
differentiated.
"""
from __future__ import annotations

import contextlib
import contextvars
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import cdiv, in_scanned_weights, interpret_mode, use_pallas
from .ln_gemm import _act, layernorm_xla
from .partition import partitioned


_W8A8_GEMMS = contextvars.ContextVar("w8a8_gemms", default=False)


@contextlib.contextmanager
def w8a8_gemms():
    """Trace-time switch: stage-1 transformer blocks route their four GEMMs
    (qkv, to_out, fc1, fc2) through the MXU's native int8 path — dynamic
    per-row activation quant x per-channel weight quant (quantized on the
    fly inside the program; stage-1 weights are ~2% of the activation
    traffic, so the re-quantize is free, unlike decode where weights
    dominate and are pre-quantized). Wrap the jit TRACE (first call), not
    just the execution. Env twin: ENHANCING_TPU_STAGE1_GEMM=w8a8.
    Numerics gate: scripts/bench_int8_stage1.py (code match + recon PSNR).
    """
    tok = _W8A8_GEMMS.set(True)
    try:
        yield
    finally:
        _W8A8_GEMMS.reset(tok)


def w8a8_gemms_enabled() -> bool:
    return (_W8A8_GEMMS.get()
            or os.environ.get("ENHANCING_TPU_STAGE1_GEMM") == "w8a8")


def quantize_channelwise(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8: w ~= w_q * scale.

    w: (..., d, n) — the contraction axis is -2, channels are the LAST
    axis. Returns (w_q int8 same shape, scale f32 (..., n)).
    """
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w32 / scale[..., None, :]), -127, 127)
    return w_q.astype(jnp.int8), scale


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row (last axis) dynamic symmetric int8: x ~= x_q * sx.

    Returns (x_q int8, sx f32 (..., 1)). The activation half of W8A8 —
    computed fresh every call (decode activations change per token)."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    return x_q, sx


def _w8a8_dot(x, w_q, scale):
    """quantize rows of x -> int8 x int8 -> int32 on the MXU -> rescale.

    W8A8 reads the same 1 byte/weight as the dequant kernels but skips the
    per-element int8->bf16 weight cast, which at flagship dims (6144x18432
    per GEMM) is VPU-bound and was measured SLOWER than bf16 (README
    decode table). The MXU's int8 path also runs at 2x the bf16 slot rate.
    Cost: bounded activation-quantization error (bench_int8_stage1 /
    parity_report --int8 measure it)."""
    x_q, sx = quantize_rows(x)
    acc = jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (sx * scale.astype(jnp.float32)[None, :])


# ---------------------------------------------------------------------------
# Fake quantization (numerics experiments: W8A8 is exactly representable as
# fake-quant because the int8 dot accumulates losslessly in int32)
# ---------------------------------------------------------------------------


def fake_quant_act(x: jax.Array) -> jax.Array:
    """Per-row (last axis) symmetric int8 fake-quant — dynamic activation
    quantization as the int8 MXU path would compute it."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 127.0
    return (jnp.clip(jnp.round(x32 / s), -127, 127) * s).astype(x.dtype)


def fake_quant_weights(params):
    """Per-output-channel int8 fake-quant of every >=2-D ``kernel`` leaf
    (same scale factorization as quantize_channelwise, dequantized in
    place). Use to measure weights-only int8 numerics on any model."""
    def q(path, a):
        if path and getattr(path[-1], "key", None) == "kernel" \
                and hasattr(a, "ndim") and a.ndim >= 2:
            w_q, scale = quantize_channelwise(a)
            return (w_q.astype(jnp.float32) * scale[..., None, :]
                    ).astype(a.dtype)
        return a
    return jax.tree_util.tree_map_with_path(q, params)


def intercept_dense_w8a8():
    """flax ``intercept_methods`` context fake-quantizing the input of every
    ``nn.Dense`` call — combine with ``fake_quant_weights`` for a full W8A8
    numerics run without model surgery (scripts/bench_int8_stage1.py,
    scripts/parity_report.py --int8)."""
    import flax.linen as nn

    def interceptor(next_fn, args, kwargs, context):
        if isinstance(context.module, nn.Dense) \
                and context.method_name == "__call__":
            args = (fake_quant_act(args[0]),) + args[1:]
        return next_fn(*args, **kwargs)

    return nn.intercept_methods(interceptor)


# ---------------------------------------------------------------------------
# y = act((x @ w_q) * scale + b) [+ residual]
# ---------------------------------------------------------------------------


def _int8_gemm_xla(x, w_q, scale, b, residual, activation, w8a8=False):
    if w8a8:
        out = _w8a8_dot(x, w_q, scale)
    else:
        out = jnp.dot(x, w_q.astype(x.dtype),
                      preferred_element_type=jnp.float32)
        out = out * scale.astype(jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    out = _act(out, activation)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    return out.astype(x.dtype)


def _int8_gemm_kernel(x_ref, wq_ref, sc_ref, b_ref, *rest, activation,
                      with_residual):
    if with_residual:
        res_ref, o_ref = rest
    else:
        (o_ref,) = rest
    w = wq_ref[:].astype(x_ref.dtype)
    out = jax.lax.dot_general(x_ref[:], w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out * sc_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    out = _act(out, activation)
    if with_residual:
        out = out + res_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _int8_blocks(m, d, n, itemsize):
    """Weight tile is int8 (1 byte): budget ~6MB for it, ~4MB fp32 acc."""
    block_m = min(m, 1024)
    while block_m > 8 and block_m * d * itemsize > 4 * 1024 * 1024:
        block_m //= 2
    block_n = min(n, 2048)
    while (block_n > 256 and block_n % 2 == 0
           and (d * block_n > 6 * 1024 * 1024
                or block_m * block_n * 4 > 4 * 1024 * 1024)):
        block_n //= 2
    if n % block_n:
        for bn in range(block_n - 128, 127, -128):
            if n % bn == 0:
                return block_m, bn
    return block_m, block_n


def _resolve_impl(impl):
    """'auto' resolution order (trace time; explicit impl= args win):
    1. ENHANCING_TPU_INT8_IMPL env override (A/B experiments);
    2. inside a ``scanned_weights()`` region -> 'xla': Pallas custom calls
       force XLA to MATERIALIZE each layer's dynamic-sliced weight operand
       — a per-layer per-token copy of the whole weight tile; plain XLA
       dots let the slice fuse instead (measured 2.14x on the 24L flagship
       int8 decode — see ops/common.scanned_weights);
    3. 'auto' (Pallas on TPU when the shape gates pass)."""
    if impl in (None, "auto"):
        env = os.environ.get("ENHANCING_TPU_INT8_IMPL")
        if env:
            return env
        if in_scanned_weights():
            return "xla"
    return impl


def _int8_supported(m, d, n, dtype):
    return (m >= 1 and d % 128 == 0 and n % 128 == 0
            and dtype in (jnp.bfloat16, jnp.float32))


def _int8_gemm_pallas(x, w_q, scale, b, residual, activation):
    m, d = x.shape
    n = w_q.shape[1]
    block_m, block_n = _int8_blocks(m, d, n, x.dtype.itemsize)
    with_residual = residual is not None
    in_specs = [
        pl.BlockSpec((block_m, d), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, block_n), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, w_q, scale.reshape(1, -1), b.reshape(1, -1)]
    if with_residual:
        in_specs.append(pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                                     memory_space=pltpu.VMEM))
        args.append(residual)
    return pl.pallas_call(
        functools.partial(_int8_gemm_kernel, activation=activation,
                          with_residual=with_residual),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(cdiv(m, block_m), cdiv(n, block_n)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * d * n,
            bytes_accessed=m * d * x.dtype.itemsize + d * n + 4 * n
            + m * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(*args)


def _int8_gemm_impl(x, w_q, scale, b, activation, w8a8, impl):
    m, d = x.shape
    if w8a8:  # XLA's native int8 dot already rides the MXU; no kernel
        return _int8_gemm_xla(x, w_q, scale, b, None, activation, True)
    if use_pallas(impl) and _int8_supported(m, d, w_q.shape[1], x.dtype):
        return _int8_gemm_pallas(x, w_q, scale, b, None, activation)
    return _int8_gemm_xla(x, w_q, scale, b, None, activation)


def _int8_gemm_res_impl(x, w_q, scale, b, residual, activation, w8a8, impl):
    m, d = x.shape
    if w8a8:
        return _int8_gemm_xla(x, w_q, scale, b, residual, activation, True)
    if use_pallas(impl) and _int8_supported(m, d, w_q.shape[1], x.dtype):
        return _int8_gemm_pallas(x, w_q, scale, b, residual, activation)
    return _int8_gemm_xla(x, w_q, scale, b, residual, activation)


# rows shard freely; columns shard with the weight+scale (Megatron column
# parallel); the contraction axis d must be whole per shard.
_int8_gemm_part = partitioned(
    _int8_gemm_impl, "m d, d n, n, n -> m n",
    need_replication=("d",), static_argnums=(4, 5, 6))

_int8_gemm_res_part = partitioned(
    _int8_gemm_res_impl, "m d, d n, n, n, m n -> m n",
    need_replication=("d",), static_argnums=(5, 6, 7))


def int8_gemm(x: jax.Array, w_q: jax.Array, scale: jax.Array,
              b: jax.Array | None = None, *,
              activation: str | None = None,
              residual: jax.Array | None = None,
              w8a8: bool = False,
              impl: str | None = "auto") -> jax.Array:
    """act((x @ w_q) * scale + b) [+ residual] with int8 weights.

    x: (..., d); w_q: (d, n) int8; scale: (n,) f32 per-output-channel;
    b: (n,) or None; residual: (..., n) fused post-activation add (the
    transformer residual — saves a kernel in the dispatch-bound decode).
    ``w8a8``: also dynamically int8-quantize x per row and run the dot on
    the MXU's native int8 path (see _w8a8_dot) — the big-dim decode mode.
    """
    impl = _resolve_impl(impl)
    batch_shape = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    bz = jnp.zeros((w_q.shape[1],), jnp.float32) if b is None else b
    if residual is not None:
        out = _int8_gemm_res_part(x2, w_q, scale, bz,
                                  residual.reshape(-1, w_q.shape[1]),
                                  activation, w8a8, impl)
    else:
        out = _int8_gemm_part(x2, w_q, scale, bz, activation, w8a8, impl)
    return out.reshape(*batch_shape, w_q.shape[1])


# ---------------------------------------------------------------------------
# Decode prologue variant: LN (+ RWKV token-shift) folded in, LN output
# returned for the sampler's shift state — the int8 twin of
# ops/ln_gemm.fused_ln_shift_gemm.
# ---------------------------------------------------------------------------


def _int8_ln_gemm_xla(x, gamma, beta, tm, prev, w_q, scale, b, activation,
                      eps, w8a8=False):
    xn = layernorm_xla(x, gamma, beta, eps)
    mixed = xn * tm.astype(xn.dtype) + prev.astype(xn.dtype) \
        * (1.0 - tm.astype(xn.dtype)) if tm is not None else xn
    if w8a8:
        out = _w8a8_dot(mixed, w_q, scale)
    else:
        out = jnp.dot(mixed, w_q.astype(xn.dtype),
                      preferred_element_type=jnp.float32)
        out = out * scale.astype(jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return _act(out, activation).astype(x.dtype), xn


def _int8_ln_gemm_kernel(x_ref, g_ref, bt_ref, tm_ref, prev_ref, wq_ref,
                         sc_ref, b_ref, o_ref, xn_ref, *, activation,
                         eps, with_shift):
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
        tm = tm_ref[0].astype(x_ref.dtype)
        mixed = xn * tm + prev_ref[:].astype(x_ref.dtype) * (1.0 - tm)
    else:
        mixed = xn
    w = wq_ref[:].astype(x_ref.dtype)
    out = jax.lax.dot_general(mixed, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out * sc_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    o_ref[:] = _act(out, activation).astype(o_ref.dtype)


def _int8_ln_gemm_pallas(x, gamma, beta, tm, prev, w_q, scale, b,
                         activation, eps, with_shift):
    m, d = x.shape
    n = w_q.shape[1]
    block_m, block_n = _int8_blocks(m, d, n, x.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_int8_ln_gemm_kernel, activation=activation,
                          eps=eps, with_shift=with_shift),
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
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((block_m, d), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * d * n,
            bytes_accessed=2 * m * d * x.dtype.itemsize + d * n
            + m * n * x.dtype.itemsize,
            transcendentals=m * n if activation not in (None, "none") else 0,
        ),
        interpret=interpret_mode(),
    )(x, gamma.reshape(1, -1), beta.reshape(1, -1), tm.reshape(1, -1),
      prev, w_q, scale.reshape(1, -1), b.reshape(1, -1))


def _int8_ln_gemm_impl(x, gamma, beta, tm, prev, w_q, scale, b, activation,
                       eps, with_shift, w8a8, impl):
    m, d = x.shape
    if w8a8:
        return _int8_ln_gemm_xla(x, gamma, beta,
                                 tm if with_shift else None, prev, w_q,
                                 scale, b, activation, eps, True)
    if use_pallas(impl) and _int8_supported(m, d, w_q.shape[1], x.dtype) \
            and m >= 8:
        return tuple(_int8_ln_gemm_pallas(x, gamma, beta, tm, prev, w_q,
                                          scale, b, activation, eps,
                                          with_shift))
    return _int8_ln_gemm_xla(x, gamma, beta, tm if with_shift else None,
                             prev, w_q, scale, b, activation, eps)


_int8_ln_gemm_part = partitioned(
    _int8_ln_gemm_impl, "m d, d, d, d, m d, d n, n, n -> m n, m d",
    need_replication=("d",), static_argnums=(8, 9, 10, 11, 12))


def int8_ln_gemm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                 tm: jax.Array | None, prev: jax.Array | None,
                 w_q: jax.Array, scale: jax.Array,
                 b: jax.Array | None = None, *,
                 activation: str | None = None, eps: float = 1e-5,
                 w8a8: bool = False,
                 impl: str | None = "auto") -> tuple[jax.Array, jax.Array]:
    """(act((LN(x)*tm + prev*(1-tm)) @ w_q * scale + b), LN(x)), int8 w.

    The int8 twin of ops/ln_gemm.fused_ln_shift_gemm — same semantics,
    int8 weight tile + per-channel rescale of the output. ``w8a8``: int8
    activations + native int8 MXU dot (see _w8a8_dot).
    """
    impl = _resolve_impl(impl)
    batch_shape = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    bz = jnp.zeros((w_q.shape[1],), jnp.float32) if b is None else b
    with_shift = tm is not None
    if tm is None:
        tm = jnp.zeros((d,), jnp.float32)
    prev2 = (jnp.zeros_like(x2) if prev is None
             else prev.reshape(-1, d).astype(x.dtype))
    out, xn = _int8_ln_gemm_part(x2, gamma, beta, tm.reshape(-1), prev2,
                                 w_q, scale, bz, activation, eps,
                                 with_shift, w8a8, impl)
    return (out.reshape(*batch_shape, w_q.shape[1]),
            xn.reshape(*batch_shape, d))


# ---------------------------------------------------------------------------
# Whole-MLP decode kernel: LN -> (x @ W0)*s0+b0 -> sqrelu -> (@ W1)*s1+b1
# -> + residual, ONE pallas_call. The decode MLP is two int8 GEMMs whose
# weights dominate traffic; chunking the HIDDEN axis lets one grid walk
# stream both weight slabs (double-buffered DMAs) while the (B, hc) hidden
# tile lives and dies in VMEM. Replaces 3-4 XLA kernels (LN fusion, fc1,
# p1, residual add) with one launch — the launch-count lever the r4 A/B
# showed matters more than any single fusion.
# ---------------------------------------------------------------------------


def _int8_mlp_xla(x, gamma, beta, w0_q, s0, b0, w1_q, s1, b1, residual,
                  activation, eps, w8a8=False):
    xn = layernorm_xla(x, gamma, beta, eps)
    if w8a8:
        h = _w8a8_dot(xn, w0_q, s0)
    else:
        h = jnp.dot(xn, w0_q.astype(xn.dtype),
                    preferred_element_type=jnp.float32)
        h = h * s0.astype(jnp.float32)
    if b0 is not None:
        h = h + b0.astype(jnp.float32)
    h = _act(h, activation)
    if w8a8:
        out = _w8a8_dot(h.astype(x.dtype), w1_q, s1)
    else:
        out = jnp.dot(h.astype(xn.dtype), w1_q.astype(xn.dtype),
                      preferred_element_type=jnp.float32)
        out = out * s1.astype(jnp.float32)
    if b1 is not None:
        out = out + b1.astype(jnp.float32)
    return (out + residual.astype(jnp.float32)).astype(x.dtype)


def _int8_mlp_pallas(x, gamma, beta, w0_q, s0, b0, w1_q, s1, b1, residual,
                     activation, eps, h_chunk=512):
    m, d = x.shape
    h = w0_q.shape[1]
    h_chunk = min(h_chunk, h)
    # b1 + residual merge into one f32 operand; the per-output-channel s1
    # scales the accumulated sum at the flush (linear in the chunk sum)
    res_eff = residual.astype(jnp.float32)
    if b1 is not None:
        res_eff = res_eff + b1.astype(jnp.float32)
    b0z = jnp.zeros((h,), jnp.float32) if b0 is None else b0
    grid = (cdiv(h, h_chunk),)
    return pl.pallas_call(
        functools.partial(_int8_mlp_flush_kernel, eps=eps,
                          activation=activation),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h_chunk), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_chunk), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_chunk), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_chunk, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, d), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, d), jnp.float32),
                        pltpu.VMEM((m, d), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * h,
            bytes_accessed=2 * d * h + 2 * m * d * x.dtype.itemsize,
            transcendentals=m * h,
        ),
        interpret=interpret_mode(),
    )(x, gamma.reshape(1, -1), beta.reshape(1, -1), w0_q, s0.reshape(1, -1),
      b0z.reshape(1, -1), w1_q, s1.reshape(1, -1),
      res_eff.astype(jnp.float32))


def _int8_mlp_flush_kernel(x_ref, g_ref, bt_ref, w0_ref, s0_ref, b0_ref,
                           w1_ref, s1_ref, res_ref, o_ref, acc, xn_sc, *,
                           eps: float, activation: str):
    """Grid over hidden chunks; s1 (per-output-channel) + b1 + residual
    fold in at the flush (res_ref already carries residual + b1)."""
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    @pl.when(j == 0)
    def _ln():
        x32 = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(x32, axis=1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(x32 * x32, axis=1, keepdims=True) - mean * mean, 0.0)
        xn_sc[...] = ((x32 - mean) * (jax.lax.rsqrt(var + eps)
                                      * g_ref[0].astype(jnp.float32))
                      + bt_ref[0].astype(jnp.float32)).astype(xn_sc.dtype)
        acc[...] = jnp.zeros_like(acc)

    xn = xn_sc[...]
    hblk = jax.lax.dot_general(xn, w0_ref[:].astype(xn.dtype),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    hblk = hblk * s0_ref[0].astype(jnp.float32) \
        + b0_ref[0].astype(jnp.float32)
    hblk = _act(hblk, activation)
    acc[...] += jax.lax.dot_general(hblk.astype(xn.dtype),
                                    w1_ref[:].astype(xn.dtype),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _flush():
        o_ref[:] = (acc[...] * s1_ref[0].astype(jnp.float32)
                    + res_ref[:]).astype(o_ref.dtype)


def _int8_mlp_impl(x, gamma, beta, w0_q, s0, b0, w1_q, s1, b1, residual,
                   activation, eps, w8a8, impl):
    m, d = x.shape
    h = w0_q.shape[1]
    if w8a8:
        return _int8_mlp_xla(x, gamma, beta, w0_q, s0, b0, w1_q, s1, b1,
                             residual, activation, eps, True)
    if use_pallas(impl) and _int8_supported(m, d, h, x.dtype) \
            and d % 128 == 0 and h % 512 == 0 and m * d * 6 < 4 * 1024 * 1024:
        return _int8_mlp_pallas(x, gamma, beta, w0_q, s0, b0, w1_q, s1, b1,
                                residual, activation, eps)
    return _int8_mlp_xla(x, gamma, beta, w0_q, s0, b0, w1_q, s1, b1,
                         residual, activation, eps)


# rows shard freely; weights/hidden replicated (decode shapes are tiny —
# the tp path shards the attention instead)
_int8_mlp_part = partitioned(
    _int8_mlp_impl,
    "m d, d, d, d h, h, h, h d, d, d, m d -> m d",
    need_replication=("d", "h"), static_argnums=(10, 11, 12, 13))


def int8_mlp_decode(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                    w0_q: jax.Array, s0: jax.Array, b0: jax.Array | None,
                    w1_q: jax.Array, s1: jax.Array, b1: jax.Array | None,
                    residual: jax.Array, *, activation: str = "sqrelu",
                    eps: float = 1e-5, w8a8: bool = False,
                    impl: str | None = "auto") -> jax.Array:
    """residual + ((act((LN(x) @ w0_q)*s0 + b0)) @ w1_q)*s1 + b1 — the whole
    pre-norm MLP as ONE kernel over int8 weights (see module comment).
    ``w8a8``: int8 activations + native int8 MXU dots (see _w8a8_dot)."""
    impl = _resolve_impl(impl)
    batch_shape = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    h = w0_q.shape[1]
    b0z = jnp.zeros((h,), jnp.float32) if b0 is None else b0
    b1z = jnp.zeros((d,), jnp.float32) if b1 is None else b1
    out = _int8_mlp_part(x2, gamma, beta, w0_q, s0, b0z, w1_q, s1, b1z,
                         residual.reshape(-1, d), activation, eps, w8a8,
                         impl)
    return out.reshape(*batch_shape, d)
