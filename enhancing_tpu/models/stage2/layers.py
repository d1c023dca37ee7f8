"""Stage-2 autoregressive priors: GPT and RQ-Transformer, TPU-first.

Capability parity with the reference stage-2 models
(reference: enhancing/modules/stage2/layers.py:23-547), redesigned for XLA:

- MultiHeadSelfAttention keeps the reference's RWKV-style token-shift
  (learned per-channel ``time_mix`` ramp blending x with its one-step-delayed
  copy, reference layers.py:50-60) and the prefix-causal mask (the condition
  prefix is mutually visible, reference layers.py:45-48). Full-sequence
  attention dispatches to the fused Pallas kernel.
- FFN uses squared-ReLU (reference layers.py:108).
- Sampling is a single jitted ``lax.scan`` over token positions with a
  preallocated KV cache — not a Python loop of concatenations. Top-k / top-p
  filtering and the categorical draw run on device.

Deliberate divergence: the reference's cached sampling zero-pads the
token-shift for every decoded token (ZeroPad2d on a length-1 sequence,
layers.py:50,60), silently dropping the shift state at decode time and
diverging from its own training-time semantics. We carry the true per-layer
shift state through the scan, matching training semantics exactly.
Likewise RQTransformer.forward's cumsum over the *channel* axis
(reference layers.py:378) is an evident bug (its own sampler sums over depth,
layers.py:502,535); we implement the depth-axis cumsum intent.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.attention import (decode_attention, decode_attention_stacked,
                              multihead_attention_bnhd)
from ...ops.cache import cache_row_update, scale_row_update
from ...ops.common import scanned_weights
from ...ops.int8 import int8_gemm, int8_ln_gemm, int8_mlp_decode
from ...ops.ln_gemm import fused_ln_gemm, fused_ln_shift_gemm

normal_init = nn.initializers.normal(stddev=0.02)


def _lnfuse_sites() -> frozenset:
    """Which decode-path LN fusions are active (trace-time):
    ENHANCING_TPU_DECODE_LNFUSE = "all" | "none" | comma list of
    {"qkv", "mlp", "head"}.

    MEASURED AND REJECTED as the bf16 default (v5e, 1024d x 16L sampler,
    b8, r4 A/B with everything else fixed): none 5520 tok/s, qkv-only
    5421, mlp-only 5266, all three 5157. Folding LN (+token-shift) into
    the Pallas GEMMs removes 2-3 kernels/layer/token, but at decode shapes
    (m = batch, 8-64 rows) the Mosaic kernels lose more to fixed overhead
    and weaker DMA pipelining than the elided XLA LN fusions cost — the
    "dispatch-bound" lever was already priced in by XLA's own fusion.
    Kept as an opt-in for re-testing on other topologies. The INT8 decode
    path always calls the fused int8 entry points, but those resolve to
    their XLA impls inside the layer scan (ops/common.scanned_weights):
    the r4 GEMM study disproved the earlier assumption that XLA would
    materialize dequantized weights — XLA's int8->bf16 convert fuses into
    the dot's operand read at full HBM rate (dq-xla 810 GB/s at
    6144x18432, BENCH_EXTENDED decode_gemm rows), while a Pallas custom
    call inside the scan forces a per-layer weight-slice copy instead
    (measured 2.14x end-to-end on the 24L flagship int8 decode)."""
    import os
    v = os.environ.get("ENHANCING_TPU_DECODE_LNFUSE", "none")
    if v in ("all", "1"):
        return frozenset({"qkv", "mlp", "head"})
    if v in ("0", "none", ""):
        return frozenset()
    return frozenset(t.strip() for t in v.split(","))


def _time_mix_init(key, shape, dtype=jnp.float32):
    """Per-channel ramp i/(C-1) (reference layers.py:51-55)."""
    c = shape[-1]
    return (jnp.arange(c, dtype=dtype) / max(c - 1, 1)).reshape(shape)


class MultiHeadSelfAttention(nn.Module):
    embed_dim: int
    n_heads: int
    cond_len: int
    attn_bias: bool = True
    use_mask: bool = True
    dtype: jnp.dtype = jnp.float32
    # W8A8 serving: int8-quantize activations per row and run the quant-
    # collection GEMMs on the MXU's native int8 path (ops/int8._w8a8_dot).
    # Only consulted where a "quant" collection is present.
    act_int8: bool = False

    def setup(self) -> None:
        assert self.embed_dim % self.n_heads == 0
        self.head_dim = self.embed_dim // self.n_heads
        dense = functools.partial(nn.Dense, self.embed_dim,
                                  use_bias=self.attn_bias,
                                  kernel_init=normal_init, dtype=self.dtype)
        self.key_p = dense(name="key")
        self.query_p = dense(name="query")
        self.value_p = dense(name="value")
        self.proj = dense(name="proj")
        self.time_mix = self.param("time_mix", _time_mix_init,
                                   (1, 1, self.embed_dim))

    def _token_shift(self, x: jax.Array,
                     prev: Optional[jax.Array] = None) -> jax.Array:
        """x*tm + delay(x)*(1-tm); ``prev`` supplies the state for 1-token decode."""
        tm = self.time_mix.astype(x.dtype)
        if x.shape[1] == 1 and prev is not None:
            shifted = prev[:, None, :]
        else:
            shifted = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        return x * tm + shifted * (1.0 - tm)

    def _fused_qkv(self, x: jax.Array):
        """q/k/v as ONE (B, T, C) @ (C, 3C) GEMM. The per-token decode step
        is dispatch-bound (~8 kernels/layer/token); this folds 3 of them
        into 1. The weight concat is loop-invariant, so XLA hoists it out
        of the decode scan. Numerically identical to the three Dense calls
        (same params — reads the bound submodules' kernels)."""
        if self.is_initializing():
            # init through the decode path: let the Dense modules create
            # their params with the standard tree layout
            return self.query_p(x), self.key_p(x), self.value_p(x)
        ws, bs = [], []
        for mod in (self.query_p, self.key_p, self.value_p):
            p = mod.variables["params"]
            ws.append(p["kernel"].astype(self.dtype))
            if self.attn_bias:
                bs.append(p["bias"].astype(self.dtype))
        qkv = x.astype(self.dtype) @ jnp.concatenate(ws, axis=1)
        if self.attn_bias:
            qkv = qkv + jnp.concatenate(bs, axis=0)
        return jnp.split(qkv, 3, axis=-1)

    def __call__(self, x: jax.Array) -> jax.Array:
        """Full-sequence forward (training). Uses the (B, N, H, D)-layout
        entry so the packed Pallas kernel consumes the projection output
        directly — no (B,H,N,D) transposes in the training graph."""
        b, t, c = x.shape
        x = self._token_shift(x)
        q = self.query_p(x).reshape(b, t, self.n_heads, self.head_dim)
        k = self.key_p(x).reshape(b, t, self.n_heads, self.head_dim)
        v = self.value_p(x).reshape(b, t, self.n_heads, self.head_dim)
        mode = "prefix_causal" if self.use_mask else "none"
        y = multihead_attention_bnhd(q, k, v, scale=self.head_dim**-0.5,
                                     mask_mode=mode, cond_len=self.cond_len)
        return self.proj(y.reshape(b, t, c))

    def decode(self, x: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
               cur_len: jax.Array, shift_prev: jax.Array,
               layer: Optional[jax.Array] = None,
               k_scale: Optional[jax.Array] = None,
               v_scale: Optional[jax.Array] = None
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """One-token cached decode — READ-ONLY on the cache.

        The new token's K/V are returned to the caller instead of written
        into the buffers here: attention treats the current token as an
        extra (q·k_new) branch folded into the softmax. This keeps the big
        cache out of layer-scan outputs — otherwise every token step would
        copy the entire multi-hundred-MB KV stack through the scan's ys,
        doubling the already bandwidth-bound decode traffic.

        On TPU this dispatches to the prefix-aware Pallas decode kernel
        (ops/attention.decode_attention): cache chunks past ``cur_len`` are
        neither DMA'd from HBM nor computed.

        Args:
          x: (B, 1, C) current-token activations (already LN'd).
          k_cache / v_cache: (B, ctx_len, C) packed head layout, rows
            < cur_len valid — or the FULL stacked (L, B, ctx_len, C)
            buffers with ``layer`` selecting this block's slice inside the
            kernel's index map. Never slice the stack at the caller: an
            XLA-level slice (scan xs, static [i], or dynamic_index) feeding
            the kernel materializes a (B, ctx, C) copy of k AND v per layer
            per token (measured: ~85% of the 16L sampler's step time).
          cur_len: number of valid cache positions before this token.
          shift_prev: (B, C) previous token's LN'd activation for token-shift.
        Returns: (attn_out (B,1,C), k_new (B,1,C), v_new (B,1,C))
        """
        x = self._token_shift(x, prev=shift_prev)
        q, k_new, v_new = self._fused_qkv(x)          # (B, 1, C) each
        return self._attend_project(q, k_new, v_new, k_cache, v_cache,
                                    cur_len, layer, k_scale, v_scale)

    def decode_qkv(self, qkv: jax.Array, k_cache: jax.Array,
                   v_cache: jax.Array, cur_len: jax.Array,
                   layer: Optional[jax.Array] = None,
                   k_scale: Optional[jax.Array] = None,
                   v_scale: Optional[jax.Array] = None
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """``decode`` for a caller-computed fused (B, 1, 3C) qkv projection
        (Block.decode folds LayerNorm + token-shift into that GEMM via
        ops/ln_gemm.fused_ln_shift_gemm — the decode step is dispatch-bound,
        and this removes the separate LN/shift kernels per layer/token)."""
        q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
        return self._attend_project(q, k_new, v_new, k_cache, v_cache,
                                    cur_len, layer, k_scale, v_scale)

    def _attend_project(self, q, k_new, v_new, k_cache, v_cache, cur_len,
                        layer, k_scale=None, v_scale=None):
        scale = jnp.asarray(self.head_dim**-0.5, q.dtype)
        if k_cache.ndim == 4:
            y = decode_attention_stacked(
                q[:, 0] * scale, k_cache, v_cache,
                k_new[:, 0].astype(
                    q.dtype if k_scale is not None else k_cache.dtype),
                v_new[:, 0].astype(
                    q.dtype if v_scale is not None else v_cache.dtype),
                cur_len,
                jnp.int32(0) if layer is None else layer,
                head_dim=self.head_dim, k_scale=k_scale, v_scale=v_scale)
        else:
            y = decode_attention(q[:, 0] * scale, k_cache, v_cache,
                                 k_new[:, 0].astype(k_cache.dtype),
                                 v_new[:, 0].astype(v_cache.dtype), cur_len,
                                 head_dim=self.head_dim)
        y2 = y[:, None, :].astype(q.dtype)
        qv = (None if self.is_initializing()
              else self.variables.get("quant"))
        if qv is not None and "proj" in qv:
            # int8 output projection (weights-only serving quantization —
            # models/stage2/quantize.py put the "quant" collection here)
            bp = (self.proj.variables["params"]["bias"]
                  if self.attn_bias else None)
            return (int8_gemm(y2, qv["proj"]["kernel_q"],
                              qv["proj"]["scale"], bp,
                              w8a8=self.act_int8), k_new, v_new)
        return self.proj(y2), k_new, v_new

    def prefill(self, x: jax.Array, k_cache: jax.Array, v_cache: jax.Array
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Multi-token prefix forward filling cache positions [0, T).

        With a "quant" collection the projections run on the int8 kernels
        (int8 serving then never touches the bf16 kernel copies — they can
        be dropped entirely, which is what lets the full 24L flagship fit
        one chip; admission prefill in the continuous batcher gets the
        same halved weight reads)."""
        b, t, c = x.shape
        x = self._token_shift(x)
        qv = (None if self.is_initializing()
              else self.variables.get("quant"))
        if qv is not None:
            names = ("query", "key", "value")
            wq = jnp.concatenate([qv[n]["kernel_q"] for n in names],
                                 axis=-1)
            sc = jnp.concatenate([qv[n]["scale"] for n in names], axis=-1)
            b_qkv = (jnp.concatenate(
                [self.variables["params"][n]["bias"] for n in names])
                if self.attn_bias else None)
            qkv = int8_gemm(x, wq, sc, b_qkv, w8a8=self.act_int8)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = self.query_p(x)
            k = self.key_p(x)
            v = self.value_p(x)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k.astype(k_cache.dtype), (0, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v.astype(v_cache.dtype), (0, 0, 0))
        mode = "prefix_causal" if self.use_mask else "none"
        split = (b, t, self.n_heads, self.head_dim)
        y = multihead_attention_bnhd(
            q.reshape(split), k.reshape(split), v.reshape(split),
            scale=self.head_dim**-0.5, mask_mode=mode, cond_len=self.cond_len)
        y = y.reshape(b, t, c)
        if qv is not None:
            bp = (self.variables["params"]["proj"]["bias"]
                  if self.attn_bias else None)
            return (int8_gemm(y, qv["proj"]["kernel_q"],
                              qv["proj"]["scale"], bp,
                              w8a8=self.act_int8), k_cache, v_cache)
        return self.proj(y), k_cache, v_cache


class FFN(nn.Module):
    """4x expansion with squared-ReLU (reference layers.py:99-110)."""

    embed_dim: int
    mlp_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(4 * self.embed_dim, use_bias=self.mlp_bias,
                     kernel_init=normal_init, dtype=self.dtype, name="p0")(x)
        h = jnp.square(jax.nn.relu(h))
        return nn.Dense(self.embed_dim, use_bias=self.mlp_bias,
                        kernel_init=normal_init, dtype=self.dtype, name="p1")(h)


class Block(nn.Module):
    """Pre-LN attention + MLP residual block (reference layers.py:112-143).

    ``sp_mesh``: optional Mesh enabling Megatron-style sequence parallelism
    for the residual stream — LayerNorm/residual activations constrained to
    P('data', 'model', None), so the elementwise segments compute (and their
    activations live) on sequence shards; GSPMD derives the all-gather into
    the column-parallel qkv/FFN matmuls and the reduce-scatter out of the
    row-parallel projections. Pure annotation — no hand-written collectives
    (the reference has no model parallelism at all, SURVEY §2.9)."""

    embed_dim: int
    n_heads: int
    cond_len: int
    mlp_bias: bool = True
    attn_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    sp_mesh: Optional[jax.sharding.Mesh] = None
    act_int8: bool = False   # W8A8 serving (see MultiHeadSelfAttention)

    def _sp(self, x: jax.Array) -> jax.Array:
        if self.sp_mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ...parallel.mesh import DATA_AXIS, MODEL_AXIS
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.sp_mesh, P(DATA_AXIS, MODEL_AXIS, None)))

    def setup(self) -> None:
        self.ln1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.ln2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.attn = MultiHeadSelfAttention(
            embed_dim=self.embed_dim, n_heads=self.n_heads,
            cond_len=self.cond_len, attn_bias=self.attn_bias,
            dtype=self.dtype, act_int8=self.act_int8)
        self.mlp = FFN(self.embed_dim, self.mlp_bias, dtype=self.dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self._sp(x)
        x = self._sp(x + self.attn(self.ln1(x)))
        x = self._sp(x + self.mlp(self.ln2(x)))
        return x

    def decode(self, x, k_cache, v_cache, cur_len, shift_prev, layer=None,
               k_scale=None, v_scale=None):
        """Returns (x, k_new, v_new, new_shift_state) — cache is read-only;
        the caller writes the new column into the stacked buffers. With
        stacked (L, B, ctx, C) caches, ``layer`` picks this block's slice
        inside the attention kernel (see MultiHeadSelfAttention.decode).

        ``k_scale``/``v_scale``: (L, B, ctx) per-row dequant scales when
        the cache stacks are INT8 (see GPT ``kv_int8``).

        With a "quant" collection present (weights-only int8 serving,
        models/stage2/quantize.py) the GEMMs run as int8 Pallas kernels
        with LN (+token-shift) folded in. For bf16, the LN fusions exist
        but are OFF by default — measured slower than XLA's own LN fusion
        at decode shapes; see _lnfuse_sites for the numbers."""
        if self.is_initializing():
            h = self.ln1(x)
            new_shift = h[:, -1, :]
            a, k_new, v_new = self.attn.decode(h, k_cache, v_cache, cur_len,
                                               shift_prev, layer)
            x = x + a
            x = x + self.mlp(self.ln2(x))
            return x, k_new, v_new, new_shift
        sites = _lnfuse_sites()
        p_ln1 = self.ln1.variables["params"]
        p_attn = self.attn.variables["params"]
        qv_attn = self.attn.variables.get("quant")
        names = ("query", "key", "value")
        b_qkv = (jnp.concatenate([p_attn[n]["bias"] for n in names])
                 if self.attn_bias else None)
        tm = p_attn["time_mix"].reshape(-1)
        if qv_attn is not None:
            # weights-only int8 serving (models/stage2/quantize.py): same
            # fused LN+shift+GEMM, int8 weight tile + per-channel rescale
            wq = jnp.concatenate([qv_attn[n]["kernel_q"] for n in names],
                                 axis=-1)
            sc = jnp.concatenate([qv_attn[n]["scale"] for n in names],
                                 axis=-1)
            qkv, xn = int8_ln_gemm(x, p_ln1["scale"], p_ln1["bias"], tm,
                                   shift_prev[:, None, :], wq, sc, b_qkv,
                                   eps=1e-5, w8a8=self.act_int8)
            new_shift = xn[:, -1, :]
        elif "qkv" in sites:
            w_qkv = jnp.concatenate(
                [p_attn[n]["kernel"].astype(self.dtype) for n in names],
                axis=1)
            qkv, xn = fused_ln_shift_gemm(
                x, p_ln1["scale"], p_ln1["bias"], tm,
                shift_prev[:, None, :], w_qkv, b_qkv, eps=1e-5)
            new_shift = xn[:, -1, :]
        else:
            h = self.ln1(x)
            new_shift = h[:, -1, :]
            a, k_new, v_new = self.attn.decode(h, k_cache, v_cache,
                                               cur_len, shift_prev, layer,
                                               k_scale, v_scale)
            qkv = None
        if qkv is not None:
            a, k_new, v_new = self.attn.decode_qkv(qkv, k_cache, v_cache,
                                                   cur_len, layer,
                                                   k_scale, v_scale)
        x = x + a
        p_ln2 = self.ln2.variables["params"]
        p_mlp = self.mlp.variables["params"]
        qv_mlp = self.mlp.variables.get("quant")
        b0 = p_mlp["p0"]["bias"] if self.mlp_bias else None
        b1 = p_mlp["p1"]["bias"] if self.mlp_bias else None
        if qv_mlp is not None:
            # whole pre-norm MLP as ONE int8 kernel (LN -> fc1 -> sqrelu ->
            # p1 -> +residual; ops/int8.int8_mlp_decode) — launch count is
            # the measured decode bottleneck, not any single fusion
            return (int8_mlp_decode(
                        x, p_ln2["scale"], p_ln2["bias"],
                        qv_mlp["p0"]["kernel_q"], qv_mlp["p0"]["scale"], b0,
                        qv_mlp["p1"]["kernel_q"], qv_mlp["p1"]["scale"], b1,
                        residual=x, activation="sqrelu", eps=1e-5,
                        w8a8=self.act_int8),
                    k_new, v_new, new_shift)
        if "mlp" in sites:
            h = fused_ln_gemm(x, p_ln2["scale"], p_ln2["bias"],
                              p_mlp["p0"]["kernel"], b0,
                              activation="sqrelu", eps=1e-5)
            h = h @ p_mlp["p1"]["kernel"].astype(self.dtype)
            if self.mlp_bias:
                h = h + b1.astype(self.dtype)
            return x + h, k_new, v_new, new_shift
        return x + self.mlp(self.ln2(x)), k_new, v_new, new_shift

    def prefill(self, x, k_cache, v_cache):
        h = self.ln1(x)
        new_shift = h[:, -1, :]
        a, k_cache, v_cache = self.attn.prefill(h, k_cache, v_cache)
        x = x + a
        qv_mlp = (None if self.is_initializing()
                  else self.mlp.variables.get("quant"))
        if qv_mlp is not None:
            p_ln2 = self.ln2.variables["params"]
            p_mlp = self.mlp.variables["params"]
            x = int8_mlp_decode(
                x, p_ln2["scale"], p_ln2["bias"],
                qv_mlp["p0"]["kernel_q"], qv_mlp["p0"]["scale"],
                p_mlp["p0"]["bias"] if self.mlp_bias else None,
                qv_mlp["p1"]["kernel_q"], qv_mlp["p1"]["scale"],
                p_mlp["p1"]["bias"] if self.mlp_bias else None,
                residual=x, activation="sqrelu", eps=1e-5,
                w8a8=self.act_int8)
        else:
            x = x + self.mlp(self.ln2(x))
        return x, k_cache, v_cache, new_shift

    # -- scan-over-layers adapters (carry, xs) -> (carry, ys) -----------------
    # Wrapped by nn.scan so an L-layer stack compiles as ONE block body
    # instead of L inlined copies — essential for the shipped 24-layer GPT
    # whose unrolled decode graph takes minutes to compile.

    def scan_call(self, x, _):
        return self(x), None

    def scan_decode(self, carry, kvs):
        # The FULL stacked caches ride the CARRY (read-only, returned
        # unchanged) and each step indexes its layer inside the attention
        # kernel — as scan xs they would be sliced at the XLA level, which
        # copies (B, ctx, C) of k and v per layer per decoded token.
        # ks/vs: per-row dequant scale stacks (int8 cache) or None.
        x, cur_len, k_stack, v_stack, ks, vs = carry
        shift, layer = kvs
        x, k2, v2, s2 = self.decode(x, k_stack, v_stack, cur_len, shift,
                                    layer, ks, vs)
        return (x, cur_len, k_stack, v_stack, ks, vs), (k2, v2, s2)

    def scan_prefill(self, x, kvs):
        k, v = kvs
        x, k2, v2, s2 = self.prefill(x, k, v)
        return x, (k2, v2, s2)


class GPT(nn.Module):
    """Conditional GPT prior over tokenizer codes (reference layers.py:146-303)."""

    vocab_cond_size: int
    vocab_img_size: int
    embed_dim: int
    cond_num_tokens: int
    img_num_tokens: int
    n_heads: int
    n_layers: int
    mlp_bias: bool = True
    attn_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = True
    remat: bool = False
    # INT8 KV cache with per-row dequant scales: halves the cache-read HBM
    # traffic of the param+cache-bound decode (README decode table). The
    # current token's k/v and all compute stay full precision; composes
    # with weights-only int8 (quantize_decode_params).
    kv_int8: bool = False
    # W8A8 serving: activations also int8, GEMMs on the MXU's native int8
    # path — at flagship dims the dequant kernels' in-VMEM weight cast is
    # the bottleneck (README decode table). Needs a "quant" collection.
    act_int8: bool = False
    # sequence parallelism for the residual stream (see Block.sp_mesh)
    sp_mesh: Optional[jax.sharding.Mesh] = None

    @property
    def ctx_len(self) -> int:
        return self.cond_num_tokens + self.img_num_tokens

    def setup(self) -> None:
        self.tok_emb_cond = nn.Embed(self.vocab_cond_size, self.embed_dim,
                                     embedding_init=normal_init)
        self.pos_emb_cond = self.param("pos_emb_cond", nn.initializers.zeros,
                                       (1, self.cond_num_tokens, self.embed_dim))
        self.tok_emb_code = nn.Embed(self.vocab_img_size, self.embed_dim,
                                     embedding_init=normal_init)
        self.pos_emb_code = self.param("pos_emb_code", nn.initializers.zeros,
                                       (1, self.img_num_tokens, self.embed_dim))
        block_kw = dict(embed_dim=self.embed_dim, n_heads=self.n_heads,
                        cond_len=self.cond_num_tokens, mlp_bias=self.mlp_bias,
                        attn_bias=self.attn_bias, dtype=self.dtype,
                        sp_mesh=self.sp_mesh, act_int8=self.act_int8)
        if self.scan_layers:
            # one compiled block body shared by all layers (stacked params)
            target = nn.remat(Block) if self.remat else Block
            scanned = nn.scan(
                target,
                variable_axes={"params": 0, "constants": 0, "quant": 0},
                split_rngs={"params": True},
                length=self.n_layers,
                methods=["scan_call", "scan_decode", "scan_prefill"])
            self.blocks_stack = scanned(**block_kw, name="blocks")
            self.blocks = None
        else:
            self.blocks = [Block(**block_kw, name=f"blocks_{i}")
                           for i in range(self.n_layers)]
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.head = nn.Dense(self.vocab_img_size, use_bias=False,
                             kernel_init=normal_init, dtype=self.dtype)

    def _run_blocks(self, x: jax.Array) -> jax.Array:
        if self.scan_layers:
            x, _ = self.blocks_stack.scan_call(
                x, jnp.zeros((self.n_layers, 0)))
            return x
        for block in self.blocks:
            x = block(x)
        return x

    def embed_input(self, codes: jax.Array, conds: jax.Array) -> jax.Array:
        """Token + position embeddings -> the (B, ctx, C) block-stack input
        (split out so parallel/pipeline.py can run the blocks itself)."""
        codes = codes.reshape(codes.shape[0], -1)
        conds = conds.reshape(conds.shape[0], -1)
        ce = self.tok_emb_code(codes) + self.pos_emb_code.astype(self.dtype)
        cc = self.tok_emb_cond(conds) + self.pos_emb_cond.astype(self.dtype)
        return jnp.concatenate([cc, ce], axis=1)

    def project_out(self, x: jax.Array) -> jax.Array:
        """Final LN + prediction-window slice + vocab head."""
        x = self.layer_norm(x)
        x = x[:, self.cond_num_tokens - 1:-1]
        return self.head(x)

    def __call__(self, codes: jax.Array, conds: jax.Array) -> jax.Array:
        """codes: (B, img_num_tokens) int, conds: (B, cond_num_tokens) int.

        Returns logits (B, img_num_tokens, vocab_img_size) — the prediction
        window offset by the condition prefix (reference layers.py:193-211).
        """
        x = self.embed_input(codes, conds)
        x = self._run_blocks(x)
        return self.project_out(x)

    # -- cached sampling --------------------------------------------------------

    def init_cache(self, batch: int, dtype=None) -> Dict[str, jax.Array]:
        dtype = dtype or self.dtype
        # packed head layout: (L, B, ctx, H*hd) — contiguous 128-lane slabs
        # for the Pallas decode kernel, contiguous one-row cache writes.
        # ctx padded to a sublane multiple for the in-place row-write
        # kernel (ops/cache.py); rows >= cur_len are never read.
        if self.kv_int8:
            # 128-mult ctx: the decode kernel's (1, bb, bk) f32 scale
            # blocks need bk | ctx with bk in {128, 256}; int8 row-write
            # tiles are 32 rows (also satisfied)
            ctx_pad = -(-self.ctx_len // 128) * 128
            shape = (self.n_layers, batch, ctx_pad, self.embed_dim)
            return {
                "k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "k_scale": jnp.zeros(shape[:3], jnp.float32),
                "v_scale": jnp.zeros(shape[:3], jnp.float32),
                "shift": jnp.zeros((self.n_layers, batch, self.embed_dim),
                                   dtype),
            }
        ctx_pad = -(-self.ctx_len // 8) * 8
        shape = (self.n_layers, batch, ctx_pad, self.embed_dim)
        return {
            "k": jnp.zeros(shape, dtype),
            "v": jnp.zeros(shape, dtype),
            "shift": jnp.zeros((self.n_layers, batch, self.embed_dim), dtype),
        }

    @staticmethod
    def _quant_rows(rows):
        """Per-row symmetric int8 for cache rows (..., C) -> (int8, scale)."""
        r32 = rows.astype(jnp.float32)
        amax = jnp.max(jnp.abs(r32), axis=-1)
        sc = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(r32 / sc[..., None]), -127, 127)
        return q.astype(jnp.int8), sc

    def _stack_prefill(self, x, cache):
        """Run all layers' prefill; returns (x, new cache).

        With ``kv_int8`` the prefill runs against a transient full-precision
        buffer sized to the PREFIX (rows the prefill actually writes, padded
        to a sublane multiple), and the quantized rows merge into the full
        int8 cache. A full-ctx bf16 temp here costs 2 x (L, B, ctx, C)
        bf16 live next to the weights — at the 24L flagship that is 5.4 GB
        at b8, the difference between fitting 16 GB HBM and OOM (the
        dynamic_update_slice merge is a one-time copy amortized over the
        whole decode; the per-token write ban in ops/cache.py still
        holds)."""
        if self.kv_int8:
            t = x.shape[1]
            tpad = min(-(-t // 8) * 8, cache["k"].shape[2])
            small = cache["k"].shape[:2] + (tpad,) + cache["k"].shape[3:]
            tmp = {"k": jnp.zeros(small, self.dtype),
                   "v": jnp.zeros(small, self.dtype),
                   "shift": cache["shift"]}
            x, tmp = self._stack_prefill_fp(x, tmp)
            k_q, k_sc = self._quant_rows(tmp["k"])
            v_q, v_sc = self._quant_rows(tmp["v"])
            zero = (0, 0, 0)
            return x, {
                "k": jax.lax.dynamic_update_slice(cache["k"], k_q, zero + (0,)),
                "v": jax.lax.dynamic_update_slice(cache["v"], v_q, zero + (0,)),
                "k_scale": jax.lax.dynamic_update_slice(
                    cache["k_scale"], k_sc, zero),
                "v_scale": jax.lax.dynamic_update_slice(
                    cache["v_scale"], v_sc, zero),
                "shift": tmp["shift"]}
        return self._stack_prefill_fp(x, cache)

    def _stack_prefill_fp(self, x, cache):
        k_all, v_all, s_all = cache["k"], cache["v"], cache["shift"]
        if self.scan_layers:
            with scanned_weights():
                x, (k_all, v_all, s_new) = self.blocks_stack.scan_prefill(
                    x, (k_all, v_all))
            s_all = s_new.astype(s_all.dtype)
        else:
            for i, block in enumerate(self.blocks):
                x, k, v, s = block.prefill(x, k_all[i], v_all[i])
                k_all = k_all.at[i].set(k)
                v_all = v_all.at[i].set(v)
                s_all = s_all.at[i].set(s.astype(s_all.dtype))
        return x, {"k": k_all, "v": v_all, "shift": s_all}

    def _stack_decode(self, x, cur_len, cache, window=None):
        """``window``: static upper bound on cur_len for this step — attention
        reads only the first ``window`` cache positions (a static slice),
        cutting HBM traffic early in the decode when the cache is mostly
        empty. None reads the full buffer (the kernel's cur_len chunk
        elision already skips the empty tail's DMAs).

        The stacked caches are passed WHOLE to every layer — scan carry in
        the scanned path, full buffers + a static layer index in the
        unrolled path — and each layer's slice is selected inside the
        attention kernel's index map. Slicing here (scan xs / k_all[i])
        costs a (B, ctx, C) copy of k and v per layer per token: measured
        7.5 ms/step vs 2.0 for the 1024d x 16L sampler at b32."""
        k_all, v_all, s_all = cache["k"], cache["v"], cache["shift"]
        k_view = k_all[:, :, :window] if window else k_all
        v_view = v_all[:, :, :window] if window else v_all
        ks = cache.get("k_scale")
        vs = cache.get("v_scale")
        if ks is not None and window:
            ks = ks[:, :, :window]
            vs = vs[:, :, :window]
        if self.scan_layers:
            layer_ix = jnp.arange(self.n_layers, dtype=jnp.int32)
            # scanned_weights: the stack's weight slices must stay fused
            # XLA reads, not Pallas custom-call operands (ops/common)
            with scanned_weights():
                (x, *_), (k_news, v_news, s_new) = \
                    self.blocks_stack.scan_decode(
                        (x, cur_len, k_view, v_view, ks, vs),
                        (s_all, layer_ix))
            s_all = s_new.astype(s_all.dtype)
        else:
            k_cols, v_cols, s_cols = [], [], []
            for i, block in enumerate(self.blocks):
                x, k, v, s = block.decode(x, k_view, v_view, cur_len,
                                          s_all[i], jnp.int32(i), ks, vs)
                k_cols.append(k)
                v_cols.append(v)
                s_cols.append(s)
            k_news = jnp.stack(k_cols)
            v_news = jnp.stack(v_cols)
            s_all = jnp.stack(s_cols).astype(s_all.dtype)
        # single in-place row write per stack (L, B, ctx, C) through the
        # aliased Pallas kernel — a dynamic_update_slice here lets XLA pick
        # a while-carry layout that clashes with the decode custom call and
        # costs 4 full-cache layout copies per token (ops/cache.py)
        if ks is not None:
            # quantize the new rows; the (L, B, ctx) scale arrays update
            # through plain XLA (MB-scale — see ops/cache.scale_row_update)
            k_news, ksc = self._quant_rows(k_news)
            v_news, vsc = self._quant_rows(v_news)
            out = {"k": cache_row_update(cache["k"], k_news, cur_len),
                   "v": cache_row_update(cache["v"], v_news, cur_len),
                   "k_scale": scale_row_update(cache["k_scale"], ksc,
                                               cur_len),
                   "v_scale": scale_row_update(cache["v_scale"], vsc,
                                               cur_len),
                   "shift": s_all}
            return x, out
        k_all = cache_row_update(k_all, k_news, cur_len)
        v_all = cache_row_update(v_all, v_news, cur_len)
        return x, {"k": k_all, "v": v_all, "shift": s_all}

    def prefill(self, conds: jax.Array, cache: Dict[str, jax.Array]
                ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Run the condition prefix; returns logits for code token 0."""
        conds = conds.reshape(conds.shape[0], -1)
        x = self.tok_emb_cond(conds) + self.pos_emb_cond.astype(self.dtype)
        x, cache = self._stack_prefill(x, cache)
        qv = (None if self.is_initializing()
              else self.head.variables.get("quant"))
        if qv is not None:
            p_ln = self.layer_norm.variables["params"]
            logits, _ = int8_ln_gemm(
                x[:, self.cond_num_tokens - 1], p_ln["scale"], p_ln["bias"],
                None, None, qv["kernel_q"], qv["scale"], None, eps=1e-5,
                w8a8=self.act_int8)
            return logits, cache
        x = self.layer_norm(x)
        logits = self.head(x[:, self.cond_num_tokens - 1])
        return logits, cache

    def decode_step(self, token: jax.Array, step: jax.Array,
                    cache: Dict[str, jax.Array], window: int | None = None
                    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """token: (B,) code sampled at position step-1 (step >= 1).

        ``step``: int32 scalar (the lockstep sampler), or a (B,) vector of
        per-row positions — a RAGGED batch where every row advances its own
        sequence independently (continuous-batching serving; the per-row
        lengths flow into the decode-attention kernel's masks and the
        cache-row writes).

        Returns logits predicting code position ``step``. ``window`` is a
        static cache-read bound (see _stack_decode; lockstep only).
        """
        pos = jnp.take(self.pos_emb_code[0], step - 1, axis=0)
        pos = (pos[:, None, :] if jnp.ndim(step) else pos[None, None, :])
        x = self.tok_emb_code(token)[:, None, :] + pos.astype(self.dtype)
        cur_len = self.cond_num_tokens + step - 1
        x, cache = self._stack_decode(x, cur_len, cache,
                                      None if jnp.ndim(step) else window)
        qv = (None if self.is_initializing()
              else self.head.variables.get("quant"))
        if qv is not None:
            # int8 vocab head with the final LN folded in
            p_ln = self.layer_norm.variables["params"]
            logits, _ = int8_ln_gemm(x[:, -1], p_ln["scale"],
                                     p_ln["bias"], None, None,
                                     qv["kernel_q"], qv["scale"], None,
                                     eps=1e-5, w8a8=self.act_int8)
        elif not self.is_initializing() and "head" in _lnfuse_sites():
            # final LN folded into the vocab-head GEMM (one kernel fewer
            # per token; same dispatch-bound argument as Block.decode)
            p_ln = self.layer_norm.variables["params"]
            logits = fused_ln_gemm(
                x[:, -1], p_ln["scale"], p_ln["bias"],
                self.head.variables["params"]["kernel"], None, eps=1e-5)
        else:
            logits = self.head(self.layer_norm(x)[:, -1])
        return logits, cache


class RQTransformer(nn.Module):
    """Two-axis AR prior over residual-quantizer codes (reference layers.py:306-547).

    Spatial transformer runs over depth-summed code embeddings; a depth
    transformer autoregresses over the per-position depth prefix-sums.
    """

    vocab_cond_size: int
    vocab_img_size: int
    embed_dim: int
    cond_num_tokens: int
    img_num_tokens: int
    depth_num_tokens: int
    spatial_n_heads: int
    depth_n_heads: int
    spatial_n_layers: int
    depth_n_layers: int
    mlp_bias: bool = True
    attn_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = True
    remat: bool = False
    # INT8 spatial KV cache with per-row scales (see GPT.kv_int8; the
    # depth stack has no cache to quantize)
    kv_int8: bool = False
    # W8A8 for the SPATIAL decode GEMMs (see GPT.act_int8; the depth
    # stack samples by full recompute through the bf16 kernels)
    act_int8: bool = False
    # sequence parallelism for the SPATIAL stack's residual stream (the
    # depth stack's window is tiny, <= 8 tokens — nothing to shard)
    sp_mesh: Optional[jax.sharding.Mesh] = None

    @property
    def ctx_len(self) -> int:
        return self.cond_num_tokens + self.img_num_tokens

    def setup(self) -> None:
        uniform_init = nn.initializers.uniform(scale=1.0)  # torch.rand
        self.tok_emb_cond = nn.Embed(self.vocab_cond_size, self.embed_dim,
                                     embedding_init=normal_init)
        self.pos_emb_cond = self.param("pos_emb_cond", uniform_init,
                                       (1, self.cond_num_tokens, self.embed_dim))
        self.tok_emb_code = nn.Embed(self.vocab_img_size, self.embed_dim,
                                     embedding_init=normal_init)
        self.pos_emb_code = self.param("pos_emb_code", uniform_init,
                                       (1, self.img_num_tokens, self.embed_dim))
        self.pos_emb_depth = self.param(
            "pos_emb_depth", uniform_init,
            (1, self.depth_num_tokens - 1, self.embed_dim))

        sp_kw = dict(embed_dim=self.embed_dim, n_heads=self.spatial_n_heads,
                     cond_len=self.cond_num_tokens, mlp_bias=self.mlp_bias,
                     attn_bias=self.attn_bias, dtype=self.dtype,
                     sp_mesh=self.sp_mesh, act_int8=self.act_int8)
        dp_kw = dict(embed_dim=self.embed_dim, n_heads=self.depth_n_heads,
                     cond_len=0, mlp_bias=self.mlp_bias,
                     attn_bias=self.attn_bias, dtype=self.dtype)
        if self.scan_layers:
            target = nn.remat(Block) if self.remat else Block
            def scanned(length):
                return nn.scan(
                    target,
                    variable_axes={"params": 0, "constants": 0, "quant": 0},
                    split_rngs={"params": True}, length=length,
                    methods=["scan_call", "scan_decode", "scan_prefill"])
            self.spatial_stack = scanned(self.spatial_n_layers)(
                **sp_kw, name="spatial")
            self.depth_stack = scanned(self.depth_n_layers)(
                **dp_kw, name="depth")
            self.spatial_transformer = None
            self.depth_transformer = None
        else:
            self.spatial_transformer = [
                Block(**sp_kw, name=f"spatial_{i}")
                for i in range(self.spatial_n_layers)]
            self.depth_transformer = [
                Block(**dp_kw, name=f"depth_{i}")
                for i in range(self.depth_n_layers)]

        self.ln_spatial = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.ln_depth = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.head = nn.Dense(self.vocab_img_size, use_bias=False,
                             kernel_init=normal_init, dtype=self.dtype)

    def __call__(self, codes: jax.Array, conds: jax.Array) -> jax.Array:
        """codes: (B, T, D) ints; conds: (B, cond_num_tokens) ints.

        Returns logits (B*T, D, vocab_img_size) matching the reference's
        flattened layout (layers.py:391-395).
        """
        b = codes.shape[0]
        codes = codes.reshape(b, -1, codes.shape[-1])
        emb = self.tok_emb_code(codes)                       # (B, T, D, C)
        conds = conds.reshape(b, -1)
        cc = self.tok_emb_cond(conds) + self.pos_emb_cond.astype(self.dtype)

        # cumsum over the DEPTH axis (paper intent; see module docstring).
        csum = jnp.cumsum(emb, axis=-2)
        code_sum = csum[..., -1, :]                          # (B, T, C)
        spatial_in = code_sum + self.pos_emb_code.astype(self.dtype)

        h = jnp.concatenate([cc, spatial_in], axis=1)
        if self.scan_layers:
            h, _ = self.spatial_stack.scan_call(
                h, jnp.zeros((self.spatial_n_layers, 0)))
        else:
            for block in self.spatial_transformer:
                h = block(h)
        h = self.ln_spatial(h)
        h = h[:, self.cond_num_tokens - 1:-1]                # (B, T, C)

        v = csum[..., :-1, :] + self.pos_emb_depth.astype(self.dtype)
        v = jnp.concatenate([h[:, :, None, :], v], axis=2)   # (B, T, D, C)
        v = v.reshape(-1, *v.shape[2:])                      # (B*T, D, C)
        if self.scan_layers:
            v, _ = self.depth_stack.scan_call(
                v, jnp.zeros((self.depth_n_layers, 0)))
        else:
            for block in self.depth_transformer:
                v = block(v)
        return self.head(self.ln_depth(v))                   # (B*T, D, vocab)

    # -- cached sampling --------------------------------------------------------

    def init_cache(self, batch: int, dtype=None) -> Dict[str, jax.Array]:
        dtype = dtype or self.dtype
        # packed head layout, ctx sublane-padded (see GPT.init_cache)
        if self.kv_int8:
            ctx_pad = -(-self.ctx_len // 128) * 128
            shape_s = (self.spatial_n_layers, batch, ctx_pad, self.embed_dim)
            return {
                "k": jnp.zeros(shape_s, jnp.int8),
                "v": jnp.zeros(shape_s, jnp.int8),
                "k_scale": jnp.zeros(shape_s[:3], jnp.float32),
                "v_scale": jnp.zeros(shape_s[:3], jnp.float32),
                "shift": jnp.zeros(
                    (self.spatial_n_layers, batch, self.embed_dim), dtype),
            }
        ctx_pad = -(-self.ctx_len // 8) * 8
        shape_s = (self.spatial_n_layers, batch, ctx_pad, self.embed_dim)
        return {
            "k": jnp.zeros(shape_s, dtype),
            "v": jnp.zeros(shape_s, dtype),
            "shift": jnp.zeros((self.spatial_n_layers, batch, self.embed_dim),
                               dtype),
        }

    def spatial_prefill(self, conds, cache):
        """Condition prefix through the spatial transformer -> first hidden."""
        conds = conds.reshape(conds.shape[0], -1)
        x = self.tok_emb_cond(conds) + self.pos_emb_cond.astype(self.dtype)
        if self.kv_int8:
            # prefix-sized fp temp, merged into the full int8 cache — a
            # full-ctx bf16 temp doubles cache HBM during prefill (see
            # GPT._stack_prefill)
            t = x.shape[1]
            tpad = min(-(-t // 8) * 8, cache["k"].shape[2])
            small = cache["k"].shape[:2] + (tpad,) + cache["k"].shape[3:]
            tmp_k = jnp.zeros(small, self.dtype)
            tmp_v = jnp.zeros(small, self.dtype)
            hidden, fp = self._spatial_prefill_fp(
                x, tmp_k, tmp_v, cache["shift"])
            k_q, k_sc = GPT._quant_rows(fp["k"])
            v_q, v_sc = GPT._quant_rows(fp["v"])
            zero = (0, 0, 0)
            return hidden, {
                "k": jax.lax.dynamic_update_slice(cache["k"], k_q,
                                                  zero + (0,)),
                "v": jax.lax.dynamic_update_slice(cache["v"], v_q,
                                                  zero + (0,)),
                "k_scale": jax.lax.dynamic_update_slice(
                    cache["k_scale"], k_sc, zero),
                "v_scale": jax.lax.dynamic_update_slice(
                    cache["v_scale"], v_sc, zero),
                "shift": fp["shift"]}
        return self._spatial_prefill_fp(x, cache["k"], cache["v"],
                                        cache["shift"])

    def _spatial_prefill_fp(self, x, k_all, v_all, s_all):
        if self.scan_layers:
            with scanned_weights():
                x, (k_all, v_all, s_new) = self.spatial_stack.scan_prefill(
                    x, (k_all, v_all))
            s_all = s_new.astype(s_all.dtype)
        else:
            for i, block in enumerate(self.spatial_transformer):
                x, k, v, s = block.prefill(x, k_all[i], v_all[i])
                k_all = k_all.at[i].set(k)
                v_all = v_all.at[i].set(v)
                s_all = s_all.at[i].set(s.astype(s_all.dtype))
        x = self.ln_spatial(x)
        hidden = x[:, self.cond_num_tokens - 1]
        return hidden, {"k": k_all, "v": v_all, "shift": s_all}

    def spatial_step(self, prev_codes: jax.Array, step: jax.Array, cache):
        """prev_codes: (B, D) codes of the previous spatial position.

        ``step``: int32 scalar, or a (B,) vector of per-row spatial
        positions (ragged batch — continuous-batching serving). The depth
        axis needs no raggedness: every row's depth loop runs d=0..D-1
        lockstep regardless of its spatial position."""
        pos = jnp.take(self.pos_emb_code[0], step - 1, axis=0)
        pos = (pos[:, None, :] if jnp.ndim(step) else pos[None, None, :])
        x = jnp.sum(self.tok_emb_code(prev_codes), axis=1, keepdims=True) \
            + pos.astype(self.dtype)
        cur_len = self.cond_num_tokens + step - 1
        k_all, v_all, s_all = cache["k"], cache["v"], cache["shift"]
        ks = cache.get("k_scale")
        vs = cache.get("v_scale")
        # stacked caches ride whole (scan carry / static layer index) — the
        # layer slice happens inside the attention kernel; see
        # GPT._stack_decode for the copy-per-token measurement
        if self.scan_layers:
            layer_ix = jnp.arange(self.spatial_n_layers, dtype=jnp.int32)
            with scanned_weights():
                (x, *_), (k_news, v_news, s_new) = \
                    self.spatial_stack.scan_decode(
                        (x, cur_len, k_all, v_all, ks, vs),
                        (s_all, layer_ix))
            s_all = s_new.astype(s_all.dtype)
        else:
            k_cols, v_cols, s_cols = [], [], []
            for i, block in enumerate(self.spatial_transformer):
                x, k, v, s = block.decode(x, k_all, v_all, cur_len,
                                          s_all[i], jnp.int32(i), ks, vs)
                k_cols.append(k)
                v_cols.append(v)
                s_cols.append(s)
            k_news = jnp.stack(k_cols)
            v_news = jnp.stack(v_cols)
            s_all = jnp.stack(s_cols).astype(s_all.dtype)
        x = self.ln_spatial(x)
        if ks is not None:
            k_news, ksc = GPT._quant_rows(k_news)
            v_news, vsc = GPT._quant_rows(v_news)
            return x[:, -1], {
                "k": cache_row_update(k_all, k_news, cur_len),
                "v": cache_row_update(v_all, v_news, cur_len),
                "k_scale": scale_row_update(ks, ksc, cur_len),
                "v_scale": scale_row_update(vs, vsc, cur_len),
                "shift": s_all}
        k_all = cache_row_update(k_all, k_news, cur_len)
        v_all = cache_row_update(v_all, v_news, cur_len)
        return x[:, -1], {"k": k_all, "v": v_all, "shift": s_all}

    def depth_forward(self, hidden: jax.Array, depth_codes: jax.Array,
                      d: jax.Array) -> jax.Array:
        """Depth-transformer forward for one spatial position.

        hidden: (B, C) spatial hidden; depth_codes: (B, D_max) codes sampled so
        far at this position (only the first ``d`` are valid). Recomputes the
        depth stack over the fixed-size window (depth is tiny, <= 8), masking
        invalid positions — cheaper and simpler than a second KV cache.
        Returns logits (B, vocab) for depth position d.
        """
        b = hidden.shape[0]
        dmax = self.depth_num_tokens
        emb = self.tok_emb_code(depth_codes)                 # (B, Dmax, C)
        valid = (jnp.arange(dmax)[None, :, None] < d)
        csum = jnp.cumsum(jnp.where(valid, emb, 0.0), axis=1)
        pos_d = jnp.pad(self.pos_emb_depth[0], ((0, 1), (0, 0)))  # (Dmax, C)
        v = jnp.concatenate(
            [hidden[:, None, :], csum[:, :-1] + pos_d[None, :-1]], axis=1)
        if self.scan_layers:
            v, _ = self.depth_stack.scan_call(
                v, jnp.zeros((self.depth_n_layers, 0)))
        else:
            for block in self.depth_transformer:
                v = block(v)
        v = self.ln_depth(v)
        out = jnp.take_along_axis(
            v, jnp.broadcast_to(d, (b,))[:, None, None].astype(jnp.int32),
            axis=1)[:, 0]
        return self.head(out)
