"""Fused multi-head attention for TPU.

Replaces the reference's unfused softmax(QK^T)V matmul chains
(reference: enhancing/modules/stage1/layers.py:108-132 for the ViT;
enhancing/modules/stage2/layers.py:57-97 for the causal/prefix GPT attention)
with a Pallas kernel that keeps the (block_q, N) score tile in VMEM, never
materialising the full (N, N) attention matrix in HBM.

Design
------
* Grid: (batch*heads, N // block_q). K/V for one head live entirely in VMEM
  (N×D ≤ a few hundred KB for this model family), so each program computes
  scores for a q-block against all keys, does a numerically-stable softmax in
  fp32, and one (block_q, N) @ (N, D) matmul back onto the MXU.
* Masking: ``mask_mode`` is 'none' for the ViT tokenizer or 'prefix_causal'
  for the stage-2 priors (causal with the first ``cond_len`` tokens mutually
  visible — reference mask construction enhancing/modules/stage2/layers.py:45-48).
* Differentiable everywhere: the Pallas forward is wrapped in ``jax.custom_vjp``
  whose backward is the VJP of the mathematically identical XLA path, so
  training works regardless of which forward ran.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import cdiv, interpret_mode, use_pallas
from .partition import partitioned

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Pure-XLA reference path (differentiable; also the source of the backward).
# ---------------------------------------------------------------------------

def _attention_xla(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                   mask_mode: str, cond_len: int) -> jax.Array:
    """q, k, v: (B, H, N, D). Softmax in fp32, output in q.dtype."""
    n, m = q.shape[-2], k.shape[-2]
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if mask_mode == "prefix_causal":
        rows = jnp.arange(n)[:, None]
        cols = jnp.arange(m)[None, :]
        allowed = (cols <= rows) | ((rows < cond_len) & (cols < cond_len))
        s = jnp.where(allowed, s, NEG_INF)
    elif mask_mode != "none":
        raise ValueError(f"unknown mask_mode {mask_mode!r}")
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas forward kernel.
# ---------------------------------------------------------------------------

def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, mask_mode: str,
                 cond_len: int, block_q: int):
    qi = pl.program_id(1)
    q = q_ref[0]                               # (block_q, D) — keep bf16:
    k = k_ref[0]                               # MXU multiplies bf16 natively
    v = v_ref[0]                               # with fp32 accumulation

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if mask_mode == "prefix_causal":
        n_keys = k.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        allowed = (cols <= rows) | ((rows < cond_len) & (cols < cond_len))
        s = jnp.where(allowed, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                      mask_mode: str, cond_len: int,
                      block_q: int | None = None) -> jax.Array:
    b, h, n, d = q.shape
    m = k.shape[2]
    bh = b * h
    q3 = q.reshape(bh, n, d)
    k3 = k.reshape(bh, m, d)
    v3 = v.reshape(bh, m, d)

    if block_q is None:
        # Largest q-block whose fp32 score tile fits a 4MB VMEM budget —
        # measured 43.3 vs 35.2 TFLOP/s for 1024 vs 256 at N=1024 on v5e.
        budget = 4 * 1024 * 1024
        block_q = 1024
        while block_q > 128 and block_q * m * 4 > budget:
            block_q //= 2
    block_q = min(block_q, n)
    grid = (bh, cdiv(n, block_q))

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, mask_mode=mask_mode,
                          cond_len=cond_len, block_q=block_q),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n * m * d,
            bytes_accessed=(q3.size + k3.size + v3.size + bh * n * d) * q.dtype.itemsize,
            transcendentals=bh * n * m,
        ),
        interpret=interpret_mode(),
    )(q3, k3, v3)
    return out.reshape(b, h, n, d)


# ---------------------------------------------------------------------------
# Public op: Pallas forward + XLA-derived backward.
# ---------------------------------------------------------------------------

def _bhnd_fwd_impl(q, k, v, scale, mask_mode, cond_len):
    """Local-shape dispatch for the (B,H,N,D) kernel: called by the SPMD
    partitioner once with global shapes and once per shard with local
    blocks (batch/head dims sharded; see ops/partition.py)."""
    if q.shape[0] * q.shape[1] == 0:
        return jnp.zeros_like(q)
    return _attention_pallas(q, k, v, scale, mask_mode, cond_len)


# batch and heads shard freely; softmax rows need full key/value sequences
_bhnd_fwd = partitioned(
    _bhnd_fwd_impl, "b h n d, b h m d, b h m d -> b h n d",
    need_replication=("n", "m", "d"), static_argnums=(3, 4, 5))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attention_fused(q, k, v, scale, mask_mode, cond_len):
    return _bhnd_fwd(q, k, v, scale, mask_mode, cond_len)


def _attention_fused_fwd(q, k, v, scale, mask_mode, cond_len):
    return _bhnd_fwd(q, k, v, scale, mask_mode, cond_len), (q, k, v)


def _attention_fused_bwd(scale, mask_mode, cond_len, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _attention_xla(q_, k_, v_, scale, mask_mode, cond_len),
        q, k, v)
    return vjp(g)


_attention_fused.defvjp(_attention_fused_fwd, _attention_fused_bwd)


def multihead_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                        scale: Optional[float] = None,
                        mask_mode: str = "none",
                        cond_len: int = 0,
                        impl: str | None = "auto") -> jax.Array:
    """Fused scaled-dot-product attention.

    Args:
      q, k, v: (batch, heads, seq, head_dim).
      scale: score scale; defaults to head_dim**-0.5.
      mask_mode: 'none' (bidirectional, ViT) or 'prefix_causal' (stage-2 prior).
      cond_len: length of the mutually-visible condition prefix.
      impl: 'auto' (Pallas on TPU, XLA elsewhere), 'pallas', or 'xla'.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_pallas(impl) and q.shape[-2] >= 8:
        return _attention_fused(q, k, v, float(scale), mask_mode, int(cond_len))
    return _attention_xla(q, k, v, float(scale), mask_mode, int(cond_len))


# ---------------------------------------------------------------------------
# Packed slab kernel: q/k/v as (B, N, H*D) — the NATIVE layout of the
# fused qkv projection output. No (B,H,N,D) transposes ever touch HBM.
#
# Mosaic tiling requires lane-dim blocks in multiples of 128, so the grid
# walks SLABs of lanes:
#   * head_dim % 128 == 0 (flagship GPT prior: 6144/16 -> D=384; also 128,
#     256, ...): one head IS one slab of head_dim lanes — no masking, no
#     wasted MXU columns; the D-lane contraction runs as D/128 native MXU
#     passes.
#   * 128 % head_dim == 0 (ViT/stand-in D=64, D=32): a 128-lane slab holds
#     several heads. Per-head scores come from zero-masking the q lanes of
#     the other heads before the contraction-128 matmul (the masked lanes
#     contribute zeros — for D=64 the same wasted MXU columns the hardware
#     would pad a 64-contraction with, but lane-aligned at full issue rate).
#   * other dims (RQ prior: 1536/16 -> D=96 spatial, 1536/8 -> D=192 depth)
#     are zero-PADDED per head to the next 128 multiple at the wrapper
#     (multihead_attention_bnhd) and run the head-per-slab path: 1.33x
#     score FLOPs vs 2-4x for masked multi-head slabs.
#
# VPU economy (the old kernel was softmax-bound, ~2.7 ms/layer of VPU at
# ViT-base/b64): the score scale is folded into q OUTSIDE the kernel (an
# O(N*HD) pass fused into the projection, not an O(N^2) pass here), and the
# 1/sum normalisation multiplies the (bq, slab) OUTPUT instead of the
# (bq, N) probability matrix — two full passes over N^2 removed.
# ---------------------------------------------------------------------------

LANES = 128


def _slab_for(head_dim: int) -> int:
    """Lane width of one kernel slab: the head itself when it is 128-aligned,
    else a 128-lane slab packing several heads."""
    return head_dim if head_dim % LANES == 0 else LANES


def _split_slab_heads(q, head_dim: int, heads_per_slab: int):
    """Per-head q tensors with the other heads' lanes zeroed. hps=2 uses one
    where + one subtract; the general case masks each head's lane range."""
    if heads_per_slab == 1:
        return (q,)
    lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    if heads_per_slab == 2:
        qa = jnp.where(lane < head_dim, q, jnp.zeros_like(q))
        return (qa, q - qa)
    zero = jnp.zeros_like(q)
    return tuple(
        jnp.where((lane >= h * head_dim) & (lane < (h + 1) * head_dim), q,
                  zero) for h in range(heads_per_slab))


def _merge_slab_heads(outs, head_dim: int):
    """Select lane range h*D:(h+1)*D from outs[h] (per-head full-slab rows)."""
    if len(outs) == 1:
        return outs[0]
    lane_head = jax.lax.broadcasted_iota(
        jnp.int32, outs[0].shape, 1) // head_dim
    out = outs[0]
    for h in range(1, len(outs)):
        out = jnp.where(lane_head == h, outs[h], out)
    return out


def _packed_attention_tile(q, k_all, v_all, qi, *, mask_mode: str,
                           cond_len: int, block_q: int, heads_per_slab: int,
                           head_dim: int, m_valid: int,
                           unroll_chunks: int) -> jax.Array:
    """Whole-row softmax attention for one (bq, slab) q tile against the
    full (M, slab) k/v tiles; returns the merged (bq, slab) output tile.
    Shared by the plain packed kernel and the attention+proj fused kernel."""
    m_tot = k_all.shape[0]

    def scores(qh, k, col0, row_mod: int | None = None):
        s = jax.lax.dot_general(qh, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        if row_mod is not None:
            rows = jax.lax.rem(rows, row_mod)
        rows = rows + qi * block_q
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + col0
        if mask_mode == "prefix_causal":
            allowed = (cols <= rows) | ((rows < cond_len) & (cols < cond_len))
        else:
            allowed = jnp.ones(s.shape, jnp.bool_)
        if m_valid != m_tot:
            allowed = allowed & (cols < m_valid)
        return jnp.where(allowed, s, NEG_INF) \
            if (mask_mode == "prefix_causal" or m_valid != m_tot) else s

    q_heads = _split_slab_heads(q, head_dim, heads_per_slab)

    if heads_per_slab > 1:
        # Stack the per-head masked-q copies along ROWS and run ONE
        # (hps*bq, slab) @ (slab, M) score matmul + ONE softmax + ONE PV
        # instead of hps half-size chains: same physical MACs, but the
        # longer row stream keeps the MXU weight tiles resident longer and
        # the VPU softmax vectorizes over one tall tile.
        qs = jnp.concatenate(q_heads, axis=0)  # (hps*bq, slab)
        if unroll_chunks > 1 and m_tot % unroll_chunks == 0:
            # Python-UNROLLED online softmax over a few big key chunks
            # (the measured default, 4): unlike the fori_loop path (serial
            # semantics), the unrolled chunks are all visible to Mosaic's
            # scheduler, so chunk c+1's score matmul (MXU) overlaps chunk
            # c's exp/rescale (VPU) — the single whole-row softmax runs
            # MXU -> VPU -> MXU strictly in sequence and eats the softmax
            # latency raw.
            ck = m_tot // unroll_chunks
            parts = []
            for c in range(unroll_chunks):
                sl = slice(c * ck, (c + 1) * ck)
                s_c = scores(qs, k_all[sl], c * ck, row_mod=block_q)
                parts.append((jnp.max(s_c, axis=-1, keepdims=True), s_c, sl))
            mx = functools.reduce(jnp.maximum, [p[0] for p in parts])
            o = None
            l = None
            for mx_c, s_c, sl in parts:
                e_c = jnp.exp(s_c - mx)
                pv = jnp.dot(e_c.astype(v_all.dtype), v_all[sl],
                             preferred_element_type=jnp.float32)
                l_c = jnp.sum(e_c, axis=-1, keepdims=True)
                o = pv if o is None else o + pv
                l = l_c if l is None else l + l_c
            o = o * (1.0 / l)
        else:
            s = scores(qs, k_all, 0, row_mod=block_q)
            mx = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - mx)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(e.astype(v_all.dtype), v_all,
                        preferred_element_type=jnp.float32) * r
        outs = [o[h * block_q:(h + 1) * block_q]
                for h in range(heads_per_slab)]
        return _merge_slab_heads(outs, head_dim)

    s = scores(q, k_all, 0)
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
    return jnp.dot(e.astype(v_all.dtype), v_all,
                   preferred_element_type=jnp.float32) * r


def _attn_kernel_packed(q_ref, k_ref, v_ref, o_ref, *, mask_mode: str,
                        cond_len: int, block_q: int, heads_per_slab: int,
                        head_dim: int, k_chunk: int = 0,
                        m_valid: int | None = None, unroll_chunks: int = 0,
                        q_scale: float | None = None):
    """``k_chunk``: 0 = whole-row softmax over all M keys at once;
    > 0 = online (flash-style) softmax over key chunks. For
    ``prefix_causal`` the chunk loop is a dynamic-bound ``fori_loop`` that
    stops after the chunk containing this q-block's diagonal — fully-masked
    key chunks are never computed (the whole-row path computes and masks
    them, doubling the score work). ``m_valid``: true key count when the
    caller padded M up to a chunk multiple (padding columns are masked)."""
    qi = pl.program_id(2)
    q = q_ref[0]                               # (bq, slab) bf16, pre-scaled
    if q_scale is not None:
        # scale applied to the VMEM-resident q TILE (the packed-qkv entry
        # cannot pre-scale q without copying it out of the fused buffer);
        # same dtype rounding as the out-of-kernel q * scale
        q = q * jnp.asarray(q_scale, q.dtype)
    slab = q.shape[-1]
    m_tot = k_ref.shape[1]
    if m_valid is None:
        m_valid = m_tot

    def scores(qh, k, col0, row_mod: int | None = None):
        # ``row_mod``: set when qh stacks several heads' copies of the same
        # q block along rows — row r of the stack is query row r % block_q.
        s = jax.lax.dot_general(qh, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        if row_mod is not None:
            rows = jax.lax.rem(rows, row_mod)
        rows = rows + qi * block_q
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + col0
        if mask_mode == "prefix_causal":
            allowed = (cols <= rows) | ((rows < cond_len) & (cols < cond_len))
        else:
            allowed = jnp.ones(s.shape, jnp.bool_)
        if m_valid != m_tot:
            allowed = allowed & (cols < m_valid)
        return jnp.where(allowed, s, NEG_INF) \
            if (mask_mode == "prefix_causal" or m_valid != m_tot) else s

    q_heads = _split_slab_heads(q, head_dim, heads_per_slab)

    if (not k_chunk or k_chunk >= m_tot) and heads_per_slab > 1:
        # Delegates to the shared whole-row tile helper (stacked-rows score
        # matmul + optionally unrolled online softmax).
        o_ref[0] = _packed_attention_tile(
            q, k_ref[0], v_ref[0], qi, mask_mode=mask_mode,
            cond_len=cond_len, block_q=block_q,
            heads_per_slab=heads_per_slab, head_dim=head_dim,
            m_valid=m_valid,
            unroll_chunks=unroll_chunks).astype(o_ref.dtype)
        return
    outs = []
    for qh in q_heads:
        if not k_chunk or k_chunk >= m_tot:
            k_all = k_ref[0]                   # (M, 128)
            v_all = v_ref[0]
            s = scores(qh, k_all, 0)
            mx = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - mx)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(e.astype(v_all.dtype), v_all,
                        preferred_element_type=jnp.float32) * r
        else:
            assert m_tot % k_chunk == 0, (m_tot, k_chunk)

            def chunk_body(c, carry):
                mx, l, o = carry
                start = c * k_chunk
                kc = k_ref[0, pl.ds(start, k_chunk), :]
                vc = v_ref[0, pl.ds(start, k_chunk), :]
                s = scores(qh, kc, start)
                m_new = jnp.maximum(mx, jnp.max(s, axis=-1, keepdims=True))
                alpha = jnp.exp(mx - m_new)
                e = jnp.exp(s - m_new)
                l_new = l * alpha + jnp.sum(e, axis=-1, keepdims=True)
                pv = jax.lax.dot_general(e.astype(vc.dtype), vc,
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                return m_new, l_new, o * alpha + pv

            n_chunks = m_tot // k_chunk
            if mask_mode == "prefix_causal":
                # last chunk any row of this block may see: the diagonal —
                # OR cond_len-1, since prefix rows (< cond_len) also attend
                # cond columns PAST their own diagonal
                row_max = qi * block_q + (block_q - 1)
                eff_max = jnp.maximum(row_max, cond_len - 1)
                live = jnp.minimum(n_chunks, eff_max // k_chunk + 1)
            else:
                live = n_chunks
            mx, l, o = jax.lax.fori_loop(
                0, live, chunk_body,
                (jnp.full((block_q, 1), NEG_INF, jnp.float32),
                 jnp.zeros((block_q, 1), jnp.float32),
                 jnp.zeros((block_q, slab), jnp.float32)))
            o = o / l
        outs.append(o)

    o_ref[0] = _merge_slab_heads(outs, head_dim).astype(o_ref.dtype)


def _attn_kernel_packed_gridchunk(q_ref, k_ref, v_ref, o_ref, m_acc, l_acc,
                                  o_acc, *, mask_mode: str, cond_len: int,
                                  block_q: int, k_chunk: int,
                                  heads_per_slab: int, head_dim: int,
                                  m_valid: int):
    """Causal-skip forward with key chunks as the FASTEST grid axis.

    Unlike the in-kernel serial chunk loop (measured slower — it defeats
    Mosaic's matmul pipelining), each (q-block, k-chunk) pair is its own
    grid step: Pallas double-buffers the chunk DMAs, the index map CLAMPS
    chunks past this q-block's diagonal to the last live one (so their DMA
    is elided), and ``pl.when`` skips their compute. Online-softmax state
    rides VMEM scratch across the chunk axis; the output flushes on the
    final chunk step.

    Measured at the stage-2 training shape (B8/H16/N1025/D64): 2.74 ms vs
    2.19 ms for the whole-row kernel DESPITE half the score FLOPs — at
    N~1k the per-chunk scratch read-modify-writes and init/flush steps
    outweigh the skipped compute. Kept as the architecture for much longer
    sequences, where compute dominates; not dispatched by default."""
    jq = pl.program_id(2)
    jk = pl.program_id(3)
    nk = pl.num_programs(3)
    # prefix rows (< cond_len) attend cond columns past their diagonal, so
    # chunks up to max(diagonal, cond_len-1) are live
    row_max = jnp.maximum(jq * block_q + (block_q - 1), cond_len - 1)
    live = jk * k_chunk <= row_max          # chunk intersects diagonal/prefix

    @pl.when(jk == 0)
    def _init():
        m_acc[...] = jnp.full_like(m_acc, NEG_INF)
        l_acc[...] = jnp.zeros_like(l_acc)
        o_acc[...] = jnp.zeros_like(o_acc)

    @pl.when(live)
    def _chunk():
        q = q_ref[0]                        # (bq, slab) pre-scaled
        k = k_ref[0]                        # (k_chunk, slab)
        v = v_ref[0]
        col0 = jk * k_chunk

        def scores(qh):
            s = jax.lax.dot_general(qh, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
                + jq * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + col0
            allowed = (cols <= rows) | ((rows < cond_len) &
                                        (cols < cond_len))
            allowed = allowed & (cols < m_valid)
            return jnp.where(allowed, s, NEG_INF)

        q_heads = _split_slab_heads(q, head_dim, heads_per_slab)

        for h, qh in enumerate(q_heads):
            s = scores(qh)
            mx = m_acc[h]                   # (bq, 1)
            m_new = jnp.maximum(mx, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(mx - m_new)
            e = jnp.exp(s - m_new)
            m_acc[h] = m_new
            l_acc[h] = l_acc[h] * alpha + jnp.sum(e, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(e.astype(v.dtype), v,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o_acc[h] = o_acc[h] * alpha + pv

    @pl.when(jk == nk - 1)
    def _flush():
        outs = [o_acc[h] / l_acc[h] for h in range(heads_per_slab)]
        o_ref[0] = _merge_slab_heads(outs, head_dim).astype(o_ref.dtype)


def _attention_packed_gridchunk_call(q3, k3, v3, mask_mode, cond_len,
                                     head_dim, block_q: int = 256,
                                     k_chunk: int = 512):
    """Grid-chunked causal forward; requires M % k_chunk handled by padding."""
    b, n, hd = q3.shape
    m = k3.shape[1]
    m_valid = m
    if m % k_chunk:
        m_pad = cdiv(m, k_chunk) * k_chunk
        k3 = jnp.pad(k3, ((0, 0), (0, m_pad - m), (0, 0)))
        v3 = jnp.pad(v3, ((0, 0), (0, m_pad - m), (0, 0)))
        m = m_pad
    slab = _slab_for(head_dim)
    heads_per_slab = slab // head_dim
    slabs = hd // slab
    block_q = min(block_q, n)
    nq = cdiv(n, block_q)
    nk = m // k_chunk
    n_heads = hd // head_dim

    def k_index(i, s, jq, jk):
        # clamp dead chunks to this q-block's last live chunk: consecutive
        # grid steps then address the same block and the DMA is elided.
        # Prefix rows see cond columns past the diagonal (hence cond_len-1).
        row_max = jnp.maximum(jq * block_q + (block_q - 1), cond_len - 1)
        live_last = jnp.minimum(row_max // k_chunk, nk - 1)
        return (i, jnp.minimum(jk, live_last), s)

    return pl.pallas_call(
        functools.partial(_attn_kernel_packed_gridchunk, mask_mode=mask_mode,
                          cond_len=cond_len, block_q=block_q,
                          k_chunk=k_chunk, heads_per_slab=heads_per_slab,
                          head_dim=head_dim, m_valid=m_valid),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), q3.dtype),
        grid=(b, slabs, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, slab), lambda i, s, jq, jk: (i, jq, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_chunk, slab), k_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_chunk, slab), k_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, slab),
                               lambda i, s, jq, jk: (i, jq, s),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((heads_per_slab, block_q, 1), jnp.float32),
            pltpu.VMEM((heads_per_slab, block_q, 1), jnp.float32),
            pltpu.VMEM((heads_per_slab, block_q, slab), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * m * hd * heads_per_slab,
            bytes_accessed=(q3.size + k3.size + v3.size + q3.size)
            * q3.dtype.itemsize,
            transcendentals=b * n_heads * n * m // 2,
        ),
        interpret=interpret_mode(),
    )(q3, k3, v3)


def _packed_block_q(n: int, m: int, heads_per_slab: int) -> int:
    # fp32 score tiles are the VMEM hog: heads_per_slab * block_q * M * 4B
    # (plus ~1 intermediate of the same size); budget them to ~4MB live.
    budget = 4 * 1024 * 1024
    block_q = 1024
    while block_q > 128 and heads_per_slab * block_q * m * 4 > budget:
        block_q //= 2
    return min(block_q, n)


def _attention_packed_call(q3, k3, v3, mask_mode, cond_len, head_dim,
                           k_chunk: int | None = None,
                           block_q: int | None = None):
    """q3, k3, v3: (B, N, H*D); D must satisfy _slab_for (D % 128 == 0 or
    128 % D == 0 — pad other dims at the wrapper). q3 must already carry
    the softmax scale."""
    import os
    b, n, hd = q3.shape
    m = k3.shape[1]
    slab = _slab_for(head_dim)
    heads_per_slab = slab // head_dim
    slabs = hd // slab
    if block_q is None:
        block_q = _packed_block_q(n, m, heads_per_slab)
    block_q = min(block_q, n)
    grid = (b, slabs, cdiv(n, block_q))
    n_heads = hd // head_dim
    if k_chunk is None:
        k_chunk = int(os.environ.get("ENHANCING_TPU_ATTN_KCHUNK", "0"))
        # Measured and rejected as the causal default: a dynamic-bound chunk
        # loop that stops at the diagonal halves the score FLOPs, but at
        # B8/H16/N1025 it ran 2.51 ms vs 2.19 ms whole-row — the serial
        # ref-sliced loop defeats Mosaic's matmul pipelining and the k/v
        # block is DMA'd whole either way. Kept as the opt-in
        # ENHANCING_TPU_ATTN_KCHUNK path (now with causal-skip + padding).

    m_valid = m
    if k_chunk and k_chunk < m and m % k_chunk:
        # dynamic-bound chunk loops need whole chunks: pad keys/values and
        # mask the padding columns in-kernel (one-time ~MB-scale copy)
        m_pad = cdiv(m, k_chunk) * k_chunk
        k3 = jnp.pad(k3, ((0, 0), (0, m_pad - m), (0, 0)))
        v3 = jnp.pad(v3, ((0, 0), (0, m_pad - m), (0, 0)))
        m = m_pad

    # Python-unrolled online softmax over 4 big key chunks is the measured
    # default for the multi-head-per-slab whole-row path: unlike the serial
    # fori_loop chunk path, the unrolled chunks are all visible to Mosaic's
    # scheduler, so chunk c+1's score matmul overlaps chunk c's exp/rescale
    # VPU work. Measured at the ViT headline shape (B128 H12 N1024 D64):
    # 5.03 vs 5.64 ms/layer-call (~11% kernel, +1.4% end-to-end). 0 = the
    # single whole-row softmax; applied only when the key count divides.
    unroll_chunks = int(os.environ.get("ENHANCING_TPU_ATTN_UNROLL", "4"))
    return pl.pallas_call(
        functools.partial(_attn_kernel_packed, mask_mode=mask_mode,
                          cond_len=cond_len, block_q=block_q,
                          heads_per_slab=heads_per_slab, head_dim=head_dim,
                          k_chunk=k_chunk, m_valid=m_valid,
                          unroll_chunks=unroll_chunks),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), q3.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, slab), lambda i, s, j: (i, j, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, slab), lambda i, s, j: (i, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, slab), lambda i, s, j: (i, 0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, slab), lambda i, s, j: (i, j, s),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * m * hd * heads_per_slab,
            bytes_accessed=(q3.size + k3.size + v3.size + q3.size)
            * q3.dtype.itemsize,
            transcendentals=b * n_heads * n * m,
        ),
        interpret=interpret_mode(),
    )(q3, k3, v3)


def _attention_packed_qkv_call(qkv3, mask_mode, cond_len, head_dim, scale):
    """Packed attention consuming the FUSED (B, N, 3*H*D) qkv projection
    output directly. The same buffer rides in as three operands whose
    BlockSpec index maps point at the q / k / v lane ranges, so the
    ``jnp.split`` + q-scale copies the separate-operand entry forces
    (custom-call operands must be contiguous — each split slice plus the
    scale pass materializes a full (B, N, H*D) copy per layer) never
    happen; the scale folds into the VMEM q tile inside the kernel."""
    import os
    b, n, hd3 = qkv3.shape
    hd = hd3 // 3
    m = n
    slab = _slab_for(head_dim)
    heads_per_slab = slab // head_dim
    slabs = hd // slab
    block_q = _packed_block_q(n, m, heads_per_slab)
    grid = (b, slabs, cdiv(n, block_q))
    n_heads = hd // head_dim
    unroll_chunks = int(os.environ.get("ENHANCING_TPU_ATTN_UNROLL", "4"))

    return pl.pallas_call(
        functools.partial(_attn_kernel_packed, mask_mode=mask_mode,
                          cond_len=cond_len, block_q=block_q,
                          heads_per_slab=heads_per_slab, head_dim=head_dim,
                          k_chunk=0, m_valid=m, unroll_chunks=unroll_chunks,
                          q_scale=float(scale)),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), qkv3.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, slab), lambda i, s, j: (i, j, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, slab), lambda i, s, j: (i, 0, slabs + s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, slab), lambda i, s, j: (i, 0, 2 * slabs + s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, slab), lambda i, s, j: (i, j, s),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * m * hd * heads_per_slab,
            bytes_accessed=(qkv3.size + b * n * hd) * qkv3.dtype.itemsize,
            transcendentals=b * n_heads * n * m,
        ),
        interpret=interpret_mode(),
    )(qkv3, qkv3, qkv3)


def _qkv_split_scaled(qkv3, head_dim, scale):
    hd = qkv3.shape[-1] // 3
    q3 = qkv3[..., :hd] * jnp.asarray(scale, qkv3.dtype)
    return q3, qkv3[..., hd:2 * hd], qkv3[..., 2 * hd:]


def _packed_qkv_fwd_impl(qkv3, mask_mode, cond_len, head_dim, scale):
    b, n, hd3 = qkv3.shape
    hd = hd3 // 3
    if (hd % _slab_for(head_dim) == 0 and hd % head_dim == 0
            and _packed_supported(hd // head_dim, head_dim, n, n)):
        return _attention_packed_qkv_call(qkv3, mask_mode, cond_len,
                                          head_dim, scale)
    q3, k3, v3 = _qkv_split_scaled(qkv3, head_dim, scale)
    return _attention_xla_packed(q3, k3, v3, mask_mode, cond_len, head_dim)


# batch shards; the packed qkv lane axis and the sequence stay whole.
_packed_qkv_fwd = partitioned(
    _packed_qkv_fwd_impl, "b n x -> b n y",
    need_replication=("n", "x", "y"), static_argnums=(1, 2, 3, 4))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _attention_fused_packed_qkv(qkv3, mask_mode, cond_len, head_dim, scale):
    return _packed_qkv_fwd(qkv3, mask_mode, cond_len, head_dim, scale)


def _attention_fused_packed_qkv_fwd(qkv3, mask_mode, cond_len, head_dim,
                                    scale):
    return (_packed_qkv_fwd(qkv3, mask_mode, cond_len, head_dim, scale),
            (qkv3,))


def _attention_fused_packed_qkv_bwd(mask_mode, cond_len, head_dim, scale,
                                    res, g):
    (qkv3,) = res
    q3, k3, v3 = _qkv_split_scaled(qkv3, head_dim, scale)
    dq, dk, dv = _packed_bwd(q3, k3, v3, g.astype(qkv3.dtype), mask_mode,
                             cond_len, head_dim)
    dq = dq * jnp.asarray(scale, dq.dtype)  # chain through the q pre-scale
    return (jnp.concatenate([dq, dk, dv], axis=-1),)


_attention_fused_packed_qkv.defvjp(_attention_fused_packed_qkv_fwd,
                                   _attention_fused_packed_qkv_bwd)


def multihead_attention_packed_qkv(qkv: jax.Array, heads: int, head_dim: int,
                                   *, scale: Optional[float] = None,
                                   mask_mode: str = "none", cond_len: int = 0,
                                   impl: str | None = "auto") -> jax.Array:
    """Self-attention straight off the fused qkv projection output.

    qkv: (B, N, 3*heads*head_dim), laid out [q | k | v] along lanes — the
    native output of one LN->qkv GEMM. Returns (B, N, heads*head_dim).
    On TPU with packed-supported head dims this reads q/k/v lane slabs
    straight out of the fused buffer (zero split/scale copies); elsewhere
    it splits and runs the standard paths.
    """
    if scale is None:
        scale = head_dim ** -0.5
    b, n, hd3 = qkv.shape
    assert hd3 == 3 * heads * head_dim, (qkv.shape, heads, head_dim)
    if use_pallas(impl) and n >= 8 and _packed_supported(heads, head_dim,
                                                         n, n):
        return _attention_fused_packed_qkv(qkv, mask_mode, int(cond_len),
                                           head_dim, float(scale))
    q3, k3, v3 = _qkv_split_scaled(qkv, head_dim, scale)
    hd = heads * head_dim
    q = q3.reshape(b, n, heads, head_dim)
    k = k3.reshape(b, n, heads, head_dim)
    v = v3.reshape(b, n, heads, head_dim)
    out = multihead_attention_bnhd(q, k, v, scale=1.0, mask_mode=mask_mode,
                                   cond_len=cond_len, impl=impl)
    return out.reshape(b, n, hd)


def _packed_supported(n_heads: int, head_dim: int, n: int, m: int) -> bool:
    """Dims the packed kernels run natively: heads that are whole slabs
    (D % 128 == 0 — incl. the flagship GPT prior's D=384) or that pack a
    128-lane slab evenly (D in {64, 32, ...}). D=96/192 reach this path
    via per-head zero-padding in multihead_attention_bnhd."""
    if head_dim % LANES and LANES % head_dim:
        return False
    if (n_heads * head_dim) % _slab_for(head_dim):
        return False
    # Unaligned n/m produce partial tiles that Mosaic masks to logical
    # bounds (verified on hardware vs XLA for N=M=1025, both mask modes).
    return n >= 16 and m >= 16


# ---------------------------------------------------------------------------
# Legacy transpose-free entry for (B, N, H, D) inputs.
# ---------------------------------------------------------------------------

def _attn_kernel_bnhd(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                      mask_mode: str, cond_len: int, block_q: int,
                      n_heads: int):
    """Block over q positions only (TPU block tiling constrains the minor
    two dims, so heads can't be blocked in this layout); heads iterate
    inside the kernel with a single reused score buffer."""
    qi = pl.program_id(1)

    def one_head(h, _):
        # dynamic head index on the *ref* (VMEM loads support it; value-level
        # dynamic_slice has no Mosaic lowering)
        q = q_ref[0, :, h, :]                   # (bq, D)
        k = k_ref[0, :, h, :]                   # (M, D)
        v = v_ref[0, :, h, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if mask_mode == "prefix_causal":
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
                + qi * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            allowed = (cols <= rows) | ((rows < cond_len) & (cols < cond_len))
            s = jnp.where(allowed, s, NEG_INF)
        mx = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - mx)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, :, h, :] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_heads, one_head, 0)


def _attention_pallas_bnhd(q, k, v, scale, mask_mode, cond_len):
    b, n, h, d = q.shape
    m = k.shape[1]
    budget = 4 * 1024 * 1024
    block_q = 1024
    while block_q > 128 and block_q * m * 4 > budget:
        block_q //= 2
    block_q = min(block_q, n)

    return pl.pallas_call(
        functools.partial(_attn_kernel_bnhd, scale=scale, mask_mode=mask_mode,
                          cond_len=cond_len, block_q=block_q, n_heads=h),
        out_shape=jax.ShapeDtypeStruct((b, n, h, d), q.dtype),
        grid=(b, cdiv(n, block_q)),
        in_specs=[
            pl.BlockSpec((1, block_q, h, d), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, h, d), lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, h, d), lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, h, d), lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * m * d,
            bytes_accessed=(q.size + k.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=b * h * n * m,
        ),
        interpret=interpret_mode(),
    )(q, k, v)


def _attention_xla_bnhd(q, k, v, scale, mask_mode, cond_len):
    out = _attention_xla(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                         v.transpose(0, 2, 1, 3), scale, mask_mode, cond_len)
    return out.transpose(0, 2, 1, 3)


_bnhd_fwd = partitioned(
    _attention_pallas_bnhd, "b n h d, b m h d, b m h d -> b n h d",
    need_replication=("n", "m", "d"), static_argnums=(3, 4, 5))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attention_fused_bnhd(q, k, v, scale, mask_mode, cond_len):
    return _bnhd_fwd(q, k, v, scale, mask_mode, cond_len)


def _attention_fused_bnhd_fwd(q, k, v, scale, mask_mode, cond_len):
    return _bnhd_fwd(q, k, v, scale, mask_mode, cond_len), (q, k, v)


def _attention_fused_bnhd_bwd(scale, mask_mode, cond_len, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _attention_xla_bnhd(q_, k_, v_, scale, mask_mode,
                                               cond_len), q, k, v)
    return vjp(g)


_attention_fused_bnhd.defvjp(_attention_fused_bnhd_fwd,
                             _attention_fused_bnhd_bwd)


# ---------------------------------------------------------------------------
# Packed flash-style backward: dq/dk/dv without ever materialising the
# (B, H, N, N) probability matrix in HBM (the XLA VJP writes P *and* dP
# there — ~6.4GB per ViT-base layer at batch 64). Scores/softmax are
# recomputed per tile; dk/dv accumulate in fp32 VMEM scratch across
# q-blocks (grid's fastest axis) and spill once.
# ---------------------------------------------------------------------------


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     dk_acc, dv_acc, *, mask_mode: str, cond_len: int,
                     block_q: int, heads_per_slab: int, head_dim: int):
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    q = q_ref[0]                                # (bq, slab) bf16, pre-scaled
    k = k_ref[0]                                # (M, slab)
    v = v_ref[0]
    do = do_ref[0]                              # (bq, slab)

    @pl.when(j == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def probs(qh):
        s = jax.lax.dot_general(qh, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if mask_mode == "prefix_causal":
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
                + j * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            allowed = (cols <= rows) | ((rows < cond_len) & (cols < cond_len))
            s = jnp.where(allowed, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        return e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))   # (bq, M) f32

    def one_head(qh, doh):
        """qh: q with other-head lanes zeroed; doh: dO likewise.
        Returns (dq_full, dk_full, dv_full) as (rows, 128) with the other
        head's lanes garbage where noted (caller masks)."""
        p = probs(qh)
        dp = jax.lax.dot_general(doh, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta)).astype(q.dtype)                 # (bq, M) bf16
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, qh, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(p.astype(do.dtype), do,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return dq, dk, dv

    if heads_per_slab == 1:
        dq, dk, dv = one_head(q, do)
    else:
        q_heads = _split_slab_heads(q, head_dim, heads_per_slab)
        do_heads = _split_slab_heads(do, head_dim, heads_per_slab)
        grads = [one_head(qh, doh) for qh, doh in zip(q_heads, do_heads)]
        dq = _merge_slab_heads([g[0] for g in grads], head_dim)
        # dk contributions are already lane-clean (the q_heads zeroing
        # carries through ds @ q); dv needs the merge (p^T do spans every
        # head's lanes)
        dk = sum(g[1] for g in grads)
        dv = _merge_slab_heads([g[2] for g in grads], head_dim)

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_acc[...] += dk
    dv_acc[...] += dv

    @pl.when(j == nj - 1)
    def _flush():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _attention_packed_bwd_call(q3, k3, v3, do3, mask_mode, cond_len,
                               head_dim):
    b, n, hd = q3.shape
    m = k3.shape[1]
    slab = _slab_for(head_dim)
    heads_per_slab = slab // head_dim
    slabs = hd // slab
    # backward holds ~3 fp32 (bq, M) tiles per head live
    block_q = _packed_block_q(n, m, heads_per_slab * 2)
    grid = (b, slabs, cdiv(n, block_q))
    n_heads = hd // head_dim

    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, mask_mode=mask_mode,
                          cond_len=cond_len, block_q=block_q,
                          heads_per_slab=heads_per_slab, head_dim=head_dim),
        out_shape=[jax.ShapeDtypeStruct((b, n, hd), q3.dtype),
                   jax.ShapeDtypeStruct((b, m, hd), k3.dtype),
                   jax.ShapeDtypeStruct((b, m, hd), v3.dtype)],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, slab), lambda i, s, j: (i, j, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, slab), lambda i, s, j: (i, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, slab), lambda i, s, j: (i, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, slab), lambda i, s, j: (i, j, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, slab), lambda i, s, j: (i, j, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, slab), lambda i, s, j: (i, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, slab), lambda i, s, j: (i, 0, s),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((m, slab), jnp.float32),
                        pltpu.VMEM((m, slab), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n * m * hd * heads_per_slab,
            bytes_accessed=3 * (q3.size + k3.size + v3.size)
            * q3.dtype.itemsize,
            transcendentals=b * n_heads * n * m,
        ),
        interpret=interpret_mode(),
    )(q3, k3, v3, do3)
    return dq, dk, dv


def _attention_xla_packed(q3, k3, v3, mask_mode, cond_len, head_dim):
    """XLA twin of the packed kernel ((B, N, H*D), scale pre-folded into q)."""
    b, n, hd = q3.shape
    m = k3.shape[1]
    h = hd // head_dim
    out = _attention_xla(
        q3.reshape(b, n, h, head_dim).transpose(0, 2, 1, 3),
        k3.reshape(b, m, h, head_dim).transpose(0, 2, 1, 3),
        v3.reshape(b, m, h, head_dim).transpose(0, 2, 1, 3),
        1.0, mask_mode, cond_len)
    return out.transpose(0, 2, 1, 3).reshape(b, n, hd)


def _packed_local_ok(q3, k3, head_dim: int) -> bool:
    """Does this (possibly per-shard local) shape support the packed kernel?
    Head-dim sharding hands each shard a contiguous lane chunk; a chunk that
    is a multiple of the slab width holds whole slabs, so the unmodified
    kernel is correct on it."""
    b, n, hd = q3.shape
    m = k3.shape[1]
    return (hd % _slab_for(head_dim) == 0 and hd % head_dim == 0
            and _packed_supported(hd // head_dim, head_dim, n, m))


def _packed_fwd_impl(q3, k3, v3, mask_mode, cond_len, head_dim):
    if _packed_local_ok(q3, k3, head_dim):
        return _attention_packed_call(q3, k3, v3, mask_mode, cond_len,
                                      head_dim)
    return _attention_xla_packed(q3, k3, v3, mask_mode, cond_len, head_dim)


def _packed_bwd_impl(q3, k3, v3, do3, mask_mode, cond_len, head_dim):
    if _packed_local_ok(q3, k3, head_dim):
        return _attention_packed_bwd_call(q3, k3, v3, do3, mask_mode,
                                          cond_len, head_dim)
    _, vjp = jax.vjp(
        lambda a, b, c: _attention_xla_packed(a, b, c, mask_mode, cond_len,
                                              head_dim), q3, k3, v3)
    return vjp(do3)


# batch shards freely; the packed head axis (hd) shards on whole 128-lane
# slabs (local blocks falling off that grid use the XLA twin — still
# collective-free); softmax rows need the full key sequence.
_packed_fwd = partitioned(
    _packed_fwd_impl, "b n hd, b m hd, b m hd -> b n hd",
    need_replication=("n", "m"), static_argnums=(3, 4, 5))

_packed_bwd = partitioned(
    _packed_bwd_impl,
    "b n hd, b m hd, b m hd, b n hd -> b n hd, b m hd, b m hd",
    need_replication=("n", "m"), static_argnums=(4, 5, 6))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attention_fused_packed(q3, k3, v3, mask_mode, cond_len, head_dim):
    return _packed_fwd(q3, k3, v3, mask_mode, cond_len, head_dim)


def _attention_fused_packed_fwd(q3, k3, v3, mask_mode, cond_len, head_dim):
    o = _packed_fwd(q3, k3, v3, mask_mode, cond_len, head_dim)
    return o, (q3, k3, v3)


def _attention_fused_packed_bwd(mask_mode, cond_len, head_dim, res, g):
    q3, k3, v3 = res
    return _packed_bwd(q3, k3, v3, g.astype(q3.dtype), mask_mode, cond_len,
                       head_dim)


_attention_fused_packed.defvjp(_attention_fused_packed_fwd,
                               _attention_fused_packed_bwd)


# ---------------------------------------------------------------------------
# Fused attention -> output-projection -> residual-add kernel.
#
# In the transformer block, XLA must materialise the attention output in
# HBM (a Pallas custom call cannot be fused into the next dot's operand),
# then read it back for the projection GEMM, then run a third pass for the
# residual add: ~3 full activation round trips per layer plus a scheduling
# boundary. Here the projection accumulates INSIDE the attention kernel —
# the grid's innermost axis walks the lane slabs of one q-block, each step
# adds o_slab @ Wp[slab_rows] into a (block_q, hd_out) fp32 scratch, and
# the residual/bias fold in at the flush — the attention output never
# exists in HBM. Measured on the ViT-base headline step: see README.
#
# custom_vjp: the FORWARD-FOR-GRAD variant runs the UNFUSED pipeline (the
# packed attention kernel + an XLA projection) so the attention output is
# saved for dWp without recompute — training cost is identical to the
# unfused path; only the no-grad (inference) primal takes the fused kernel.
# ---------------------------------------------------------------------------


def _attn_proj_kernel(q_ref, k_ref, v_ref, wp_ref, bp_ref, res_ref, o_ref,
                      acc, *, mask_mode: str, cond_len: int, block_q: int,
                      heads_per_slab: int, head_dim: int, unroll_chunks: int):
    s_idx = pl.program_id(2)
    ns = pl.num_programs(2)
    qi = pl.program_id(1)

    @pl.when(s_idx == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    o_tile = _packed_attention_tile(
        q_ref[0], k_ref[0], v_ref[0], qi, mask_mode=mask_mode,
        cond_len=cond_len, block_q=block_q, heads_per_slab=heads_per_slab,
        head_dim=head_dim, m_valid=k_ref.shape[1],
        unroll_chunks=unroll_chunks)
    # cast to the compute dtype first — the XLA twin (and the unfused path)
    # projects the bf16 attention output, not the fp32 accumulator
    acc[...] += jax.lax.dot_general(
        o_tile.astype(q_ref.dtype), wp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(s_idx == ns - 1)
    def _flush():
        out = acc[...] + bp_ref[0].astype(jnp.float32) \
            + res_ref[0].astype(jnp.float32)
        o_ref[0] = out.astype(o_ref.dtype)


def _attention_proj_packed_call(q3, k3, v3, wp, bp, res, mask_mode, cond_len,
                                head_dim):
    import os
    b, n, hd = q3.shape
    m = k3.shape[1]
    ho = wp.shape[1]
    slab = _slab_for(head_dim)
    heads_per_slab = slab // head_dim
    slabs = hd // slab
    # fp32 score tiles + the (block_q, ho) accumulator share the budget
    block_q = _packed_block_q(n, m, heads_per_slab)
    while block_q > 128 and block_q * ho * 4 > 4 * 1024 * 1024:
        block_q //= 2
    grid = (b, cdiv(n, block_q), slabs)
    n_heads = hd // head_dim
    unroll_chunks = int(os.environ.get("ENHANCING_TPU_ATTN_UNROLL", "4"))

    return pl.pallas_call(
        functools.partial(_attn_proj_kernel, mask_mode=mask_mode,
                          cond_len=cond_len, block_q=block_q,
                          heads_per_slab=heads_per_slab, head_dim=head_dim,
                          unroll_chunks=unroll_chunks),
        out_shape=jax.ShapeDtypeStruct((b, n, ho), q3.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, slab), lambda i, j, s: (i, j, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, slab), lambda i, j, s: (i, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, slab), lambda i, j, s: (i, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((slab, ho), lambda i, j, s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ho), lambda i, j, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, ho), lambda i, j, s: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, ho), lambda i, j, s: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_q, ho), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * m * hd * heads_per_slab + 2 * b * n * hd * ho,
            bytes_accessed=(q3.size + k3.size + v3.size + 2 * b * n * ho
                            + wp.size) * q3.dtype.itemsize,
            transcendentals=b * n_heads * n * m,
        ),
        interpret=interpret_mode(),
    )(q3, k3, v3, wp, bp.reshape(1, -1), res)


def _attention_proj_xla(q3, k3, v3, wp, bp, res, mask_mode, cond_len,
                        head_dim):
    """XLA twin: packed attention -> bf16 projection (fp32 accumulation +
    bias + residual in fp32, cast to the input dtype) — numerics identical
    to the kernel's flush."""
    o = _attention_xla_packed(q3, k3, v3, mask_mode, cond_len, head_dim)
    out = jnp.dot(o, wp.astype(o.dtype),
                  preferred_element_type=jnp.float32)
    out = out + bp.astype(jnp.float32) + res.astype(jnp.float32)
    return out.astype(q3.dtype)


def _attn_proj_supported(q3, k3, wp) -> bool:
    # Wp slab rows stay resident per grid step and the fp32 accumulator is
    # bounded by the block_q shrink loop — cap hd_out so both fit VMEM.
    return (wp.shape[0] == q3.shape[2] and wp.shape[1] % LANES == 0
            and wp.shape[1] <= 4096)


def _attn_proj_fwd_impl(q3, k3, v3, wp, bp, res, mask_mode, cond_len,
                        head_dim):
    if _packed_local_ok(q3, k3, head_dim) and _attn_proj_supported(q3, k3, wp):
        return _attention_proj_packed_call(q3, k3, v3, wp, bp, res,
                                           mask_mode, cond_len, head_dim)
    return _attention_proj_xla(q3, k3, v3, wp, bp, res, mask_mode, cond_len,
                               head_dim)


# batch shards; the packed head axis and the projection output axis must be
# whole per shard (the projection contracts the full hd).
_attn_proj_part = partitioned(
    _attn_proj_fwd_impl, "b n hd, b m hd, b m hd, hd ho, ho, b n ho -> b n ho",
    need_replication=("n", "m", "hd", "ho"), static_argnums=(6, 7, 8))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _attention_proj_fused(q3, k3, v3, wp, bp, res, mask_mode, cond_len,
                          head_dim):
    return _attn_proj_part(q3, k3, v3, wp, bp, res, mask_mode, cond_len,
                           head_dim)


def _attention_proj_fused_fwd(q3, k3, v3, wp, bp, res, mask_mode, cond_len,
                              head_dim):
    # unfused forward: saves the attention output for dWp (no recompute);
    # identical cost to the pre-fusion training path
    o_attn = _packed_fwd(q3, k3, v3, mask_mode, cond_len, head_dim)
    out = jnp.dot(o_attn, wp.astype(o_attn.dtype),
                  preferred_element_type=jnp.float32)
    out = (out + bp.astype(jnp.float32)
           + res.astype(jnp.float32)).astype(q3.dtype)
    return out, (q3, k3, v3, wp, o_attn)


def _attention_proj_fused_bwd(mask_mode, cond_len, head_dim, resids, g):
    q3, k3, v3, wp, o_attn = resids
    g32 = g.astype(jnp.float32)
    dbp = jnp.sum(g32, axis=(0, 1))
    dwp = jnp.einsum("bnh,bno->ho", o_attn.astype(jnp.float32), g32)
    do = jnp.dot(g, wp.T.astype(g.dtype),
                 preferred_element_type=jnp.float32).astype(q3.dtype)
    dq3, dk3, dv3 = _packed_bwd(q3, k3, v3, do, mask_mode, cond_len, head_dim)
    return dq3, dk3, dv3, dwp.astype(wp.dtype), dbp, g


_attention_proj_fused.defvjp(_attention_proj_fused_fwd,
                             _attention_proj_fused_bwd)


def attention_proj_packed(q: jax.Array, k: jax.Array, v: jax.Array,
                          wp: jax.Array, bp: jax.Array, residual: jax.Array,
                          *, scale: Optional[float] = None,
                          mask_mode: str = "none", cond_len: int = 0,
                          impl: str | None = "auto") -> jax.Array:
    """residual + (attention(q, k, v) reshaped to (B, N, H*D)) @ wp + bp,
    with the projection and residual folded into the attention kernel.

    q, k, v: (B, N, H, D); wp: (H*D, dim_out); bp: (dim_out,);
    residual: (B, N, dim_out). Falls back to the unfused packed kernel +
    XLA projection when the shape misses the packed grid, and to pure XLA
    off-TPU.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, n, h, d = q.shape
    m = k.shape[1]
    q3 = (q * jnp.asarray(scale, q.dtype)).reshape(b, n, h * d)
    k3 = k.reshape(b, m, h * d)
    v3 = v.reshape(b, m, h * d)
    if use_pallas(impl) and n >= 8 and _packed_supported(h, d, n, m):
        return _attention_proj_fused(q3, k3, v3, wp.astype(q.dtype), bp,
                                     residual, mask_mode, int(cond_len), d)
    return _attention_proj_xla(q3, k3, v3, wp.astype(q.dtype), bp, residual,
                               mask_mode, int(cond_len), d)


# ---------------------------------------------------------------------------
# Prefix-aware single-token decode attention over a packed KV cache.
#
# The autoregressive decode reads a (ctx, H*D) KV cache of which only the
# first ``cur_len`` rows are valid. An XLA implementation DMAs the WHOLE
# buffer every token (the mask is applied after the read), so decode HBM
# traffic is O(ctx) per step regardless of fill. Here the kernel grid walks
# cache chunks with ``cur_len`` as a scalar-prefetch operand: the k/v
# BlockSpec index maps clamp chunk indices past the filled prefix to the
# last valid chunk, so consecutive grid steps map to the same block and
# Pallas elides the DMA — traffic scales with cur_len, not ctx. Compute for
# the skipped chunks is gated out with pl.when.
#
# The current token's k/v column is NOT in the cache (the sampling loop
# keeps the cache read-only inside the layer scan; see
# models/stage2/layers.py decode); it arrives as a separate (B, HD) input
# folded into the online softmax at the flush step.
# ---------------------------------------------------------------------------


def _decode_xla(q3, kc, vc, kn, vn, cur_len, head_dim):
    """Reference path. q3/kn/vn: (B, HD) — q3 pre-scaled; kc/vc: (B, M, HD).
    ``cur_len``: int32 scalar, or a (B,) vector of per-row valid lengths
    (ragged batch — continuous-batching serving)."""
    b, m, hd = kc.shape
    h = hd // head_dim
    qh = q3.reshape(b, h, 1, head_dim).astype(jnp.float32)
    kh = kc.reshape(b, m, h, head_dim).transpose(0, 2, 1, 3).astype(jnp.float32)
    vh = vc.reshape(b, m, h, head_dim).transpose(0, 2, 1, 3)
    knh = kn.reshape(b, h, 1, head_dim).astype(jnp.float32)
    vnh = vn.reshape(b, h, 1, head_dim)

    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
    pos = jnp.arange(m)
    bound = (jnp.asarray(cur_len, jnp.int32)[:, None, None, None]
             if jnp.ndim(cur_len) else cur_len)
    s = jnp.where(pos[None, None, None, :] < bound, s, NEG_INF)
    s_self = jnp.sum(qh * knh, axis=-1, keepdims=True)          # (B,H,1,1)
    mx = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_self)
    e = jnp.exp(s - mx)
    e_self = jnp.exp(s_self - mx)
    denom = jnp.sum(e, axis=-1, keepdims=True) + e_self
    y = jnp.einsum("bhqk,bhkd->bhqd", e.astype(vh.dtype), vh)
    y = (y + e_self.astype(vh.dtype) * vnh) / denom.astype(vh.dtype)
    return y.transpose(0, 2, 1, 3).reshape(b, hd).astype(q3.dtype)


def _decode_kernel(sc_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref, *rest,
                   block_k: int, head_dim: int,
                   n_heads: int, block_b: int, nb: int,
                   quantized: bool = False):
    """Grid (B/block_b, head_splits, chunks): each program owns a
    (block_b, block_k, heads_slab*D) cache tile — the head axis splits hd
    into independent slabs when a whole-hd tile would blow the 16MB scoped
    VMEM limit (see _decode_blocks). Heads are handled in ONE matmul per
    row per chunk by scoring
    with a block-diagonal masked-q matrix: row h of (H, HD) keeps only head
    h's lanes of q, so (H, HD) @ (HD, block_k) contracts to the (H, block_k)
    per-head score matrix (the zeroed lanes contribute nothing). Online
    softmax runs vectorized over the H sublane rows; at the flush the
    (H, HD) per-head outputs collapse to (1, HD) through the same mask.

    ``block_b`` batch rows share one program: per-program compute is a few
    thousand MXU cycles against a ~100us-scale grid-step + DMA issue
    overhead, so per-row grid programs made the decode step overhead-bound
    (measured 4.5k tok/s at b8 scaling DOWN to 3.3k at b64 — time nearly
    linear in B, far off the cache-read roofline).

    Prefix lengths are PER ROW (ragged batches for continuous-batching
    serving; a scalar cur_len is broadcast by the wrapper). Prefetch layout
    ``sc = [layer] ++ per-block max(nb entries) ++ per-row cur (padded)``:
    the index map bounds each block's chunk DMAs by its rows' max; rows
    whose own cur is shorter gate the dead chunks out with pl.when.

    ``quantized``: k/v cache chunks are INT8 with per-row scales riding as
    two extra (1, block_b, block_k) f32 operands — score columns rescale by
    k's row scale and the probability columns by v's before the PV matmul
    (exact in the scale factorization). Halves the cache-read HBM traffic,
    which dominates decode at large batch (README decode table)."""
    if quantized:
        ks_ref, vs_ref, o_ref, m_acc, l_acc, o_acc = rest
    else:
        o_ref, m_acc, l_acc, o_acc = rest
    ib = pl.program_id(0)
    # axis 1 is the head-split (blocks pre-sliced by the index maps —
    # n_heads/head_mask here are already per-slab); axis 2 walks key chunks
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    hd_total = q_ref.shape[-1]
    lane_head = jax.lax.broadcasted_iota(
        jnp.int32, (n_heads, hd_total), 1) // head_dim
    row = jax.lax.broadcasted_iota(jnp.int32, (n_heads, hd_total), 0)
    head_mask = (lane_head == row).astype(jnp.float32)       # (H, HD)

    @pl.when(j == 0)
    def _init():
        m_acc[...] = jnp.full_like(m_acc, NEG_INF)
        l_acc[...] = jnp.zeros_like(l_acc)
        o_acc[...] = jnp.zeros_like(o_acc)

    for i in range(block_b):
        qm = q_ref[i].astype(jnp.float32) * head_mask         # (H, HD)
        sl = slice(i * n_heads, (i + 1) * n_heads)
        cur_len = sc_ref[1 + nb + ib * block_b + i]

        @pl.when(j * block_k < cur_len)
        def _chunk(qm=qm, sl=sl, i=i, cur_len=cur_len):
            k = k_ref[0, i]                       # (block_k, HD)
            v = v_ref[0, i]
            # compute dtype: int8 cache chunks cast UP to the query's dtype
            cd = q_ref.dtype if quantized else k.dtype
            # Mosaic's default-precision f32 dot runs single-pass bf16 on
            # the MXU (~1e-2 rel. error); force exact passes for f32
            # inputs. The production bf16 cache path is unaffected.
            prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
                    else None)
            s = jax.lax.dot_general(qm.astype(cd), k.astype(cd),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
            if quantized:
                s = s * ks_ref[0, i].reshape(1, -1)   # per-key row scale
            pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
                + j * block_k
            s = jnp.where(pos < cur_len, s, NEG_INF)  # (H, block_k)
            m_old = m_acc[sl]                         # (H, 1)
            m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_old - m_new)
            e = jnp.exp(s - m_new)
            m_acc[sl] = m_new
            l_acc[sl] = l_acc[sl] * alpha \
                + jnp.sum(e, axis=-1, keepdims=True)
            if quantized:
                e = e * vs_ref[0, i].reshape(1, -1)   # per-value row scale
            contrib = jax.lax.dot_general(e.astype(cd), v.astype(cd),
                                          (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32,
                                          precision=prec)
            o_acc[sl] = o_acc[sl] * alpha + contrib   # (H, HD)

        @pl.when(j == nj - 1)
        def _flush(qm=qm, sl=sl, i=i):
            kn = kn_ref[i].astype(jnp.float32)        # (1, HD)
            vn = vn_ref[i].astype(jnp.float32)
            s_self = jnp.sum(qm * kn, axis=-1, keepdims=True)    # (H, 1)
            m_fin = jnp.maximum(m_acc[sl], s_self)
            alpha = jnp.exp(m_acc[sl] - m_fin)
            e_self = jnp.exp(s_self - m_fin)
            l_fin = l_acc[sl] * alpha + e_self
            o = (o_acc[sl] * alpha + e_self * vn) / l_fin        # (H, HD)
            out = jnp.sum(o * head_mask, axis=0, keepdims=True)  # (1, HD)
            o_ref[i] = out.astype(o_ref.dtype)


def _decode_blocks(b: int, m: int, hd: int, block_k: int,
                   itemsize: int = 2, sublane8: bool = False,
                   n_heads: int = 1, head_dim: int | None = None
                   ) -> tuple[int, int, int]:
    """(block_b, block_k, n_head_splits) minimizing grid steps: the most
    batch rows per program whose per-program VMEM fits the compiler's 16MB
    scoped limit — a smaller key chunk is worth it when it buys more rows
    per program (256KB-scale DMAs already run at full stride efficiency;
    grid-step count is the overhead that dominated the per-row kernel).
    Prefers divisors of b so no program carries padded rows.

    VMEM model (the terms that scale with the block): double-buffered k+v
    tiles (2 * 2 * block_k * hd_slab * itemsize * block_b) plus the f32
    online-softmax output accumulator (block_b * heads_slab * hd_slab * 4).
    14.5MB leaves headroom for q/kn/vn/out blocks and Mosaic stack inside
    the 16MB limit (measured at flagship hd 6144 int8: (8 rows x 128 keys)
    whole-hd is 25.2MB of k+v and fails to compile; (4 x 128) = 14.2MB
    total compiles — the b4 184 tok/s row).

    ``n_head_splits`` (nh): heads are independent, so when whole-hd tiles
    cannot fit (big-hd x big-b: flagship 6144d at b>=8) the grid gains a
    head axis — each program owns heads_slab = n_heads/nh heads and the
    (block_k, hd/nh) k+v slab feeding them; total cache DMA is unchanged
    (every lane still read once per step). Slabs stay 128-lane multiples.

    ``sublane8``: restrict block_b to multiples of 8 (or b itself) — the
    quantized path's (1, block_b, block_k) f32 scale blocks put block_b on
    the sublane axis, where Mosaic requires 8-multiples or the full dim
    (block_k likewise stays >= 128 there for the lane axis)."""
    limit = int(14.5 * 1024 * 1024)
    head_dim = head_dim or hd
    best_steps = None
    best = None
    nh_cands = [x for x in (1, 2, 4, 8, 16)
                if x <= n_heads and n_heads % x == 0
                and (n_heads // x) * head_dim % 128 == 0] or [1]
    for nh in nh_cands:
        hd_slab = (n_heads // nh) * head_dim if nh > 1 else hd
        for bk in dict.fromkeys((min(block_k, m), min(128, m))):
            for cand in range(b, 0, -1):
                if b % cand or (sublane8 and cand % 8 and cand != b):
                    continue
                kv = 2 * 2 * bk * hd_slab * itemsize * cand
                acc = cand * max(n_heads // nh, 1) * hd_slab * 4
                if kv + acc > limit:
                    continue
                steps = cdiv(b, cand) * nh * cdiv(m, bk)
                if best_steps is None or steps < best_steps:
                    best, best_steps = (cand, bk, nh), steps
                break  # largest feasible block_b for this (nh, bk)
    if best is None:
        # nothing fits even at max head split: smallest legal block —
        # correctness over throughput (sublane8 requires block_b to be a
        # multiple of 8 OR b itself; pick whichever is smaller)
        block_b = (8 if b % 8 == 0 else b) if sublane8 else 1
        best = (block_b, min(128, m), max(nh_cands))
    return best


def _decode_pallas(q3, kc, vc, kn, vn, cur_len, head_dim, block_k=256,
                   layer=None, ks=None, vs=None):
    """kc/vc: (B, M, HD), or a stacked (L, B, M, HD) cache with ``layer``
    (traced int32) selecting the live layer INSIDE the BlockSpec index map —
    the kernel DMAs only that layer's chunks, so callers never slice the
    stack (a host-level slice materializes a full (B, M, HD) copy per layer
    per decoded token; measured 4.3k tok/s -> the scan-layers decode was
    spending ~85% of its time on those copies).

    ``ks``/``vs``: per-row dequant scales (L, B, M) f32 for an INT8 cache
    (both or neither)."""
    if kc.ndim == 3:
        kc = kc[None]
        vc = vc[None]
        layer = jnp.int32(0)
    quantized = ks is not None
    lnum, b, m, hd = kc.shape
    n_heads = hd // head_dim
    block_b, block_k, nh = _decode_blocks(b, m, hd, block_k,
                                          itemsize=kc.dtype.itemsize,
                                          sublane8=quantized,
                                          n_heads=n_heads,
                                          head_dim=head_dim)
    heads_slab = n_heads // nh
    hd_slab = heads_slab * head_dim
    nj = cdiv(m, block_k)
    nb = cdiv(b, block_b)
    # prefetch layout: [layer] ++ per-block chunk bound ++ per-row cur
    # (scalar cur_len broadcasts to all rows — the lockstep sampler)
    cur_vec = jnp.broadcast_to(
        jnp.asarray(cur_len, jnp.int32).reshape(-1), (b,))
    assert nb * block_b == b, (b, block_b)  # _decode_blocks picks divisors
    blockmax = jnp.max(cur_vec.reshape(nb, block_b), axis=1)
    sc = jnp.concatenate([jnp.asarray(layer, jnp.int32).reshape(1),
                          blockmax, cur_vec])

    def kv_index(i, h, j, sc_ref):
        # index maps receive (grid indices..., scalar-prefetch refs...);
        # chunks past the block's filled prefix clamp to its last valid
        # chunk, so consecutive grid steps map to the same block and the
        # DMA is elided
        last_valid = jnp.maximum(sc_ref[1 + i] - 1, 0) // block_k
        return (sc_ref[0], i, jnp.minimum(j, last_valid), h)

    def scale_index(i, h, j, sc_ref):
        last_valid = jnp.maximum(sc_ref[1 + i] - 1, 0) // block_k
        return (sc_ref[0], i, jnp.minimum(j, last_valid))

    def row_index(i, h, j, sc_ref):
        return (i, 0, h)

    in_specs = [
        pl.BlockSpec((block_b, 1, hd_slab), row_index,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, 1, hd_slab), row_index,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, 1, hd_slab), row_index,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_b, block_k, hd_slab), kv_index,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_b, block_k, hd_slab), kv_index,
                     memory_space=pltpu.VMEM),
    ]
    args = [sc, q3[:, None, :], kn[:, None, :], vn[:, None, :], kc, vc]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, block_b, block_k), scale_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, block_k), scale_index,
                         memory_space=pltpu.VMEM),
        ]
        args += [ks, vs]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # j innermost: the online-softmax accumulators integrate over key
        # chunks per (rows, head-slab) before the flush
        grid=(nb, nh, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, 1, hd_slab), row_index,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_b * heads_slab, 1), jnp.float32),
            pltpu.VMEM((block_b * heads_slab, 1), jnp.float32),
            pltpu.VMEM((block_b * heads_slab, hd_slab), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel, block_k=block_k, head_dim=head_dim,
                          n_heads=heads_slab, block_b=block_b, nb=nb,
                          quantized=quantized),
        out_shape=jax.ShapeDtypeStruct((b, 1, hd), q3.dtype),
        grid_spec=grid_spec,
        interpret=interpret_mode(),
    )(*args)
    return out[:, 0, :]


def _dequant_cache(kc, vc, ks, vs, dtype):
    """XLA-twin dequant of an int8 cache with per-row scales."""
    k = kc.astype(jnp.float32) * ks[..., None].astype(jnp.float32)
    v = vc.astype(jnp.float32) * vs[..., None].astype(jnp.float32)
    return k.astype(dtype), v.astype(dtype)


def _decode_supported(hd: int, head_dim: int, m: int) -> bool:
    """The decode kernel scores every head in one masked (H, HD) matmul —
    its lane masks are built from iota//head_dim, so ANY head_dim dividing
    hd works (incl. the RQ prior's 96/192); only the packed hd axis needs
    Mosaic's 128-lane tiling and the cache enough rows to chunk."""
    return hd % LANES == 0 and hd % head_dim == 0 and m >= 128


def _decode_impl(q3, kc, vc, kn, vn, cur, head_dim):
    """Local-shape dispatch (cur: (1,) int32 so the partitioner sees an
    array operand, not a traced scalar)."""
    m, hd = kc.shape[1], kc.shape[2]
    if _decode_supported(hd, head_dim, m):
        return _decode_pallas(q3, kc, vc, kn, vn, cur[0], head_dim)
    return _decode_xla(q3, kc, vc, kn, vn, cur[0], head_dim)


def _decode_stack_impl(q3, kc, vc, kn, vn, sc, head_dim):
    """Stacked-cache dispatch: kc/vc (L, B, M, HD); sc = [cur_len, layer]."""
    m, hd = kc.shape[2], kc.shape[3]
    if _decode_supported(hd, head_dim, m):
        return _decode_pallas(q3, kc, vc, kn, vn, sc[0], head_dim,
                              layer=sc[1])
    k = jax.lax.dynamic_index_in_dim(kc, sc[1], 0, keepdims=False)
    v = jax.lax.dynamic_index_in_dim(vc, sc[1], 0, keepdims=False)
    return _decode_xla(q3, k, v, kn, vn, sc[0], head_dim)


def _decode_ragged_impl(q3, kc, vc, kn, vn, cur_b, head_dim):
    """Per-row cur_len (B,) — continuous-batching serving."""
    m, hd = kc.shape[1], kc.shape[2]
    if _decode_supported(hd, head_dim, m):
        return _decode_pallas(q3, kc, vc, kn, vn, cur_b, head_dim)
    return _decode_xla(q3, kc, vc, kn, vn, cur_b, head_dim)


def _decode_stack_ragged_impl(q3, kc, vc, kn, vn, layer, cur_b, head_dim):
    m, hd = kc.shape[2], kc.shape[3]
    if _decode_supported(hd, head_dim, m):
        return _decode_pallas(q3, kc, vc, kn, vn, cur_b, head_dim,
                              layer=layer[0])
    k = jax.lax.dynamic_index_in_dim(kc, layer[0], 0, keepdims=False)
    v = jax.lax.dynamic_index_in_dim(vc, layer[0], 0, keepdims=False)
    return _decode_xla(q3, k, v, kn, vn, cur_b, head_dim)


def _decode_stack_q_impl(q3, kc, vc, ks, vs, kn, vn, sc, head_dim):
    """Stacked INT8 cache with per-row scales; sc = [cur_len, layer]."""
    m, hd = kc.shape[2], kc.shape[3]
    if _decode_supported(hd, head_dim, m) and m % 128 == 0:
        return _decode_pallas(q3, kc, vc, kn, vn, sc[0], head_dim,
                              layer=sc[1], ks=ks, vs=vs)
    k = jax.lax.dynamic_index_in_dim(kc, sc[1], 0, keepdims=False)
    v = jax.lax.dynamic_index_in_dim(vc, sc[1], 0, keepdims=False)
    k, v = _dequant_cache(
        k, v, jax.lax.dynamic_index_in_dim(ks, sc[1], 0, keepdims=False),
        jax.lax.dynamic_index_in_dim(vs, sc[1], 0, keepdims=False),
        q3.dtype)
    return _decode_xla(q3, k, v, kn, vn, sc[0], head_dim)


def _decode_stack_q_ragged_impl(q3, kc, vc, ks, vs, kn, vn, layer, cur_b,
                                head_dim):
    m, hd = kc.shape[2], kc.shape[3]
    if _decode_supported(hd, head_dim, m) and m % 128 == 0:
        return _decode_pallas(q3, kc, vc, kn, vn, cur_b, head_dim,
                              layer=layer[0], ks=ks, vs=vs)
    k = jax.lax.dynamic_index_in_dim(kc, layer[0], 0, keepdims=False)
    v = jax.lax.dynamic_index_in_dim(vc, layer[0], 0, keepdims=False)
    k, v = _dequant_cache(
        k, v,
        jax.lax.dynamic_index_in_dim(ks, layer[0], 0, keepdims=False),
        jax.lax.dynamic_index_in_dim(vs, layer[0], 0, keepdims=False),
        q3.dtype)
    return _decode_xla(q3, k, v, kn, vn, cur_b, head_dim)


# batch and whole-head chunks of hd shard freely (tp decode); the cache
# length axis m must be local in full for the online softmax.
_decode_part = partitioned(
    _decode_impl, "b hd, b m hd, b m hd, b hd, b hd, u -> b hd",
    need_replication=("m", "u"), static_argnums=(6,))

# the layer axis l rides whole (it is indexed, not computed over)
_decode_stack_part = partitioned(
    _decode_stack_impl, "b hd, l b m hd, l b m hd, b hd, b hd, u -> b hd",
    need_replication=("l", "m", "u"), static_argnums=(6,))

# ragged variants: the per-row length vector shards WITH the batch rows
_decode_ragged_part = partitioned(
    _decode_ragged_impl, "b hd, b m hd, b m hd, b hd, b hd, b -> b hd",
    need_replication=("m",), static_argnums=(6,))

_decode_stack_ragged_part = partitioned(
    _decode_stack_ragged_impl,
    "b hd, l b m hd, l b m hd, b hd, b hd, u, b -> b hd",
    need_replication=("l", "m", "u"), static_argnums=(7,))

# int8-cache variants: the per-row scale stacks shard with batch like the
# caches themselves
_decode_stack_q_part = partitioned(
    _decode_stack_q_impl,
    "b hd, l b m hd, l b m hd, l b m, l b m, b hd, b hd, u -> b hd",
    need_replication=("l", "m", "u"), static_argnums=(8,))

_decode_stack_q_ragged_part = partitioned(
    _decode_stack_q_ragged_impl,
    "b hd, l b m hd, l b m hd, l b m, l b m, b hd, b hd, u, b -> b hd",
    need_replication=("l", "m", "u"), static_argnums=(9,))


def decode_attention(q3: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                     k_new: jax.Array, v_new: jax.Array, cur_len: jax.Array,
                     *, head_dim: int, impl: str | None = "auto") -> jax.Array:
    """Single-token cached decode attention, packed (B, H*D) layout.

    Args:
      q3: (B, H*D) query for the current token, softmax scale pre-folded in.
      k_cache, v_cache: (B, ctx, H*D); only rows < cur_len are valid.
      k_new, v_new: (B, H*D) the current token's key/value (not yet in cache).
      cur_len: int32 scalar — number of valid cache rows — or a (B,) vector
        of per-row lengths (ragged batch: continuous-batching serving, where
        every row is at a different position in its own sequence).
      head_dim: per-head feature size.

    Replaces the reference's per-step torch.cat KV concatenation
    (enhancing/modules/stage2/layers.py:68-88). On TPU with 128-aligned
    H*D and any D dividing it (64/96/128/192/384 — both shipped priors)
    this runs the prefix-aware Pallas kernel; cache chunks past cur_len
    are neither DMA'd nor computed (per grid block, bounded by the block's
    longest row in the ragged case).
    """
    b, m, hd = k_cache.shape
    if use_pallas(impl) and _decode_supported(hd, head_dim, m):
        if jnp.ndim(cur_len):
            cur = jnp.asarray(cur_len, jnp.int32)
            return _decode_ragged_part(q3, k_cache, v_cache, k_new, v_new,
                                       cur, head_dim)
        cur = jnp.asarray(cur_len, jnp.int32).reshape(1)
        return _decode_part(q3, k_cache, v_cache, k_new, v_new, cur, head_dim)
    return _decode_xla(q3, k_cache, v_cache, k_new, v_new, cur_len, head_dim)


def decode_attention_stacked(q3: jax.Array, k_stack: jax.Array,
                             v_stack: jax.Array, k_new: jax.Array,
                             v_new: jax.Array, cur_len: jax.Array,
                             layer: jax.Array, *, head_dim: int,
                             k_scale: jax.Array | None = None,
                             v_scale: jax.Array | None = None,
                             impl: str | None = "auto") -> jax.Array:
    """``decode_attention`` against one layer of a stacked (L, B, ctx, H*D)
    cache, WITHOUT the caller slicing the stack.

    The layer index is resolved inside the Pallas BlockSpec index map (a
    scalar-prefetch operand), so only that layer's live chunks are DMA'd.
    This is the layer-scan decode path: slicing the stack at the XLA level
    (lax.scan xs slicing, or dynamic_index before the kernel) materializes
    a full (B, ctx, H*D) copy of k AND v per layer per decoded token —
    measured ~85% of the 1024d x 16L sampler's step time.

    ``cur_len``: scalar, or a (B,) per-row length vector (ragged batch).

    ``k_scale``/``v_scale``: (L, B, ctx) f32 per-row scales when the cache
    stacks are INT8 (halves decode cache-read traffic; the kernel rescales
    score and probability columns in VMEM — exact factorization). The new
    token's k_new/v_new stay full precision."""
    lnum, b, m, hd = k_stack.shape
    quantized = k_scale is not None
    if use_pallas(impl) and _decode_supported(hd, head_dim, m):
        if quantized:
            if jnp.ndim(cur_len):
                return _decode_stack_q_ragged_part(
                    q3, k_stack, v_stack, k_scale, v_scale, k_new, v_new,
                    jnp.asarray(layer, jnp.int32).reshape(1),
                    jnp.asarray(cur_len, jnp.int32), head_dim)
            sc = jnp.stack([jnp.asarray(cur_len, jnp.int32).reshape(()),
                            jnp.asarray(layer, jnp.int32).reshape(())])
            return _decode_stack_q_part(q3, k_stack, v_stack, k_scale,
                                        v_scale, k_new, v_new, sc, head_dim)
        if jnp.ndim(cur_len):
            return _decode_stack_ragged_part(
                q3, k_stack, v_stack, k_new, v_new,
                jnp.asarray(layer, jnp.int32).reshape(1),
                jnp.asarray(cur_len, jnp.int32), head_dim)
        sc = jnp.stack([jnp.asarray(cur_len, jnp.int32).reshape(()),
                        jnp.asarray(layer, jnp.int32).reshape(())])
        return _decode_stack_part(q3, k_stack, v_stack, k_new, v_new, sc,
                                  head_dim)
    k = jax.lax.dynamic_index_in_dim(k_stack, layer, 0, keepdims=False)
    v = jax.lax.dynamic_index_in_dim(v_stack, layer, 0, keepdims=False)
    if quantized:
        k, v = _dequant_cache(
            k, v,
            jax.lax.dynamic_index_in_dim(k_scale, layer, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(v_scale, layer, 0, keepdims=False),
            q3.dtype)
    return _decode_xla(q3, k, v, k_new, v_new, cur_len, head_dim)


def multihead_attention_bnhd(q: jax.Array, k: jax.Array, v: jax.Array, *,
                             scale: Optional[float] = None,
                             mask_mode: str = "none", cond_len: int = 0,
                             impl: str | None = "auto") -> jax.Array:
    """Attention over (batch, seq, heads, head_dim) input layout.

    On TPU with slab-compatible head dims (D % 128 == 0 — incl. the GPT
    prior's 384 — or 128 % D == 0, e.g. 64) this dispatches to the packed
    slab kernel, consuming the (B, N, H*D) projection layout directly —
    zero layout transposes. Other D (the RQ prior's 96 and 192) are
    zero-padded per head to the next 128 multiple and run the same kernel:
    padded q/k lanes add 0 to every score and padded v lanes produce 0
    output lanes that are sliced off, so the math is exact at 1.33x the
    score FLOPs. The softmax scale is folded into q here (an O(N*HD)
    elementwise op XLA fuses into the projection); its gradient flows
    through this scaling outside the custom_vjp. Remaining shapes fall
    back to the (B,H,N,D) fused kernel with XLA transposes, then pure XLA.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, n, h, d = q.shape
    m = k.shape[1]
    if use_pallas(impl) and n >= 8:
        if _packed_supported(h, d, n, m):
            q3 = (q * jnp.asarray(scale, q.dtype)).reshape(b, n, h * d)
            out = _attention_fused_packed(q3, k.reshape(b, m, h * d),
                                          v.reshape(b, m, h * d),
                                          mask_mode, int(cond_len), d)
            return out.reshape(b, n, h, d)
        d_pad = cdiv(d, LANES) * LANES
        if d_pad != d and _packed_supported(h, d_pad, n, m):
            pad = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
            qp = jnp.pad(q * jnp.asarray(scale, q.dtype), pad)
            kp = jnp.pad(k, pad)
            vp = jnp.pad(v, pad)
            out = _attention_fused_packed(
                qp.reshape(b, n, h * d_pad), kp.reshape(b, m, h * d_pad),
                vp.reshape(b, m, h * d_pad), mask_mode, int(cond_len), d_pad)
            return out.reshape(b, n, h, d_pad)[..., :d]
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        out = _attention_fused(qt, kt, vt, float(scale), mask_mode,
                               int(cond_len))
        return out.transpose(0, 2, 1, 3)
    return _attention_xla_bnhd(q, k, v, float(scale), mask_mode, int(cond_len))
