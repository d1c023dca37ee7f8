"""GPipe-style pipeline parallelism for the stage-2 priors, TPU-native.

The reference has no pipeline parallelism (SURVEY §2.9 — DDP is its entire
distribution story). This module adds it the TPU way: no per-stage
processes, no send/recv framework — ONE jitted SPMD program where

- the scan-stacked block parameters (leading layer axis L) are sharded
  ``P('pipe')`` over the mesh's pipe axis, so each of the S stages holds
  L/S contiguous layers — pipeline stage assignment IS a sharding
  annotation;
- a ``shard_map`` manual only over the pipe axis runs the classic GPipe
  schedule as a ``lax.scan`` over M + S - 1 ticks: every tick each stage
  applies its local layers to its current microbatch and ``ppermute``s the
  activation to the next stage over ICI. The data/model mesh axes stay
  *auto*, so batch data-parallelism and Megatron tensor parallelism of the
  per-layer matmuls compose with the pipeline unchanged;
- reverse-mode AD differentiates straight through the schedule (the
  transpose of ``ppermute`` is the reverse ``ppermute``), giving the
  backward pipeline for free — no hand-written 1F1B machinery.

The pipeline bubble is the usual (S-1)/(M+S-1) fraction; pick
``n_microbatches`` >= 4*S to keep it small.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import PIPE_AXIS


def stage_params_specs(stacked_params: Any) -> Any:
    """P('pipe') on the leading (layer) axis of every stacked-block leaf."""
    return jax.tree.map(
        lambda l: P(*([PIPE_AXIS] + [None] * (l.ndim - 1))), stacked_params)


def place_stage_params(mesh: Mesh, stacked_params: Any) -> Any:
    return jax.tree.map(
        lambda l, s: jax.device_put(l, NamedSharding(mesh, s)),
        stacked_params, stage_params_specs(stacked_params))


def pipeline_blocks(block_module, stacked_params: Any, x: jax.Array, *,
                    mesh: Mesh, n_microbatches: int) -> jax.Array:
    """Run ``x`` through L stacked blocks, pipelined over the mesh pipe axis.

    Args:
      block_module: an UNSCANNED flax block whose ``apply({'params': p}, h)``
        maps (mb, T, C) -> (mb, T, C); ``p`` is one layer's param tree.
      stacked_params: the nn.scan-stacked tree (leading axis L on every
        leaf), sharded or shardable ``P('pipe')`` on that axis.
      x: (B, T, C) input activations; B must divide into n_microbatches.
      mesh: mesh with a '{pipe}' axis (make_mesh(pipe=S)).
      n_microbatches: GPipe M. The schedule runs M + S - 1 ticks.

    Returns (B, T, C), replicated over the pipe axis (data/model shardings
    untouched).
    """
    S = mesh.shape[PIPE_AXIS]
    M = int(n_microbatches)
    b = x.shape[0]
    assert b % M == 0, f"batch {b} not divisible into {M} microbatches"
    mb = b // M

    def schedule(params_local, x_full):
        # params_local leaves: (L/S, ...) — this stage's layers
        s = jax.lax.axis_index(PIPE_AXIS)
        xs = x_full.reshape(M, mb, *x_full.shape[1:])
        out_buf = jnp.zeros_like(xs)
        state = jnp.zeros(xs.shape[1:], x_full.dtype)

        def local_apply(h):
            def body(hh, p):
                return block_module.apply({"params": p}, hh), None
            out, _ = jax.lax.scan(body, h, params_local)
            return out

        def tick(carry, t):
            state, out_buf = carry
            # stage 0 injects microbatch t (clipped; drain ticks compute
            # on don't-care data), later stages use the received activation
            feed = jax.lax.dynamic_index_in_dim(xs, jnp.clip(t, 0, M - 1),
                                                keepdims=False)
            inp = jnp.where(s == 0, feed, state)
            y = local_apply(inp)
            # the LAST stage's tick t output is microbatch t-(S-1)
            ot = t - (S - 1)
            idx = jnp.clip(ot, 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(out_buf, idx, keepdims=False)
            valid = (s == S - 1) & (ot >= 0)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf, jnp.where(valid, y, cur), idx, 0)
            # hand the activation to the next stage over ICI (no wraparound:
            # stage 0's next-state comes only from its own feed)
            nxt = jax.lax.ppermute(y, PIPE_AXIS,
                                   [(i, i + 1) for i in range(S - 1)])
            return (nxt, out_buf), None

        (_, out_buf), _ = jax.lax.scan(tick, (state, out_buf),
                                       jnp.arange(M + S - 1))
        # only the last stage holds real outputs; psum-broadcast to all
        # stages so the result is pipe-replicated
        out_buf = jax.lax.psum(
            jnp.where(s == S - 1, out_buf, jnp.zeros_like(out_buf)),
            PIPE_AXIS)
        return out_buf.reshape(x_full.shape)

    specs = stage_params_specs(stacked_params)
    fn = jax.shard_map(schedule, mesh=mesh,
                       in_specs=(specs, P()), out_specs=P(),
                       axis_names={PIPE_AXIS}, check_vma=False)
    return fn(stacked_params, x)


def gpt_apply_pipelined(gpt, variables: Any, codes: jax.Array,
                        conds: jax.Array, *, mesh: Mesh,
                        n_microbatches: int) -> jax.Array:
    """``GPT.__call__`` with the block stack pipelined over the pipe axis.

    Embedding and head run replicated across stages (auto-sharded over
    data/model as usual) — they are a tiny fraction of the 24-layer prior's
    FLOPs. Requires ``scan_layers=True`` (stacked 'blocks' params)."""
    from ..models.stage2.layers import Block

    assert gpt.scan_layers, "pipeline parallelism needs scan_layers=True"
    n_layers = jax.tree.leaves(variables["params"]["blocks"])[0].shape[0]
    S = mesh.shape[PIPE_AXIS]
    assert n_layers % S == 0, \
        f"{n_layers} layers not divisible into {S} pipeline stages"

    block = Block(embed_dim=gpt.embed_dim, n_heads=gpt.n_heads,
                  cond_len=gpt.cond_num_tokens, mlp_bias=gpt.mlp_bias,
                  attn_bias=gpt.attn_bias, dtype=gpt.dtype)
    x = gpt.apply(variables, codes, conds, method="embed_input")
    x = pipeline_blocks(block, variables["params"]["blocks"], x,
                        mesh=mesh, n_microbatches=n_microbatches)
    return gpt.apply(variables, x, method="project_out")
