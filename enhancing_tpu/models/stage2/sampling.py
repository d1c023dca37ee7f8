"""On-device autoregressive sampling for the stage-2 priors.

The reference samples with a Python loop that re-concatenates KV tensors every
step under fp16 autocast (reference: enhancing/modules/stage2/layers.py:213-303
and :397-477). Here the whole decode is one jitted ``lax.scan`` with a
preallocated KV cache and static shapes: no host round trips, no per-step
retracing, top-k/top-p filtering and the categorical draw all on device.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def filter_logits(logits: jax.Array, top_k: Optional[int] = None,
                  top_p: Optional[float] = None) -> jax.Array:
    """Apply top-k then nucleus (top-p) filtering to (B, V) logits.

    Matches the reference semantics (layers.py:242-258): top-k keeps the k
    best logits; top-p keeps the smallest prefix of the descending-sorted
    distribution whose cumulative probability reaches ``top_p`` (the first
    token is always kept).
    """
    if top_k is not None:
        kth = jax.lax.top_k(logits, int(top_k))[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # remove tokens once cumulative prob (exclusive) has passed top_p
        remove_sorted = cum - probs >= top_p
        # threshold value: smallest kept logit
        kept = jnp.where(remove_sorted, -jnp.inf, sorted_logits)
        threshold = jnp.min(jnp.where(jnp.isfinite(kept), kept, jnp.inf),
                            axis=-1, keepdims=True)
        logits = jnp.where(logits < threshold, -jnp.inf, logits)
    return logits


def _draw(rng: jax.Array, logits: jax.Array, temperature: float,
          top_k: Optional[int], top_p: Optional[float]) -> jax.Array:
    logits = logits.astype(jnp.float32) / temperature
    logits = filter_logits(logits, top_k, top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("module", "top_k", "top_p",
                                             "temperature", "with_logits"))
def sample_gpt(module, variables: Dict[str, Any], conds: jax.Array,
               rng: jax.Array, *, top_k: Optional[int] = None,
               top_p: Optional[float] = None, temperature: float = 1.0,
               with_logits: bool = True
               ) -> Tuple[Optional[jax.Array], jax.Array]:
    """Sample ``img_num_tokens`` codes from a GPT prior.

    Returns (logits (B, T, V) fp32, codes (B, T) int32).

    ``with_logits=False`` returns (None, codes) and drops the stacked
    per-step logits from the decode scan — (B, T, V) f32 is 537 MB at the
    flagship dims b16, the margin between fitting one chip and OOM.
    """
    b = conds.shape[0]
    cache = module.apply(variables, b, method="init_cache")
    logits0, cache = module.apply(variables, conds, cache, method="prefill")
    rng, sub = jax.random.split(rng)
    tok0 = _draw(sub, logits0, temperature, top_k, top_p)

    def body(carry, step):
        tok, cache, rng = carry
        rng, sub = jax.random.split(rng)
        logits, cache = module.apply(variables, tok, step, cache,
                                     method="decode_step")
        nxt = _draw(sub, logits, temperature, top_k, top_p)
        ys = (logits.astype(jnp.float32), nxt) if with_logits else (nxt,)
        return (nxt, cache, rng), ys

    # Cache reads are prefix-aware at the kernel level: decode_step
    # dispatches to ops/attention.decode_attention, whose Pallas kernel
    # clamps cache-chunk indices past cur_len so the DMAs are elided —
    # measured 4.3k tok/s @ b8 for the 1024d x 16L prior vs 3.2k for the
    # full-buffer XLA read and 2.2k for an XLA-level bucketing attempt
    # (slicing the scan carry copies the window every step).
    steps = jnp.arange(1, module.img_num_tokens)
    (_, _, _), ys = jax.lax.scan(body, (tok0, cache, rng), steps)

    if not with_logits:
        (toks_rest,) = ys
        return None, jnp.concatenate([tok0[None], toks_rest], axis=0).T
    logits_rest, toks_rest = ys
    codes = jnp.concatenate([tok0[None], toks_rest], axis=0).T  # (B, T)
    logits = jnp.concatenate(
        [logits0.astype(jnp.float32)[None], logits_rest], axis=0)
    logits = jnp.transpose(logits, (1, 0, 2))                    # (B, T, V)
    return logits, codes


@functools.partial(jax.jit, static_argnames=("module", "top_k", "top_p",
                                             "temperature", "with_logits"))
def sample_rq(module, variables: Dict[str, Any], conds: jax.Array,
              rng: jax.Array, *, top_k: Optional[int] = None,
              top_p: Optional[float] = None, temperature: float = 1.0,
              with_logits: bool = True
              ) -> Tuple[Optional[jax.Array], jax.Array]:
    """Sample (B, T, D) residual codes from an RQTransformer prior.

    ``with_logits=False`` returns (None, codes) — see sample_gpt."""
    b = conds.shape[0]
    dmax = module.depth_num_tokens
    cache = module.apply(variables, b, method="init_cache")
    hidden0, cache = module.apply(variables, conds, cache,
                                  method="spatial_prefill")

    def depth_loop(hidden, rng):
        """Sample all depth tokens for one spatial position."""
        def body(carry, d):
            codes, rng = carry
            rng, sub = jax.random.split(rng)
            logits = module.apply(variables, hidden, codes, d,
                                  method="depth_forward")
            tok = _draw(sub, logits, temperature, top_k, top_p)
            codes = jax.lax.dynamic_update_index_in_dim(codes, tok, d, axis=1)
            return (codes, rng), (logits.astype(jnp.float32)
                                  if with_logits else jnp.zeros((), rng.dtype))

        codes0 = jnp.zeros((b, dmax), jnp.int32)
        (codes, _), logits = jax.lax.scan(body, (codes0, rng),
                                          jnp.arange(dmax))
        if not with_logits:
            return codes, logits
        return codes, jnp.transpose(logits, (1, 0, 2))  # (B, D, V)

    rng, sub = jax.random.split(rng)
    codes0, logits0 = depth_loop(hidden0, sub)

    def body(carry, step):
        prev_codes, cache, rng = carry
        rng, sub1, sub2 = jax.random.split(rng, 3)
        hidden, cache = module.apply(variables, prev_codes, step, cache,
                                     method="spatial_step")
        codes_d, logits_d = depth_loop(hidden, sub1)
        return (codes_d, cache, rng), (codes_d, logits_d)

    steps = jnp.arange(1, module.img_num_tokens)
    (_, _, _), (codes_rest, logits_rest) = jax.lax.scan(
        body, (codes0, cache, rng), steps)

    codes = jnp.concatenate([codes0[None], codes_rest], axis=0)   # (T, B, D)
    codes = jnp.transpose(codes, (1, 0, 2))                       # (B, T, D)
    if not with_logits:
        return None, codes
    logits = jnp.concatenate([logits0[None], logits_rest], axis=0)
    logits = jnp.transpose(logits, (1, 0, 2, 3))                  # (B, T, D, V)
    return logits.reshape(b * module.img_num_tokens, dmax, -1), codes


# ---------------------------------------------------------------------------
# Data-parallel sharded sampling (batch over the mesh 'data' axis).
#
# The reference serves generation one process per GPU under Lightning DDP
# (reference: enhancing/modules/stage2/transformer.py:78-95 inside
# validation); here one GSPMD program shard_maps the whole decode loop so a
# batch of prompts decodes across every device of the mesh — per-shard KV
# caches, per-shard RNG streams, zero cross-device traffic during decode.
# ---------------------------------------------------------------------------


def _sharded(sample_fn, mesh, module, variables, conds, rng, **kw):
    from jax.sharding import PartitionSpec as P

    from ...parallel.mesh import DATA_AXIS

    n_shards = mesh.shape[DATA_AXIS]
    b = conds.shape[0]
    assert b % n_shards == 0, (
        f"batch {b} not divisible by data-axis size {n_shards}")
    # independent RNG stream per shard
    keys = jax.random.split(rng, n_shards)

    def body(variables, conds, keys):
        return sample_fn(module, variables, conds, keys[0], **kw)

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                       out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                       check_vma=False)
    return fn(variables, conds, keys)


def sample_gpt_sharded(mesh, module, variables: Dict[str, Any],
                       conds: jax.Array, rng: jax.Array, *,
                       top_k: Optional[int] = None,
                       top_p: Optional[float] = None,
                       temperature: float = 1.0
                       ) -> Tuple[jax.Array, jax.Array]:
    """``sample_gpt`` with the batch sharded over the mesh 'data' axis."""
    return _sharded(sample_gpt, mesh, module, variables, conds, rng,
                    top_k=top_k, top_p=top_p, temperature=temperature)


def sample_rq_sharded(mesh, module, variables: Dict[str, Any],
                      conds: jax.Array, rng: jax.Array, *,
                      top_k: Optional[int] = None,
                      top_p: Optional[float] = None,
                      temperature: float = 1.0
                      ) -> Tuple[jax.Array, jax.Array]:
    """``sample_rq`` with the batch sharded over the mesh 'data' axis.

    Note the flattened (B*T, D, V) logits come back shard-concatenated along
    the leading axis (each shard contributes its own B_local*T block)."""
    return _sharded(sample_rq, mesh, module, variables, conds, rng,
                    top_k=top_k, top_p=top_p, temperature=temperature)
