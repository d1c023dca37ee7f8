"""Continuous-batching decode serving for the GPT prior.

The reference can only generate in lockstep whole batches (its sample()
re-concatenates KV tensors for every row every step and every row must be at
the same position; reference: enhancing/modules/stage2/layers.py:213-303).
A production server gets requests at arbitrary times: lockstep batching
either pads every new request to the oldest one's schedule or serves batch
1 — both waste the chip.

``ContinuousGPTBatcher`` keeps a fixed pool of B cache SLOTS. Every slot
runs its own sequence at its own position; ONE jitted ragged decode step
advances all active slots together (per-row positions flow into the Pallas
decode-attention masks and cache-row writes — see
ops/attention.decode_attention and ops/cache.cache_row_update). A finished
slot frees immediately; admission prefills the new request's condition in a
batch-1 program and scatters the resulting cache rows into the vacated slot
without touching its neighbours.

All device work is three jitted programs (admission prefill, row scatter,
ragged step) with static shapes — no retracing as requests come and go.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import _draw


@functools.partial(jax.jit, static_argnames=("module", "temperature",
                                             "top_k", "top_p"))
def _admit(module, variables, cond1, rng, temperature, top_k, top_p):
    """Batch-1 condition prefill: returns (first token (1,), slot cache)."""
    cache1 = module.apply(variables, 1, method="init_cache")
    logits0, cache1 = module.apply(variables, cond1, cache1,
                                   method="prefill")
    tok0 = _draw(rng, logits0, temperature, top_k, top_p)
    return tok0, cache1


@jax.jit
def _scatter_slot(cache, cache1, slot):
    """Write a batch-1 cache into row ``slot`` of the pool cache."""
    return {
        "k": jax.lax.dynamic_update_slice(
            cache["k"], cache1["k"].astype(cache["k"].dtype),
            (0, slot, 0, 0)),
        "v": jax.lax.dynamic_update_slice(
            cache["v"], cache1["v"].astype(cache["v"].dtype),
            (0, slot, 0, 0)),
        "shift": jax.lax.dynamic_update_slice(
            cache["shift"], cache1["shift"].astype(cache["shift"].dtype),
            (0, slot, 0)),
    }


@functools.partial(jax.jit, static_argnames=("module", "temperature",
                                             "top_k", "top_p"),
                   donate_argnames=("cache",))
def _ragged_step(module, variables, tok, steps, active, cache, rng,
                 temperature, top_k, top_p):
    """One token for every slot; inactive slots are frozen.

    ``steps`` is the per-row position of the token being decoded (>= 1 for
    active rows). Idle rows run at a clipped position and their sampled
    token is discarded; their cache write lands on a row that is never read
    (reads stop strictly below cur_len) and is overwritten at admission.
    """
    safe = jnp.clip(steps, 1, module.img_num_tokens)
    logits, cache = module.apply(variables, tok, safe, cache,
                                 method="decode_step")
    nxt = _draw(rng, logits, temperature, top_k, top_p)
    nxt = jnp.where(active, nxt, tok)
    steps = jnp.where(active, steps + 1, steps)
    return nxt, steps, cache


class ContinuousGPTBatcher:
    """Fixed-slot continuous batcher over a GPT prior.

    Args:
      module: the GPT flax module (bound config).
      variables: its parameters.
      num_slots: pool size B — the step program's static batch.
      rng: base PRNG key.
      temperature / top_k / top_p: sampling controls (static).

    Usage::

        b = ContinuousGPTBatcher(gpt, params, num_slots=8,
                                 rng=jax.random.PRNGKey(0), top_k=1)
        rid = b.submit(cond_row)          # admit whenever a slot is free
        done = b.step()                   # one token for every active slot
        # -> [(rid, np.ndarray codes (img_num_tokens,)), ...] as they finish
    """

    def __init__(self, module, variables: Dict[str, Any], num_slots: int,
                 rng: jax.Array, *, temperature: float = 1.0,
                 top_k: Optional[int] = None,
                 top_p: Optional[float] = None) -> None:
        self.module = module
        self.variables = variables
        self.num_slots = int(num_slots)
        self._temperature = float(temperature)
        self._top_k = top_k
        self._top_p = top_p
        self._rng = rng
        self._cache = module.apply(variables, self.num_slots,
                                   method="init_cache")
        self._tok = jnp.zeros((self.num_slots,), jnp.int32)
        self._steps = jnp.zeros((self.num_slots,), jnp.int32)
        self._slot_req: List[Optional[int]] = [None] * self.num_slots
        self._results: Dict[int, List[int]] = {}
        self._next_id = 0

    # -- admission ----------------------------------------------------------

    def free_slots(self) -> int:
        return sum(r is None for r in self._slot_req)

    def num_active(self) -> int:
        return self.num_slots - self.free_slots()

    def submit(self, cond: jax.Array) -> int:
        """Admit one request; returns its id. Raises if no slot is free."""
        try:
            slot = self._slot_req.index(None)
        except ValueError:
            raise RuntimeError("no free slot — call step() until one "
                               "completes") from None
        self._rng, sub = jax.random.split(self._rng)
        cond1 = jnp.asarray(cond, jnp.int32).reshape(1, -1)
        tok0, cache1 = _admit(self.module, self.variables, cond1, sub,
                              self._temperature, self._top_k, self._top_p)
        self._cache = _scatter_slot(self._cache, cache1, jnp.int32(slot))
        self._tok = self._tok.at[slot].set(tok0[0])
        self._steps = self._steps.at[slot].set(1)
        rid = self._next_id
        self._next_id += 1
        self._slot_req[slot] = rid
        self._results[rid] = [int(tok0[0])]
        return rid

    # -- decode -------------------------------------------------------------

    def step(self) -> List[Tuple[int, np.ndarray]]:
        """Advance every active slot one token.

        Returns the requests that completed on this step as
        ``(request_id, codes (img_num_tokens,) int32)``.
        """
        active_host = np.array([r is not None for r in self._slot_req])
        if not active_host.any():
            return []
        self._rng, sub = jax.random.split(self._rng)
        nxt, steps, cache = _ragged_step(
            self.module, self.variables, self._tok, self._steps,
            jnp.asarray(active_host), self._cache, sub,
            self._temperature, self._top_k, self._top_p)
        self._tok, self._steps, self._cache = nxt, steps, cache
        toks = np.asarray(nxt)
        finished: List[Tuple[int, np.ndarray]] = []
        for slot, rid in enumerate(self._slot_req):
            if rid is None:
                continue
            seq = self._results[rid]
            seq.append(int(toks[slot]))
            if len(seq) == self.module.img_num_tokens:
                finished.append((rid, np.asarray(seq, np.int32)))
                self._slot_req[slot] = None
                del self._results[rid]
        return finished

    def run_until_done(self, max_steps: Optional[int] = None
                       ) -> List[Tuple[int, np.ndarray]]:
        """Drain: step until every admitted request has completed."""
        out: List[Tuple[int, np.ndarray]] = []
        n = 0
        while any(r is not None for r in self._slot_req):
            out.extend(self.step())
            n += 1
            if max_steps is not None and n >= max_steps:
                break
        return out
