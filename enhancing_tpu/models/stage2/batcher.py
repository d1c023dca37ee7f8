"""Continuous-batching decode serving for the stage-2 priors.

The reference can only generate in lockstep whole batches (its sample()
re-concatenates KV tensors for every row every step and every row must be at
the same position; reference: enhancing/modules/stage2/layers.py:213-303).
A production server gets requests at arbitrary times: lockstep batching
either pads every new request to the oldest one's schedule or serves batch
1 — both waste the chip.

The batchers here keep a fixed pool of B cache SLOTS. Every slot runs its
own sequence at its own position; ONE jitted ragged decode step advances
all active slots together (per-row positions flow into the Pallas
decode-attention masks and cache-row writes — see
ops/attention.decode_attention and ops/cache.cache_row_update). A finished
slot frees immediately; admission prefills the new request's condition in a
batch-1 program and scatters the resulting cache rows into the vacated slot
without touching its neighbours.

``ContinuousGPTBatcher`` serves the GPT prior (one code per step);
``ContinuousRQBatcher`` serves the RQTransformer (a (D,) residual-code
column per step — the depth loop runs lockstep across rows, only the
SPATIAL axis is ragged). All device work is three jitted programs
(admission prefill, row scatter, ragged step) with static shapes — no
retracing as requests come and go.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import _draw


def _host_async(x) -> None:
    """Start the device->host copy without blocking (jax arrays only)."""
    try:
        jax.tree.map(lambda a: a.copy_to_host_async(), x)
    except Exception:  # backend without async host copies: fall through
        pass


@functools.partial(jax.jit,
                   static_argnames=("admit", "module", "temperature",
                                    "top_k", "top_p"),
                   donate_argnames=("cache", "tok", "steps"))
def _admit_commit(admit, module, variables, cond1, rng, cache, tok, steps,
                  slot, temperature, top_k, top_p):
    """One admission in ONE device program: batch-1 prefill + seed draw
    (``admit`` — the GPT/RQ-specific function), then fold the result into
    the pool state: write the batch-1 cache into row ``slot`` (in place —
    the pool is donated; without donation every admission would COPY the
    whole multi-GB KV pool for a one-row update), seed the slot's item,
    and reset its step counter.

    ONE fused program instead of a prefill program plus a commit program:
    every host-issued program costs a dispatch through the relay
    (~10-20 ms), admissions sit on the serving loop's critical path, and
    the measured r4 continuous-vs-lockstep gap was ~1 admission cost per
    dispatch. The RNG advances INSIDE the program and the new key is
    returned — a host-side ``jax.random.split`` would itself be one more
    tiny relay program per admission. Generic over the cache keys (int8
    caches carry k_scale/v_scale too; batch is axis 1 of every entry) and
    over the item shape (GPT (1,) token / RQ (1, D) column; slot axis 0 of
    ``tok``)."""
    rng, sub = jax.random.split(rng)
    item0, cache1 = admit(module, variables, cond1, sub, temperature,
                          top_k, top_p)

    def put(pool, one):
        idx = (0, slot) + (0,) * (pool.ndim - 2)
        return jax.lax.dynamic_update_slice(pool, one.astype(pool.dtype),
                                            idx)

    cache = jax.tree.map(put, cache, cache1)
    tok = jax.lax.dynamic_update_slice(
        tok, item0.astype(tok.dtype), (slot,) + (0,) * (tok.ndim - 1))
    steps = jax.lax.dynamic_update_index_in_dim(
        steps, jnp.ones((), steps.dtype), slot, 0)
    return rng, cache, tok, steps, item0


class _SlotPool:
    """Slot bookkeeping shared by the GPT and RQ batchers.

    Subclasses set ``_admit_fn`` (a pure
    ``(module, variables, cond1, rng, temperature, top_k, top_p) ->
    (item (1, ...), cache1)`` traced inside the fused admission program),
    define ``_step_device(active, n) -> items (n, B, ...)`` (advancing
    ``self._tok/self._steps/self._cache/self._rng`` in place), initialize
    ``self._tok`` (slot axis 0), and set ``self.seq_len`` — sequence
    length in items.
    """

    def __init__(self, module, variables: Dict[str, Any], num_slots: int,
                 rng: jax.Array, *, temperature: float = 1.0,
                 top_k: Optional[int] = None,
                 top_p: Optional[float] = None,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 pipeline: int = 0,
                 fetch_thread: bool = False) -> None:
        self.module = module
        self.variables = variables
        self.num_slots = int(num_slots)
        self._temperature = float(temperature)
        self._top_k = top_k
        self._top_p = top_p
        self._rng = rng
        self.mesh = mesh
        # pipeline depth D >= 1 overlaps host bookkeeping with device
        # compute: step() keeps up to D dispatches in flight and only
        # fetches the OLDEST when the queue exceeds D, so the device runs
        # scans back-to-back and the host<->device round trip (large on a
        # network-attached chip) leaves the critical path; D >= 2 also
        # rides out host-side hiccups (admission prefills, result
        # processing) without the device going idle. Correct because a row
        # finishing mid-flight freezes ON DEVICE (steps clamps at the
        # sequence length) — the stale active mask costs nothing; the only
        # price is that a freed slot idles for up to D extra dispatches
        # before its replacement's first decode. Completions therefore
        # surface up to D step() calls later than they finished.
        # (pipeline=True is accepted as depth 1 for back-compat.)
        self._pipe_depth = int(pipeline)
        # fetch_thread moves the blocking device->host materialization of
        # each dispatch's items onto a single background thread: through a
        # network-attached chip the fetch is a serialized multi-ms round
        # trip even when the result is long since computed, and with
        # pipelining it is the only remaining host work on step()'s
        # critical path. One worker keeps fetches ordered; _process()
        # waits on the future (usually already resolved by the time the
        # dispatch leaves the pipeline window).
        self._fetch_thread = bool(fetch_thread) and self._pipe_depth > 0
        self._fetcher = None
        self._pending: List[Tuple[Any, List[Optional[int]]]] = []
        self._cache = module.apply(variables, self.num_slots,
                                   method="init_cache")
        self._steps = jnp.zeros((self.num_slots,), jnp.int32)
        if mesh is not None:
            # shard the SLOTS over the mesh 'data' axis: every device owns
            # its rows' cache lanes, the ragged decode partition rules keep
            # the step collective-free (tests/test_partition.py), and only
            # admissions touch a single row across the sharded axis
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ...parallel.mesh import DATA_AXIS

            n_shards = mesh.shape[DATA_AXIS]
            assert self.num_slots % n_shards == 0, (
                f"num_slots {self.num_slots} not divisible by data-axis "
                f"size {n_shards}")
            row1 = NamedSharding(mesh, P(DATA_AXIS))
            # every cache entry (k/v 4D, shift + int8 scales 3D) has the
            # slot axis at position 1
            self._cache = jax.tree.map(
                lambda a: jax.device_put(a, NamedSharding(
                    mesh, P(None, DATA_AXIS, *([None] * (a.ndim - 2))))),
                self._cache)
            self._steps = jax.device_put(self._steps, row1)
            self._row1 = row1
        self._slot_req: List[Optional[int]] = [None] * self.num_slots
        self._results: Dict[int, List[np.ndarray]] = {}
        self._next_id = 0

    # -- admission ----------------------------------------------------------

    def free_slots(self) -> int:
        return sum(r is None for r in self._slot_req)

    def num_active(self) -> int:
        return self.num_slots - self.free_slots()

    def submit(self, cond: jax.Array) -> int:
        """Admit one request; returns its id. Raises if no slot is free.

        One fused device program (prefill + seed draw + pool commit, RNG
        advanced inside — see ``_admit_commit``); the host issues nothing
        else."""
        try:
            slot = self._slot_req.index(None)
        except ValueError:
            raise RuntimeError("no free slot — call step() until one "
                               "completes") from None
        cond1 = jnp.asarray(cond, jnp.int32).reshape(1, -1)
        # per-slot device scalars, uploaded once — a fresh jnp.int32(slot)
        # would be one more host->device transfer per admission
        slots_dev = getattr(self, "_slots_dev", None)
        if slots_dev is None:
            slots_dev = self._slots_dev = [jnp.int32(s)
                                           for s in range(self.num_slots)]
        (self._rng, self._cache, self._tok, self._steps,
         item0) = _admit_commit(
            type(self)._admit_fn, self.module, self.variables, cond1,
            self._rng, self._cache, self._tok, self._steps,
            slots_dev[slot], self._temperature, self._top_k, self._top_p)
        rid = self._next_id
        self._next_id += 1
        self._slot_req[slot] = rid
        # keep the seed item on device with an async host copy in flight —
        # np.asarray here would stall admission on a host round trip;
        # _process converts it once the request completes
        _host_async(item0)
        self._results[rid] = [item0[0]]
        return rid

    # -- decode -------------------------------------------------------------

    def step(self, n: int = 1) -> List[Tuple[int, np.ndarray]]:
        """Advance every active slot up to ``n`` items in ONE device
        dispatch (a jitted lax.scan) — through a dispatch-latency-heavy
        path (e.g. a network-attached chip) n > 1 amortizes the round
        trip. Rows that finish mid-scan freeze on device (steps stops at
        the sequence length) and their surplus items are discarded here.

        Returns the requests that completed during this call as
        ``(request_id, codes)`` — (T,) int32 for GPT, (T, D) for RQ.

        With pipeline depth D >= 1, up to D dispatches stay in flight:
        step() issues a new dispatch first and then fetches only the
        oldest one past the depth, so completions surface up to D
        ``step()`` calls later than they were decoded (``flush()`` drains
        all in-flight dispatches without issuing new ones).
        """
        occupancy = tuple(r is not None for r in self._slot_req)
        issued = any(occupancy)
        if issued:
            # cache the device-side active mask: in steady state (every
            # completion immediately re-admitted) occupancy never changes,
            # and re-uploading an identical (slots,) bool array is one
            # host->device transfer through the relay per dispatch
            cached = getattr(self, "_active_dev", None)
            if cached is None or cached[0] != occupancy:
                mask = jnp.asarray(np.array(occupancy))
                if self.mesh is not None:
                    mask = jax.device_put(mask, self._row1)
                self._active_dev = cached = (occupancy, mask)
            # the RNG advances inside the step program (the final scan key
            # comes back as an output) — a host-side random.split here
            # would be one extra relay program per dispatch
            items = self._step_device(cached[1], int(n))
            _host_async(items)
            if self._fetch_thread:
                if self._fetcher is None:
                    from concurrent.futures import ThreadPoolExecutor
                    self._fetcher = ThreadPoolExecutor(max_workers=1)
                items = self._fetcher.submit(np.asarray, items)
            self._pending.append((items, list(self._slot_req)))
        out: List[Tuple[int, np.ndarray]] = []
        # nothing active to keep the device busy -> drain everything
        # (otherwise run_until_done would spin on the tail of the queue)
        depth = self._pipe_depth if issued else 0
        while len(self._pending) > depth:
            out.extend(self._process(self._pending.pop(0)))
        return out

    def flush(self) -> List[Tuple[int, np.ndarray]]:
        """Fetch every in-flight pipelined dispatch without issuing new
        ones. No-op at pipeline depth 0."""
        out: List[Tuple[int, np.ndarray]] = []
        while self._pending:
            out.extend(self._process(self._pending.pop(0)))
        return out

    def _process(self, batch) -> List[Tuple[int, np.ndarray]]:
        """Fold one dispatch's fetched items into per-request results.
        ``batch`` carries the slot->request snapshot taken AT DISPATCH —
        under pipelining ``self._slot_req`` may have moved on since."""
        if batch is None:
            return []
        items, slot_req = batch
        if hasattr(items, "result"):                   # fetch_thread future
            items = items.result()
        items = np.asarray(items)                      # (n, B, ...)
        finished: List[Tuple[int, np.ndarray]] = []
        for t in range(items.shape[0]):
            for slot, rid in enumerate(slot_req):
                # rid not in _results: completed in an earlier dispatch —
                # these items are the on-device frozen repeats
                if rid is None or rid not in self._results:
                    continue
                seq = self._results[rid]
                seq.append(items[t, slot])
                if len(seq) == self.seq_len:
                    finished.append(
                        (rid, np.stack([np.asarray(a) for a in seq])
                         .astype(np.int32)))
                    if self._slot_req[slot] == rid:
                        self._slot_req[slot] = None
                    del self._results[rid]
        return finished

    def run_until_done(self, max_steps: Optional[int] = None
                       ) -> List[Tuple[int, np.ndarray]]:
        """Drain: step until every admitted request has completed."""
        out: List[Tuple[int, np.ndarray]] = []
        n = 0
        while (any(r is not None for r in self._slot_req)
               or self._pending):
            out.extend(self.step())
            n += 1
            if max_steps is not None and n >= max_steps:
                break
        return out


# ---------------------------------------------------------------------------
# GPT
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("module", "temperature",
                                             "top_k", "top_p"))
def _gpt_admit(module, variables, cond1, rng, temperature, top_k, top_p):
    cache1 = module.apply(variables, 1, method="init_cache")
    logits0, cache1 = module.apply(variables, cond1, cache1,
                                   method="prefill")
    tok0 = _draw(rng, logits0, temperature, top_k, top_p)
    return tok0, cache1


@functools.partial(jax.jit, static_argnames=("module", "n", "temperature",
                                             "top_k", "top_p"),
                   donate_argnames=("cache",))
def _gpt_ragged_step(module, variables, tok, steps, active, cache, rng, n,
                     temperature, top_k, top_p):
    """``n`` tokens for every slot in one lax.scan; inactive slots are
    frozen, and a row reaching the sequence end mid-scan freezes too
    (``steps`` stops at img_num_tokens, its later items are no-ops).

    Idle rows run at a clipped position and their sampled token is
    discarded; their cache write lands on a row that is never read (reads
    stop strictly below cur_len) and is overwritten at admission.
    """
    def body(carry, _):
        tok, steps, cache, rng = carry
        rng, sub = jax.random.split(rng)
        live = active & (steps < module.img_num_tokens)
        safe = jnp.clip(steps, 1, module.img_num_tokens - 1)
        logits, cache = module.apply(variables, tok, safe, cache,
                                     method="decode_step")
        nxt = _draw(sub, logits, temperature, top_k, top_p)
        nxt = jnp.where(live, nxt, tok)
        steps = jnp.where(live, steps + 1, steps)
        return (nxt, steps, cache, rng), nxt

    (tok, steps, cache, rng), toks = jax.lax.scan(
        body, (tok, steps, cache, rng), None, length=n)
    return tok, steps, cache, rng, toks


class ContinuousGPTBatcher(_SlotPool):
    """Fixed-slot continuous batcher over a GPT prior.

    Usage::

        b = ContinuousGPTBatcher(gpt, params, num_slots=8,
                                 rng=jax.random.PRNGKey(0), top_k=1)
        rid = b.submit(cond_row)          # admit whenever a slot is free
        done = b.step()                   # one token for every active slot
        # -> [(rid, np.ndarray codes (img_num_tokens,)), ...] as they finish
    """

    def __init__(self, module, variables, num_slots, rng, **kw) -> None:
        super().__init__(module, variables, num_slots, rng, **kw)
        self._tok = jnp.zeros((self.num_slots,), jnp.int32)
        if self.mesh is not None:
            self._tok = jax.device_put(self._tok, self._row1)
        self.seq_len = module.img_num_tokens

    _admit_fn = staticmethod(_gpt_admit)

    def _step_device(self, active, n):
        tok, steps, cache, rng, toks = _gpt_ragged_step(
            self.module, self.variables, self._tok, self._steps, active,
            self._cache, self._rng, n, self._temperature, self._top_k,
            self._top_p)
        self._tok, self._steps, self._cache, self._rng = (tok, steps,
                                                          cache, rng)
        return toks


# ---------------------------------------------------------------------------
# RQTransformer
# ---------------------------------------------------------------------------


def _rq_depth_loop(module, variables, hidden, rng, temperature, top_k,
                   top_p):
    """Sample the (B, D) residual column at one spatial position."""
    b = hidden.shape[0]
    dmax = module.depth_num_tokens

    def body(carry, d):
        codes, rng = carry
        rng, sub = jax.random.split(rng)
        logits = module.apply(variables, hidden, codes, d,
                              method="depth_forward")
        tok = _draw(sub, logits, temperature, top_k, top_p)
        codes = jax.lax.dynamic_update_index_in_dim(codes, tok, d, axis=1)
        return (codes, rng), None

    codes0 = jnp.zeros((b, dmax), jnp.int32)
    (codes, _), _ = jax.lax.scan(body, (codes0, rng), jnp.arange(dmax))
    return codes


@functools.partial(jax.jit, static_argnames=("module", "temperature",
                                             "top_k", "top_p"))
def _rq_admit(module, variables, cond1, rng, temperature, top_k, top_p):
    cache1 = module.apply(variables, 1, method="init_cache")
    hidden0, cache1 = module.apply(variables, cond1, cache1,
                                   method="spatial_prefill")
    codes0 = _rq_depth_loop(module, variables, hidden0, rng, temperature,
                            top_k, top_p)
    return codes0, cache1


@functools.partial(jax.jit, static_argnames=("module", "n", "temperature",
                                             "top_k", "top_p"),
                   donate_argnames=("cache",))
def _rq_ragged_step(module, variables, prev_codes, steps, active, cache,
                    rng, n, temperature, top_k, top_p):
    """``n`` (B, D) residual columns per call: ragged spatial positions,
    the depth loop lockstep (d is position-independent)."""
    def body(carry, _):
        prev_codes, steps, cache, rng = carry
        rng, sub = jax.random.split(rng)
        live = active & (steps < module.img_num_tokens)
        safe = jnp.clip(steps, 1, module.img_num_tokens - 1)
        hidden, cache = module.apply(variables, prev_codes, safe, cache,
                                     method="spatial_step")
        codes = _rq_depth_loop(module, variables, hidden, sub, temperature,
                               top_k, top_p)
        codes = jnp.where(live[:, None], codes, prev_codes)
        steps = jnp.where(live, steps + 1, steps)
        return (codes, steps, cache, rng), codes

    (prev_codes, steps, cache, rng), cols = jax.lax.scan(
        body, (prev_codes, steps, cache, rng), None, length=n)
    return prev_codes, steps, cache, rng, cols


class ContinuousRQBatcher(_SlotPool):
    """Continuous batcher over an RQTransformer prior: each step yields a
    (D,) residual-code column per active slot; completed requests return
    (img_num_tokens, D) int32."""

    def __init__(self, module, variables, num_slots, rng, **kw) -> None:
        super().__init__(module, variables, num_slots, rng, **kw)
        self._tok = jnp.zeros((self.num_slots, module.depth_num_tokens),
                              jnp.int32)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ...parallel.mesh import DATA_AXIS

            self._tok = jax.device_put(
                self._tok, NamedSharding(self.mesh, P(DATA_AXIS, None)))
        self.seq_len = module.img_num_tokens

    _admit_fn = staticmethod(_rq_admit)

    def _step_device(self, active, n):
        tok, steps, cache, rng, cols = _rq_ragged_step(
            self.module, self.variables, self._tok, self._steps, active,
            self._cache, self._rng, n, self._temperature, self._top_k,
            self._top_p)
        self._tok, self._steps, self._cache, self._rng = (tok, steps,
                                                          cache, rng)
        return cols
