"""Relay-safe on-chip timing helpers.

Methodology (validated against the axon relay's quirks, see CLAUDE.md):
every variant runs inside ONE jitted ``lax.scan`` of many chained
iterations — a dispatch through the relay costs ~10-20 ms, so per-op times
from short host loops are round-trip noise. Program-entry cost is removed
by subtracting a run of double length (same executable family, same
transfer), and each timed invocation gets a unique input so the relay's
(executable, input) result cache cannot serve a hit.

The 2n-n subtraction is itself noise-dominated for very fast ops at small
n (it once archived NEGATIVE microsecond rows in BENCH_EXTENDED.json):
``timed_scan`` therefore refuses to return until the median delta clears
5x the sample spread, rescaling the scan length (one extra compile pair
per rescale) and raising if the cap is hit.
"""
from __future__ import annotations

import statistics
import time
from typing import Callable, Sequence


def timed_scan(fn: Callable, x0, n: int, extras: Sequence = (),
               trials: int = 3, rescale: int = 8, max_scale: int = 64,
               verbose: bool = True) -> float:
    """Median per-iteration seconds of ``fn`` chained ``n`` times inside one
    jitted program, program-entry cost subtracted via a 2n-length run.

    ``fn(carry, *extras) -> array-tree``; iterations serialize by folding a
    checksum of the output back into the carry. ``extras``: big operands
    (weights, caches) threaded as jit ARGS — closing over them bakes them
    into the HLO as constants, which the relay rejects (HTTP 413) past
    ~100MB.
    """
    import jax
    import jax.numpy as jnp

    def loop(length):
        @jax.jit
        def run(x, *ops):
            def body(c, _):
                y = fn(c, *ops)
                # fold the FULL sum of EVERY leaf into the carry: folding
                # only the first leaf lets XLA dead-code the rest (e.g. all
                # other layers' dW GEMMs when fn returns a gradient tree),
                # and a sliced checksum is unsafe too (XLA propagates
                # slices through dots). One extra read of the outputs,
                # identical across compared variants.
                feed = sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree.leaves(y))
                return (c + feed.astype(c.dtype)
                        * jnp.asarray(1e-12, c.dtype)), None
            c, _ = jax.lax.scan(body, x, None, length=length)
            return c
        return run

    max_n = max_scale * n
    while True:
        run_n, run_2n = loop(n), loop(2 * n)
        for r in (run_n, run_2n):
            float(jnp.sum(r(x0, *extras).astype(jnp.float32)))  # compile
        ts = []
        for t in range(trials):
            xt = x0 + jnp.asarray(t * 1e-6, x0.dtype)
            t0 = time.perf_counter()
            float(jnp.sum(run_n(xt, *extras).astype(jnp.float32)))
            t1 = time.perf_counter()
            float(jnp.sum(run_2n(xt, *extras).astype(jnp.float32)))
            t2 = time.perf_counter()
            ts.append(((t2 - t1) - (t1 - t0)) / n)
        med = statistics.median(ts)
        spread = max(ts) - min(ts)
        if med > 0 and med >= 5 * spread:
            return med
        if n >= max_n:
            raise RuntimeError(
                f"timed_scan noise-bound at n={n}: median "
                f"{med * 1e6:.2f} us/iter vs spread {spread * 1e6:.2f} us "
                "— refusing to report.")
        n *= rescale
        if verbose:
            print(f"  [timed_scan] signal {med * 1e6:.2f} us within noise "
                  f"{spread * 1e6:.2f} us, rescaling to n={n}", flush=True)
