#!/usr/bin/env python3
"""Continuous-batching serving benchmark on the real chip.

Measures the ContinuousGPTBatcher's steady-state throughput on the 1024d x
16L prior (the decode-bandwidth workload from README's table) and compares
it with the lockstep sampler at the same pool size, plus the effect of
--steps_per_dispatch (dispatch-latency amortization through the relay).

The interesting number for serving is STAGGERED work: slots deliberately
start at spread-out positions, so the ragged kernel sees mixed lengths
(lockstep batching cannot run this case at all without padding every row
to the longest).

Usage: python scripts/bench_serving.py [--slots 32] [--dispatch 1 8 32]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=32)
    ap.add_argument("--dispatch", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--int8", action="store_true",
                    help="weights-only int8 + int8 KV serving pool")
    ap.add_argument("--only", choices=["all", "lockstep", "continuous"],
                    default="all")
    ap.add_argument("--pipeline", type=int, default=0,
                    help="pipelined batcher depth D: up to D dispatches in "
                         "flight before fetching the oldest (hides the "
                         "relay round trip; D>=2 rides out host hiccups)")
    ap.add_argument("--fetch_thread", action="store_true",
                    help="materialize dispatch results on a background "
                         "thread (overlaps the serialized relay fetch "
                         "with dispatch issue; needs --pipeline >= 1)")
    ap.add_argument("--repeats", type=int, default=3,
                    help="steady-state windows per config; the recorded "
                         "row carries the median + the min-max spread")
    args = ap.parse_args()

    from enhancing_tpu.utils.compile_cache import maybe_enable_from_env
    maybe_enable_from_env()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhancing_tpu.models.stage2.batcher import ContinuousGPTBatcher
    from enhancing_tpu.models.stage2.layers import GPT
    from enhancing_tpu.models.stage2.quantize import (drop_quantized_kernels,
                                                      quantize_decode_params)
    from enhancing_tpu.models.stage2.sampling import sample_gpt
    from enhancing_tpu.utils.bench_log import record

    T = 1024
    m = GPT(vocab_cond_size=1000, vocab_img_size=8192, embed_dim=args.dim,
            cond_num_tokens=1, img_num_tokens=T, n_heads=16,
            n_layers=args.layers, dtype=jnp.bfloat16, kv_int8=args.int8)
    # fused init+cast (see bench_flagship): serving params live in bf16
    @jax.jit
    def init_bf16(key):
        v = m.init(key, jnp.zeros((1, T), jnp.int32),
                   jnp.zeros((1, 1), jnp.int32))
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            v)

    vs = init_bf16(jax.random.PRNGKey(0))
    if args.int8:
        vs = drop_quantized_kernels(quantize_decode_params(vs))
    dims = dict(slots=args.slots, dim=args.dim, layers=args.layers,
                int8=args.int8)

    # lockstep baseline at the same batch; with_logits=False so the
    # baseline, like the batcher, never stacks the (B, T, V) f32 logits —
    # both sides produce codes only.
    conds = jnp.zeros((args.slots, 1), jnp.int32)
    if args.only in ("all", "lockstep"):
        _run_lockstep(args, m, vs, conds, sample_gpt, np, jax, jnp, record,
                      dims, T)
    if args.only == "lockstep":
        return

    for n in args.dispatch:
        _run_continuous(args, m, vs, n, jax, jnp, record, dims, T)


def _run_lockstep(args, m, vs, conds, sample_gpt, np, jax, jnp, record,
                  dims, T):
    import statistics
    import time
    _, out = sample_gpt(m, vs, conds, jax.random.PRNGKey(0), top_k=100,
                        with_logits=False)
    np.asarray(out)
    rates = []
    for i in range(max(args.repeats, 2)):
        t0 = time.time()
        _, out = sample_gpt(m, vs, conds, jax.random.PRNGKey(1 + i),
                            top_k=100, with_logits=False)
        np.asarray(out)
        rates.append(args.slots * T / (time.time() - t0))
    med = statistics.median(rates)
    spread = max(rates) - min(rates)
    print(f"[lockstep b{args.slots}] {med:.0f} tok/s "
          f"(spread {spread:.0f} over {len(rates)} runs)", flush=True)
    record("serving_lockstep", med, "tok/s",
           spread=round(spread, 1), runs=[round(r, 1) for r in rates],
           **dims)


def _run_continuous(args, m, vs, n, jax, jnp, record, dims, T):
    import statistics
    import time

    from enhancing_tpu.models.stage2.batcher import ContinuousGPTBatcher

    b = ContinuousGPTBatcher(m, vs, num_slots=args.slots,
                             rng=jax.random.PRNGKey(7), top_k=100,
                             pipeline=args.pipeline,
                             fetch_thread=args.fetch_thread)
    submit_ts = {}

    def submit(cond_val):
        rid = b.submit(jnp.asarray([cond_val % 1000], jnp.int32))
        submit_ts[rid] = time.time()
        return rid

    for s in range(args.slots):
        submit(s)
    # STAGGER: spread the slots across positions by stepping while
    # re-admitting finished rows round-robin for one full sequence
    warm_items = 0
    # warmup until the first completion wave passes (compile + fill)
    while warm_items < args.slots:
        for rid, codes in b.step(n):
            warm_items += 1
            submit(rid)
    # steady state: measure items/s over `repeats` windows of 2 full
    # sequence lengths each. Completions counted in a window include
    # tokens decoded before its t0; over 2 full sequences the startup
    # credit is <= 1/2 sequence per slot and amortizes. Per-request
    # completion latency (submit -> surfaced) accumulates across windows —
    # that's the number continuous batching exists for.
    rates = []
    lats = []
    for _ in range(args.repeats):
        produced = 0
        t0 = time.time()
        target = 2 * args.slots
        while produced < target:
            for rid, codes in b.step(n):
                produced += 1
                lats.append(time.time() - submit_ts.pop(rid))
                submit(rid)
        rates.append(produced * T / (time.time() - t0))
    med = statistics.median(rates)
    spread = max(rates) - min(rates)
    lats.sort()
    p50 = lats[len(lats) // 2]
    p99 = lats[min(len(lats) - 1, int(len(lats) * 0.99))]
    tag = f" pipelined(depth={args.pipeline})" if args.pipeline else ""
    if args.fetch_thread:
        tag += " fetch_thread"
    print(f"[continuous b{args.slots} dispatch={n}{tag}] "
          f"{med:.0f} tok/s steady-state (spread {spread:.0f} over "
          f"{args.repeats} windows; staggered slots, admissions "
          f"included); request latency p50 {p50:.2f}s p99 {p99:.2f}s "
          f"({p50 / T * 1e3:.2f} ms/tok p50)", flush=True)
    record("serving_continuous", med, "tok/s", dispatch=n,
           pipeline=args.pipeline, fetch_thread=args.fetch_thread,
           spread=round(spread, 1),
           runs=[round(r, 1) for r in rates],
           lat_p50_s=round(p50, 3), lat_p99_s=round(p99, 3),
           n_requests=len(lats), **dims)

    # TTFT: the first token is sampled during the admission prefill, so
    # time-to-first-token = submit() + materializing the seed token on the
    # host. Measured on freed slots right after the steady-state windows
    # (the decode pool stays busy — this is TTFT under load).
    ttfts = []
    while len(ttfts) < 5:
        for rid, codes in b.step(n):
            submit_ts.pop(rid, None)
            t0 = time.time()
            rid2 = b.submit(jnp.asarray([rid % 1000], jnp.int32))
            float(b._results[rid2][0].astype(jnp.float32).sum())
            ttfts.append(time.time() - t0)
            submit_ts[rid2] = time.time()
            if len(ttfts) >= 5:
                break
    ttft = statistics.median(ttfts)
    print(f"[continuous b{args.slots} dispatch={n}{tag}] TTFT "
          f"{ttft * 1e3:.0f} ms (median of {len(ttfts)} admissions under "
          f"load)", flush=True)
    record("serving_ttft", ttft * 1e3, "ms", dispatch=n,
           pipeline=args.pipeline, fetch_thread=args.fetch_thread, **dims)


if __name__ == "__main__":
    main()
