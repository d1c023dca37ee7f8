#!/usr/bin/env python3
"""Decode-bandwidth benchmark: the README decode table's workload.

Measures KV-cache sampling throughput of the 1024d x 16L GPT prior (the
reference's stage-2 decode loop, enhancing/modules/stage2/layers.py:268-303)
at several batch sizes, reports tok/s and the implied HBM bandwidth, and
counts the compiled KERNELS PER TOKEN in the decode scan body — the decode
step is dispatch-bound, so kernel count is the lever the LN-fusion work
targets (models/stage2/layers.py Block.decode).

Appends rows to BENCH_EXTENDED.json.

Usage: python scripts/bench_decode.py [--batches 8 32 64] [--layers 16]
       [--dim 1024] [--kernels-only]
"""
import argparse
import re
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def count_scan_kernels(m, vs, conds):
    """Number of thunks (fusions + custom calls + copies) in the compiled
    decode while-body, normalized per layer where possible.

    Parses the optimized HLO of the jitted sampler: the decode lax.scan
    lowers to a while loop whose body computation contains the per-token
    work; every non-trivial instruction at the body's top level is one
    kernel launch per token step.
    """
    import jax

    from enhancing_tpu.models.stage2.sampling import sample_gpt

    try:
        lowered = jax.jit(
            lambda v, c, r: sample_gpt(m, v, c, r, top_k=100),
        ).lower(vs, conds, jax.random.PRNGKey(0))
        txt = lowered.compile().as_text()
    except Exception as e:  # relay backends may not return optimized HLO
        print(f"[kernels] optimized HLO unavailable: {type(e).__name__}")
        return None
    # find while-body computations and count top-level ops that become
    # thunks: fusions, custom-calls, dots/convs not fused, sorts
    bodies = re.findall(
        r"^%?(?:wide\.)?\S*body\S*? \([^)]*\) -> .*?\{\n(.*?)^\}",
        txt, re.M | re.S)
    if not bodies:
        return None
    best = None
    for body in bodies:
        n_kern = 0
        for line in body.splitlines():
            line = line.strip()
            if re.match(r"^(ROOT )?%?\S+ = \S+ (fusion|custom-call|dot|"
                        r"convolution|sort|copy|all-reduce|scatter|gather)\(",
                        line):
                n_kern += 1
        if n_kern and (best is None or n_kern > best):
            best = n_kern
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 32, 64])
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kernels-only", action="store_true")
    ap.add_argument("--lnfuse", default=None,
                    help="sets ENHANCING_TPU_DECODE_LNFUSE (all|none|"
                         "qkv,mlp,head subsets) before tracing")
    ap.add_argument("--int8", action="store_true",
                    help="weights-only int8 decode "
                         "(models/stage2/quantize.py)")
    ap.add_argument("--kv-int8", action="store_true",
                    help="int8 KV cache with per-row scales (GPT.kv_int8)")
    args = ap.parse_args()
    if args.lnfuse is not None:
        import os
        os.environ["ENHANCING_TPU_DECODE_LNFUSE"] = args.lnfuse

    from enhancing_tpu.utils.compile_cache import maybe_enable_from_env
    maybe_enable_from_env()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhancing_tpu.models.stage2.layers import GPT
    from enhancing_tpu.models.stage2.sampling import sample_gpt
    from enhancing_tpu.utils.bench_log import record

    T = 1024
    m = GPT(vocab_cond_size=1000, vocab_img_size=8192, embed_dim=args.dim,
            cond_num_tokens=1, img_num_tokens=T, n_heads=args.heads,
            n_layers=args.layers, dtype=jnp.bfloat16,
            kv_int8=args.kv_int8)

    @jax.jit
    def init_bf16(key, conds):
        vs = m.init(key, jnp.zeros((conds.shape[0], T), jnp.int32), conds)
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            vs)

    conds0 = jnp.zeros((args.batches[0], 1), jnp.int32)
    vs = init_bf16(jax.random.PRNGKey(0), conds0)
    n_params = sum(p.size for p in jax.tree.leaves(vs["params"]))
    w_bytes = n_params * 2
    if args.int8:
        from enhancing_tpu.models.stage2.quantize import quantize_decode_params
        vs = jax.jit(quantize_decode_params)(vs)
        qb = sum(p.size * p.dtype.itemsize
                 for p in jax.tree.leaves(vs["quant"]))
        print(f"[int8] quantized kernels: {qb / 1e9:.2f} GB "
              f"(bf16 params {w_bytes / 1e9:.2f} GB)")
        # per-step traffic: int8 kernels replace their bf16 copies
        k_bytes = sum(
            p.size * 2 for path, p in
            jax.tree_util.tree_flatten_with_path(vs["params"])[0]
            if path[-1].key == "kernel")
        w_bytes = w_bytes - k_bytes + qb

    nk = count_scan_kernels(m, vs, conds0)
    if nk is not None:
        print(f"[kernels] {nk} kernels/token in the decode while-body "
              f"(~{nk / args.layers:.1f}/layer at {args.layers}L)")
        record("decode_kernels_per_token", nk, "kernels",
               dim=args.dim, layers=args.layers)
    if args.kernels_only:
        return

    for b in args.batches:
        conds = jnp.zeros((b, 1), jnp.int32)
        t0 = time.perf_counter()
        _, out = sample_gpt(m, vs, conds, jax.random.PRNGKey(0), top_k=100)
        np.asarray(out)
        print(f"[decode b{b}] compile+first {time.perf_counter() - t0:.0f}s")
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            _, out = sample_gpt(m, vs, conds, jax.random.PRNGKey(1 + i),
                                top_k=100)
            np.asarray(out)
            times.append(time.perf_counter() - t0)
        dt = statistics.median(times)
        tok_s = b * T / dt
        # per token step: all params once + the live half of each row's KV
        kv_item = 1 if args.kv_int8 else 2
        cache_bytes = args.layers * b * 1032 * args.dim * 2 * kv_item
        traffic = T * (w_bytes + cache_bytes / 2)
        gbs = traffic / dt / 1e9
        tag = ("int8w " if args.int8 else "") + \
            ("int8kv " if args.kv_int8 else "")
        print(f"[decode {tag}b{b}] {dt * 1e3:.0f} ms / {T} tok -> {tok_s:.0f} "
              f"tok/s; ~{gbs:.0f} GB/s of ~819 GB/s HBM roofline")
        record("gpt_decode_throughput", tok_s, "tok/s", batch=b,
               dim=args.dim, layers=args.layers, gbs=round(gbs, 1),
               int8=bool(args.int8), kv_int8=bool(args.kv_int8),
               lnfuse=args.lnfuse or "default")


if __name__ == "__main__":
    main()
