#!/usr/bin/env python3
"""On-chip measurements of the SHIPPED flagship stage-2 configs.

The reference's shipped prior workloads (its only stage-2 configs) are:
  * GPT  6144d x 24L x 16h  -> head_dim 384   (configs/imagenet_gpt_vitvq_base.yaml,
    reference configs/imagenet_gpt_vitvq_base.yaml:34-41)
  * RQ   1536d, spatial 24L x 16h (D=96), depth 4L x 8h (D=192)
    (configs/imagenet_rqtransformer_base.yaml)

Every row here is measured at THOSE dims (not 1024d/D-64 stand-ins) on the
real chip, with the relay-safe methodology from bench.py: unique inputs per
iteration, chained calls, and a host transfer to force completion.

Memory reality check (one v5e = 16 GB HBM): the 6144d x 24L GPT has
~11.0B matmul params — 22 GB in bf16 before a single activation, ~130 GB
as fp32 AdamW state. Single-chip rows therefore measure per-layer cost and
the largest depth slice that fits; the full-depth config trains via the
tp/pp/zero1 modes in parallel/ (driver-validated on the virtual mesh).

Usage: python scripts/bench_flagship.py [--part all|layer|train|decode|rq]
"""
import argparse
import statistics
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _sync(x) -> float:
    import jax.numpy as jnp
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def _timed_carry(step1, carry, iters=4, trials=3):
    """Per-step time of a donating train step: the carry (params, opt, loss)
    is threaded continuously (donated buffers can't be reused), each trial
    times `iters` chained unique-input steps and syncs on the scalar loss."""
    ts = []
    for t in range(trials):
        t0 = time.perf_counter()
        for i in range(iters):
            carry = step1(carry, 10_000 * t + i)
        _sync(carry[-1])
        ts.append((time.perf_counter() - t0) / iters)
    return statistics.median(ts), carry


def _timed(fn, x0, iters=8, trials=3):
    """Marginal per-iteration time of chained fn(x, i) calls."""
    def run(n, tag):
        x = x0
        t0 = time.perf_counter()
        for i in range(n):
            x = fn(x, tag + i)
        _sync(x[0] if isinstance(x, tuple) else x)
        return time.perf_counter() - t0

    times = []
    for t in range(trials):
        t_short = run(2, 1000 * t)
        t_long = run(2 + iters, 50_000 + 1000 * t)
        times.append((t_long - t_short) / iters)
    return statistics.median(times)


def bench_layer():
    """One 6144d stage-2 Block (D=384 packed attention + squared-ReLU FFN):
    fwd and fwd+bwd, b4 (the shipped config's per-device batch) x N=1025."""
    import jax
    import jax.numpy as jnp
    from enhancing_tpu.models.stage2.layers import Block

    b, n, c, h = 4, 1025, 6144, 16
    blk = Block(embed_dim=c, n_heads=h, cond_len=1, dtype=jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (b, n, c), jnp.bfloat16)
    # params ride as ARGUMENTS — closing over them bakes ~450MB of constants
    # into the HLO (minutes of MLIR conversion + a relay-killing upload)
    params = blk.init(jax.random.PRNGKey(1), x0)

    @jax.jit
    def fwd(p, x, i):
        return blk.apply(p, x + i * jnp.bfloat16(1e-8))

    @jax.jit
    def fwdbwd(p, x, i):
        # grads wrt params AND input — the real per-layer training cost
        # (x-only grads let XLA DCE every dW matmul)
        def loss(pi, xi):
            return jnp.sum(blk.apply(pi, xi).astype(jnp.float32) ** 2)
        gp, gx = jax.grad(loss, argnums=(0, 1))(p, x + i * jnp.bfloat16(1e-8))
        # consume EVERY param grad — an unused leaf lets XLA DCE its dW matmul
        gp_sum = sum(l.sum().astype(jnp.float32)
                     for l in jax.tree.leaves(gp))
        return gx + gp_sum.astype(gx.dtype)

    def _flops(jitted, *a):
        try:
            return float(jitted.lower(*a).compile().cost_analysis()["flops"])
        except Exception:
            return float("nan")

    _sync(fwd(params, x0, jnp.bfloat16(0)))
    t_f = _timed(lambda x, i: fwd(params, x, jnp.bfloat16(i * 1e-6)), x0)
    _sync(fwdbwd(params, x0, jnp.bfloat16(0)))
    t_fb = _timed(lambda x, i: fwdbwd(params, x, jnp.bfloat16(i * 1e-6)), x0)

    fl_f = _flops(fwd, params, x0, jnp.bfloat16(0))
    fl_fb = _flops(fwdbwd, params, x0, jnp.bfloat16(0))
    print(f"[gpt-6144d layer] fwd {t_f*1e3:.2f} ms "
          f"({fl_f/t_f/1e12:.1f} TFLOP/s of {fl_f/1e9:.0f} GF), "
          f"fwd+bwd {t_fb*1e3:.2f} ms "
          f"({fl_fb/t_fb/1e12:.1f} TFLOP/s of {fl_fb/1e9:.0f} GF)")
    return t_f, t_fb


def bench_train(n_layers=2):
    """Largest 6144d GPT depth slice that trains (AdamW, remat, scan) on one
    chip: full CE step over frozen-tokenizer codes at the config batch (4)."""
    import jax
    import jax.numpy as jnp
    import optax
    from enhancing_tpu.models.stage2.layers import GPT

    m = GPT(vocab_cond_size=1000, vocab_img_size=8192, embed_dim=6144,
            cond_num_tokens=1, img_num_tokens=1024, n_heads=16,
            n_layers=n_layers, dtype=jnp.bfloat16, scan_layers=True,
            remat=True)
    b = 4
    codes0 = jnp.zeros((b, 1024), jnp.int32)
    conds = jnp.zeros((b, 1), jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), codes0, conds)
    params = variables["params"]
    n_params = sum(p.size for p in jax.tree.leaves(params))
    tx = optax.adamw(1e-4)
    opt = tx.init(params)

    # donate params+opt: without donation XLA double-buffers the ~13 GB
    # fp32 AdamW state and the 2-layer slice RESOURCE_EXHAUSTs on 16 GB HBM
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt, codes):
        def loss(p):
            logits = m.apply({"params": p}, codes, conds)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), codes).mean()
        l, g = jax.value_and_grad(loss)(params)
        updates, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, updates), opt, l

    t0 = time.perf_counter()
    params, opt, l = step(params, opt, codes0)
    _sync(l)
    print(f"[gpt-6144d train {n_layers}L] compile+first {time.perf_counter()-t0:.0f}s, "
          f"{n_params/1e9:.2f}B params")

    def one(carry, i):
        params, opt, _ = carry
        codes = jnp.full((b, 1024), i % 8192, jnp.int32)
        return step(params, opt, codes)

    t, _ = _timed_carry(one, (params, opt, l), iters=4, trials=3)
    tok = b * 1024 / t
    print(f"[gpt-6144d train {n_layers}L] {t*1e3:.1f} ms/step "
          f"({tok:.0f} tok/s, b{b}, AdamW fp32 state, remat)")
    return t


def bench_decode(n_layers=8, batch=4, int8=False, kv_int8=False,
                 act_int8=False):
    """Flagship-dim (6144d, D=384) KV-cache decode at the deepest slice whose
    params + cache fit one chip; reports tok/s and HBM GB/s. ``int8``:
    weights-only int8 serving (quantize_decode_params) — halves param bytes,
    so DEEPER slices fit (the full 24L config at ~11 GB int8); ``kv_int8``:
    int8 KV cache; ``act_int8``: W8A8 (int8 activations, native int8 MXU
    dots)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from enhancing_tpu.models.stage2.layers import GPT
    from enhancing_tpu.models.stage2.quantize import (
        drop_quantized_kernels, quantize_decode_params)
    from enhancing_tpu.models.stage2.sampling import sample_gpt
    from enhancing_tpu.utils.bench_log import record

    m = GPT(vocab_cond_size=1000, vocab_img_size=8192, embed_dim=6144,
            cond_num_tokens=1, img_num_tokens=1024, n_heads=16,
            n_layers=n_layers, dtype=jnp.bfloat16, kv_int8=kv_int8,
            act_int8=act_int8)
    conds = jnp.zeros((batch, 1), jnp.int32)

    if int8:
        # Build the served (int8 kernels + placeholders) tree leaf-by-leaf
        # from eval_shape — at 24L even ONE stacked fp32 kernel (fc1:
        # 24x6144x24576 = 14.5 GB) blows HBM, so the full-precision tree
        # must never exist on device. Random int8 kernels + constant scales
        # are throughput-equivalent to quantized trained weights.
        shapes = jax.eval_shape(
            m.init, jax.random.PRNGKey(0),
            jnp.zeros((batch, 1024), jnp.int32), conds)
        shapes = jax.tree.map(lambda s: jax.ShapeDtypeStruct(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
            shapes)
        template = jax.eval_shape(
            lambda p: drop_quantized_kernels(quantize_decode_params(p)),
            shapes)

        def gen(path, s):
            ks = jax.tree_util.keystr(path)
            key = jax.random.PRNGKey(abs(hash(ks)) % (2**31))
            if s.dtype == jnp.int8:
                return jax.jit(lambda: jax.random.randint(
                    key, s.shape, -127, 128, jnp.int32).astype(jnp.int8))()
            if ks.endswith("['scale']"):
                # quant dequant scales / LayerNorm scales
                fill = 0.02 / 127.0 if ks.startswith("['quant']") else 1.0
                return jnp.full(s.shape, fill, s.dtype)
            return jax.jit(lambda: 0.02 * jax.random.normal(
                key, s.shape, jnp.float32).astype(s.dtype))()

        vs = jax.tree_util.tree_map_with_path(gen, template)
    else:
        # params live in bf16; the cast must be FUSED with init in one jit —
        # a separate init materializes the full fp32 tree (11+ GB at 6L)
        # before the cast and OOMs 16 GB HBM
        @jax.jit
        def init_serving(key):
            vs = m.init(key, jnp.zeros((batch, 1024), jnp.int32), conds)
            return jax.tree.map(
                lambda a: (a.astype(jnp.bfloat16)
                           if a.dtype == jnp.float32 else a), vs)

        vs = init_serving(jax.random.PRNGKey(0))
    n_params = sum(p.size for p in jax.tree.leaves(vs["params"]))
    w_bytes = sum(p.size * p.dtype.itemsize for p in jax.tree.leaves(
        {k: v for k, v in vs.items() if k in ("params", "quant")}))

    tag = (f"{'int8w ' if int8 else ''}{'int8kv ' if kv_int8 else ''}"
           f"{'w8a8 ' if act_int8 else ''}")
    t0 = time.perf_counter()
    _, out = sample_gpt(m, vs, conds, jax.random.PRNGKey(0), top_k=100,
                        with_logits=False)
    _ = np.asarray(out)
    print(f"[gpt-6144d decode {tag}{n_layers}L] compile+first "
          f"{time.perf_counter()-t0:.0f}s, weights {w_bytes/1e9:.1f} GB")

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        _, out = sample_gpt(m, vs, conds, jax.random.PRNGKey(1 + i),
                            top_k=100, with_logits=False)
        _ = np.asarray(out)
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    tok_s = batch * 1024 / dt
    # per decoded token: all weights read once + ~half the final KV cache
    kv_item = 1 if kv_int8 else 2
    cache_bytes = n_layers * batch * 1025 * 6144 * 2 * kv_item
    traffic = 1024 * (w_bytes + cache_bytes / 2)
    print(f"[gpt-6144d decode {tag}{n_layers}L] {dt*1e3:.0f} ms / 1024 tok "
          f"-> {tok_s:.0f} tok/s @ b{batch}; ~{traffic/dt/1e9:.0f} GB/s "
          f"of ~819 GB/s HBM roofline")
    record("flagship_decode", tok_s, "tok/s", layers=n_layers, batch=batch,
           int8=int8, kv_int8=kv_int8, act_int8=act_int8,
           gbs=round(traffic / dt / 1e9, 1))
    return dt


def bench_rq(train_batch=4, sample_batch=4, do_train=True, int8=False):
    """Shipped RQ flagship (1536d, 24L spatial D=96 + 4L depth D=192):
    full-config AdamW training step and nested sampling. ``int8``:
    weights-only int8 + int8 KV sampling (the bf16 kernels are kept — the
    RQ depth stack recomputes through them at every spatial position)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from enhancing_tpu.models.stage2.layers import RQTransformer
    from enhancing_tpu.models.stage2.sampling import sample_rq
    from enhancing_tpu.utils.bench_log import record

    m = RQTransformer(vocab_cond_size=1000, vocab_img_size=8192,
                      embed_dim=1536, cond_num_tokens=1, img_num_tokens=1024,
                      depth_num_tokens=4, spatial_n_heads=16, depth_n_heads=8,
                      spatial_n_layers=24, depth_n_layers=4,
                      dtype=jnp.bfloat16, scan_layers=True, remat=True,
                      kv_int8=int8)
    b = train_batch
    codes0 = jnp.zeros((b, 1024, 4), jnp.int32)
    conds = jnp.zeros((b, 1), jnp.int32)
    vs = m.init(jax.random.PRNGKey(0), codes0, conds)
    params = vs["params"]
    n_params = sum(p.size for p in jax.tree.leaves(params))
    tx = optax.adamw(1e-4)
    opt = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt, codes):
        def loss(p):
            logits = m.apply({"params": p}, codes, conds)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32),
                codes.reshape(-1, 4)).mean()
        l, g = jax.value_and_grad(loss)(params)
        updates, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, updates), opt, l

    if do_train:
        t0 = time.perf_counter()
        params, opt, l = step(params, opt, codes0)
        _sync(l)
        print(f"[rq-1536d train 24L+4L] compile+first {time.perf_counter()-t0:.0f}s, "
              f"{n_params/1e9:.2f}B params")

        def one(carry, i):
            params, opt, _ = carry
            codes = jnp.full((b, 1024, 4), i % 8192, jnp.int32)
            return step(params, opt, codes)

        (t, (params, opt, _)) = _timed_carry(one, (params, opt, l),
                                             iters=4, trials=3)
        print(f"[rq-1536d train 24L+4L] {t*1e3:.1f} ms/step "
              f"({b*1024*4/t:.0f} tok/s, b{b}, AdamW, remat)")
    # sampling serves from bf16 params (fp32 jit args double the HBM)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    # sampling at the full shipped config
    conds_s = jnp.zeros((sample_batch, 1), jnp.int32)
    vs_s = {"params": params}
    if int8:
        from enhancing_tpu.models.stage2.quantize import \
            quantize_decode_params
        vs_s = quantize_decode_params(vs_s)
    t0 = time.perf_counter()
    _, out = sample_rq(m, vs_s, conds_s, jax.random.PRNGKey(0), top_k=100)
    _ = np.asarray(out)
    print(f"[rq-1536d sample] compile+first {time.perf_counter()-t0:.0f}s")
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        _, out = sample_rq(m, vs_s, conds_s, jax.random.PRNGKey(1 + i),
                        top_k=100)
        _ = np.asarray(out)
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    tag = " int8" if int8 else ""
    print(f"[rq-1536d sample{tag}] {dt:.1f} s / 1024x4 codes -> "
          f"{sample_batch*1024*4/dt:.0f} tok/s @ b{sample_batch}")
    record("flagship_rq_sample", sample_batch * 1024 * 4 / dt, "tok/s",
           batch=sample_batch, int8=int8, kv_int8=int8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="all",
                    choices=["all", "layer", "train", "decode", "rq", "rqsample"])
    ap.add_argument("--layers", type=int, default=None,
                    help="depth override for train/decode parts")
    ap.add_argument("--batch", type=int, default=4,
                    help="batch for the decode part")
    ap.add_argument("--int8", action="store_true",
                    help="weights-only int8 decode (bf16 kernels dropped)")
    ap.add_argument("--kv_int8", action="store_true",
                    help="int8 KV cache for the decode part")
    ap.add_argument("--act_int8", action="store_true",
                    help="W8A8 decode (int8 activations, int8 MXU dots)")
    args = ap.parse_args()
    from enhancing_tpu.utils.compile_cache import maybe_enable_from_env
    maybe_enable_from_env()
    if args.part in ("all", "layer"):
        bench_layer()
    if args.part in ("all", "train"):
        for nl in ([args.layers] if args.layers else [2, 1]):
            try:
                bench_train(nl)
                break
            except Exception as e:  # RESOURCE_EXHAUSTED -> try thinner slice
                print(f"[gpt-6144d train {nl}L] failed: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    if args.part in ("all", "decode"):
        bench_decode(args.layers or 8, batch=args.batch,
                     int8=args.int8, kv_int8=args.kv_int8,
                     act_int8=args.act_int8)
    if args.part in ("all", "rq"):
        bench_rq(int8=args.int8)
    if args.part == "rqsample":
        bench_rq(do_train=False, sample_batch=args.batch,
                 int8=args.int8)


if __name__ == "__main__":
    main()
