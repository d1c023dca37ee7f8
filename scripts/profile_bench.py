#!/usr/bin/env python3
"""Profile the bench.py headline step on the real chip and print a per-op
time breakdown.

Captures a ``jax.profiler`` trace (perfetto JSON) of a few steady-state
iterations of the ViT-VQGAN-Base encode+decode program, then aggregates
device-track event durations by op category (attention kernel, GEMMs by
shape, VQ search, layernorm/elementwise fusions, ...). This is the tool
behind the README's "where the remaining roofline gap goes" numbers.

Usage: python scripts/profile_bench.py [--batch 128] [--iters 4]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def categorize(name: str) -> str:
    n = name.lower()
    if "attn" in n or "attention" in n:
        return "attention kernel"
    if "vq" in n or "argmin" in n:
        return "vq search"
    if "ln_gemm" in n:
        return "fused ln+gemm"
    if "dot" in n or "fusion" in n and "dot" in n:
        return name  # keep per-fusion detail; fused GEMMs dominate
    return name


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--logdir", default="/tmp/bench_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--mode", default="headline",
                    choices=["headline", "train_ae", "train_d"],
                    help="headline: encode+decode inference; train_ae / "
                         "train_d: the split GAN training phases "
                         "(bench_train_breakdown.build, bf16 D)")
    args = ap.parse_args()

    from enhancing_tpu.utils.compile_cache import maybe_enable_from_env
    maybe_enable_from_env()
    import jax
    import jax.numpy as jnp

    if args.mode == "headline":
        from enhancing_tpu.models.stage1.vitvqgan import ViTVQ

        enc = dict(dim=768, depth=12, heads=12, mlp_dim=3072)
        model = ViTVQ(image_size=256, patch_size=8, encoder=enc, decoder=enc,
                      quantizer=dict(embed_dim=32, n_embed=8192),
                      dtype="bfloat16")
        module, variables = model.module, model.variables

        def step_fn(v, x, i):
            codes = module.apply(v, x, method="encode_codes")
            out = module.apply(v, codes, method="decode_codes")
            return jnp.clip(out + i * 1e-5, 0.0, 1.0)

        step = jax.jit(step_fn)
        x = jax.random.uniform(jax.random.PRNGKey(0),
                               (args.batch, 256, 256, 3), jnp.float32)
        # compile + one warm iteration outside the trace
        x = step(variables, x, jnp.float32(0))
        float(jnp.sum(x))

        os.makedirs(args.logdir, exist_ok=True)
        jax.profiler.start_trace(args.logdir, create_perfetto_trace=True)
        for i in range(args.iters):
            x = step(variables, x, jnp.float32(1 + i))
        float(jnp.sum(x))
        jax.profiler.stop_trace()
    else:
        # GAN training phase (the README breakdown's ae/d programs, bf16 D)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_train_breakdown import build

        if args.batch == 128:  # headline default is wrong for training
            args.batch = 8
        remat = args.batch >= 32
        model, state, ae_step, disc_step = build(args.batch, remat=remat,
                                                 disc_bf16=True)
        x = jax.random.uniform(jax.random.PRNGKey(0),
                               (args.batch, 256, 256, 3), jnp.bfloat16)
        rng, temp = jax.random.PRNGKey(1), jnp.float32(1.0)
        fn = (lambda s: ae_step(s, x, rng, temp)) if args.mode == "train_ae" \
            else (lambda s: disc_step(s, x, rng, temp, do_r1=False))
        # the steps donate their state: run on copies, keep the original
        s = fn(jax.tree.map(jnp.copy, state))[0]
        float(jnp.sum(jnp.asarray(s.step, jnp.float32)))
        del s

        os.makedirs(args.logdir, exist_ok=True)
        jax.profiler.start_trace(args.logdir, create_perfetto_trace=True)
        s = jax.tree.map(jnp.copy, state)
        for i in range(args.iters):
            s = fn(s)[0]
        float(jnp.sum(jnp.asarray(s.step, jnp.float32)))
        jax.profiler.stop_trace()

    traces = sorted(glob.glob(
        os.path.join(args.logdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not traces:
        print("no perfetto trace found under", args.logdir)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])

    # device-track pids: thread name metadata containing 'XLA Op' / 'TPU'
    track = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in ("process_name",
                                                    "thread_name"):
            key = (e.get("pid"), e.get("tid"))
            track.setdefault(key, "")
            track[key] += ";" + str(e.get("args", {}).get("name", ""))

    def is_device(e) -> bool:
        lbl = track.get((e.get("pid"), e.get("tid")), "")
        return ("XLA Ops" in lbl or "TensorCore" in lbl or "/device:" in lbl
                or "TPU" in lbl)

    by_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or not is_device(e):
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        by_op[name] += dur
        total += dur
    if not by_op:
        # fallback: aggregate every complete event, flag the track label
        for e in events:
            if e.get("ph") != "X":
                continue
            by_op[e.get("name", "?")] += float(e.get("dur", 0.0))
        total = sum(by_op.values())
        print("WARNING: no device track matched; showing all events")

    per_iter_ms = total / args.iters / 1e3
    print(f"device total: {total/1e3:.1f} ms over {args.iters} iters "
          f"-> {per_iter_ms:.1f} ms/iter  "
          f"({args.batch / (per_iter_ms/1e3):.1f} img/s device-time)")
    print(f"{'ms/iter':>9}  {'%':>5}  op")
    for name, dur in by_op.most_common(args.top):
        print(f"{dur/args.iters/1e3:9.3f}  {100*dur/total:5.1f}  {name[:110]}")


if __name__ == "__main__":
    main()
