#!/usr/bin/env python3
"""Decode-shape GEMM study: which int8 story actually beats bf16 on chip.

The flagship decode re-reads each weight once per token; weights-only int8
halves that traffic, but the in-kernel int8->bf16 weight cast is VPU work
on EVERY weight element — at 6144-dim shapes the cast no longer hides
under the DMA (measured: 8L int8w decode SLOWER than bf16, 258 vs 276
tok/s). Native W8A8 (per-row dynamic activation quant, int8 x int8 ->
int32 on the MXU) reads the same 1 byte/weight with NO cast.

Methodology: every variant runs inside ONE jitted lax.scan of many
chained iterations — through the relay a dispatch costs ~10-20 ms, so
per-op times from short host loops are pure round-trip noise (this
invalidated an earlier block-size study at 200 iters: ~100 us/iter of
apparent "overhead" was RTT/200). Times here subtract a second run at
double length, so program-entry cost cancels exactly.

Appends decode_gemm rows to BENCH_EXTENDED.json.

Usage: python scripts/bench_decode_gemm.py [--m 4 8 32]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, nargs="+", default=[4, 8, 32])
    ap.add_argument("--shapes", type=str, nargs="+",
                    default=["6144x18432", "6144x6144", "1024x3072"])
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--part", default="gemm", choices=["gemm", "ops"],
                    help="gemm: raw GEMM variants; ops: the composite "
                         "decode ops (fused ln_gemm / mlp / attention) at "
                         "flagship shapes — finds which composite op eats "
                         "the gap between kernel roofline and decode tok/s")
    args = ap.parse_args()
    from enhancing_tpu.utils.compile_cache import maybe_enable_from_env
    maybe_enable_from_env()
    import jax
    import jax.numpy as jnp

    from enhancing_tpu.ops import int8 as q8
    from enhancing_tpu.utils.bench_log import record

    # noise-guarded chained-scan timer (2n-n subtraction; rescales until
    # the signal clears the spread, raises rather than report garbage)
    from enhancing_tpu.utils.timing import timed_scan

    if args.part == "ops":
        bench_ops(args, timed_scan, record)
        return

    for shape in args.shapes:
        d, n = map(int, shape.split("x"))
        key = jax.random.PRNGKey(0)
        w = (jax.random.normal(key, (d, n), jnp.float32) * 0.02
             ).astype(jnp.bfloat16)
        w_q, w_s = q8.quantize_channelwise(w)
        w_s1 = w_s.reshape(1, -1)
        bias = jnp.zeros((n,), jnp.float32)

        def bf16(x):
            return jnp.dot(x, w, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

        def dq_xla(x):
            return q8._int8_gemm_xla(x, w_q, w_s, bias, None, None)

        def dq_pallas(x):
            return q8._int8_gemm_pallas(x, w_q, w_s, bias, None, None)

        def w8a8(x):
            x32 = x.astype(jnp.float32)
            sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                             1e-12) / 127.0
            xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, w_q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * (sx * w_s1)
                    ).astype(jnp.bfloat16)

        for m in args.m:
            x = (jax.random.normal(key, (m, d), jnp.float32) * 0.5
                 ).astype(jnp.bfloat16)
            wbytes = {"bf16": d * n * 2, "dq-xla": d * n,
                      "dq-pallas": d * n, "w8a8": d * n}
            for name, fn in (("bf16", bf16), ("dq-xla", dq_xla),
                             ("dq-pallas", dq_pallas), ("w8a8", w8a8)):
                t = timed_scan(fn, x, args.iters)
                gbs = wbytes[name] / t / 1e9
                print(f"[gemm m{m} {d}x{n} {name:9s}] {t * 1e6:7.1f} us "
                      f"({gbs:5.0f} GB/s weight read)", flush=True)
                record("decode_gemm", t * 1e6, "us", m=m, d=d, n=n,
                       mode=name, gbs=round(gbs, 1))


def bench_ops(args, timed_scan, record):
    """Composite decode ops at flagship shapes (6144d, 24L, b4): fused
    int8 ln+qkv GEMM, proj GEMM, whole-MLP kernel, stacked-cache decode
    attention — per-op us + effective GB/s, per impl."""
    import jax
    import jax.numpy as jnp

    from enhancing_tpu.ops import int8 as q8
    from enhancing_tpu.ops.attention import decode_attention_stacked

    d, h, L, ctx = 6144, 24576, 24, 1152
    key = jax.random.PRNGKey(0)
    for m in args.m:
        x = (jax.random.normal(key, (m, 1, d), jnp.float32) * 0.5
             ).astype(jnp.bfloat16)
        g = jnp.ones((d,), jnp.float32)
        bt = jnp.zeros((d,), jnp.float32)
        tm = jnp.linspace(0, 1, d).astype(jnp.float32)
        prev = jnp.zeros((m, 1, d), jnp.bfloat16)
        w_qkv = (jax.random.normal(key, (d, 3 * d), jnp.float32) * 0.02
                 ).astype(jnp.bfloat16)
        wq_qkv, s_qkv = q8.quantize_channelwise(w_qkv)
        w_pr = (jax.random.normal(key, (d, d), jnp.float32) * 0.02
                ).astype(jnp.bfloat16)
        wq_pr, s_pr = q8.quantize_channelwise(w_pr)
        w0 = (jax.random.normal(key, (d, h), jnp.float32) * 0.02
              ).astype(jnp.bfloat16)
        wq0, s0 = q8.quantize_channelwise(w0)
        w1 = (jax.random.normal(key, (h, d), jnp.float32) * 0.02
              ).astype(jnp.bfloat16)
        wq1, s1 = q8.quantize_channelwise(w1)
        kq = jax.random.randint(key, (L, m, ctx, d), -127, 128,
                                jnp.int32).astype(jnp.int8)
        vq = jax.random.randint(key, (L, m, ctx, d), -127, 128,
                                jnp.int32).astype(jnp.int8)
        ksc = jnp.full((L, m, ctx), 0.01, jnp.float32)
        vsc = jnp.full((L, m, ctx), 0.01, jnp.float32)
        cur = jnp.int32(512)

        def op_qkv(impl, w8a8=False):
            def f(c, w, s):
                o, _ = q8.int8_ln_gemm(c, g, bt, tm, prev, w, s,
                                       None, w8a8=w8a8, impl=impl)
                return o
            return f

        def op_proj(impl, w8a8=False):
            return lambda c, w, s: q8.int8_gemm(
                c[..., :d], w, s, None, w8a8=w8a8, impl=impl)

        def op_mlp(impl, w8a8=False):
            return lambda c, a0, c0, a1, c1: q8.int8_mlp_decode(
                c, g, bt, a0, c0, None, a1, c1, None, residual=c,
                activation="sqrelu", w8a8=w8a8, impl=impl)

        def op_attn(c, kq, vq, ksc, vsc):
            # sum over a mini layer walk like the scan body does
            y = decode_attention_stacked(
                c[:, 0, :], kq, vq, c[:, 0, :], c[:, 0, :],
                cur, jnp.int32(0), head_dim=384,
                k_scale=ksc, v_scale=vsc)
            return y[:, None, :]

        cases = [
            ("qkv xla", op_qkv("xla"), d * 3 * d, (wq_qkv, s_qkv)),
            ("qkv w8a8", op_qkv("xla", True), d * 3 * d, (wq_qkv, s_qkv)),
            ("proj xla", op_proj("xla"), d * d, (wq_pr, s_pr)),
            ("proj pallas", op_proj("pallas"), d * d, (wq_pr, s_pr)),
            ("proj w8a8", op_proj("xla", True), d * d, (wq_pr, s_pr)),
            ("mlp xla", op_mlp("xla"), 2 * d * h, (wq0, s0, wq1, s1)),
            ("mlp pallas", op_mlp("pallas"), 2 * d * h, (wq0, s0, wq1, s1)),
            ("mlp w8a8", op_mlp("xla", True), 2 * d * h, (wq0, s0, wq1, s1)),
            ("attn int8kv L-slice", op_attn, 2 * 512 * d,
             (kq, vq, ksc, vsc)),
        ]
        for name, fn, bytes_r, extras in cases:
            try:
                t = timed_scan(fn, x, args.iters // 4, extras)
            except Exception as e:
                print(f"[op m{m} {name}] FAILED {type(e).__name__}: "
                      f"{str(e)[:90]}", flush=True)
                continue
            gbs = bytes_r * (m if name.startswith("attn") else 1) / t / 1e9
            print(f"[op m{m} {name:20s}] {t * 1e6:7.1f} us "
                  f"({gbs:5.0f} GB/s)", flush=True)
            record("decode_op", t * 1e6, "us", m=m, op=name,
                   gbs=round(gbs, 1))


if __name__ == "__main__":
    main()
