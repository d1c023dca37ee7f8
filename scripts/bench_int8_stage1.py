#!/usr/bin/env python3
"""INT8 experiment for the stage-1 tokenizer headline (VERDICT r3 #1).

The bf16 encode+decode headline sits at ~90% of the adjusted MXU-slot
roofline (README), and the v5e's int8 MXU path doubles the slot rate — the
only remaining >1.2x single-chip lever. This script measures both halves of
the question honestly, on random weights (no pretrained ckpt exists in this
image):

1. SPEED CEILING — isolated W8A8 GEMM (dynamic per-row activation quant +
   per-channel weight quant, int8 x int8 -> int32 on the MXU) vs the same
   bf16 GEMM at the headline's dominant shapes (d=768 qkv/fc1 GEMMs over
   131k rows). If the int8 dot does not beat bf16 *including* the
   quantize/rescale passes, the headline experiment is dead on arrival.

2. NUMERICS — full encode/decode round trip with W8A8 FAKE quantization
   (per-channel int8 weights; per-row dynamic int8 on every Dense input,
   injected via nn.intercept_methods — no model surgery): code match rate
   vs bf16 codes + reconstruction PSNR. Fake-quant is numerically the int8
   computation (the int8 dot accumulates exactly in int32).

Appends rows to BENCH_EXTENDED.json; wire into parity_report when real
weights land. Reference workload: the decode_codes hot path
(enhancing/modules/stage1/vitvqgan.py:74-90).

Usage: python scripts/bench_int8_stage1.py [--part all|gemm|numerics]
"""
import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _sync(x) -> float:
    import jax.numpy as jnp
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def bench_gemm():
    import jax
    import jax.numpy as jnp

    from enhancing_tpu.utils.bench_log import record

    m, d = 128 * 1024, 768
    for n in (2304, 3072):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (m, d), jnp.bfloat16)
        w = jax.random.normal(key, (d, n), jnp.bfloat16) * 0.02
        w32 = w.astype(jnp.float32)
        w_scale = jnp.max(jnp.abs(w32), axis=0) / 127.0
        w_q = jnp.clip(jnp.round(w32 / w_scale), -127, 127).astype(jnp.int8)

        @jax.jit
        def bf16_gemm(x, i):
            return jnp.dot(x + i * jnp.bfloat16(1e-8), w)

        @jax.jit
        def int8_gemm(x, i):
            xx = (x + i * jnp.bfloat16(1e-8)).astype(jnp.float32)
            sx = jnp.maximum(jnp.max(jnp.abs(xx), axis=-1, keepdims=True),
                             1e-12) / 127.0
            xq = jnp.clip(jnp.round(xx / sx), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc * (sx * w_scale[None, :])).astype(jnp.bfloat16)

        # control: the raw int8 x int8 -> int32 dot with activations
        # PRE-quantized — isolates the MXU int8 path from the dynamic
        # activation-quant pass, deciding whether a fused quant+dot kernel
        # could ever win (if even this is not ~2x bf16, int8 compute is a
        # dead end for the stage-1 GEMMs on this chip)
        x_pre = jnp.clip(
            jnp.round(jax.random.normal(key, (m, d), jnp.float32) * 40),
            -127, 127).astype(jnp.int8)

        @jax.jit
        def int8_dot_only(xq, i):
            xq = xq + (i.astype(jnp.int8) - i.astype(jnp.int8))  # unique arg
            acc = jax.lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * w_scale[None, :]
                    ).astype(jnp.bfloat16)

        flops = 2 * m * d * n
        for name, fn in (("bf16", bf16_gemm), ("int8-W8A8", int8_gemm),
                         ("int8-dot-only", int8_dot_only)):
            if name == "int8-dot-only":
                x = x_pre
            out = fn(x, jnp.bfloat16(0))
            _sync(out[:1])
            ts = []
            for t in range(3):
                t0 = time.perf_counter()
                o = None
                for i in range(8):
                    o = fn(x, jnp.bfloat16(1 + 8 * t + i))
                _sync(o[:1])
                ts.append((time.perf_counter() - t0) / 8)
            dt = statistics.median(ts)
            print(f"[gemm {m // 1024}k x {d} x {n} {name}] {dt * 1e3:.2f} ms "
                  f"({flops / dt / 1e12:.1f} TFLOP/s)", flush=True)
            record("stage1_gemm", flops / dt / 1e12, "TFLOP/s",
                   m=m, d=d, n=n, mode=name)


def bench_headline(batch=128, iters=8):
    """Same-day A/B of the bench.py headline step (encode+decode, 256px,
    ViT-Base) bf16 vs the REAL W8A8 mode (ops/int8.w8a8_gemms: the four
    block GEMMs ride the MXU's native int8 path; attention, patch embed
    and the VQ search stay bf16)."""
    import jax
    import jax.numpy as jnp

    from enhancing_tpu.models.stage1.vitvqgan import ViTVQ
    from enhancing_tpu.ops.int8 import w8a8_gemms
    from enhancing_tpu.utils.bench_log import record

    enc = dict(dim=768, depth=12, heads=12, mlp_dim=3072)
    model = ViTVQ(image_size=256, patch_size=8, encoder=enc, decoder=enc,
                  quantizer=dict(embed_dim=32, n_embed=8192),
                  dtype="bfloat16")
    module, variables = model.module, model.variables

    def step_fn(v, x, i):
        codes = module.apply(v, x, method="encode_codes")
        out = module.apply(v, codes, method="decode_codes")
        return jnp.clip(out + i * 1e-5, 0.0, 1.0)

    def step_w8a8_fn(v, x, i):
        with w8a8_gemms():
            return step_fn(v, x, i)

    x0 = jax.random.uniform(jax.random.PRNGKey(0), (batch, 256, 256, 3),
                            jnp.float32)
    for name, fn in (("bf16", jax.jit(step_fn)),
                     ("w8a8", jax.jit(step_w8a8_fn))):
        x = fn(variables, x0, jnp.float32(0))
        _sync(x[:1])
        ts = []
        for t in range(3):
            t0 = time.perf_counter()
            for i in range(iters):
                x = fn(variables, x, jnp.float32(1 + iters * t + i))
            _sync(x[:1])
            ts.append((time.perf_counter() - t0) / iters)
        dt = statistics.median(ts)
        print(f"[headline {name} b{batch}] {dt * 1e3:.1f} ms -> "
              f"{batch / dt:.1f} img/s", flush=True)
        record("stage1_headline", batch / dt, "img/s", batch=batch,
               mode=name)


def bench_numerics():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhancing_tpu.models.stage1.vitvqgan import ViTVQ
    from enhancing_tpu.ops.int8 import (fake_quant_weights,
                                        intercept_dense_w8a8)
    from enhancing_tpu.utils.bench_log import record

    enc = dict(dim=768, depth=12, heads=12, mlp_dim=3072)
    model = ViTVQ(image_size=256, patch_size=8, encoder=enc, decoder=enc,
                  quantizer=dict(embed_dim=32, n_embed=8192),
                  dtype="bfloat16")
    module = model.module
    variables = model.variables

    qvars = {**variables,
             "params": fake_quant_weights(variables["params"])}

    @jax.jit
    def roundtrip(vs, x):
        codes = module.apply(vs, x, method="encode_codes")
        return codes, module.apply(vs, codes, method="decode_codes")

    @jax.jit
    def roundtrip_w8a8(vs, x):
        with intercept_dense_w8a8():
            codes = module.apply(vs, x, method="encode_codes")
            return codes, module.apply(vs, codes, method="decode_codes")

    from enhancing_tpu.ops.int8 import w8a8_gemms

    @jax.jit
    def roundtrip_real(vs, x):
        # the REAL serving mode (ops/int8.w8a8_gemms): the four block GEMMs
        # on the int8 MXU path, everything else bf16 — what bench_headline
        # times. (The fake-quant variants above bound the error of
        # quantizing EVERY Dense including patch embed/unembed.)
        with w8a8_gemms():
            codes = module.apply(vs, x, method="encode_codes")
            return codes, module.apply(vs, codes, method="decode_codes")

    x = jax.random.uniform(jax.random.PRNGKey(7), (16, 256, 256, 3),
                           jnp.float32)
    codes_bf, rec_bf = roundtrip(variables, x)
    codes_w8, rec_w8 = roundtrip_w8a8(qvars, x)
    codes_wonly, rec_wonly = roundtrip(qvars, x)
    codes_real, rec_real = roundtrip_real(variables, x)

    def psnr(a, b):
        mse = float(jnp.mean((a.astype(jnp.float32)
                              - b.astype(jnp.float32)) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    for tag, codes, rec in (("w8 (weights-only)", codes_wonly, rec_wonly),
                            ("w8a8", codes_w8, rec_w8),
                            ("w8a8-mode (block GEMMs)", codes_real,
                             rec_real)):
        match = float(jnp.mean((codes == codes_bf).astype(jnp.float32)))
        p = psnr(rec, rec_bf)
        print(f"[numerics {tag}] code match {match * 100:.1f}%, recon PSNR "
              f"vs bf16 recon {p:.1f} dB", flush=True)
        record("stage1_int8_numerics", match, "code_match_frac",
               mode=tag.split()[0], psnr_db=round(p, 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="all",
                    choices=["all", "gemm", "numerics", "headline"])
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    from enhancing_tpu.utils.compile_cache import maybe_enable_from_env
    maybe_enable_from_env()
    if args.part in ("all", "gemm"):
        bench_gemm()
    if args.part in ("all", "headline"):
        bench_headline(batch=args.batch)
    if args.part in ("all", "numerics"):
        bench_numerics()


if __name__ == "__main__":
    main()
