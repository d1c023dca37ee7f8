#!/usr/bin/env python3
"""GAN training-step profile for the ViT-VQGAN-Base config (VERDICT r2 #5).

Times the pieces of the full adversarial step separately (the split-step
programs ARE the production alternative, so their times are the breakdown),
sweeps the training batch, and reports training MFU from XLA's own
cost_analysis of the exact compiled programs.

Usage: python scripts/bench_train_breakdown.py [--batches 8 16 32]
"""
import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PEAK = 197e12  # v5e bf16


def _sync(x) -> float:
    import jax.numpy as jnp
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def build(batch: int, remat: bool, disc_bf16: bool = False,
          reuse_xrec: bool = False, r1_chunk=None):
    import jax.numpy as jnp
    from enhancing_tpu.models.stage1.vitvqgan import ViTVQ
    from enhancing_tpu.train.optim import make_ae_optimizer
    from enhancing_tpu.train.steps import (GANTrainState,
                                           make_vitvq_train_steps_split)

    enc = dict(dim=768, depth=12, heads=12, mlp_dim=3072, remat=remat)
    loss_params = {"image_size": 256, "perceptual_weight": 1.0,
                   "allow_random_lpips": True,  # benchmark, not training
                   "adversarial_weight": 1.0}
    if disc_bf16:
        # mixed-precision D (params f32, compute bf16) — the analogue of
        # the reference's Lightning AMP `-a` flag, which also runs the
        # discriminator in half precision
        loss_params["disc_params"] = {"dtype": "bfloat16"}
    if r1_chunk:
        loss_params["r1_chunk"] = r1_chunk
    model = ViTVQ(
        image_size=256, patch_size=8, encoder=enc, decoder=enc,
        quantizer=dict(embed_dim=32, n_embed=8192), dtype="bfloat16",
        loss={"target":
              "enhancing_tpu.losses.vqperceptual.VQLPIPSWithDiscriminator",
              "params": loss_params})
    loss_obj = model.loss
    ae_tx = make_ae_optimizer(1e-4, None, 1)
    disc_tx = make_ae_optimizer(1e-4, None, 1)
    state = GANTrainState(
        step=jnp.ones((), jnp.int32) * 10_000,  # past disc warmup
        ae_params=model.params, ae_opt=ae_tx.init(model.params),
        disc_params=loss_obj.disc_init_params,
        disc_opt=disc_tx.init(loss_obj.disc_init_params),
        lpips_params=loss_obj.lpips_params)
    ae_step, disc_step = make_vitvq_train_steps_split(
        model, loss_obj, ae_tx, disc_tx, reuse_xrec=reuse_xrec)
    return model, state, ae_step, disc_step


def timed(fn, state, x0, iters=10, trials=3):
    import jax
    import jax.numpy as jnp

    def run(n, tag):
        # the step DONATES its state arg; reusing ``state`` across run()s
        # dispatches against deleted buffers (the relay reports it as a
        # bare InvalidArgument at the NEXT op). Copy per run; the copy cost
        # cancels in the marginal-time subtraction.
        s = jax.tree.map(jnp.copy, state)
        t0 = time.perf_counter()
        for i in range(n):
            s, log = fn(s, x0 + jnp.bfloat16((tag + i) * 1e-6))
        _sync(jax.tree.leaves(log)[0])
        return time.perf_counter() - t0

    ts = []
    for t in range(trials):
        ts.append((run(2 + iters, 100 + t) - run(2, 10_000 + t)) / iters)
    return statistics.median(ts)


def count_flops(reuse_xrec: bool = False) -> None:
    """Subprocess (--count-flops): algorithmic FLOPs of the ae/disc steps at
    b8, from XLA's CPU cost analysis of the pure-XLA twin programs (same
    honest-MFU basis as bench.py: Pallas cost_estimates report physical
    MACs and TPU-side counts include padding duplication). Callers scale by
    batch/8 — algorithmic flops are exactly linear in batch, and the scaled
    number deliberately excludes remat recompute (MFU counts model flops,
    not recomputation)."""
    import json

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from enhancing_tpu.ops.common import force_xla_ops

    model, state, ae_step, disc_step = build(8, remat=False,
                                             reuse_xrec=reuse_xrec)
    x0 = jnp.zeros((8, 256, 256, 3), jnp.bfloat16)
    rng = jax.random.PRNGKey(1)
    temp = jnp.float32(1.0)
    with force_xla_ops():
        fl_ae = float(ae_step.lower(state, x0, rng, temp)
                      .compile().cost_analysis()["flops"])
        # the d program without the generator forward when reuse_xrec:
        # its honest flop basis must match what the timed program runs
        d_kw = ({"xrec": x0} if reuse_xrec else {})
        fl_d = float(disc_step.lower(state, x0, rng, temp, do_r1=False,
                                     **d_kw)
                     .compile().cost_analysis()["flops"])
    print(json.dumps({"fl_ae_b8": fl_ae, "fl_d_b8": fl_d}))


def algorithmic_flops_b8(reuse_xrec: bool = False) -> tuple:
    import json
    import os
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--count-flops"]
            + (["--reuse_xrec"] if reuse_xrec else []),
            capture_output=True, text=True, timeout=1800)
        d = json.loads(proc.stdout.strip().splitlines()[-1])
        return d["fl_ae_b8"], d["fl_d_b8"]
    except Exception:
        return float("nan"), float("nan")


def bench_ae_segments(batches, record):
    """Per-segment timing of the AE phase's pieces (VERDICT r4 #3: the AE
    phase is 66% of the GAN step and had no breakdown). Each segment is its
    own chained-scan program (utils/timing.timed_scan), so the numbers
    localize cost; they need not sum exactly to the phase (fusion across
    segment boundaries differs), but the fwd/bwd split and the LPIPS/D-fwd
    shares are what the optimization question needs.

    Every segment's computation consumes the scan carry — otherwise XLA
    hoists the loop-invariant body and the scan times nothing."""
    import jax
    import jax.numpy as jnp

    from enhancing_tpu.utils.timing import timed_scan

    for batch in batches:
        model, state, _, _ = build(batch, remat=False)
        module, constants = model.module, model.constants
        loss_obj = model.loss
        ae_params = state.ae_params
        dp = state.disc_params
        lp = state.lpips_params
        temp = jnp.float32(1.0)
        n_embed = module.quantizer["n_embed"]

        x0 = jax.random.uniform(jax.random.PRNGKey(0),
                                (batch, 256, 256, 3), jnp.bfloat16)
        codes0 = module.apply({"params": ae_params, "constants": constants},
                              x0, method="encode_codes")

        def vs(p):
            return {"params": p, "constants": constants}

        def enc_fwd(c, p):
            return module.apply(vs(p), c, method="encode_codes")

        def dec_fwd(c, p, codes):
            # fold the carry into the codes so the decode isn't hoisted
            shift = (jnp.sum(c[0, 0, 0, :]).astype(jnp.int32) % 2)
            return module.apply(vs(p), (codes + shift) % n_embed,
                                method="decode_codes")

        def fwd_training(c, p):
            xrec, qloss, _, _ = module.apply(vs(p), c, temp, True,
                                             method="forward_training")
            return xrec

        def lpips_pair(c, p, lpp):
            # nll_loss = L1 + L2 + LPIPS (two VGG towers: x and xrec)
            return loss_obj.nll_loss(x0.astype(jnp.float32), c, lpp)[0]

        def d_fwd(c, dpp):
            return loss_obj.run_discriminator(dpp, c)

        def ae_loss_fwd(c, p, dpp, lpp):
            xrec, qloss, _, _ = module.apply(vs(p), c, temp, True,
                                             method="forward_training")
            l, _ = loss_obj.generator_loss(qloss, c, xrec, dpp,
                                           jnp.float32(1.0),
                                           lpips_params=lpp)
            return l

        def ae_fwd_bwd(c, p, dpp, lpp):
            # return the WHOLE grad tree — timed_scan checksums every leaf,
            # so no layer's dW GEMM is dead code (returning one leaf
            # understated this segment by ~2x)
            return jax.grad(lambda pp: ae_loss_fwd(c, pp, dpp, lpp))(p)

        from enhancing_tpu.train.optim import make_ae_optimizer
        tx = make_ae_optimizer(1e-4, None, 1)
        opt0 = tx.init(ae_params)

        def adamw_update(c, p, opt):
            # AdamW bandwidth: fake grads derived from the carry (the
            # update math is value-independent), full params+moments
            # read/write — the piece of the AE phase that is pure
            # optimizer
            s = jnp.sum(c[0, 0, 0, :1]).astype(jnp.float32) * 1e-12
            g = jax.tree.map(lambda a: a * (1.0 + s).astype(a.dtype), p)
            updates, opt = tx.update(g, opt, p)
            import optax
            return optax.apply_updates(p, updates)

        segs = [
            ("enc_fwd", enc_fwd, (ae_params,)),
            ("dec_fwd", dec_fwd, (ae_params, codes0)),
            ("ae_fwd", fwd_training, (ae_params,)),
            ("lpips_pair_fwd", lpips_pair, (ae_params, lp)),
            ("d_fwd", d_fwd, (dp,)),
            ("ae_loss_fwd", ae_loss_fwd, (ae_params, dp, lp)),
            ("ae_fwd_bwd", ae_fwd_bwd, (ae_params, dp, lp)),
            ("adamw_update", adamw_update, (ae_params, opt0)),
        ]
        out = {}
        for name, fn, extras in segs:
            t = timed_scan(fn, x0, 10, extras)
            out[name] = t
            print(f"[ae-seg b{batch} {name:15s}] {t * 1e3:7.2f} ms",
                  flush=True)
            record("ae_segment_ms", t * 1e3, "ms", batch=batch,
                   segment=name)
        bwd = out["ae_fwd_bwd"] - out["ae_loss_fwd"]
        print(f"[ae-seg b{batch} derived] bwd-only "
              f"{bwd * 1e3:.2f} ms; loss-overhead (lpips+D fwd) "
              f"{(out['ae_loss_fwd'] - out['ae_fwd']) * 1e3:.2f} ms",
              flush=True)


def bench_scanned(batches, record, reuse_xrec=False, disc_bf16=True,
                  iters=16, no_flops=False):
    """Chained-scan GAN-step timing: ``iters`` full steps inside ONE jitted
    program (state is the scan carry, so every grad/optimizer buffer feeds
    the next iteration — nothing is DCE-able, unlike single-segment probes
    that return one leaf). This is pure DEVICE time: the per-step numbers
    from ``timed()`` include one relay dispatch per host-issued program
    (~10-20 ms on this network-attached chip, absent on a PCIe-attached
    production host), which a scanned multi-step train loop amortizes away.
    The gap between the two IS the dispatch overhead."""
    import jax
    import jax.numpy as jnp

    fl_ae_b8, fl_d_b8 = ((float("nan"), float("nan")) if no_flops
                         else algorithmic_flops_b8(reuse_xrec))

    for batch in batches:
        remat = batch >= 32
        model, state, ae_step, disc_step = build(
            batch, remat, disc_bf16=disc_bf16, reuse_xrec=reuse_xrec)
        rng = jax.random.PRNGKey(1)
        temp = jnp.float32(1.0)

        def full_body(s, x):
            # one full adversarial step: AE update, then D update on the
            # (reuse_xrec: pre-update) reconstruction — the carry threads
            # params+opt+disc so no backward GEMM is dead code
            if reuse_xrec:
                s, _, xrec = ae_step(s, x, rng, temp)
                s, _ = disc_step(s, x, rng, temp, do_r1=False, xrec=xrec)
            else:
                s, _ = ae_step(s, x, rng, temp)
                s, _ = disc_step(s, x, rng, temp, do_r1=False)
            return s

        def ae_body(s, x):
            out = ae_step(s, x, rng, temp)
            return out[0]

        def scan_time(body, n, tag, trials=5):
            """Median ms/step of ONE n-step scanned program, timed whole
            (no 2n-n subtraction — it doubles relay jitter; the one-time
            program-entry cost is <= one relay dispatch / n steps, ~1-2%
            at n=16, an OVERstatement of step time, i.e. conservative for
            MFU). Returns (median_s, spread_s)."""
            @jax.jit
            def run(s0, x0):
                def step_i(s, i):
                    # unique input per iteration (relay caches identical
                    # (executable, input) pairs) that also consumes the
                    # carry's step counter — serializes iterations
                    x = x0 + (i + s.step).astype(jnp.bfloat16) * 1e-6
                    return body(s, x), None
                s, _ = jax.lax.scan(step_i, s0, jnp.arange(n))
                # checksum EVERY leaf of the final state: returning only
                # s.step lets XLA dead-code the entire training chain
                # (measured: a 365% "MFU" and a full step faster than
                # its own AE phase)
                return sum(jnp.sum(l).astype(jnp.float32)
                           for l in jax.tree.leaves(s))
            x0 = jax.random.uniform(jax.random.PRNGKey(0),
                                    (batch, 256, 256, 3), jnp.bfloat16)
            _sync(run(jax.tree.map(jnp.copy, state), x0))  # compile
            ts = []
            for t in range(trials):
                s0 = jax.tree.map(jnp.copy, state)
                # drain the async state copies BEFORE opening the timing
                # window — the device queue is in-order, so run() would
                # otherwise wait on the copy tail inside the window
                _sync(jax.tree.leaves(s0)[-1])
                xt = x0 + jnp.bfloat16((1 + t) * 1e-5)
                t0 = time.perf_counter()
                _sync(run(s0, xt))
                ts.append((time.perf_counter() - t0) / n)
            med = statistics.median(ts)
            spread = max(ts) - min(ts)
            print(f"  [scanned {tag}] {med*1e3:.1f} ms/step "
                  f"(spread {spread*1e3:.1f} over {trials} programs of "
                  f"{n} steps)", flush=True)
            if med <= 0 or spread > med:
                print(f"  [scanned {tag}] NOISY — not recording", flush=True)
                return None, None
            return med, spread

        t_ae, sp_ae = scan_time(ae_body, iters, "ae")
        t_full, sp_full = scan_time(full_body, iters, "full")
        if t_full is None:
            continue
        fl = (fl_ae_b8 + fl_d_b8) * batch / 8
        mfu = fl / t_full / PEAK * 100
        tag = " reuse_xrec" if reuse_xrec else ""
        print(f"[gan-scanned b{batch}{tag}] "
              f"ae {'%.1f' % (t_ae * 1e3) if t_ae else '?'} ms, "
              f"full step {t_full*1e3:.1f} ms ({batch/t_full:.1f} img/s, "
              f"device MFU {mfu:.1f}%)", flush=True)
        record("gan_step_scanned", batch / t_full, "img/s", batch=batch,
               remat=remat, disc_bf16=disc_bf16, reuse_xrec=reuse_xrec,
               ae_ms=round(t_ae * 1e3, 1) if t_ae else None,
               ae_spread_ms=round(sp_ae * 1e3, 1) if t_ae else None,
               full_ms=round(t_full * 1e3, 1),
               full_spread_ms=round(sp_full * 1e3, 1),
               mfu_pct=round(mfu, 1), iters_per_program=iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--phase", choices=["all", "ae", "d", "r1", "segments",
                                        "scanned"],
                    default="all",
                    help="time one phase only (per-phase subprocesses keep "
                         "peak HBM down at b32: one held state + one copy "
                         "+ that phase's activations)")
    ap.add_argument("--disc_bf16", action="store_true",
                    help="mixed-precision discriminator (bf16 compute)")
    ap.add_argument("--reuse_xrec", action="store_true",
                    help="D trains on the AE phase's xrec (no second "
                         "generator forward; one SGD step stale)")
    ap.add_argument("--no-flops", action="store_true",
                    help="skip the CPU cost-analysis subprocess (phase runs "
                         "print raw ms only)")
    ap.add_argument("--r1_chunk", type=int, default=None,
                    help="sub-batch the R1 penalty (losses/vqperceptual "
                         "r1_chunk): fits the b32 R1 step on one chip; "
                         "must be a multiple of the minibatch-stddev group "
                         "(4) and divide the batch — whole-group chunks "
                         "are exact, anything else raises")
    args = ap.parse_args()
    from enhancing_tpu.utils.compile_cache import maybe_enable_from_env
    maybe_enable_from_env()
    import jax
    import jax.numpy as jnp
    from enhancing_tpu.utils.bench_log import record

    if args.phase == "segments":
        bench_ae_segments(args.batches, record)
        return
    if args.phase == "scanned":
        bench_scanned(args.batches, record, reuse_xrec=args.reuse_xrec,
                      disc_bf16=args.disc_bf16, no_flops=args.no_flops)
        return

    fl_ae_b8, fl_d_b8 = ((float("nan"), float("nan")) if args.no_flops
                         else algorithmic_flops_b8(args.reuse_xrec))

    for batch in args.batches:
        remat = batch >= 32
        model, state, ae_step, disc_step = build(batch, remat,
                                                  args.disc_bf16,
                                                  args.reuse_xrec,
                                                  args.r1_chunk)
        x0 = jax.random.uniform(jax.random.PRNGKey(0),
                                (batch, 256, 256, 3), jnp.bfloat16)
        rng = jax.random.PRNGKey(1)
        temp = jnp.float32(1.0)

        if args.reuse_xrec:
            # the d phase consumes the ae phase's xrec; time it against a
            # fixed representative xrec (same shape/dtype — the d program
            # cost does not depend on its values)
            s_tmp, _, xrec0 = ae_step(jax.tree.map(jnp.copy, state), x0,
                                      rng, temp)
            _sync(s_tmp.step)
            del s_tmp

            def ae(s, x):
                s2, log, _ = ae_step(s, x, rng, temp)
                return s2, log

            def d(s, x):
                return disc_step(s, x, rng, temp, do_r1=False, xrec=xrec0)

            def d_r1(s, x):
                return disc_step(s, x, rng, temp, do_r1=True, xrec=xrec0)
        else:
            def ae(s, x):
                return ae_step(s, x, rng, temp)

            def d(s, x):
                return disc_step(s, x, rng, temp, do_r1=False)

            def d_r1(s, x):
                return disc_step(s, x, rng, temp, do_r1=True)

        def fresh():
            # never hand the original (donated-arg) state to a step — see
            # the note in timed()
            return jax.tree.map(jnp.copy, state)

        def phase(name, fn, iters=10):
            # drop the warmup's returned state before timing — extra live
            # GAN states alongside the original exhaust 16 GB HBM at b16+
            s, _ = fn(fresh(), x0)
            _sync(s.step)
            del s
            return timed(fn, state, x0, iters=iters)

        if args.phase != "all":
            fn = {"ae": ae, "d": d, "r1": d_r1}[args.phase]
            t = phase(args.phase, fn, iters=4 if args.phase == "r1" else 10)
            print(f"[gan-phase b{batch}{' remat' if remat else ''} "
                  f"{args.phase}] {t*1e3:.1f} ms", flush=True)
            record("gan_phase_ms", t * 1e3, "ms", batch=batch, remat=remat,
                   phase=args.phase, disc_bf16=args.disc_bf16,
                   reuse_xrec=args.reuse_xrec, r1_chunk=args.r1_chunk)
            continue

        t_ae = phase("ae", ae)
        t_d = phase("d", d)
        t_r1 = phase("r1", d_r1, iters=4)

        fl_ae = fl_ae_b8 * batch / 8
        fl_d = fl_d_b8 * batch / 8
        total = t_ae + t_d
        fl = fl_ae + fl_d
        r1_surcharge = (t_r1 - t_d)
        # amortized over the do_r1_every=16 cadence
        amort = total + r1_surcharge / 16
        print(f"[gan-step b{batch}{' remat' if remat else ''}] "
              f"ae {t_ae*1e3:.1f} ms + disc {t_d*1e3:.1f} ms = "
              f"{total*1e3:.1f} ms ({batch/total:.1f} img/s); "
              f"R1 step {t_r1*1e3:.1f} ms (+{r1_surcharge*1e3:.1f}, "
              f"amortized/16 -> {amort*1e3:.1f} ms); "
              f"MFU {fl/total/PEAK*100:.1f}% "
              f"({fl_ae/1e9:.0f}+{fl_d/1e9:.0f} GF)", flush=True)
        record("gan_train_step", batch / total, "img/s", batch=batch,
               remat=remat, disc_bf16=args.disc_bf16,
               reuse_xrec=args.reuse_xrec,
               ae_ms=round(t_ae * 1e3, 1), d_ms=round(t_d * 1e3, 1),
               r1_ms=round(t_r1 * 1e3, 1),
               mfu_pct=round(fl / total / PEAK * 100, 1))


if __name__ == "__main__":
    if "--count-flops" in sys.argv:
        count_flops(reuse_xrec="--reuse_xrec" in sys.argv)
    else:
        main()
