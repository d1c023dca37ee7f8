#!/usr/bin/env python3
"""CLI trainer: python3 main.py -c <config> [-s seed -nn nodes -ng chips -u
accum -e epochs -lr lr -a amp -b freq -m max_images].

Same surface as the reference entrypoint (reference: main.py:16-61), driving
the TPU-native Trainer instead of pytorch_lightning: a (data, model) device
mesh replaces DDP, XLA collectives replace NCCL, bf16 policy replaces AMP.
"""
import argparse
import random
from datetime import datetime
from pathlib import Path

import numpy as np


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-s", "--seed", type=int, default=0)
    parser.add_argument("-nn", "--num_nodes", type=int, default=1)
    parser.add_argument("-ng", "--num_chips", "--num_gpus", type=int,
                        default=0, help="0 = use all visible devices")
    parser.add_argument("-u", "--update_every", type=int, default=1)
    parser.add_argument("-e", "--epochs", type=int, default=100)
    parser.add_argument("-lr", "--base_lr", type=float, default=4.5e-6)
    parser.add_argument("-a", "--use_amp", default=False, action="store_true",
                        help="bf16 compute policy (TPU-native AMP)")
    parser.add_argument("-b", "--batch_frequency", type=int, default=750)
    parser.add_argument("-m", "--max_images", type=int, default=4)
    parser.add_argument("-mp", "--model_parallel", type=int, default=1,
                        help="tensor-parallel size (mesh 'model' axis)")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--log_every", type=int, default=50,
                        help="scalar-metric cadence (console + "
                             "metrics.jsonl + wandb), in steps")
    parser.add_argument("--split_gan_step", action="store_true",
                        help="compile AE and discriminator updates as two "
                             "smaller XLA programs (faster compiles)")
    parser.add_argument("--reuse_xrec", action="store_true",
                        help="D trains on the AE phase's reconstruction "
                             "instead of re-running the generator forward "
                             "(~20%% faster GAN step; D's fake is one SGD "
                             "step stale vs the reference; implies "
                             "--split_gan_step)")
    parser.add_argument("--zero1", action="store_true",
                        help="shard optimizer state over the data axis "
                             "(ZeRO-1 via GSPMD sharding annotations)")
    parser.add_argument("-pp", "--pipeline_parallel", type=int, default=1,
                        help="pipeline-parallel stages for the stage-2 "
                             "prior (GPipe schedule over a 'pipe' mesh axis)")
    parser.add_argument("--microbatches", type=int, default=8,
                        help="GPipe microbatch count (with -pp > 1)")
    parser.add_argument("--resume", action="store_true",
                        help="auto-resume from the latest checkpoint in "
                             "the run directory (preemption recovery); "
                             "without --run_dir, reuses the newest existing "
                             "run for this config")
    parser.add_argument("--run_dir", type=str, default=None,
                        help="explicit experiment directory (default: a new "
                             "timestamped one under experiments/<config>)")
    parser.add_argument("--sp", action="store_true",
                        help="sequence-parallel residual streams for the "
                             "stage-2 prior (needs a model axis, -mp > 1)")
    parser.add_argument("--compile_cache", type=str, default=None,
                        help="persistent XLA compilation-cache directory "
                             "(reruns/restarts skip recompiles); also via "
                             "ENHANCING_TPU_COMPILE_CACHE")
    parser.add_argument("--coordinator", type=str, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args()

    set_seed(args.seed)

    from enhancing_tpu.utils.compile_cache import (enable_compilation_cache,
                                                   maybe_enable_from_env)
    if args.compile_cache:
        enable_compilation_cache(args.compile_cache)
    else:
        maybe_enable_from_env()

    from enhancing_tpu.parallel import init_distributed, make_mesh
    init_distributed(args.coordinator, args.num_nodes, args.process_id)

    import jax
    from enhancing_tpu.train import Trainer
    from enhancing_tpu.utils import get_config_from_file, initialize_from_config
    from enhancing_tpu.utils.callback import ImageLogger, SetupCallback
    from enhancing_tpu.utils.logging import (JsonlLogger, MultiLogger,
                                              WandbLogger)

    config = get_config_from_file(Path("configs") / f"{args.config}.yaml")
    exp_config = {"name": args.config, "epochs": args.epochs,
                  "update_every": args.update_every, "base_lr": args.base_lr,
                  "use_amp": args.use_amp,
                  "batch_frequency": args.batch_frequency,
                  "max_images": args.max_images}

    # amp: bf16 compute dtype threaded into the model config. The
    # reference's Lightning AMP (`precision=16`, main.py:52) also runs the
    # discriminator in half precision — mirror that with bf16 D compute
    # (D params stay f32). Measured r4 same-day A/B (bench_train_breakdown
    # --disc_bf16, b8): D phase 91.2 -> 70.6 ms (BENCH_EXTENDED.json
    # gan_phase_ms rows); b32 OOMs one chip with the f32 D, runs in bf16.
    if args.use_amp and "params" in config.model:
        config.model["params"]["dtype"] = "bfloat16"
        loss_cfg = config.model["params"].get("loss")
        if loss_cfg and "Discriminator" in str(loss_cfg.get("target", "")):
            dp = loss_cfg.setdefault("params", {}).setdefault(
                "disc_params", {})
            dp.setdefault("dtype", "bfloat16")

    model = initialize_from_config(config.model)

    now = datetime.now().strftime("%d%m%Y_%H%M%S")
    if args.run_dir is not None:
        basedir = Path(args.run_dir)
    elif args.resume:
        # newest by mtime — the day-first %d%m%Y_%H%M%S dir names do NOT
        # sort chronologically lexicographically across months/years
        runs = sorted((Path("experiments") / args.config).glob("*"),
                      key=lambda p: p.stat().st_mtime)
        basedir = runs[-1] if runs else Path("experiments") / args.config / now
    else:
        basedir = Path("experiments") / args.config / now
    setup_cb = SetupCallback(config.to_dict(), exp_config, basedir)
    wandb_logger = WandbLogger(str(basedir), f"{args.config}_{now}",
                               enabled=True)
    # metrics.jsonl always: the zero-egress scalar history (loss/PSNR/
    # code-perplexity trajectories) convergence artifacts are built from
    metrics_logger = MultiLogger(JsonlLogger(str(basedir)), wandb_logger)
    image_cb = ImageLogger(args.batch_frequency, args.max_images,
                           logdir=basedir / "log", wandb_logger=wandb_logger)

    data = initialize_from_config(config.dataset)
    data.prepare_data()

    devices = jax.devices()
    if args.num_chips:
        devices = devices[: args.num_chips * max(args.num_nodes, 1)]
    mesh = make_mesh(model=args.model_parallel,
                     pipe=args.pipeline_parallel, devices=devices)

    trainer = Trainer(max_epochs=args.epochs, base_lr=args.base_lr,
                      use_amp=args.use_amp,
                      accumulate_grad_batches=args.update_every,
                      basedir=str(basedir), seed=args.seed, mesh=mesh,
                      callbacks=[setup_cb, image_cb],
                      max_steps=args.max_steps,
                      log_every=args.log_every,
                      split_gan_step=args.split_gan_step,
                      reuse_xrec=args.reuse_xrec,
                      metrics_logger=metrics_logger,
                      zero1=args.zero1,
                      sp=args.sp,
                      pipeline_parallel=args.pipeline_parallel,
                      microbatches=args.microbatches,
                      resume=args.resume)
    trainer.fit(model, data)


if __name__ == "__main__":
    main()
