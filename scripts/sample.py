#!/usr/bin/env python3
"""Generate images from a trained stage-2 prior.

Usage:
    python scripts/sample.py -c imagenet_gpt_vitvq_base --classes 1 7 42 \
        [--top_k 100] [--top_p 0.95] [--temperature 1.0] [-n 4] [-o samples]

The equivalent of the reference's CondTransformer.sample path
(enhancing/modules/stage2/transformer.py:78-95) as a CLI.
"""
import argparse
from pathlib import Path

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--classes", type=int, nargs="+", default=[0])
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--top_p", type=float, default=None)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("-n", "--num_per_class", type=int, default=1)
    p.add_argument("-s", "--seed", type=int, default=0)
    p.add_argument("-o", "--outdir", default="samples")
    p.add_argument("--shard", action="store_true",
                   help="decode the batch data-parallel over all devices")
    args = p.parse_args()

    from enhancing_tpu.utils import get_config_from_file, initialize_from_config
    from enhancing_tpu.utils.logging import save_image_grid

    cfg = get_config_from_file(Path("configs") / f"{args.config}.yaml")
    model = initialize_from_config(cfg.model)

    conds = np.repeat(np.asarray(args.classes, np.int32),
                      args.num_per_class)[:, None]
    mesh = None
    if args.shard:
        from enhancing_tpu.parallel import make_mesh
        mesh = make_mesh()
    pixels = model.sample(conds, top_k=args.top_k, top_p=args.top_p,
                          softmax_temperature=args.temperature,
                          seed=args.seed, mesh=mesh)
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    save_image_grid(np.asarray(pixels), outdir / "samples.png",
                    nrow=args.num_per_class)
    print(f"wrote {len(conds)} samples to {outdir}/samples.png")


if __name__ == "__main__":
    main()
