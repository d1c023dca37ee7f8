#!/usr/bin/env python3
"""Tokenize + reconstruct images with a trained stage-1 model.

Usage:
    python scripts/reconstruct.py -c imagenet_vitvq_base \
        [--ckpt weight/imagenet_vitvq_base.ckpt] image1.jpg image2.png \
        [-o out_dir] [--resolution 256]

Loads the model from the config's ``model:`` block (optionally overriding the
checkpoint path), encodes each image to codes, decodes back, and writes
side-by-side original/reconstruction grids plus the codes as .npy.
"""
import argparse
from pathlib import Path

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("images", nargs="+")
    p.add_argument("--ckpt", default=None)
    p.add_argument("-o", "--outdir", default="reconstructions")
    p.add_argument("--resolution", type=int, default=None)
    args = p.parse_args()

    from enhancing_tpu.data.transforms import EvalTransform, load_image
    from enhancing_tpu.utils import get_config_from_file, initialize_from_config
    from enhancing_tpu.utils.logging import save_image_grid

    cfg = get_config_from_file(Path("configs") / f"{args.config}.yaml")
    model_cfg = cfg.model.to_dict() if hasattr(cfg.model, "to_dict") else dict(cfg.model)
    if args.ckpt:
        model_cfg.setdefault("params", {})["path"] = args.ckpt
    model = initialize_from_config(model_cfg)

    res = args.resolution or model.image_size
    tf = EvalTransform(res)
    batch = np.stack([tf(load_image(f)) for f in args.images])

    codes = model.encode_codes(batch)
    recon = np.clip(np.asarray(model.decode_codes(codes)), 0, 1)

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    np.save(outdir / "codes.npy", np.asarray(codes))
    for i, f in enumerate(args.images):
        stem = Path(f).stem
        save_image_grid(np.stack([batch[i], recon[i]]),
                        outdir / f"{stem}_recon.png", nrow=2)
    mse = float(np.mean((recon - batch) ** 2))
    print(f"wrote {len(args.images)} grids to {outdir}  (codes shape "
          f"{tuple(np.asarray(codes).shape)}, MSE {mse:.5f})")


if __name__ == "__main__":
    main()
