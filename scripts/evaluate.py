#!/usr/bin/env python3
"""Reconstruction-quality evaluation for a stage-1 tokenizer.

Computes PSNR, SSIM and a VGG-feature Fréchet distance (rFID-style; exact
rFID needs InceptionV3 weights which cannot be downloaded in zero-egress
environments — pass LPIPS/VGG torch weights via the model config's
``lpips_weights`` for a metric that tracks it) between dataset images and
their encode->decode reconstructions.

Usage:
    python scripts/evaluate.py -c imagenet_vitvq_base \
        [--ckpt weight/imagenet_vitvq_base.ckpt] [--split validation] \
        [--max-batches 50] [--batch-size 16]
"""
import argparse
import json
from pathlib import Path

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--split", default="validation")
    p.add_argument("--max-batches", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=None)
    args = p.parse_args()

    import jax.numpy as jnp
    from enhancing_tpu.eval import FrechetDistance, codebook_usage, psnr, ssim
    from enhancing_tpu.eval.metrics import vgg_feature_fn
    from enhancing_tpu.utils import get_config_from_file, initialize_from_config

    cfg = get_config_from_file(Path("configs") / f"{args.config}.yaml")
    model_cfg = cfg.model.to_dict()
    if args.ckpt:
        model_cfg.setdefault("params", {})["path"] = args.ckpt
    model = initialize_from_config(model_cfg)

    data_cfg = cfg.dataset.to_dict()
    if args.batch_size:
        data_cfg["params"]["batch_size"] = args.batch_size
    data = initialize_from_config(data_cfg)
    data.setup()
    loader = (data.val_dataloader() if args.split == "validation"
              else data.train_dataloader())

    fd = None
    if model.loss is not None and hasattr(model.loss, "perceptual"):
        fd = FrechetDistance(vgg_feature_fn(model.loss.perceptual,
                                            model.loss.lpips_params))

    psnrs, ssims, all_codes = [], [], []
    n_embed = model.module.quantizer["n_embed"]
    for i, batch in enumerate(loader):
        if i >= args.max_batches:
            break
        x = model.get_input(batch, model.image_key)
        codes = model.encode_codes(x)
        rec = jnp.clip(model.decode_codes(codes), 0.0, 1.0)
        psnrs.extend(np.asarray(psnr(x, rec)).tolist())
        ssims.extend(np.asarray(ssim(x, rec)).tolist())
        all_codes.append(np.asarray(codes).reshape(-1))
        if fd is not None:
            fd.update_real(x)
            fd.update_fake(rec)

    result = {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "num_images": len(psnrs),
        **{f"codebook_{k}": v for k, v in
           codebook_usage(np.concatenate(all_codes), n_embed).items()},
    }
    if fd is not None:
        result["vgg_frechet_distance"] = fd.compute()
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
