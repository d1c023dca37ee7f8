#!/usr/bin/env python3
"""North-star parity dress rehearsal: one command from released weights to
an rFID/PSNR/SSIM report.

The BASELINE gate is rFID parity of encode->decode reconstructions against
the released HF checkpoint (`thuanz123/vitvqgan-imagenet-base`, reference
README.md:29-32) on the ImageNet validation set. Real weights cannot be
downloaded in this zero-egress image, so this script keeps the whole path
warm: the day a checkpoint, VGG/LPIPS weights, and InceptionV3 FID weights
are droppable, the gate closes in minutes:

    python scripts/parity_report.py \
        --hf_ckpt weight/imagenet_vitvq_base.ckpt \
        --inception weight/pt_inception-2015-12-05.pth \
        --val_dir data/ilsvrc2012/val -o report.json

Pipeline: load HF ckpt through compat/torch_loader (exact-key mapping,
golden-tested) -> encode_codes/decode_codes every val image (SURVEY §3.5,
reference vitvqgan.py:50-59,74-90) -> PSNR + SSIM + rFID (InceptionV3
pool3, pytorch-fid preprocessing) or VGG-Fréchet fallback (--vgg) ->
single JSON report. Tested end-to-end on synthesized weights in CI
(tests/test_scripts.py).
"""
import argparse
import json
from pathlib import Path

import numpy as np

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".JPEG", ".JPG", ".PNG"}


def iter_image_batches(val_dir: str, resolution: int, batch_size: int,
                       max_images: int):
    from enhancing_tpu.data.transforms import EvalTransform, load_image

    files = sorted(p for p in Path(val_dir).rglob("*")
                   if p.suffix in IMG_EXTS)[:max_images]
    if not files:
        raise SystemExit(f"no images under {val_dir}")
    tf = EvalTransform(resolution)
    for i in range(0, len(files), batch_size):
        chunk = files[i:i + batch_size]
        yield np.stack([np.asarray(tf(load_image(str(f))), np.float32)
                        for f in chunk])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--hf_ckpt", required=True,
                   help="released ViT-VQGAN torch checkpoint (.ckpt)")
    p.add_argument("--val_dir", required=True,
                   help="folder of validation images (searched recursively)")
    p.add_argument("--inception", default=None,
                   help="pytorch-fid InceptionV3 weights (.pth) -> true rFID")
    p.add_argument("--vgg", default=None,
                   help="LPIPS/VGG16 torch weights -> VGG-Fréchet fallback")
    p.add_argument("-c", "--config", default="imagenet_vitvq_base",
                   help="config name under configs/, or a path to a .yaml")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--max-images", type=int, default=50_000)
    p.add_argument("--int8", action="store_true",
                   help="ALSO run the W8A8 fake-quant round trip (ops/int8 "
                        "fake_quant_*) and report int8-vs-bf16 code match + "
                        "int8 PSNR/SSIM/rFID — the quantized-serving "
                        "numerics gate for when real weights land")
    p.add_argument("-o", "--out", default="parity_report.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from enhancing_tpu.eval import FrechetDistance, codebook_usage, psnr, ssim
    from enhancing_tpu.utils import get_config_from_file, initialize_from_config

    cfg_path = (Path(args.config) if args.config.endswith(".yaml")
                else Path("configs") / f"{args.config}.yaml")
    cfg = get_config_from_file(cfg_path)
    model_cfg = cfg.model.to_dict()
    model_cfg.setdefault("params", {})["path"] = args.hf_ckpt
    if args.vgg:
        model_cfg["params"].setdefault("loss", {"target":
            "enhancing_tpu.losses.vqperceptual.VQLPIPS",
            "params": {"image_size": args.resolution}})
        model_cfg["params"]["loss"].setdefault("params", {})[
            "lpips_weights"] = args.vgg
    model = initialize_from_config(model_cfg)
    module, variables = model.module, model.variables

    @jax.jit
    def roundtrip(x):
        codes = module.apply(variables, x, method="encode_codes")
        rec = jnp.clip(module.apply(variables, codes, method="decode_codes"),
                       0.0, 1.0)
        return codes, rec

    if args.int8:
        from enhancing_tpu.ops.int8 import (fake_quant_weights,
                                            intercept_dense_w8a8)
        qvars = {**variables,
                 "params": fake_quant_weights(variables["params"])}

        @jax.jit
        def roundtrip_int8(x):
            with intercept_dense_w8a8():
                codes = module.apply(qvars, x, method="encode_codes")
                rec = jnp.clip(
                    module.apply(qvars, codes, method="decode_codes"),
                    0.0, 1.0)
            return codes, rec

    fd, fd_kind = None, None
    if args.inception:
        from enhancing_tpu.eval.inception import fid_feature_fn, init_inception
        net, iparams = init_inception(jax.random.PRNGKey(0), args.inception)
        fd, fd_kind = FrechetDistance(fid_feature_fn(net, iparams)), "rfid"
    elif args.vgg:
        from enhancing_tpu.eval.metrics import vgg_feature_fn
        lp = model.loss   # VQLPIPS: .perceptual (LPIPS module), .lpips_params
        fd = FrechetDistance(vgg_feature_fn(lp.perceptual, lp.lpips_params))
        fd_kind = "vgg_frechet"

    fd8 = None
    if args.int8 and fd_kind == "rfid":
        from enhancing_tpu.eval.inception import fid_feature_fn
        fd8 = FrechetDistance(fid_feature_fn(net, iparams))

    psnrs, ssims, all_codes, n = [], [], [], 0
    psnrs8, ssims8, match8 = [], [], []
    for x in iter_image_batches(args.val_dir, args.resolution,
                                args.batch_size, args.max_images):
        codes, rec = roundtrip(jnp.asarray(x))
        psnrs.append(np.asarray(psnr(jnp.asarray(x), rec)))
        ssims.append(np.asarray(ssim(jnp.asarray(x), rec)))
        all_codes.append(np.asarray(codes).reshape(-1))
        if fd is not None:
            fd.update_real(jnp.asarray(x))
            fd.update_fake(rec)
        if args.int8:
            codes8, rec8 = roundtrip_int8(jnp.asarray(x))
            psnrs8.append(np.asarray(psnr(jnp.asarray(x), rec8)))
            ssims8.append(np.asarray(ssim(jnp.asarray(x), rec8)))
            match8.append(float(jnp.mean((codes8 == codes)
                                         .astype(jnp.float32))))
            if fd8 is not None:
                fd8.update_real(jnp.asarray(x))
                fd8.update_fake(rec8)
        n += x.shape[0]

    n_embed = model_cfg["params"]["quantizer"]["n_embed"]
    report = {
        "checkpoint": args.hf_ckpt,
        "n_images": n,
        "resolution": args.resolution,
        "psnr": float(np.mean(np.concatenate(psnrs))),
        "ssim": float(np.mean(np.concatenate(ssims))),
        "codebook": codebook_usage(np.concatenate(all_codes), n_embed),
    }
    if fd is not None:
        report[fd_kind] = fd.compute()
    else:
        report["rfid"] = None
        report["note"] = ("no --inception/--vgg weights given; rFID skipped "
                          "(PSNR/SSIM computed)")
    if args.int8:
        report["int8_w8a8"] = {
            "code_match_vs_bf16": float(np.mean(match8)),
            "psnr": float(np.mean(np.concatenate(psnrs8))),
            "ssim": float(np.mean(np.concatenate(ssims8))),
        }
        if fd8 is not None:
            report["int8_w8a8"]["rfid"] = fd8.compute()
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
