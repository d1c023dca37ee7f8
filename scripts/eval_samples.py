"""Generation-quality evaluation: Fréchet distance between prior samples
and dataset images (FID-style; becomes true FID when InceptionV3 torchvision
weights are supplied via --inception_weights, else the flax VGG16 trunk).

Usage:
    python scripts/eval_samples.py -c imagenet_gpt_vitvq_base \
        [--ckpt prior.ckpt] [--num_samples 256] [--batch 16] \
        [--top_k 300] [--inception_weights inception.pth]

Complements scripts/evaluate.py (reconstruction metrics): this one drives
the full conditional sampling path (prior decode + tokenizer decode).
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--num_samples", type=int, default=256)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--top_k", type=int, default=300)
    p.add_argument("--top_p", type=float, default=None)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--split", default="validation")
    p.add_argument("--inception_weights", default=None,
                   help="torchvision InceptionV3 state_dict for true FID")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from enhancing_tpu.eval import FrechetDistance
    from enhancing_tpu.utils import (get_config_from_file,
                                     initialize_from_config)

    cfg = get_config_from_file(Path("configs") / f"{args.config}.yaml")
    model_cfg = cfg.model.to_dict()
    if args.ckpt:
        model_cfg.setdefault("params", {})["path"] = args.ckpt
    model = initialize_from_config(model_cfg)

    if args.inception_weights:
        from enhancing_tpu.eval.inception import (fid_feature_fn,
                                                  init_inception)
        feat_fn = fid_feature_fn(
            *init_inception(jax.random.PRNGKey(0),
                            weights_path=args.inception_weights))
    else:
        from enhancing_tpu.eval.metrics import vgg_feature_fn
        from enhancing_tpu.losses.lpips import init_lpips

        lp, params = init_lpips(jax.random.PRNGKey(0),
                                image_size=model.stage1_model.image_size
                                if isinstance(
                                    model.stage1_model.image_size, int)
                                else model.stage1_model.image_size[0])
        feat_fn = vgg_feature_fn(lp, params)

    data = initialize_from_config(cfg.dataset.to_dict())
    data.setup()
    loader = (data.val_dataloader() if args.split == "validation"
              else data.train_dataloader())

    fd = FrechetDistance(feat_fn)
    n_classes = model.transformer.vocab_cond_size
    rng = np.random.default_rng(args.seed)

    made = 0
    while made < args.num_samples:
        b = min(args.batch, args.num_samples - made)
        conds = rng.integers(0, n_classes, (b, 1)).astype(np.int32)
        pixels = model.sample(conds, top_k=args.top_k, top_p=args.top_p,
                              softmax_temperature=args.temperature,
                              seed=args.seed + made)
        fd.update_fake(jnp.asarray(pixels))
        made += b

    seen = 0
    for batch in loader:
        x = model.stage1_model.get_input(
            batch, model.stage1_model.image_key)
        fd.update_real(jnp.asarray(x))
        seen += x.shape[0]
        if seen >= args.num_samples:
            break

    result = {
        "frechet_distance": fd.compute(),
        "feature_trunk": ("inception_pool3" if args.inception_weights
                          else "vgg16_random_init"),
        "num_samples": made,
        "num_real": seen,
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
