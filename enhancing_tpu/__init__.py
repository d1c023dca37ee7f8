"""enhancing_tpu — a TPU-native (JAX / XLA / Pallas / pjit) image-tokenization framework.

Capability parity with thuanz123/enhancing-transformers (ViT-VQGAN + RQ-VAE two-stage
image tokenization and autoregressive priors), redesigned TPU-first:

- ViT encoder/decoder, vector/Gumbel/residual quantizers (models/stage1)
- GPT and RQ-Transformer conditional priors with on-device KV-cache sampling
  (models/stage2)
- LPIPS-perceptual + StyleGAN-discriminator adversarial training (losses/)
- Pallas kernels for the hot ops: fused attention, VQ codebook search,
  upfirdn2d FIR resampling, fused bias+leaky-relu (ops/)
- GSPMD data/tensor-parallel training over jax.sharding.Mesh (parallel/, train/)
- YAML ``target/params`` config-driven object graph, compatible with the
  reference's config schema (utils/config.py)
"""

__version__ = "0.1.0"

# Lazy top-level exports (PEP 562): `from enhancing_tpu import ViTVQ` etc.
# without importing jax/flax at package-import time.
_EXPORTS = {
    "ViTVQ": "enhancing_tpu.models.stage1.vitvqgan",
    "ViTVQGumbel": "enhancing_tpu.models.stage1.vitvqgan",
    "CondTransformer": "enhancing_tpu.models.stage2.transformer",
    "GPT": "enhancing_tpu.models.stage2.layers",
    "RQTransformer": "enhancing_tpu.models.stage2.layers",
    "Trainer": "enhancing_tpu.train.trainer",
    "load_config": "enhancing_tpu.utils.config",
    "get_config_from_file": "enhancing_tpu.utils.config",
    "initialize_from_config": "enhancing_tpu.utils.config",
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib
        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module 'enhancing_tpu' has no attribute {name!r}")
