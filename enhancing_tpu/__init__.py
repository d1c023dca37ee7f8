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
