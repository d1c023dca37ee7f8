"""LPIPS perceptual loss (VGG16 backbone) in flax, TPU-native.

The reference leans on the ``lpips`` pip package
(reference: enhancing/losses/vqperceptual.py:29,74); that package is a thin
torch wrapper over (a) torchvision's pretrained VGG16 features and (b) learned
1x1 "lin" heads. Here both are first-class flax modules:

- :class:`VGG16Features` reproduces torchvision's VGG16 feature trunk (NHWC),
  returning relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3 activations.
- :class:`LPIPS` scales inputs with the lpips ScalingLayer constants,
  unit-normalizes each activation across channels, applies the 1x1 heads and
  averages spatially, summing over the 5 stages.

Pretrained weights cannot be downloaded in this environment (zero egress);
``load_torch_lpips``/``load_torch_vgg16`` map the standard torch checkpoints
(torchvision ``vgg16-397923af.pth``, lpips ``vgg.pth``) onto the param tree
when the user provides them (config key ``lpips_weights``). Without weights
the loss degrades to a random-projection perceptual distance — still a valid
training signal, but not the published LPIPS metric; a warning is emitted.
"""
from __future__ import annotations

import warnings
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision VGG16 conv plan: (out_channels, n_convs) per stage
_VGG_PLAN = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# lpips ScalingLayer constants (shift/scale for inputs in [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 feature trunk returning the 5 LPIPS stages. Input NHWC in [-1,1]
    pre-scaled by the caller."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        feats = []
        for s, (width, n_convs) in enumerate(_VGG_PLAN):
            for c in range(n_convs):
                x = nn.Conv(width, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{s + 1}_{c + 1}")(x)
                x = jax.nn.relu(x)
            feats.append(x)
            if s < len(_VGG_PLAN) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Learned perceptual distance between two NHWC images in [-1, 1]."""

    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        self.net = VGG16Features(dtype=self.dtype)
        widths = [w for w, _ in _VGG_PLAN]
        # lpips "lin" heads: 1x1 conv, no bias; weights are non-negative
        self.lins = [
            nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.uniform(scale=0.1),
                    name=f"lin{i}")
            for i, _ in enumerate(widths)]

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """Returns per-sample LPIPS distance, shape (B,)."""
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)
        fx = self.net((x.astype(self.dtype) - shift) / scale)
        fy = self.net((y.astype(self.dtype) - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            diff = jnp.square(_unit_normalize(a) - _unit_normalize(b))
            val = self.lins[i](diff)                  # (B, H, W, 1)
            total = total + jnp.mean(val, axis=(1, 2, 3))
        return total


def init_lpips(rng: jax.Array, image_size: int = 256,
               weights_path: Optional[str] = None,
               dtype=jnp.float32) -> Tuple[LPIPS, dict]:
    """Build LPIPS and (optionally) load torch weights."""
    module = LPIPS(dtype=dtype)
    x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    params = module.init(rng, x, x)["params"]
    if weights_path:
        params = load_torch_lpips(weights_path, params)
    else:
        warnings.warn(
            "LPIPS running with randomly initialized VGG16 weights — "
            "perceptual loss is a random-projection distance, not the "
            "published LPIPS metric. Provide `lpips_weights` (a torch "
            "checkpoint with vgg + lin weights) for metric parity.")
    return module, params


def load_torch_vgg16(state_dict: Dict[str, np.ndarray], params: dict) -> dict:
    """Map torchvision vgg16 ``features.*`` conv weights onto VGG16Features."""
    params = jax.tree.map(np.asarray, params)
    # torchvision indices of the 13 convs in `features`
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    names = [f"conv{s + 1}_{c + 1}"
             for s, (_, n) in enumerate(_VGG_PLAN) for c in range(n)]
    for idx, name in zip(conv_idx, names):
        w = np.asarray(state_dict[f"features.{idx}.weight"])  # (O, I, kh, kw)
        b = np.asarray(state_dict[f"features.{idx}.bias"])
        params[name]["kernel"] = w.transpose(2, 3, 1, 0)      # HWIO
        params[name]["bias"] = b
    return params


def load_torch_lpips(path: str, params: dict) -> dict:
    """Load a combined torch checkpoint: vgg features + lpips lin heads.

    Accepts either a dict with 'vgg'/'lin' sub-dicts or a flat lpips-package
    state_dict (``lin{i}.model.1.weight``) plus torchvision vgg keys.
    """
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}

    params = jax.tree.map(np.asarray, params)
    vgg_keys = {k: v for k, v in sd.items() if k.startswith("features.")}
    if vgg_keys:
        params["net"] = load_torch_vgg16(vgg_keys, params["net"])
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in sd:
                w = sd[key]  # (1, C, 1, 1)
                params[f"lin{i}"]["kernel"] = w.transpose(2, 3, 1, 0)
                break
    return params
