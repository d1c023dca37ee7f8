"""ViT-VQGAN stage-1 tokenizer: encoder -> pre_quant -> quantizer -> post_quant -> decoder.

Capability parity with the reference LightningModule
(reference: enhancing/modules/stage1/vitvqgan.py:25-212), split TPU-style into:

- :class:`ViTVQModule` — a pure flax module (functional, jit/pjit-friendly)
  exposing ``__call__ / encode / decode / encode_codes / decode_codes``.
- :class:`ViTVQ` / :class:`ViTVQGumbel` — config-instantiable wrappers that own
  parameters, jitted apply functions and (optionally) reference-checkpoint
  loading; the Trainer consumes these. The factorized code path
  (dim -> embed_dim 32 -> dim Linear pair) matches
  reference: enhancing/modules/stage1/vitvqgan.py:38-39.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from ...utils.config import initialize_from_config
from .layers import ViTDecoder, ViTEncoder, dense_init
from .quantizers import GumbelQuantizer, VectorQuantizer


class ViTVQModule(nn.Module):
    """Functional ViT-VQGAN autoencoder core."""

    image_size: int
    patch_size: int
    encoder: Dict[str, Any]
    decoder: Dict[str, Any]
    quantizer: Dict[str, Any]
    quantizer_type: str = "vq"  # 'vq' | 'gumbel'
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False

    def setup(self) -> None:
        # per-tower remat/scan_layers keys inside the encoder/decoder dicts
        # override the model-level flags (lets a config remat only the
        # deeper tower of an asymmetric model)
        enc = dict(self.encoder)
        dec = dict(self.decoder)
        self.enc = ViTEncoder(image_size=self.image_size, patch_size=self.patch_size,
                              dtype=self.dtype,
                              remat=enc.pop("remat", self.remat),
                              scan_layers=enc.pop("scan_layers",
                                                  self.scan_layers),
                              name="encoder", **enc)
        self.dec = ViTDecoder(image_size=self.image_size, patch_size=self.patch_size,
                              dtype=self.dtype,
                              remat=dec.pop("remat", self.remat),
                              scan_layers=dec.pop("scan_layers",
                                                  self.scan_layers),
                              name="decoder", **dec)
        if self.quantizer_type == "vq":
            self.quant = VectorQuantizer(name="quantizer", **dict(self.quantizer))
        elif self.quantizer_type == "gumbel":
            self.quant = GumbelQuantizer(name="quantizer", **dict(self.quantizer))
        else:
            raise ValueError(f"unknown quantizer_type {self.quantizer_type!r}")
        embed_dim = self.quantizer["embed_dim"]
        self.pre_quant = nn.Dense(embed_dim, kernel_init=dense_init,
                                  dtype=self.dtype, name="pre_quant")
        self.post_quant = nn.Dense(dec["dim"], kernel_init=dense_init,
                                   dtype=self.dtype, name="post_quant")

    # -- public API (mirrors reference vitvqgan.py:44-90) ----------------------

    def __call__(self, x: jax.Array, temp: Optional[jax.Array] = None,
                 deterministic: bool = True) -> Tuple[jax.Array, jax.Array]:
        quant, diff = self.encode(x, temp, deterministic)
        return self.decode(quant), diff

    def _run_quantizer(self, h, temp, deterministic):
        if self.quantizer_type == "gumbel":
            return self.quant(h, temp, deterministic)
        return self.quant(h)

    def encode(self, x: jax.Array, temp: Optional[jax.Array] = None,
               deterministic: bool = True) -> Tuple[jax.Array, jax.Array]:
        h = self.enc(x)
        h = self.pre_quant(h)
        quant, emb_loss, _ = self._run_quantizer(
            h.astype(jnp.float32), temp, deterministic)
        return quant, emb_loss

    def decode(self, quant: jax.Array) -> jax.Array:
        return self.dec(self.post_quant(quant.astype(self.dtype)))

    def encode_codes(self, x: jax.Array) -> jax.Array:
        h = self.enc(x)
        h = self.pre_quant(h)
        _, _, codes = self._run_quantizer(h.astype(jnp.float32), None, True)
        return codes

    def decode_codes(self, codes: jax.Array) -> jax.Array:
        quant = self.quant.embed_codes(codes)
        return self.decode(quant)

    def forward_with_codes(self, x, temp=None, deterministic=True):
        """(reconstruction, qloss, codes) in one pass — used by the train step."""
        h = self.enc(x)
        h = self.pre_quant(h)
        quant, emb_loss, codes = self._run_quantizer(
            h.astype(jnp.float32), temp, deterministic)
        return self.decode(quant), emb_loss, codes

    def forward_training(self, x, temp=None, deterministic=True):
        """(xrec, qloss, pre_pixel_tokens, codes) — the aux outputs let the
        train step (a) form last-layer gradients for the adaptive adversarial
        weight (reference vqperceptual.py:95-103) with one cheap einsum
        instead of extra full backward passes, and (b) log codebook-usage
        metrics without a second encoder pass."""
        h = self.enc(x)
        h = self.pre_quant(h)
        quant, emb_loss, codes = self._run_quantizer(
            h.astype(jnp.float32), temp, deterministic)
        tokens = self.dec.pre_pixel_tokens(self.post_quant(
            quant.astype(self.dtype)))
        xrec = self.dec.pixels_from_tokens(tokens)
        return xrec, emb_loss, tokens, codes


def _as_nhwc(x: jax.Array) -> jax.Array:
    """Accept NCHW (reference layout) or NHWC and return NHWC."""
    if x.ndim == 3:
        x = x[..., None]
    if x.ndim == 4 and x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
        x = jnp.transpose(x, (0, 2, 3, 1))
    return x


class ViTVQ:
    """Config-instantiable stage-1 model owning params + jitted apply fns.

    Matches the reference constructor signature
    (enhancing/modules/stage1/vitvqgan.py:26-42); ``loss`` is built via the same
    target/params reflection and consumed by the Trainer.
    """

    quantizer_type = "vq"

    def __init__(self, image_key: str = "image", image_size: int = 256,
                 patch_size: int = 8, encoder: Optional[dict] = None,
                 decoder: Optional[dict] = None, quantizer: Optional[dict] = None,
                 loss: Optional[dict] = None, path: Optional[str] = None,
                 ignore_keys: Sequence[str] = (), scheduler: Optional[dict] = None,
                 dtype: str = "float32", seed: int = 0, remat: bool = False,
                 scan_layers: bool = False,
                 temperature_scheduler: Optional[dict] = None) -> None:
        self.image_key = image_key
        self.image_size = image_size
        self.patch_size = patch_size
        self.scheduler = scheduler
        self.temperature_scheduler = (
            initialize_from_config(temperature_scheduler)
            if temperature_scheduler else None)
        self.loss = initialize_from_config(loss) if loss else None

        self.module = ViTVQModule(
            image_size=image_size, patch_size=patch_size,
            encoder=dict(encoder or {}), decoder=dict(decoder or {}),
            quantizer=dict(quantizer or {}), quantizer_type=self.quantizer_type,
            dtype=jnp.dtype(dtype), remat=remat, scan_layers=scan_layers)

        rng = jax.random.PRNGKey(seed)
        channels = int((encoder or {}).get("channels", 3))
        sample = jnp.zeros((1, image_size, image_size, channels), jnp.float32)
        variables = self.module.init({"params": rng, "gumbel": rng}, sample)
        self.params = variables["params"]
        self.constants = variables.get("constants", FrozenDict())

        if path is not None:
            self.init_from_ckpt(path, list(ignore_keys))

    # -- checkpoint surgery (reference vitvqgan.py:50-59) ----------------------

    def init_from_ckpt(self, path: str, ignore_keys: Sequence[str] = ()) -> None:
        from ...compat.torch_loader import (
            load_style_discriminator_params,
            load_torch_state_dict,
            load_vitvq_params,
        )
        self.params = load_vitvq_params(path, self.params,
                                        ignore_keys=list(ignore_keys))
        # Lightning checkpoints also carry the GAN discriminator
        # (loss.discriminator.*) — load it for training continuation
        if (self.loss is not None
                and getattr(self.loss, "has_discriminator", False)
                and any(k.startswith("loss.discriminator.")
                        for k in load_torch_state_dict(path))):
            self.loss.disc_init_params = load_style_discriminator_params(
                path, self.loss.disc_init_params,
                size=self.image_size, ignore_keys=list(ignore_keys))
        print(f"Restored from {path}")

    # -- functional API ---------------------------------------------------------

    @property
    def variables(self) -> dict:
        return {"params": self.params, "constants": self.constants}

    def _vars(self, params=None) -> dict:
        return {"params": params if params is not None else self.params,
                "constants": self.constants}

    @functools.cached_property
    def _jit_encode(self):
        return jax.jit(lambda v, x: self.module.apply(v, x, method="encode"))

    @functools.cached_property
    def _jit_decode(self):
        return jax.jit(lambda v, q: self.module.apply(v, q, method="decode"))

    @functools.cached_property
    def _jit_encode_codes(self):
        return jax.jit(lambda v, x: self.module.apply(v, x, method="encode_codes"))

    @functools.cached_property
    def _jit_decode_codes(self):
        return jax.jit(lambda v, c: self.module.apply(v, c, method="decode_codes"))

    def __call__(self, x, params=None):
        quant, diff = self.encode(x, params)
        return self.decode(quant, params), diff

    def encode(self, x, params=None):
        return self._jit_encode(self._vars(params), _as_nhwc(jnp.asarray(x)))

    def decode(self, quant, params=None):
        return self._jit_decode(self._vars(params), jnp.asarray(quant))

    def encode_codes(self, x, params=None):
        return self._jit_encode_codes(self._vars(params), _as_nhwc(jnp.asarray(x)))

    def decode_codes(self, codes, params=None):
        return self._jit_decode_codes(self._vars(params), jnp.asarray(codes))

    def get_input(self, batch: dict, key: str = "image") -> jax.Array:
        return _as_nhwc(jnp.asarray(batch[key], jnp.float32))

    def log_images(self, batch: dict, params=None, **kwargs) -> Dict[str, jax.Array]:
        x = self.get_input(batch, self.image_key)
        quant, _ = self.encode(x, params)
        return {"originals": x, "reconstructions": self.decode(quant, params)}


class ViTVQGumbel(ViTVQ):
    """ViTVQ with a Gumbel-softmax quantizer and temperature schedule.

    (reference: enhancing/modules/stage1/vitvqgan.py:191-212)
    """

    quantizer_type = "gumbel"
