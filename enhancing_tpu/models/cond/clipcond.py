"""CLIP-feature condition encoders — functional flax CLIP, gated on weights.

Parity of intent with reference: enhancing/modules/cond/clipcond.py:20-76.
The reference implementation is broken as shipped (undefined ``device``/
``model`` variables, clipcond.py:25,30,67,71); this module implements the
evident intent — frozen CLIP text/image features as condition codes — on a
complete flax CLIP port (:mod:`.clip`). The only gate is the pretrained
weights themselves: this zero-egress environment cannot download them, so the
constructor requires ``clip_params_path`` (a torch CLIP checkpoint, e.g. the
state_dict of ``clip.load("ViT-B/32")``) and raises a clear error otherwise.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.config import initialize_from_config
from .clip import (
    CLIP_CONFIGS,
    CLIPTextTransformer,
    CLIPVisionTransformer,
    load_torch_clip,
    preprocess_images,
)
from .dummycond import DummyCond, _render_text


def _load(clip_model: str, clip_params_path: Optional[str], which: str):
    if clip_params_path is None:
        raise RuntimeError(
            f"CLIP condition model '{clip_model}' needs pretrained weights; "
            "this environment has no network egress. Provide "
            "clip_params_path= pointing at a torch CLIP checkpoint "
            "(the state_dict of clip.load(...)).")
    cfg = CLIP_CONFIGS.get(clip_model)
    return load_torch_clip(clip_params_path, which=which, cfg=cfg)


class ClipTextCond(DummyCond):
    """Frozen CLIP text features as condition codes
    (reference clipcond.py:20-60)."""

    def __init__(self, image_size: Union[int, Tuple[int, int]],
                 clip_model: str, tokenizer: Optional[dict] = None,
                 clip_params_path: Optional[str] = None) -> None:
        from ...utils.tokenizer import SimpleTokenizer
        self.image_size = image_size
        self.tokenizer = (initialize_from_config(tokenizer) if tokenizer
                          else SimpleTokenizer())
        self.config, params = _load(clip_model, clip_params_path, "text")
        self.params = params["text"]
        self.module = CLIPTextTransformer(self.config)
        self._encode = jax.jit(
            lambda p, t: self.module.apply({"params": p}, t))

    def encode_codes(self, text) -> jax.Array:
        """(B, T) BPE tokens -> (B, embed_dim) frozen CLIP text features."""
        tokens = jnp.asarray(text, jnp.int32)
        pad = self.config.context_length - tokens.shape[1]
        if pad > 0:
            tokens = jnp.pad(tokens, ((0, 0), (0, pad)))
        return jax.lax.stop_gradient(self._encode(self.params, tokens))

    def to_img(self, texts) -> np.ndarray:
        size = (self.image_size, self.image_size) \
            if isinstance(self.image_size, int) else tuple(self.image_size)
        return np.stack([_render_text(self.tokenizer.decode(t), size)
                         for t in np.asarray(texts)])


class ClipImageCond(DummyCond):
    """Frozen CLIP image features as condition codes
    (reference clipcond.py:64-76)."""

    def __init__(self, clip_model: str,
                 clip_params_path: Optional[str] = None) -> None:
        self.config, params = _load(clip_model, clip_params_path, "visual")
        self.params = params["visual"]
        self.module = CLIPVisionTransformer(self.config)
        res = self.config.image_resolution
        self._encode = jax.jit(functools.partial(
            lambda p, x, res: self.module.apply(
                {"params": p}, preprocess_images(x, res)), res=res))

    def encode_codes(self, image) -> jax.Array:
        """(B, H, W, 3) images in [0,1] -> (B, embed_dim) CLIP features."""
        x = jnp.asarray(image, jnp.float32)
        return jax.lax.stop_gradient(self._encode(self.params, x))

    def to_img(self, image) -> np.ndarray:
        return np.clip(np.asarray(image), 0.0, 1.0)
