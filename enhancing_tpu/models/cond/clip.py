"""OpenAI CLIP (ViT vision tower + causal text tower) in flax, TPU-native.

The reference conditions stage-2 priors on frozen CLIP features via the
``clip`` pip package (reference: enhancing/modules/cond/clipcond.py:20-76 —
itself broken as shipped: undefined ``device``/``model`` at :25,30,67,71).
This is a complete from-scratch port of the CLIP architecture so the
condition encoders are gated only on *weights*, not on code:

- :class:`CLIPVisionTransformer` — conv patch embed (no bias), class token,
  learned positional embedding, pre-LN transformer, ln_post + projection.
- :class:`CLIPTextTransformer` — token + positional embeddings, causal
  transformer, ln_final, features taken at the argmax (EOT) token, projected.
- :class:`ResidualAttentionBlock` — ln_1 → MHA → ln_2 → MLP with QuickGELU
  (x * sigmoid(1.702 x)), matching OpenAI CLIP exactly.

``load_torch_clip`` maps the official torch checkpoints (the state_dict of
``clip.load(...)`` / the HF ``pytorch_model.bin`` with OpenAI key names:
``visual.conv1.weight``, ``visual.transformer.resblocks.N.attn.in_proj_*``,
``token_embedding.weight``, ``text_projection``, ...) onto the param trees.
``clip_config_from_state_dict`` infers the architecture hyperparameters from
the checkpoint shapes the same way ``clip/model.py::build_model`` does.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.attention import multihead_attention_bnhd

# CLIP preprocess normalization (clip/clip.py _transform)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    image_resolution: int = 224
    vision_layers: int = 12
    vision_width: int = 768
    vision_patch_size: int = 32
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    # real CLIP always uses vision_width // 64 heads; overridable for tests
    vision_heads_override: Optional[int] = None

    @property
    def vision_heads(self) -> int:
        return self.vision_heads_override or self.vision_width // 64


# shipped model family shapes (clip/model.py; ViT variants only — the
# reference passes names like "ViT-B/32" to clip.load)
CLIP_CONFIGS = {
    "ViT-B/32": CLIPConfig(),
    "ViT-B/16": CLIPConfig(vision_patch_size=16),
    "ViT-L/14": CLIPConfig(embed_dim=768, vision_layers=24, vision_width=1024,
                           vision_patch_size=14, transformer_width=768,
                           transformer_heads=12),
}


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, c = x.shape
        hd = self.width // self.heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = (b, t, self.heads, hd)
        y = multihead_attention_bnhd(
            q.reshape(split), k.reshape(split), v.reshape(split),
            scale=hd**-0.5,
            mask_mode="prefix_causal" if self.causal else "none", cond_len=0)
        y = nn.Dense(self.width, dtype=self.dtype, name="out_proj")(
            y.reshape(b, t, c))
        x = x + y
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="c_proj")(h)
        return x + h


class CLIPVisionTransformer(nn.Module):
    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: (B, H, W, 3) CLIP-normalized. Returns (B, embed_dim)."""
        cfg = self.config
        p = cfg.vision_patch_size
        scale = cfg.vision_width**-0.5
        x = nn.Conv(cfg.vision_width, (p, p), strides=(p, p), use_bias=False,
                    dtype=self.dtype, name="conv1")(images)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.vision_width)
        cls = self.param("class_embedding",
                         lambda k, s: scale * jax.random.normal(k, s),
                         (cfg.vision_width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype),
                              (b, 1, cfg.vision_width)), x], axis=1)
        pos = self.param("positional_embedding",
                         lambda k, s: scale * jax.random.normal(k, s),
                         (x.shape[1], cfg.vision_width))
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for i in range(cfg.vision_layers):
            x = ResidualAttentionBlock(cfg.vision_width, cfg.vision_heads,
                                       dtype=self.dtype,
                                       name=f"resblocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(
            x[:, 0])
        proj = self.param("proj", lambda k, s: scale * jax.random.normal(k, s),
                          (cfg.vision_width, cfg.embed_dim))
        return x @ proj.astype(x.dtype)


class CLIPTextTransformer(nn.Module):
    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens: (B, context_length) int32. Returns (B, embed_dim) features
        at the argmax (EOT) token position (clip/model.py CLIP.encode_text)."""
        cfg = self.config
        tok_emb = nn.Embed(cfg.vocab_size, cfg.transformer_width,
                           embedding_init=nn.initializers.normal(0.02),
                           name="token_embedding")
        x = tok_emb(tokens).astype(self.dtype)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.transformer_width))
        x = x + pos[:x.shape[1]].astype(x.dtype)
        for i in range(cfg.transformer_layers):
            x = ResidualAttentionBlock(cfg.transformer_width,
                                       cfg.transformer_heads, causal=True,
                                       dtype=self.dtype,
                                       name=f"resblocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)
        x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param("text_projection",
                          lambda k, s: (cfg.transformer_width**-0.5)
                          * jax.random.normal(k, s),
                          (cfg.transformer_width, cfg.embed_dim))
        return x @ proj.astype(x.dtype)


def preprocess_images(images: jax.Array, resolution: int) -> jax.Array:
    """[0,1] NHWC images -> CLIP-normalized at the tower's resolution
    (bicubic resize, as clip/clip.py _transform's Resize+CenterCrop on
    already-square inputs)."""
    b, h, w, c = images.shape
    if (h, w) != (resolution, resolution):
        images = jax.image.resize(images, (b, resolution, resolution, c),
                                  method="bicubic")
    return (images - CLIP_MEAN) / CLIP_STD


# ---------------------------------------------------------------------------
# torch checkpoint mapping
# ---------------------------------------------------------------------------


def clip_config_from_state_dict(sd: Dict[str, np.ndarray]) -> CLIPConfig:
    """Infer hyperparameters from checkpoint shapes (clip/model.py
    build_model:L398-420, ViT branch)."""
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_layers = len({k.split(".")[3] for k in sd
                         if k.startswith("visual.transformer.resblocks.")})
    vision_patch_size = sd["visual.conv1.weight"].shape[-1]
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
    return CLIPConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=vision_patch_size * grid,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=sd["ln_final.weight"].shape[0] // 64,
        transformer_layers=len({k.split(".")[2] for k in sd
                                if k.startswith("transformer.resblocks.")}),
    )


def _map_resblocks(sd: Dict[str, np.ndarray], prefix: str, params: dict,
                   n_layers: int, unused: set) -> None:
    for i in range(n_layers):
        src = f"{prefix}resblocks.{i}."
        dst = params[f"resblocks_{i}"]
        pairs = [
            (src + "ln_1.weight", dst["ln_1"], "scale", None),
            (src + "ln_1.bias", dst["ln_1"], "bias", None),
            (src + "ln_2.weight", dst["ln_2"], "scale", None),
            (src + "ln_2.bias", dst["ln_2"], "bias", None),
            (src + "attn.in_proj_weight", dst["in_proj"], "kernel", "T"),
            (src + "attn.in_proj_bias", dst["in_proj"], "bias", None),
            (src + "attn.out_proj.weight", dst["out_proj"], "kernel", "T"),
            (src + "attn.out_proj.bias", dst["out_proj"], "bias", None),
            (src + "mlp.c_fc.weight", dst["c_fc"], "kernel", "T"),
            (src + "mlp.c_fc.bias", dst["c_fc"], "bias", None),
            (src + "mlp.c_proj.weight", dst["c_proj"], "kernel", "T"),
            (src + "mlp.c_proj.bias", dst["c_proj"], "bias", None),
        ]
        for key, node, leaf, tf in pairs:
            w = np.asarray(sd[key], np.float32)
            node[leaf] = w.T if tf == "T" else w
            unused.discard(key)


def load_clip_vision_params(sd: Dict[str, np.ndarray], params: dict,
                            cfg: CLIPConfig) -> Tuple[dict, set]:
    """Map ``visual.*`` keys onto CLIPVisionTransformer params. Returns the
    updated tree and the set of consumed keys."""
    params = jax.tree.map(np.asarray, params)
    vis = {k[len("visual."):]: v for k, v in sd.items()
           if k.startswith("visual.")}
    unused = set(vis)
    # torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)
    params["conv1"]["kernel"] = np.asarray(
        vis["conv1.weight"], np.float32).transpose(2, 3, 1, 0)
    params["class_embedding"] = np.asarray(vis["class_embedding"], np.float32)
    params["positional_embedding"] = np.asarray(
        vis["positional_embedding"], np.float32)
    params["proj"] = np.asarray(vis["proj"], np.float32)
    for ln in ("ln_pre", "ln_post"):
        params[ln]["scale"] = np.asarray(vis[f"{ln}.weight"], np.float32)
        params[ln]["bias"] = np.asarray(vis[f"{ln}.bias"], np.float32)
    unused -= {"conv1.weight", "class_embedding", "positional_embedding",
               "proj", "ln_pre.weight", "ln_pre.bias", "ln_post.weight",
               "ln_post.bias"}
    _map_resblocks(vis, "transformer.", params, cfg.vision_layers, unused)
    consumed = {"visual." + k for k in set(vis) - unused}
    return params, consumed


def load_clip_text_params(sd: Dict[str, np.ndarray], params: dict,
                          cfg: CLIPConfig) -> Tuple[dict, set]:
    """Map text-tower keys onto CLIPTextTransformer params."""
    params = jax.tree.map(np.asarray, params)
    unused = {k for k in sd if not k.startswith("visual.")}
    params["token_embedding"]["embedding"] = np.asarray(
        sd["token_embedding.weight"], np.float32)
    params["positional_embedding"] = np.asarray(
        sd["positional_embedding"], np.float32)
    params["text_projection"] = np.asarray(sd["text_projection"], np.float32)
    params["ln_final"]["scale"] = np.asarray(sd["ln_final.weight"], np.float32)
    params["ln_final"]["bias"] = np.asarray(sd["ln_final.bias"], np.float32)
    unused -= {"token_embedding.weight", "positional_embedding",
               "text_projection", "ln_final.weight", "ln_final.bias",
               "logit_scale"}
    _map_resblocks(sd, "transformer.", params, cfg.transformer_layers, unused)
    consumed = {k for k in sd if not k.startswith("visual.")} - unused
    return params, consumed


def load_torch_clip(path: str, which: str = "both",
                    cfg: Optional[CLIPConfig] = None
                    ) -> Tuple[CLIPConfig, Dict[str, Any]]:
    """Load an OpenAI CLIP torch checkpoint and return (config, params).

    ``which``: 'visual', 'text' or 'both'. The returned dict has keys
    'visual'/'text' holding flax param trees ready for ``module.apply``.
    """
    from ...compat.torch_loader import load_torch_state_dict
    sd = load_torch_state_dict(path)
    # clip.load() checkpoints are the full model; HF ones may nest
    sd = {k[len("clip."):] if k.startswith("clip.") else k: v
          for k, v in sd.items()}
    if cfg is None:
        cfg = clip_config_from_state_dict(sd)
    out: Dict[str, Any] = {}
    rng = jax.random.PRNGKey(0)
    if which in ("visual", "both"):
        module = CLIPVisionTransformer(cfg)
        init = module.init(rng, jnp.zeros(
            (1, cfg.image_resolution, cfg.image_resolution, 3)))["params"]
        out["visual"], _ = load_clip_vision_params(sd, init, cfg)
    if which in ("text", "both"):
        module = CLIPTextTransformer(cfg)
        init = module.init(rng, jnp.zeros((1, cfg.context_length),
                                          jnp.int32))["params"]
        out["text"], _ = load_clip_text_params(sd, init, cfg)
    return cfg, out
