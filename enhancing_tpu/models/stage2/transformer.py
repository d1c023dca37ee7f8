"""Conditional stage-2 trainer module: frozen stage-1 + cond encoder + prior.

Capability parity with the reference CondTransformer LightningModule
(reference: enhancing/modules/stage2/transformer.py:23-206): builds the
condition model, the frozen stage-1 tokenizer and the prior from config;
``shared_step`` encodes images to codes under stop_gradient and trains the
prior with cross-entropy; ``sample`` decodes prior samples back to pixels.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.config import initialize_from_config
from .layers import GPT, RQTransformer
from .sampling import (sample_gpt, sample_gpt_sharded, sample_rq,
                       sample_rq_sharded)


class CondTransformer:
    """Config-instantiable conditional prior over tokenizer codes."""

    def __init__(self, cond_key: str, cond: dict, stage1: dict,
                 transformer: dict, path: Optional[str] = None,
                 ignore_keys: Sequence[str] = (),
                 code_shape: Optional[List[int]] = None,
                 scheduler: Optional[dict] = None,
                 dtype: str = "float32", seed: int = 0) -> None:
        self.cond_key = cond_key
        self.code_shape = code_shape
        self.scheduler = scheduler

        # condition + frozen stage-1 models (reference transformer.py:34-51;
        # freezing is structural here: their params simply never enter the
        # optimizer, and encode paths are wrapped in stop_gradient)
        self.cond_model = initialize_from_config(cond)
        self.stage1_model = initialize_from_config(stage1)

        tconf = dict(transformer.get("params", {}) or {})
        target = transformer["target"]
        tconf.setdefault("dtype", jnp.dtype(dtype))
        if target.rsplit(".", 1)[-1] == "RQTransformer":
            self.transformer = RQTransformer(**tconf)
            self.is_rq = True
        else:
            self.transformer = GPT(**tconf)
            self.is_rq = False

        rng = jax.random.PRNGKey(seed)
        codes = jnp.zeros(self._code_init_shape(), jnp.int32)
        conds = jnp.zeros((1, self.transformer.cond_num_tokens), jnp.int32)
        self.params = self.transformer.init(rng, codes, conds)["params"]

        if path is not None:
            self.init_from_ckpt(path, list(ignore_keys))

    def _code_init_shape(self) -> Tuple[int, ...]:
        t = self.transformer.img_num_tokens
        if self.is_rq:
            return (1, t, self.transformer.depth_num_tokens)
        return (1, t)

    def init_from_ckpt(self, path: str, ignore_keys: Sequence[str] = ()) -> None:
        from ...compat.torch_loader import load_gpt_params
        self.params = load_gpt_params(path, self.params,
                                      ignore_keys=list(ignore_keys))
        print(f"Restored from {path}")

    # -- functional API ---------------------------------------------------------

    def __call__(self, codes: jax.Array, conds: jax.Array, params=None
                 ) -> Tuple[jax.Array, jax.Array]:
        """Returns (logits, flat target codes) like reference transformer.py:56-65."""
        params = self.params if params is None else params
        conds = conds.reshape(conds.shape[0], -1)
        logits = self.transformer.apply({"params": params}, codes, conds)
        codes = codes.reshape(-1, codes.shape[-1]) if self.is_rq \
            else codes.reshape(codes.shape[0], -1)
        return logits, codes

    def loss_fn(self, params, codes: jax.Array, conds: jax.Array) -> jax.Array:
        """Cross-entropy over the prior's predictions (transformer.py:107-118)."""
        logits, targets = self(codes, conds, params)
        logits = logits.reshape(-1, logits.shape[-1]).astype(jnp.float32)
        targets = targets.reshape(-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, targets[:, None], axis=1))

    def encode_inputs(self, batch: Dict[str, Any]) -> Tuple[jax.Array, jax.Array]:
        """Frozen encodes of image -> codes and condition -> cond codes."""
        images = self.stage1_model.get_input(batch, self.stage1_model.image_key)
        conds = jnp.asarray(np.asarray(batch[self.cond_key]))
        codes = jax.lax.stop_gradient(self.stage1_model.encode_codes(images))
        cond_codes = jax.lax.stop_gradient(
            self.cond_model.encode_codes(conds))
        if cond_codes.ndim == 1:
            cond_codes = cond_codes[:, None]
        # out-of-vocab condition ids silently gather garbage (NaN losses) —
        # fail loudly on host instead (token conditions only)
        if jnp.issubdtype(cond_codes.dtype, jnp.integer) and cond_codes.size:
            vmax = int(np.asarray(cond_codes).max())
            if vmax >= self.transformer.vocab_cond_size:
                raise ValueError(
                    f"condition id {vmax} >= vocab_cond_size="
                    f"{self.transformer.vocab_cond_size}; check the dataset's "
                    f"class range vs the transformer config")
        return codes, cond_codes.astype(jnp.int32)

    def shared_step(self, batch: Dict[str, Any], params=None) -> jax.Array:
        codes, cond_codes = self.encode_inputs(batch)
        return self.loss_fn(self.params if params is None else params,
                            codes, cond_codes)

    def sample(self, conds: jax.Array, top_k: Optional[int] = None,
               top_p: Optional[float] = None, softmax_temperature: float = 1.0,
               seed: int = 0, params=None, return_codes: bool = False,
               mesh=None):
        """Generate images for the given condition codes (transformer.py:78-95).

        ``mesh``: optional jax.sharding.Mesh — the batch then decodes
        data-parallel over the mesh's 'data' axis (one shard_map'd program,
        per-shard KV caches and RNG streams)."""
        params = self.params if params is None else params
        conds = jnp.asarray(conds).reshape(len(conds), -1).astype(jnp.int32)
        rng = jax.random.PRNGKey(seed)
        if mesh is not None:
            sampler = sample_rq_sharded if self.is_rq else sample_gpt_sharded
            _, codes = sampler(mesh, self.transformer, {"params": params},
                               conds, rng, top_k=top_k, top_p=top_p,
                               temperature=float(softmax_temperature))
        else:
            sampler = sample_rq if self.is_rq else sample_gpt
            _, codes = sampler(self.transformer, {"params": params}, conds,
                               rng, top_k=top_k, top_p=top_p,
                               temperature=float(softmax_temperature))
        if self.code_shape is not None:
            codes = codes.reshape(codes.shape[0], *self.code_shape)
        pixels = jnp.clip(self.stage1_model.decode_codes(codes), 0.0, 1.0)
        if return_codes:
            return pixels, codes
        return pixels

    def get_input(self, batch: Dict[str, Any], key: str) -> jax.Array:
        x = jnp.asarray(np.asarray(batch[key]))
        return x

    def log_images(self, batch: Dict[str, Any], **kwargs) -> Dict[str, jax.Array]:
        conds = self.get_input(batch, self.cond_key)
        cond_codes = self.cond_model.encode_codes(conds)
        log = {}
        if hasattr(self.cond_model, "to_img"):
            log["conditions"] = self.cond_model.to_img(conds)
        log["first samples"] = self.sample(cond_codes, seed=0, top_k=kwargs.get("top_k"))
        log["second samples"] = self.sample(cond_codes, seed=1, top_k=kwargs.get("top_k"))
        return log
