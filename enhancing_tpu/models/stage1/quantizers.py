"""Vector / Gumbel / residual quantizers for the ViT-VQGAN tokenizer.

Capability parity with the reference quantizers
(reference: enhancing/modules/stage1/quantizers.py:19-126), TPU-first:

- The nearest-neighbour search runs through ops.vq.nearest_codebook_indices,
  a fused Pallas distance+argmin kernel that never materialises the
  (tokens, n_embed) distance matrix in HBM.
- The residual-quantization loop (RQ-VAE) accumulates quantized residuals over
  ``num_quantizers`` depths; depth indices stack on the last axis
  (reference: enhancing/modules/stage1/quantizers.py:38-57).
- Straight-through estimator: z + stop_gradient(z_q - z)
  (reference: enhancing/modules/stage1/quantizers.py:60-61).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.vq import codebook_distances, l2_normalize, nearest_codebook_indices

QuantizerOutput = Tuple[jax.Array, jax.Array, jax.Array]  # (z_q, loss, indices)


class VectorQuantizer(nn.Module):
    """l2-normalized ("spherical") nearest-neighbour quantizer.

    reference: enhancing/modules/stage1/quantizers.py:66-92. The commitment
    loss is computed on the *normalized* vectors and the returned z_q is the
    normalized codebook vector.
    """

    embed_dim: int
    n_embed: int
    beta: float = 0.25
    use_norm: bool = True
    use_residual: bool = False
    num_quantizers: Optional[int] = None
    straight_through: bool = True
    impl: str = "auto"

    def setup(self) -> None:
        self.embedding = self.param(
            "embedding", nn.initializers.normal(stddev=1.0),
            (self.n_embed, self.embed_dim))

    def _norm(self, x: jax.Array) -> jax.Array:
        return l2_normalize(x) if self.use_norm else x

    def quantize(self, z: jax.Array) -> QuantizerOutput:
        z_norm = self._norm(z)
        e_norm = self._norm(self.embedding)

        indices = nearest_codebook_indices(z_norm, e_norm, impl=self.impl)
        z_q = jnp.take(self.embedding, indices, axis=0)
        z_qnorm = self._norm(z_q)

        sg = jax.lax.stop_gradient
        loss = (self.beta * jnp.mean(jnp.square(sg(z_qnorm) - z_norm))
                + jnp.mean(jnp.square(z_qnorm - sg(z_norm))))
        return z_qnorm, loss, indices

    def __call__(self, z: jax.Array) -> QuantizerOutput:
        sg = jax.lax.stop_gradient
        if not self.use_residual:
            z_q, loss, indices = self.quantize(z)
        else:
            assert self.num_quantizers is not None and self.num_quantizers > 0
            residual = sg(z)
            z_q = jnp.zeros_like(z)
            losses, index_list = [], []
            for _ in range(self.num_quantizers):
                z_qi, loss_i, idx_i = self.quantize(residual)
                residual = residual - z_qi
                z_q = z_q + z_qi
                losses.append(loss_i)
                index_list.append(idx_i)
            loss = jnp.mean(jnp.stack(losses))
            indices = jnp.stack(index_list, axis=-1)

        if self.straight_through:
            z_q = z + sg(z_q - z)
        return z_q, loss, indices

    def embed_codes(self, indices: jax.Array) -> jax.Array:
        """Codebook lookup + norm (+ depth-sum when residual).

        Used by decode_codes (reference: enhancing/modules/stage1/vitvqgan.py:81-90).
        """
        quant = self._norm(jnp.take(self.embedding, indices, axis=0))
        if self.use_residual:
            quant = jnp.sum(quant, axis=-2)
        return quant


class GumbelQuantizer(nn.Module):
    """Gumbel-softmax relaxed quantizer with KL-to-uniform prior loss.

    reference: enhancing/modules/stage1/quantizers.py:95-126. ``hard`` one-hot
    selection is used outside training (there we must truly quantize);
    training uses the soft relaxation. No straight-through on top
    (straight_through=False in the reference ctor, quantizers.py:98).
    """

    embed_dim: int
    n_embed: int
    temp_init: float = 1.0
    use_norm: bool = True
    use_residual: bool = False
    num_quantizers: Optional[int] = None
    impl: str = "auto"

    def setup(self) -> None:
        self.embedding = self.param(
            "embedding", nn.initializers.normal(stddev=1.0),
            (self.n_embed, self.embed_dim))

    def _norm(self, x: jax.Array) -> jax.Array:
        return l2_normalize(x) if self.use_norm else x

    def quantize(self, z: jax.Array, temp: Optional[jax.Array] = None,
                 deterministic: bool = True) -> QuantizerOutput:
        temp = self.temp_init if temp is None else temp
        hard = deterministic  # quantize for real outside training

        e_norm = self._norm(self.embedding)
        logits = -codebook_distances(self._norm(z), e_norm)

        if deterministic:
            y_soft = jax.nn.softmax(logits / temp, axis=-1)
        else:
            g = jax.random.gumbel(self.make_rng("gumbel"), logits.shape,
                                  dtype=logits.dtype)
            y_soft = jax.nn.softmax((logits + g) / temp, axis=-1)

        indices = jnp.argmax(y_soft, axis=-1).astype(jnp.int32)
        if hard:
            # Straight-through one-hot (torch F.gumbel_softmax hard=True).
            y_hard = jax.nn.one_hot(indices, self.n_embed, dtype=y_soft.dtype)
            y = y_hard - jax.lax.stop_gradient(y_soft) + y_soft
        else:
            y = y_soft
        z_q = jnp.einsum("...n,nd->...d", y, e_norm)

        logp = jax.nn.log_softmax(logits, axis=-1)
        loss = jnp.mean(jnp.sum(jnp.exp(logp) * (logp + math.log(self.n_embed)),
                                axis=-1))
        return z_q, loss, indices

    def __call__(self, z: jax.Array, temp: Optional[jax.Array] = None,
                 deterministic: bool = True) -> QuantizerOutput:
        if not self.use_residual:
            return self.quantize(z, temp, deterministic)
        assert self.num_quantizers is not None and self.num_quantizers > 0
        sg = jax.lax.stop_gradient
        residual = sg(z)
        z_q = jnp.zeros_like(z)
        losses, index_list = [], []
        for _ in range(self.num_quantizers):
            z_qi, loss_i, idx_i = self.quantize(residual, temp, deterministic)
            residual = residual - z_qi
            z_q = z_q + z_qi
            losses.append(loss_i)
            index_list.append(idx_i)
        return z_q, jnp.mean(jnp.stack(losses)), jnp.stack(index_list, axis=-1)

    def embed_codes(self, indices: jax.Array) -> jax.Array:
        quant = self._norm(jnp.take(self.embedding, indices, axis=0))
        if self.use_residual:
            quant = jnp.sum(quant, axis=-2)
        return quant
