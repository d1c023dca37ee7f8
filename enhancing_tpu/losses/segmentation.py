"""Segmentation losses for the VQSegmentation condition path.

Parity with reference: enhancing/losses/segmentation.py:10-31. Targets are
one-hot label maps; reconstructions are logits over labels (NHWC).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits))))


class BCELoss:
    """Binary cross-entropy on label maps (reference segmentation.py:10-14)."""

    has_discriminator = False

    def __init__(self, **kwargs) -> None:
        pass

    def __call__(self, codebook_loss, inputs, reconstructions,
                 split: str = "train") -> Tuple[jax.Array, Dict]:
        loss = _bce_with_logits(reconstructions, inputs)
        return loss, {f"{split}/total_loss": loss}

    generator_loss = __call__


class BCELossWithQuant:
    """BCE + weighted codebook loss (reference segmentation.py:17-31)."""

    has_discriminator = False

    def __init__(self, codebook_weight: float = 1.0, **kwargs) -> None:
        self.codebook_weight = codebook_weight

    def __call__(self, codebook_loss, inputs, reconstructions,
                 split: str = "train") -> Tuple[jax.Array, Dict]:
        bce = _bce_with_logits(reconstructions, inputs)
        loss = bce + self.codebook_weight * codebook_loss
        return loss, {f"{split}/total_loss": loss,
                      f"{split}/bce_loss": bce,
                      f"{split}/quant_loss": codebook_loss}

    generator_loss = __call__
