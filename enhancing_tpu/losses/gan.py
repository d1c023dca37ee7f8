"""GAN loss functions: hinge / vanilla(softplus) / least-square.

Parity with reference: enhancing/losses/layers.py:22-40. Each handles both
modes: generator (``logits_real is None``) and discriminator.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def hinge_d_loss(logits_fake: jax.Array,
                 logits_real: Optional[jax.Array] = None) -> jax.Array:
    if logits_real is None:
        loss_fake = -jnp.mean(logits_fake) * 2
        loss_real = 0.0
    else:
        loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
        loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_fake: jax.Array,
                   logits_real: Optional[jax.Array] = None) -> jax.Array:
    if logits_real is None:
        loss_fake = jnp.mean(jax.nn.softplus(-logits_fake)) * 2
        loss_real = 0.0
    else:
        loss_fake = jnp.mean(jax.nn.softplus(logits_fake))
        loss_real = jnp.mean(jax.nn.softplus(-logits_real))
    return 0.5 * (loss_real + loss_fake)


def least_square_d_loss(logits_fake: jax.Array,
                        logits_real: Optional[jax.Array] = None) -> jax.Array:
    if logits_real is None:
        loss_fake = jnp.mean(jnp.square(logits_fake)) * 2
        loss_real = 0.0
    else:
        loss_fake = jnp.mean(jnp.square(1.0 + logits_fake))
        loss_real = jnp.mean(jnp.square(1.0 - logits_real))
    return 0.5 * (loss_real + loss_fake)


GAN_LOSSES = {
    "hinge": hinge_d_loss,
    "vanilla": vanilla_d_loss,
    "least_square": least_square_d_loss,
}
