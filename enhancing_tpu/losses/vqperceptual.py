"""Composite stage-1 losses: VQLPIPS and VQLPIPSWithDiscriminator.

Parity with reference: enhancing/losses/vqperceptual.py:17-172, reorganized
functionally for jit: the loss object owns its submodule definitions and
*initial* parameters, but every loss evaluation is a pure function of
explicitly passed parameters, so the Trainer can jit train steps and keep the
discriminator params in its own optimizer partition (the reference's
optimizer_idx 0/1 split, vitvqgan.py:101-127).

R1 and the adaptive adversarial weight are expressed with jax.grad directly —
no conv2d_gradfix equivalent is needed: differentiating the discriminator
w.r.t. its *input* never touches weight gradients by construction
(reference needed op/conv2d_gradfix.py:12-19 to suppress them).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .discriminator import StyleDiscriminator
from .gan import GAN_LOSSES
from .lpips import init_lpips


class DummyLoss:
    """No-op loss placeholder (reference vqperceptual.py:17-19)."""

    def __init__(self, **kwargs) -> None:
        pass


class VQLPIPS:
    """Reconstruction + perceptual + codebook loss, no GAN
    (reference vqperceptual.py:22-56)."""

    has_discriminator = False

    def __init__(self, codebook_weight: float = 1.0,
                 loglaplace_weight: float = 1.0,
                 loggaussian_weight: float = 1.0,
                 perceptual_weight: float = 1.0,
                 lpips_weights: Optional[str] = None,
                 allow_random_lpips: bool = False,
                 image_size: int = 256, seed: int = 0) -> None:
        # A silently-random "LPIPS" trains a subtly wrong model; a user who
        # missed the init_lpips UserWarning would only find out from the
        # final metrics. Record the condition here; the Trainer refuses to
        # TRAIN against it (check_trainable) unless `allow_random_lpips:
        # true` — eval-only consumers (reconstruct/sample scripts) stay
        # usable. The reference has no silent fallback either: it
        # unconditionally downloads pretrained VGG (vqperceptual.py:29).
        self.lpips_is_random = bool(perceptual_weight > 0
                                    and not lpips_weights)
        self.allow_random_lpips = allow_random_lpips
        self.codebook_weight = codebook_weight
        self.loglaplace_weight = loglaplace_weight
        self.loggaussian_weight = loggaussian_weight
        self.perceptual_weight = perceptual_weight
        self.perceptual, self.lpips_params = init_lpips(
            jax.random.PRNGKey(seed), image_size, lpips_weights)

    def check_trainable(self) -> None:
        """Raise unless training against this loss is metrically sound
        (called by the Trainer before building stage-1 train steps)."""
        if self.lpips_is_random and not self.allow_random_lpips:
            raise ValueError(
                "perceptual_weight > 0 but no `lpips_weights` checkpoint was "
                "provided: the perceptual term would be a random-projection "
                "distance, not LPIPS — training would silently optimize a "
                "wrong objective. Pass `lpips_weights: <path to a torch "
                "vgg+lin checkpoint>` in the loss params, set "
                "`perceptual_weight: 0.0`, or opt in explicitly with "
                "`allow_random_lpips: true` (tests/smoke runs only).")

    def nll_loss(self, x: jax.Array, xrec: jax.Array,
                 lpips_params=None) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        # lpips_params must be threaded in by jitted callers — closing over
        # the ~58M-param VGG tree bakes it into the HLO as literal constants
        # (compile-time and program-size blowup)
        lp = lpips_params if lpips_params is not None else self.lpips_params
        loglaplace = jnp.mean(jnp.abs(xrec - x))
        loggaussian = jnp.mean(jnp.square(xrec - x))
        perceptual = jnp.mean(self.perceptual.apply(
            {"params": lp}, x * 2 - 1, xrec * 2 - 1))
        nll = (self.loglaplace_weight * loglaplace
               + self.loggaussian_weight * loggaussian
               + self.perceptual_weight * perceptual)
        return nll, {"loglaplace_loss": loglaplace,
                     "loggaussian_loss": loggaussian,
                     "perceptual_loss": perceptual}

    def generator_loss(self, codebook_loss, x, xrec, split: str = "train",
                       lpips_params=None, **_: Any
                       ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        nll, parts = self.nll_loss(x, xrec, lpips_params)
        loss = nll + self.codebook_weight * codebook_loss
        log = {f"{split}/total_loss": loss,
               f"{split}/quant_loss": codebook_loss,
               f"{split}/rec_loss": nll}
        log.update({f"{split}/{k}": v for k, v in parts.items()})
        return loss, log


class VQLPIPSWithDiscriminator(VQLPIPS):
    """VQLPIPS + StyleGAN adversarial term with lazy R1 regularization
    (reference vqperceptual.py:59-172)."""

    has_discriminator = True

    def __init__(self, disc_start: int = 0, disc_loss: str = "vanilla",
                 disc_params: Optional[dict] = None,
                 codebook_weight: float = 1.0,
                 loglaplace_weight: float = 1.0,
                 loggaussian_weight: float = 1.0,
                 perceptual_weight: float = 1.0,
                 adversarial_weight: float = 1.0,
                 use_adaptive_adv: bool = False,
                 r1_gamma: float = 10.0,
                 do_r1_every: int = 16,
                 r1_chunk: Optional[int] = None,
                 lpips_weights: Optional[str] = None,
                 allow_random_lpips: bool = False,
                 image_size: int = 256, seed: int = 0) -> None:
        super().__init__(codebook_weight, loglaplace_weight,
                         loggaussian_weight, perceptual_weight,
                         lpips_weights, allow_random_lpips, image_size, seed)
        assert disc_loss in GAN_LOSSES, f"Unknown GAN loss '{disc_loss}'."
        self.disc_loss = GAN_LOSSES[disc_loss]
        self.discriminator_iter_start = disc_start
        self.adversarial_weight = adversarial_weight
        self.use_adaptive_adv = use_adaptive_adv
        self.r1_gamma = r1_gamma
        self.do_r1_every = do_r1_every
        # R1 memory knob: compute the gradient penalty in sub-batches of
        # r1_chunk images (rematerialized lax.map) — the R1 step's
        # second-order residuals, not the D update itself, are what OOMs
        # large batches (b32 measured: the plain D phase fits, +R1 does
        # not). None = whole batch in one shot. r1_chunk must be a
        # multiple of the minibatch-stddev group size (4 for batches ≥ 4)
        # and divide the batch: the stddev channel couples images within
        # a group, so only whole-group chunks keep the chunked penalty
        # bit-identical to the one-shot one (misaligned sizes raise).
        self.r1_chunk = r1_chunk

        disc_params = dict(disc_params or {})
        disc_params.setdefault("size", image_size)
        self.discriminator = StyleDiscriminator(**disc_params)
        self.disc_init_params = self.discriminator.init(
            jax.random.PRNGKey(seed + 1),
            jnp.zeros((1, image_size, image_size, 3), jnp.float32))["params"]

    def run_discriminator(self, disc_params, images: jax.Array) -> jax.Array:
        return self.discriminator.apply({"params": disc_params}, images)

    # -- optimizer_idx == 0 (reference vqperceptual.py:111-146) ---------------

    def generator_loss(self, codebook_loss, x, xrec, disc_params=None,
                       disc_factor: jax.Array | float = 1.0,
                       d_weight: Optional[jax.Array] = None,
                       split: str = "train", lpips_params=None, **_: Any
                       ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """``disc_factor`` carries the global_step >= disc_start warmup gate;
        ``d_weight`` overrides the static adversarial weight (adaptive path)."""
        nll, parts = self.nll_loss(x, xrec, lpips_params)
        logits_fake = self.run_discriminator(
            disc_params if disc_params is not None else self.disc_init_params,
            xrec)
        g_loss = self.disc_loss(logits_fake)
        if d_weight is None:
            d_weight = jnp.asarray(self.adversarial_weight, jnp.float32)
        loss = (nll + disc_factor * d_weight * g_loss
                + self.codebook_weight * codebook_loss)
        log = {f"{split}/total_loss": loss,
               f"{split}/quant_loss": codebook_loss,
               f"{split}/rec_loss": nll,
               f"{split}/g_loss": g_loss}
        log.update({f"{split}/{k}": v for k, v in parts.items()})
        if self.use_adaptive_adv:
            log[f"{split}/d_weight"] = d_weight
        return loss, log

    # -- optimizer_idx == 1 (reference vqperceptual.py:148-172) ---------------

    def discriminator_loss(self, disc_params, x, xrec,
                           disc_factor: jax.Array | float = 1.0,
                           do_r1: bool = False, split: str = "train"
                           ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        logits_real = self.run_discriminator(disc_params, x)
        logits_fake = self.run_discriminator(
            disc_params, jax.lax.stop_gradient(xrec))
        d_loss = disc_factor * self.disc_loss(logits_fake, logits_real)

        log = {f"{split}/disc_loss": d_loss,
               f"{split}/logits_real": jnp.mean(logits_real),
               f"{split}/logits_fake": jnp.mean(logits_fake)}

        if do_r1:
            # lazy R1: d/dx sum(D(x)), squared-norm per sample, scaled by
            # gamma * do_r1_every / 2 (reference vqperceptual.py:157-162).
            # This term is differentiated AGAIN w.r.t. disc_params by the
            # outer training grad — custom_vjp Pallas kernels only support
            # first-order AD, so trace this branch on the pure-XLA op paths
            # (the reference's conv2d_gradfix equivalent).
            from ..ops.common import force_xla_ops
            with force_xla_ops():
                def sq_grad_norms(imgs):
                    g = jax.grad(lambda im: jnp.sum(
                        self.run_discriminator(disc_params, im)))(imgs)
                    return jnp.sum(jnp.square(g), axis=(1, 2, 3))

                b = x.shape[0]
                if self.r1_chunk and b > self.r1_chunk:
                    # minibatch-stddev (discriminator.py:144-157) couples
                    # images within a group of `group`, and the groups are
                    # STRIDED over the batch (image i is in group
                    # i % n_groups, from the (group, n_groups) reshape) —
                    # a contiguous sub-batch of the raw batch computes a
                    # different stddev channel, i.e. a different function.
                    # Exact chunking: gather each group contiguous and map
                    # over whole groups; D(one group) reproduces the
                    # full-batch grouping exactly, and sum-of-groups equals
                    # the full-batch sum (D output i depends only on group
                    # i's images).
                    group = min(b, 4)
                    group = b // (b // group)
                    if self.r1_chunk % group != 0 or b % self.r1_chunk != 0:
                        raise ValueError(
                            f"r1_chunk={self.r1_chunk} must divide the "
                            f"batch ({b}) and be a multiple of the "
                            f"minibatch-stddev group size ({group}): the "
                            "stddev channel couples images within a group, "
                            "so only whole-group chunks keep chunked R1 "
                            "identical to the one-shot penalty.")
                    n_groups = b // group
                    k = self.r1_chunk // group
                    # group-major reorder: xg[j] = group j's members
                    xg = jnp.moveaxis(
                        x.reshape(group, n_groups, *x.shape[1:]), 0, 1)
                    chunks = xg.reshape(-1, k, group, *x.shape[1:])
                    # sub-batch the penalty: jax.checkpoint keeps only one
                    # chunk's second-order residuals live at a time when
                    # the outer grad (w.r.t. disc_params) sweeps back
                    # through the lax.map
                    norms = jax.lax.map(
                        jax.checkpoint(
                            lambda ch: jax.vmap(sq_grad_norms)(ch)),
                        chunks).reshape(-1)
                else:
                    norms = sq_grad_norms(x)
            grad_norm = jnp.mean(norms)
            d_loss = d_loss + self.r1_gamma * self.do_r1_every * grad_norm / 2
            log[f"{split}/r1_reg"] = grad_norm
            log[f"{split}/disc_loss"] = d_loss
        return d_loss, log

    def adaptive_weight(self, nll_grad: jax.Array, g_grad: jax.Array
                        ) -> jax.Array:
        """||grad nll|| / (||grad g|| + 1e-4), clamped — grads taken w.r.t. the
        decoder's last layer (reference vqperceptual.py:95-103)."""
        factor = (jnp.linalg.norm(nll_grad.reshape(-1))
                  / (jnp.linalg.norm(g_grad.reshape(-1)) + 1e-4))
        return jax.lax.stop_gradient(
            jnp.clip(factor, 0.0, 1e4) * self.adversarial_weight)
