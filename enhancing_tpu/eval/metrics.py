"""Reconstruction / generation metrics: PSNR, SSIM, Fréchet distance, codebook
usage.

The reference ships no evaluation code (SURVEY §6); the driver's north star
requires rFID parity, so this module provides the measurement machinery:

- :func:`psnr` / :func:`ssim` — pixel metrics on NHWC batches.
- :class:`FrechetDistance` — streaming feature-statistics accumulator +
  Fréchet distance. The canonical (r)FID uses InceptionV3-pool3 features;
  pretrained Inception weights cannot be downloaded here (zero egress), so
  the extractor is pluggable: pass any feature function (e.g. the LPIPS
  VGG16 trunk with loaded torch weights gives a VGG-FID that tracks rFID).
- :func:`codebook_usage` — fraction of codes used + perplexity of the code
  histogram (standard VQ health metrics).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def psnr(x: jax.Array, y: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Per-image PSNR over NHWC batches."""
    mse = jnp.mean(jnp.square(x - y), axis=(1, 2, 3))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    g = np.exp(-0.5 * ((np.arange(size) - size // 2) / sigma) ** 2)
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(x: jax.Array, y: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Mean SSIM per image (Gaussian 11x11 window, standard constants)."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    kern = _gaussian_kernel()
    c = x.shape[-1]
    w = jnp.broadcast_to(kern[:, :, None, None], (11, 11, 1, c))

    def filt(t):
        return jax.lax.conv_general_dilated(
            t, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    mu_x, mu_y = filt(x), filt(y)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = filt(x * x) - mu_x2
    sig_y = filt(y * y) - mu_y2
    sig_xy = filt(x * y) - mu_xy
    s = ((2 * mu_xy + c1) * (2 * sig_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2))
    return jnp.mean(s, axis=(1, 2, 3))


class FrechetDistance:
    """Streaming Fréchet distance between two feature distributions.

    Usage:
        fd = FrechetDistance(feature_fn)
        for batch in reals: fd.update_real(batch)
        for batch in fakes: fd.update_fake(batch)
        value = fd.compute()
    """

    def __init__(self, feature_fn: Callable[[jax.Array], jax.Array]) -> None:
        self.feature_fn = feature_fn
        self._stats = {"real": None, "fake": None}

    def _update(self, which: str, images: jax.Array) -> None:
        feats = np.asarray(self.feature_fn(images), np.float64)
        feats = feats.reshape(feats.shape[0], -1)
        st = self._stats[which]
        if st is None:
            st = {"n": 0, "sum": np.zeros(feats.shape[1]),
                  "outer": np.zeros((feats.shape[1], feats.shape[1]))}
        st["n"] += feats.shape[0]
        st["sum"] += feats.sum(0)
        st["outer"] += feats.T @ feats
        self._stats[which] = st

    def update_real(self, images: jax.Array) -> None:
        self._update("real", images)

    def update_fake(self, images: jax.Array) -> None:
        self._update("fake", images)

    @staticmethod
    def _mean_cov(st) -> Tuple[np.ndarray, np.ndarray]:
        n = st["n"]
        mu = st["sum"] / n
        cov = st["outer"] / n - np.outer(mu, mu)
        return mu, cov

    def compute(self) -> float:
        import scipy.linalg
        assert self._stats["real"] and self._stats["fake"], \
            "call update_real/update_fake first"
        mu1, c1 = self._mean_cov(self._stats["real"])
        mu2, c2 = self._mean_cov(self._stats["fake"])
        diff = mu1 - mu2
        covmean, _ = scipy.linalg.sqrtm(c1 @ c2, disp=False)
        covmean = np.real(covmean)
        return float(diff @ diff + np.trace(c1 + c2 - 2 * covmean))


def vgg_feature_fn(lpips_module, lpips_params, stage: int = 3
                   ) -> Callable[[jax.Array], jax.Array]:
    """Spatially pooled VGG16 stage features for VGG-Fréchet distance.

    ``lpips_module``/``lpips_params`` are an LPIPS flax module and its params
    (the trunk lives under params['net']); flax module attributes are only
    bound inside apply, so build a fresh trunk module here.
    """
    from ..losses.lpips import VGG16Features
    net = VGG16Features()
    params = lpips_params["net"] if "net" in lpips_params else lpips_params

    @jax.jit
    def fn(images):
        feats = net.apply({"params": params}, images * 2 - 1)
        return jnp.mean(feats[stage], axis=(1, 2))
    return fn


def codebook_usage(codes: jax.Array, n_embed: int) -> dict:
    """Fraction of codebook used + perplexity of the empirical code histogram."""
    hist = np.bincount(np.asarray(codes).reshape(-1), minlength=n_embed)
    p = hist / max(hist.sum(), 1)
    nz = p[p > 0]
    perplexity = float(np.exp(-(nz * np.log(nz)).sum()))
    return {"usage": float((hist > 0).mean()), "perplexity": perplexity,
            "n_used": int((hist > 0).sum())}
