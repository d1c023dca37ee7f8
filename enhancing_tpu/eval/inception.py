"""InceptionV3 pool3 (2048-d) feature extractor for rFID, in flax (NHWC).

The reference repo ships no evaluation code (SURVEY §6); its README rFID
numbers come from standard pytorch-fid tooling. This module reproduces that
tooling's network: torchvision ``inception_v3`` up to the global average
pool, with the pytorch-fid patches (the avg-pool branches of the A/C/E
blocks use ``count_include_pad=False``; the *last* InceptionE block uses a
max-pool in its pool branch), so the standard FID weights
(``pt_inception-2015-12-05`` export, torchvision key layout) load to
numerical parity via :func:`load_torch_inception`.

Inference-only: BatchNorm is applied from the loaded running statistics.
Everything is NHWC and jit-friendly (static shapes, lax pooling).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

BN_EPS = 1e-3


def _pool(x, window: int, stride: int, padding, kind: str,
          count_include_pad: bool = True):
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    if isinstance(padding, int):
        pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    else:
        pad = padding
    if kind == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strides,
                                     pad)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pad)
    if count_include_pad:
        return s / (window * window)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, pad)
    return s / cnt


def max_pool3x3_s2(x):
    return _pool(x, 3, 2, 0, "max")


def avg_pool3x3_s1p1(x, count_include_pad: bool):
    return _pool(x, 3, 1, 1, "avg", count_include_pad)


class BasicConv2d(nn.Module):
    """Conv(no bias) + BatchNorm(running stats, eps=1e-3) + ReLU —
    torchvision's BasicConv2d."""

    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, x.shape[-1], self.features))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x, w, (self.stride, self.stride),
            ((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = (y - mean) * (scale * jax.lax.rsqrt(var + BN_EPS)) + bias
        return jax.nn.relu(y)


class InceptionA(nn.Module):
    pool_features: int
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = avg_pool3x3_s1p1(x, count_include_pad=not self.fid_variant)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = max_pool3x3_s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = avg_pool3x3_s1p1(x, count_include_pad=not self.fid_variant)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = max_pool3x3_s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = "avg"  # pytorch-fid: 'avg' for Mixed_7b, 'max' for 7c
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1),
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0),
                        name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_kind == "max":
            bp = _pool(x, 3, 1, 1, "max")
        else:
            bp = avg_pool3x3_s1p1(x, count_include_pad=not self.fid_variant)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """Feature trunk up to the 2048-d global-average pool (no fc head).

    Input: NHWC float in [-1, 1] at 299x299 (use :func:`fid_feature_fn` for
    the full [0,1]-image -> resize -> scale -> features pipeline).
    """

    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = max_pool3x3_s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool3x3_s2(x)
        x = InceptionA(32, self.fid_variant, name="Mixed_5b")(x)
        x = InceptionA(64, self.fid_variant, name="Mixed_5c")(x)
        x = InceptionA(64, self.fid_variant, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, self.fid_variant, name="Mixed_6b")(x)
        x = InceptionC(160, self.fid_variant, name="Mixed_6c")(x)
        x = InceptionC(160, self.fid_variant, name="Mixed_6d")(x)
        x = InceptionC(192, self.fid_variant, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", self.fid_variant, name="Mixed_7b")(x)
        x = InceptionE("max" if self.fid_variant else "avg",
                       self.fid_variant, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))            # global avg pool -> 2048


def load_torch_inception(path_or_sd, params: dict) -> dict:
    """Map a torchvision-layout inception state_dict onto the flax tree.

    Accepts a file path or an already-loaded dict. fc/AuxLogits keys are
    ignored (not part of the pool3 trunk). Raises if any trunk key fails to
    map or any flax param goes unfilled.
    """
    if isinstance(path_or_sd, (str, bytes)) or hasattr(path_or_sd, "__fspath__"):
        import torch
        sd = torch.load(path_or_sd, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    else:
        sd = path_or_sd
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}

    params = jax.tree.map(np.asarray, jax.device_get(params))
    suffix_map = {
        "conv.weight": ("kernel", lambda w: w.transpose(2, 3, 1, 0)),
        "bn.weight": ("scale", None),
        "bn.bias": ("bias", None),
        "bn.running_mean": ("mean", None),
        "bn.running_var": ("var", None),
    }
    filled = set()
    for key, val in sd.items():
        if key.startswith(("fc.", "AuxLogits.")) or key.endswith(
                "num_batches_tracked"):
            continue
        parts = key.split(".")
        suffix = ".".join(parts[-2:])
        if suffix not in suffix_map:
            raise KeyError(f"unrecognized inception key {key!r}")
        leaf, tf = suffix_map[suffix]
        node = params
        for p in parts[:-2]:
            if p not in node:
                raise KeyError(f"no flax module for torch key {key!r}")
            node = node[p]
        if leaf not in node:
            raise KeyError(f"no flax param {leaf!r} for torch key {key!r}")
        v = tf(val) if tf else val
        if tuple(node[leaf].shape) != tuple(v.shape):
            raise ValueError(f"shape mismatch at {key}: {v.shape} vs "
                             f"{node[leaf].shape}")
        node[leaf] = v.astype(node[leaf].dtype)
        filled.add(("/".join(parts[:-2]), leaf))

    want = set()

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, prefix + (k,))
            else:
                want.add(("/".join(prefix), k))
    walk(params, ())
    missing = want - filled
    if missing:
        raise ValueError(f"{len(missing)} inception params unfilled, e.g. "
                         f"{sorted(missing)[:4]}")
    return params


def init_inception(rng: jax.Array,
                   weights_path: Optional[str] = None,
                   fid_variant: bool = True) -> Tuple[InceptionV3Pool3, dict]:
    module = InceptionV3Pool3(fid_variant=fid_variant)
    params = module.init(rng, jnp.zeros((1, 299, 299, 3)))["params"]
    if weights_path:
        params = load_torch_inception(weights_path, params)
    return module, params


def fid_feature_fn(module: InceptionV3Pool3, params: dict
                   ) -> Callable[[jax.Array], jax.Array]:
    """[0,1] NHWC images (any size) -> 2048-d pool3 features.

    Matches pytorch-fid's preprocessing: bilinear resize to 299x299 without
    antialiasing (torch F.interpolate semantics), then scale to [-1, 1].
    """

    @jax.jit
    def fn(images):
        x = jax.image.resize(images,
                             (images.shape[0], 299, 299, images.shape[-1]),
                             method="bilinear", antialias=False)
        return module.apply({"params": params}, x * 2.0 - 1.0)
    return fn
