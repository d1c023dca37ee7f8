"""upfirdn2d — upsample, FIR filter, downsample (StyleGAN blur) for TPU.

TPU-native replacement for the reference's CUDA extension
(reference: enhancing/losses/op/upfirdn2d_kernel.cu:50-366 and the autograd
wrapper enhancing/losses/op/upfirdn2d.py:112-209):

- General path: one ``lax.conv_general_dilated`` in NHWC — lhs_dilation
  performs the zero-stuffed upsample, window strides the downsample, and the
  depthwise FIR runs as a grouped conv. XLA differentiates this natively, so
  no conv2d_gradfix equivalent is needed (grads w.r.t. inputs only fall out
  of jax.grad by construction).
- Hot path (up=down=1: the discriminator's Blur) is a Pallas kernel that
  accumulates the k×k taps as shifted VMEM reads over a channels-last block,
  fused in one pass over HBM. Backward = the VJP of the identical lax path.

Semantics match the reference native fallback (upfirdn2d.py:168-209):
zero-insert upsample by ``up``, pad by (pad0, pad1) per spatial dim (negative
pads crop), *convolve* (kernel flipped) with the 2-D FIR kernel, then keep
every ``down``-th pixel.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import interpret_mode, use_pallas
from .partition import partitioned


def _norm_pad(pad) -> Tuple[int, int, int, int]:
    """(padx0, padx1, pady0, pady1) from the reference's pad argument."""
    if isinstance(pad, int):
        return (pad, pad, pad, pad)
    if len(pad) == 2:
        return (pad[0], pad[1], pad[0], pad[1])
    return tuple(pad)


def _upfirdn2d_xla(x: jax.Array, kernel: jax.Array, up: int, down: int,
                   pad: Tuple[int, int, int, int]) -> jax.Array:
    """x: (B, H, W, C); kernel: (kh, kw) fp32. Returns (B, H', W', C)."""
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    px0, px1, py0, py1 = pad

    # Flip for true convolution (conv_general_dilated does correlation).
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    k = jnp.broadcast_to(k[:, :, None, None], (kh, kw, 1, c))

    # lhs_dilation inserts zeros *between* samples ((h-1)*up + 1 long); the
    # reference zero-stuffs after every sample (h*up long) — add the missing
    # (up - 1) trailing zeros into the end padding. Negative pads crop.
    out = jax.lax.conv_general_dilated(
        x, k,
        window_strides=(down, down),
        padding=((py0, py1 + up - 1), (px0, px1 + up - 1)),
        lhs_dilation=(up, up),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


# ---------------------------------------------------------------------------
# Pallas hot path: up = down = 1 (plain FIR blur with padding).
# ---------------------------------------------------------------------------

def _fir_kernel(x_ref, o_ref, *, taps, kh: int, kw: int, py0: int, px0: int,
                py1: int, px1: int, h: int, w: int):
    """One batch image per program. x: (H, W, C) block; out: (Ho, Wo, C).

    Pads the input ONCE, then accumulates tap-weighted *shifted static
    slices* of that single padded buffer — only two full-size temporaries
    live at a time (a per-tap pad-and-add formulation allocated one
    full-size buffer per tap and blew scoped VMEM at 512 channels).
    """
    x = x_ref[0]
    ho, wo = o_ref.shape[1], o_ref.shape[2]
    # negative pads crop the source; positive pads zero-extend
    rs, re = max(-py0, 0), h - max(-py1, 0)
    cs, ce = max(-px0, 0), w - max(-px1, 0)
    xp = jnp.pad(x[rs:re, cs:ce, :].astype(jnp.float32),
                 ((max(py0, 0), max(py1, 0)),
                  (max(px0, 0), max(px1, 0)), (0, 0)))
    acc = None
    for a in range(kh):
        for b in range(kw):
            tap = taps[a][b]
            if tap == 0.0:
                continue
            term = tap * xp[a:a + ho, b:b + wo, :]
            acc = term if acc is None else acc + term
    o_ref[0] = acc.astype(o_ref.dtype)


def _upfirdn2d_pallas_fir(x: jax.Array, taps: tuple, pad) -> jax.Array:
    """taps: pre-flipped kernel as a nested tuple of python floats (static)."""
    b, h, w, c = x.shape
    kh, kw = len(taps), len(taps[0])
    px0, px1, py0, py1 = pad
    ho = h + py0 + py1 - kh + 1
    wo = w + px0 + px1 - kw + 1

    return pl.pallas_call(
        functools.partial(_fir_kernel, taps=taps, kh=kh, kw=kw,
                          py0=py0, px0=px0, py1=py1, px1=px1, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, c), x.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ho, wo, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(x)


# batch and channels shard; the FIR spatial window needs full rows/cols
# (h, w inputs and i, j outputs are result-size-changing -> replicated).
_fir_part = partitioned(_upfirdn2d_pallas_fir, "b h w c -> b i j c",
                        need_replication=("h", "w", "i", "j"),
                        static_argnums=(1, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fir_fused(x, taps, pad):
    return _fir_part(x, taps, pad)


def _fir_fused_fwd(x, taps, pad):
    return _fir_part(x, taps, pad), x


def _fir_fused_bwd(taps, pad, x, g):
    import numpy as np
    # un-flip back to the original kernel for the XLA reference VJP
    k = jnp.asarray(np.flip(np.asarray(taps, np.float32), (0, 1)))
    _, vjp = jax.vjp(lambda x_: _upfirdn2d_xla(x_, k, 1, 1, pad), x)
    return vjp(g)


_fir_fused.defvjp(_fir_fused_fwd, _fir_fused_bwd)

# Full-image Pallas path only for small panels: Mosaic materializes each
# shifted tap slice (sublane shifts are layout changes), so scoped VMEM use
# is ~(kh*kw/2 + 4) x panel. Measured: a 2MB fp32 panel with a 4x4 kernel
# needs 24MB scoped VMEM -> keep panels <= 512KB and route larger blurs to
# XLA's depthwise conv (already well-tiled on TPU; the blur is a tiny
# fraction of discriminator step time either way).
_PALLAS_FIR_VMEM_BUDGET = 512 * 1024


def upfirdn2d(x: jax.Array, kernel: jax.Array, up: int = 1, down: int = 1,
              pad=(0, 0), *, impl: str | None = "auto") -> jax.Array:
    """Upsample-FIR-downsample on NHWC images.

    Matches the reference op's channel-last math (it flattens channels into
    batch; here channels ride the TPU lane dimension instead). The FIR kernel
    must be a concrete (non-traced) array — it is baked into the Pallas kernel
    as static taps, exactly like the reference bakes it into its CUDA kernel
    templates (upfirdn2d_kernel.cu:250-309).
    """
    pad4 = _norm_pad(pad)
    import numpy as np
    panel_bytes = int(np.prod(x.shape[1:])) * x.dtype.itemsize
    if (up == 1 and down == 1 and use_pallas(impl) and kernel.ndim == 2
            and not isinstance(kernel, jax.core.Tracer)
            and panel_bytes <= _PALLAS_FIR_VMEM_BUDGET):
        taps = tuple(tuple(float(v) for v in row)
                     for row in np.flip(np.asarray(kernel, np.float32), (0, 1)))
        return _fir_fused(x, taps, pad4)
    return _upfirdn2d_xla(x, jnp.asarray(kernel, jnp.float32), up, down, pad4)


def make_blur_kernel(taps, upsample_factor: int = 1) -> jax.Array:
    """1-D taps -> normalized 2-D separable blur kernel (reference Blur,
    enhancing/losses/layers.py:140-160; the upsample_factor**2 gain
    compensates zero-stuffed upsampling)."""
    k = jnp.asarray(taps, jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    k = k / jnp.sum(k)
    if upsample_factor > 1:
        k = k * (upsample_factor ** 2)
    return k
