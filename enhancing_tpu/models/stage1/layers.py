"""ViT encoder/decoder for the VQGAN tokenizer, TPU-first.

Capability parity with the reference's stage-1 ViT
(reference: enhancing/modules/stage1/layers.py:21-217) with a TPU-native design:

- Images are NHWC (TPU-native layout). Patch embed / unembed are expressed as
  reshape + matmul instead of Conv2d/ConvTranspose2d with kernel=stride — the
  exact same math, but guaranteed to land on the MXU as one large GEMM.
  Patch pixels are flattened in (C, ph, pw) order so released PyTorch conv
  weights map onto the Dense kernels by a pure reshape (see compat/).
- Fixed (non-trainable) 2-D sin-cos position embeddings
  (reference: enhancing/modules/stage1/layers.py:21-68).
- Pre-norm transformer blocks: LN -> MHSA -> residual, LN -> FFN(tanh) -> residual,
  final LN (reference: enhancing/modules/stage1/layers.py:85-150).
- Attention runs through ops.attention.multihead_attention which dispatches to a
  fused Pallas kernel on TPU and a pure-XLA reference path elsewhere.
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange
from flax import linen as nn

from ...ops.attention import (attention_proj_packed,
                              multihead_attention_bnhd,
                              multihead_attention_packed_qkv)
from ...ops.ffn import fused_ffn
from ...ops.ln_gemm import fused_layernorm, fused_ln_gemm

Size = Union[int, Tuple[int, int], Sequence[int]]


def _pair(x: Size) -> Tuple[int, int]:
    if isinstance(x, int):
        return (x, x)
    a, b = x
    return (int(a), int(b))


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: Size) -> np.ndarray:
    """Fixed 2-D sin-cos position embedding, (grid_h*grid_w, embed_dim).

    Matches the reference construction (enhancing/modules/stage1/layers.py:21-68):
    half the channels encode the row coordinate, half the column, each as
    [sin(pos*omega), cos(pos*omega)] with omega = 1/10000^(2i/d).
    """
    gh, gw = _pair(grid_size)
    grid_h = np.arange(gh, dtype=np.float64)
    grid_w = np.arange(gw, dtype=np.float64)
    # w varies fastest (meshgrid with w first, matching the reference)
    grid = np.meshgrid(grid_w, grid_h)  # grid[0]: w coords, grid[1]: h coords
    grid = np.stack(grid, axis=0).reshape(2, -1)

    def _1d(dim: int, pos: np.ndarray) -> np.ndarray:
        assert dim % 2 == 0
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    assert embed_dim % 2 == 0
    emb_h = _1d(embed_dim // 2, grid[0])
    emb_w = _1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


# Xavier-uniform init for Dense kernels ("following official JAX ViT",
# reference: enhancing/modules/stage1/layers.py:71-82).
dense_init = nn.initializers.xavier_uniform()


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's tree layout (kernel/bias) — lets the
    fused FFN kernel consume the weights directly while keeping checkpoint
    compatibility with the Dense-based layout."""

    features_in: int
    features_out: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", dense_init,
                       (self.features_in, self.features_out))
        if not self.use_bias:
            return k, None
        b = self.param("bias", nn.initializers.zeros, (self.features_out,))
        return k, b


class _LNParams(nn.Module):
    """Parameter holder with nn.LayerNorm's tree layout (scale/bias) — the
    block owns the LN params so they can feed the fused LN->GEMM kernel
    (ops/ln_gemm.py) while checkpoints keep the LayerNorm-based layout."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


def _use_fused_attn_proj() -> bool:
    """Opt-in (ENHANCING_TPU_ATTN_PROJ=1): fold the output projection +
    residual add into the attention kernel (ops/attention.attention_proj_
    packed). MEASURED SLOWER on v5e for the ViT-base headline (300.5 vs
    310.1 img/s): the in-kernel proj matmul serializes behind the softmax
    and the q-block-major grid re-DMAs k/v per q-block, while XLA runs the
    separate proj GEMM at ~peak and overlaps the HBM passes it saves. Kept
    for FLOPs:bandwidth ratios where the round trip dominates."""
    import os
    return os.environ.get("ENHANCING_TPU_ATTN_PROJ", "") not in ("", "0")


def _w8a8_gemms_enabled() -> bool:
    from ...ops.int8 import w8a8_gemms_enabled
    return w8a8_gemms_enabled()


def _w8a8_dense(x, w, b, activation=None):
    """nn.Dense-equivalent GEMM on the MXU's native int8 path: dynamic
    per-row int8 activations x per-output-channel int8 weights (quantized
    on the fly — stage-1 weights are a rounding error next to the
    activation traffic). See ops/int8.w8a8_gemms."""
    from ...ops.int8 import int8_gemm, quantize_channelwise
    w_q, sc = quantize_channelwise(w)
    return int8_gemm(x, w_q, sc, b, activation=activation, w8a8=True)


def _w8a8_ln_gemm(x, ln, w, b=None, activation=None):
    """fused_ln_gemm's W8A8 twin (LN stays f32; the GEMM runs int8)."""
    from ...ops.int8 import int8_ln_gemm, quantize_channelwise
    w_q, sc = quantize_channelwise(w)
    out, _ = int8_ln_gemm(x, ln[0], ln[1], None, None, w_q, sc, b,
                          activation=activation, w8a8=True)
    return out


def resolve_ffn_impl(ffn_impl: str | None) -> str:
    """Resolve the FFN kernel choice: the ENHANCING_TPU_FUSED_FFN env var is
    an A/B override; otherwise the module/config field decides ('dense' — the
    default — or 'fused')."""
    import os
    env = os.environ.get("ENHANCING_TPU_FUSED_FFN")
    if env is not None:
        return "fused" if env not in ("", "0") else "dense"
    return ffn_impl or "dense"


class FeedForward(nn.Module):
    """Position-wise MLP with Tanh hidden activation.

    The reference uses Tanh (not GELU) in the stage-1 FFN
    (enhancing/modules/stage1/layers.py:95-105).

    ``ffn_impl='fused'`` (a config field on the encoder/decoder, or the
    ENHANCING_TPU_FUSED_FFN=1 env override) routes through the fused Pallas
    kernel (ops/ffn.py) — measured ~2% slower than XLA's pipelined matmuls
    on v5e for the base model (see README perf notes for flagship dims), but
    potentially faster where HBM bandwidth is scarcer relative to FLOPs.
    """

    dim: int
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32
    ffn_impl: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, ln=None) -> jax.Array:
        """``ln=(scale, bias)`` fuses the preceding LayerNorm into the fc1
        GEMM (ops/ln_gemm.py) so the normalized activation never leaves
        VMEM; ``ln=None`` keeps the plain (pre-normalized input) path."""
        if resolve_ffn_impl(self.ffn_impl) == "fused":
            if ln is not None:
                from ...ops.ln_gemm import layernorm_xla
                x = layernorm_xla(x.astype(self.dtype), ln[0], ln[1])
            w1, b1 = _DenseParams(self.dim, self.hidden_dim, name="fc1")()
            w2, b2 = _DenseParams(self.hidden_dim, self.dim, name="fc2")()
            return fused_ffn(x.astype(self.dtype), w1, b1, w2, b2,
                             activation="tanh", impl="pallas")
        w8a8 = _w8a8_gemms_enabled()
        if ln is not None:
            w1, b1 = _DenseParams(self.dim, self.hidden_dim, name="fc1")()
            if w8a8:
                x = _w8a8_ln_gemm(x.astype(self.dtype), ln, w1, b1,
                                  activation="tanh")
            else:
                x = fused_ln_gemm(x.astype(self.dtype), ln[0], ln[1], w1, b1,
                                  activation="tanh")
        elif w8a8:
            w1, b1 = _DenseParams(self.dim, self.hidden_dim, name="fc1")()
            x = _w8a8_dense(x.astype(self.dtype), w1, b1, activation="tanh")
        else:
            x = nn.Dense(self.hidden_dim, kernel_init=dense_init,
                         dtype=self.dtype, name="fc1")(x)
            x = jnp.tanh(x)
        if w8a8:
            w2, b2 = _DenseParams(self.hidden_dim, self.dim, name="fc2")()
            return _w8a8_dense(x, w2, b2)
        return nn.Dense(self.dim, kernel_init=dense_init, dtype=self.dtype,
                        name="fc2")(x)


class Attention(nn.Module):
    """Multi-head self-attention with fused QKV projection (no bias).

    Mirrors the reference attention (enhancing/modules/stage1/layers.py:108-132):
    a single qkv Dense without bias, scale = head_dim**-0.5, output projection
    only when (heads, head_dim) != (1, dim).
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, ln=None,
                 residual: jax.Array | None = None) -> jax.Array:
        """``ln=(scale, bias)`` fuses the preceding LayerNorm into the QKV
        GEMM (ops/ln_gemm.py); ``ln=None`` expects a pre-normalized input.

        ``residual``: when given (and the module has an output projection),
        returns ``residual + to_out(attention(...))`` with the projection
        and residual-add folded into the attention kernel
        (ops/attention.attention_proj_packed) — the attention output never
        round-trips HBM. Callers passing ``residual`` must NOT add it again.
        """
        b, n, _ = x.shape
        inner = self.heads * self.dim_head
        w8a8 = _w8a8_gemms_enabled()
        if ln is not None:
            wq, _ = _DenseParams(self.dim, inner * 3, use_bias=False,
                                 name="to_qkv")()
            if w8a8:
                qkv = _w8a8_ln_gemm(x.astype(self.dtype), ln, wq)
            else:
                qkv = fused_ln_gemm(x.astype(self.dtype), ln[0], ln[1], wq)
        elif w8a8:
            wq, _ = _DenseParams(self.dim, inner * 3, use_bias=False,
                                 name="to_qkv")()
            qkv = _w8a8_dense(x.astype(self.dtype), wq, None)
        else:
            qkv = nn.Dense(inner * 3, use_bias=False, kernel_init=dense_init,
                           dtype=self.dtype, name="to_qkv")(x)
        has_proj = not (self.heads == 1 and self.dim_head == self.dim)
        if residual is not None and has_proj and _use_fused_attn_proj():
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, n, self.heads, self.dim_head)
            k = k.reshape(b, n, self.heads, self.dim_head)
            v = v.reshape(b, n, self.heads, self.dim_head)
            # param layout identical to nn.Dense(name='to_out') — checkpoint
            # compatible either way
            wp, bp = _DenseParams(inner, self.dim, name="to_out")()
            return attention_proj_packed(
                q, k, v, wp, bp, residual.astype(self.dtype),
                scale=self.dim_head**-0.5)

        # attention reads q/k/v lane slabs straight out of the fused qkv
        # buffer — a jnp.split here would materialize three full copies
        # (Pallas custom-call operands must be contiguous)
        out = multihead_attention_packed_qkv(qkv, self.heads, self.dim_head,
                                             scale=self.dim_head**-0.5)

        if has_proj:
            if w8a8:
                wp, bp = _DenseParams(inner, self.dim, name="to_out")()
                out = _w8a8_dense(out, wp, bp)
            else:
                out = nn.Dense(self.dim, kernel_init=dense_init,
                               dtype=self.dtype, name="to_out")(out)
        if residual is not None:
            out = residual.astype(out.dtype) + out
        return out


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    dtype: jnp.dtype = jnp.float32
    ffn_impl: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # The block owns the LN params (layout-identical to nn.LayerNorm)
        # and hands them to the sublayers, which fuse LN into their first
        # GEMM — XLA cannot fuse an elementwise producer into a dot operand,
        # so a standalone LN pass costs a full HBM round trip (~12% of the
        # stage-1 headline step; see ops/ln_gemm.py).
        ln1 = _LNParams(self.dim, name="norm1")()
        # Attention consumes the residual: projection + residual-add fold
        # into the attention kernel (no HBM round trip of the attn output)
        x = Attention(self.dim, self.heads, self.dim_head, dtype=self.dtype,
                      name="attn")(x, ln=ln1, residual=x)
        ln2 = _LNParams(self.dim, name="norm2")()
        x = x + FeedForward(self.dim, self.mlp_dim, dtype=self.dtype,
                            ffn_impl=self.ffn_impl, name="ff")(x, ln=ln2)
        return x

    def scan_call(self, x: jax.Array, _) -> tuple:
        return self(x), None


class Transformer(nn.Module):
    """Pre-norm ViT transformer stack with a final LayerNorm.

    (reference: enhancing/modules/stage1/layers.py:135-150)

    ``scan_layers`` compiles the stack as one nn.scan'd block body (stacked
    params) — dramatically smaller XLA graphs for deep training programs;
    ``remat`` rematerializes blocks in the backward pass.
    """

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False
    ffn_impl: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        block_cls = TransformerBlock
        if self.remat:
            block_cls = nn.remat(TransformerBlock)
        if self.scan_layers:
            scanned = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.depth,
                methods=["scan_call"])
            stack = scanned(self.dim, self.heads, self.dim_head, self.mlp_dim,
                            dtype=self.dtype, ffn_impl=self.ffn_impl,
                            name="layers")
            x, _ = stack.scan_call(x, jnp.zeros((self.depth, 0)))
        else:
            for i in range(self.depth):
                x = block_cls(self.dim, self.heads, self.dim_head,
                              self.mlp_dim, dtype=self.dtype,
                              ffn_impl=self.ffn_impl,
                              name=f"layers_{i}")(x)
        # Final LN as the single-pass Pallas kernel (param layout identical
        # to nn.LayerNorm): XLA's emission of this unfusable-into-a-dot LN
        # ran at ~122 GB/s on the headline step (3.3 ms/201 MB, profiled r3).
        lnf = _LNParams(self.dim, name="norm")()
        return fused_layernorm(x.astype(self.dtype), lnf[0], lnf[1])


class ViTEncoder(nn.Module):
    """Patchify -> add fixed sincos pos-embed -> Transformer.

    (reference: enhancing/modules/stage1/layers.py:153-182). Patch embedding is a
    single Dense over patches flattened in (C, ph, pw) order — numerically equal
    to the reference's Conv2d(kernel=stride=patch) but a pure GEMM on the MXU.
    """

    image_size: Size
    patch_size: Size
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False
    ffn_impl: str | None = None

    def setup(self) -> None:
        ih, iw = _pair(self.image_size)
        ph, pw = _pair(self.patch_size)
        assert ih % ph == 0 and iw % pw == 0, "image size must divide by patch size"
        self.grid = (ih // ph, iw // pw)
        self.num_patches = self.grid[0] * self.grid[1]
        self.patch_dim = self.channels * ph * pw

        self.patch_embed = nn.Dense(self.dim, kernel_init=dense_init,
                                    dtype=self.dtype, name="patch_embed")
        pos = get_2d_sincos_pos_embed(self.dim, self.grid)
        self.pos_embed = self.variable(
            "constants", "pos_embed", lambda: jnp.asarray(pos[None]))
        self.transformer = Transformer(self.dim, self.depth, self.heads,
                                       self.dim_head, self.mlp_dim,
                                       dtype=self.dtype, remat=self.remat,
                                       scan_layers=self.scan_layers,
                                       ffn_impl=self.ffn_impl,
                                       name="transformer")

    def __call__(self, img: jax.Array) -> jax.Array:
        """img: (B, H, W, C) in [0, 1] -> tokens (B, N, dim)."""
        ph, pw = _pair(self.patch_size)
        x = rearrange(img, "b (h p1) (w p2) c -> b (h w) (c p1 p2)", p1=ph, p2=pw)
        x = self.patch_embed(x.astype(self.dtype))
        x = x + self.pos_embed.value.astype(self.dtype)
        return self.transformer(x)


class ViTDecoder(nn.Module):
    """Add pos-embed -> Transformer -> un-patchify Dense to pixels.

    (reference: enhancing/modules/stage1/layers.py:185-217). ``to_pixel`` is a
    Dense producing (C, ph, pw)-ordered patch pixels, equal to the reference's
    ConvTranspose2d(kernel=stride=patch).
    """

    image_size: Size
    patch_size: Size
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    scan_layers: bool = False
    ffn_impl: str | None = None

    def setup(self) -> None:
        ih, iw = _pair(self.image_size)
        ph, pw = _pair(self.patch_size)
        assert ih % ph == 0 and iw % pw == 0, "image size must divide by patch size"
        self.grid = (ih // ph, iw // pw)
        self.num_patches = self.grid[0] * self.grid[1]

        pos = get_2d_sincos_pos_embed(self.dim, self.grid)
        self.pos_embed = self.variable(
            "constants", "pos_embed", lambda: jnp.asarray(pos[None]))
        self.transformer = Transformer(self.dim, self.depth, self.heads,
                                       self.dim_head, self.mlp_dim,
                                       dtype=self.dtype, remat=self.remat,
                                       scan_layers=self.scan_layers,
                                       ffn_impl=self.ffn_impl,
                                       name="transformer")
        self.to_pixel = nn.Dense(self.channels * ph * pw, kernel_init=dense_init,
                                 dtype=self.dtype, name="to_pixel")

    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens: (B, N, dim) -> img (B, H, W, C)."""
        return self.pixels_from_tokens(self.pre_pixel_tokens(tokens))

    def pre_pixel_tokens(self, tokens: jax.Array) -> jax.Array:
        """Everything up to (but excluding) the last layer (to_pixel)."""
        x = tokens + self.pos_embed.value.astype(tokens.dtype)
        return self.transformer(x)

    def pixels_from_tokens(self, x: jax.Array) -> jax.Array:
        """The last layer only: to_pixel Dense + un-patchify."""
        ph, pw = _pair(self.patch_size)
        x = self.to_pixel(x)
        return rearrange(x, "b (h w) (c p1 p2) -> b (h p1) (w p2) c",
                         h=self.grid[0], p1=ph, p2=pw)

    def patchify_grad(self, g: jax.Array) -> jax.Array:
        """Inverse of the un-patchify rearrange, for last-layer grad chaining."""
        ph, pw = _pair(self.patch_size)
        return rearrange(g, "b (h p1) (w p2) c -> b (h w) (c p1 p2)",
                         p1=ph, p2=pw)

    def get_last_layer_path(self) -> Tuple[str, ...]:
        """Param-tree path of the last layer kernel (for adaptive GAN weight).

        Equivalent of the reference's ``decoder.get_last_layer()``
        (enhancing/modules/stage1/layers.py:216-217).
        """
        return ("to_pixel", "kernel")
