"""Weights-only int8 serving for the stage-2 priors.

``quantize_decode_params(variables)`` adds a ``"quant"`` collection
mirroring every Dense ``kernel`` in the param tree with a symmetric
per-output-channel int8 copy (``kernel_q`` int8 + ``scale`` f32 — see
ops/int8.quantize_channelwise). Pass the returned variables to the SAME
samplers / batchers (``sample_gpt(m, qvars, ...)``): the decode methods in
models/stage2/layers.py detect the collection and read the int8 tensors
instead of the bf16 kernels, halving the dominant HBM traffic term of the
param-read-bound decode (README decode table: 58-66% of roofline reading
bf16 weights).

Quantization happens HERE, once, outside the jitted decode loop — the int8
tensors are real buffers the while-body DMAs, not an XLA rewrite that
loop-invariant code motion might fail to hoist. Prefill and training paths
ignore the collection entirely (full-precision numerics everywhere except
the per-token decode GEMMs).

The reference has nothing comparable (its sampler is fp16 autocast,
enhancing/modules/stage2/layers.py:268-303).
"""
from __future__ import annotations

from typing import Any, Dict

import jax

from ...ops.int8 import quantize_channelwise


def _walk(tree: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            sub = _walk(v)
            if sub:
                out[k] = sub
        elif k == "kernel" and hasattr(v, "ndim") and v.ndim >= 2:
            w_q, scale = quantize_channelwise(v)
            out["kernel_q"] = w_q
            out["scale"] = scale
    return out


def quantize_decode_params(variables: Dict[str, Any]) -> Dict[str, Any]:
    """variables -> variables + a "quant" collection of int8 kernels.

    Works for GPT and RQTransformer (scan-stacked or unrolled): stacked
    (L, d, n) kernels quantize with per-layer per-channel (L, n) scales.
    """
    quant = jax.jit(lambda p: _walk(p))(variables["params"])
    return {**variables, "quant": quant}


def _drop(params: Dict[str, Any], quant: Dict[str, Any]) -> Dict[str, Any]:
    import jax.numpy as jnp
    out: Dict[str, Any] = {}
    for k, v in params.items():
        q = quant.get(k) if isinstance(quant, dict) else None
        if isinstance(v, dict):
            out[k] = _drop(v, q if isinstance(q, dict) else {})
        elif (k == "kernel" and isinstance(quant, dict)
              and "kernel_q" in quant):
            # keep every leading axis (flax scan splits scanned params on
            # axis 0 — a 0-d placeholder breaks scan_prefill/scan_decode);
            # only the (d, n) GEMM dims collapse
            out[k] = jnp.zeros(v.shape[:-2] + (1, 1), v.dtype)
        else:
            out[k] = v
    return out


def drop_quantized_kernels(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Replace every bf16 kernel that has an int8 twin with a placeholder.

    Serving memory mode for **GPT**: after ``quantize_decode_params`` the
    prefill/decode/head paths only read the int8 copies, so the bf16
    kernels are dead weight — dropping them is what lets the full 24-layer
    6144d flagship (~11 GB int8) fit a single 16 GB chip. Placeholders keep
    their leading (layer-stack) axes so flax ``nn.scan`` still splits them.

    NOT valid for RQTransformer: its depth stack samples by full recompute
    (``Block.__call__`` + plain Dense head, layers.py depth_forward), which
    still reads the bf16 kernels — dropping them would silently corrupt the
    depth logits, so an RQ param tree (detected by its ``pos_emb_depth``
    parameter) raises here.
    """
    params = variables["params"]
    if "pos_emb_depth" in params:
        raise ValueError(
            "drop_quantized_kernels is not valid for RQTransformer: the "
            "depth stack's sampling path (depth_forward) reads the bf16 "
            "kernels directly, so dropping them would produce wrong logits, "
            "not save memory. Serve RQ with quantize_decode_params alone.")
    return {**variables,
            "params": _drop(params, variables.get("quant", {}))}
