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
