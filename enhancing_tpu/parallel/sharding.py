"""Parameter sharding rules: tensor-parallel specs for the stage-2 priors.

The stage-1 tokenizer (<=100M params) is replicated; the GPT prior at its
shipped size (6144d x 24L, configs/imagenet_gpt_vitvq_base.yaml:34-41) carries
~11B matmul params, so its attention/FFN kernels are Megatron-sharded over the
``model`` axis:

- column-parallel (shard output features): q/k/v projections, FFN up (p0),
  vocab head — P(None, 'model')
- row-parallel (shard input features): attention out-proj, FFN down (p1)
  — P('model', None)
- everything else (LN, biases of row-parallel layers, embeddings, pos embeds)
  replicated.

XLA/GSPMD inserts the reduce-scatter/all-gather collectives; no hand-written
comms (SURVEY §2.9 TPU-native mapping).
"""
from __future__ import annotations

import re
from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# (path regex, PartitionSpec) — first match wins. Specs are written for the
# *matrix* dims; scan-stacked layers (kernels with a leading layer axis,
# params under 'blocks'/'spatial'/'depth') get a leading None prepended.
_GPT_RULES = [
    (re.compile(r"attn/(key|query|value)/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"attn/proj/kernel$"), P(MODEL_AXIS, None)),
    (re.compile(r"mlp/p0/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"mlp/p1/kernel$"), P(MODEL_AXIS, None)),
    (re.compile(r"head/kernel$"), P(None, MODEL_AXIS)),
    # column-parallel bias lives with the output features
    (re.compile(r"attn/(key|query|value)/bias$"), P(MODEL_AXIS)),
    (re.compile(r"mlp/p0/bias$"), P(MODEL_AXIS)),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


_STACKED = re.compile(r"(^|/)(blocks|spatial|depth)/")


def gpt_param_specs(params: Dict[str, Any],
                    pipe: bool = False) -> Dict[str, Any]:
    """PartitionSpec tree for a GPT/RQTransformer param tree (handles both
    per-layer ``blocks_{i}`` and scan-stacked ``blocks`` layouts).

    ``pipe=True`` additionally shards the scan-stacked leading layer axis
    over the 'pipe' mesh axis — pipeline stage assignment as a sharding
    annotation (parallel/pipeline.py). Composes with the Megatron specs:
    e.g. a stacked qkv kernel becomes P('pipe', None, 'model')."""
    from .mesh import PIPE_AXIS

    def spec_for(path, leaf):
        name = _path_str(path)
        stacked = _STACKED.search(name) is not None
        lead = [PIPE_AXIS] if (pipe and stacked) else [None]
        for pat, spec in _GPT_RULES:
            if pat.search(name):
                matrix_ndim = len(spec)
                extra = leaf.ndim - matrix_ndim
                if extra > 0:   # scan-stacked: leading layer axis
                    return P(*(lead + [None] * (extra - 1)), *spec)
                return spec
        if pipe and stacked and leaf.ndim >= 1:
            return P(*(lead + [None] * (leaf.ndim - 1)))
        return P()
    return jax.tree_util.tree_map_with_path(spec_for, params)


def replicated_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    return jax.tree.map(lambda _: P(), params)


def zero1_specs(tree: Dict[str, Any], mesh: Mesh,
                min_size: int = 4096) -> Dict[str, Any]:
    """ZeRO-1-style PartitionSpec tree: shard each leaf's largest
    data-divisible axis over the 'data' mesh axis.

    Applied to *optimizer state* (Adam moments): with replicated params and
    data-sharded moments, GSPMD partitions the elementwise moment updates
    across the data axis and all-gathers the updated params — the ZeRO-1
    memory/compute split, expressed purely as sharding annotations (the
    reference has no equivalent; its DDP replicates optimizer state
    per-GPU, SURVEY §2.9).

    Only matrix-shaped leaves (ndim <= 3) with >= ``min_size`` elements are
    sharded: that is where the moment memory lives (dense/attention kernels,
    embedding tables). Conv kernels (ndim 4) stay replicated — their
    channel-sharded moment layouts propagate into the conv gradient
    computation where GSPMD falls back to full rematerialization.
    Scalars, small and non-divisible leaves replicate.
    """
    from .mesh import DATA_AXIS
    n = mesh.shape[DATA_AXIS]

    def spec_for(leaf):
        if (not hasattr(leaf, "ndim") or leaf.ndim == 0 or leaf.ndim > 3
                or n <= 1 or leaf.size < min_size):
            return P()
        dims = list(getattr(leaf, "shape", ()))
        best = max(range(len(dims)), key=lambda i: dims[i])
        if dims[best] % n != 0:
            return P()
        axes: list = [None] * len(dims)
        axes[best] = DATA_AXIS
        return P(*axes)

    return jax.tree.map(spec_for, tree)


def place_params(mesh: Mesh, params: Dict[str, Any],
                 specs: Dict[str, Any]) -> Dict[str, Any]:
    """device_put the param tree with the given specs on the mesh."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
