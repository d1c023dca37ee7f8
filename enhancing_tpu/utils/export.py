"""AOT export of the inference surfaces to portable StableHLO artifacts.

Production-serving path the reference lacks entirely (its inference is
"load the Lightning module in Python"): here the tokenizer round trip and
the prior sampler are staged with ``jax.export`` into self-contained
serialized functions — weights baked in, Python model code NOT needed at
load time. A serving process does::

    from enhancing_tpu.utils.export import load_artifact
    fn = load_artifact("tokenizer_encode.jaxexport")
    codes = fn(images)                      # jit-compiled on first call

Artifacts are platform-checked by jax.export (a TPU export refuses to run
on CPU unless exported for both) and versioned by its calling convention.
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def export_fn(fn: Callable, example_args: Sequence, path: str | Path,
              *, platforms: Optional[Sequence[str]] = None) -> Path:
    """Trace ``fn`` on ``example_args`` and serialize to ``path``.

    ``fn`` must be jittable and closure-free w.r.t. traced values (bake
    weights via functools.partial on *concrete* arrays — jax.export
    serializes them as constants).

    ``platforms``: lowering platforms (e.g. ["tpu", "cpu"]); defaults to
    the current backend.
    """
    path = Path(path)
    jitted = jax.jit(fn)
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    exported = jax.export.export(jitted, **kw)(*example_args)
    path.write_bytes(exported.serialize())
    return path


def load_artifact(path: str | Path) -> Callable:
    """Deserialize an exported function; returns a callable (jit-wrapped)."""
    exported = jax.export.deserialize(Path(path).read_bytes())
    return jax.jit(exported.call)


# ---------------------------------------------------------------------------
# Model-specific exporters.
# ---------------------------------------------------------------------------


def export_tokenizer(model, batch: int, outdir: str | Path,
                     *, platforms: Optional[Sequence[str]] = None
                     ) -> dict:
    """Export encode_codes / decode_codes / reconstruct for a ViTVQ wrapper.

    Returns {name: artifact path}. The weights ride inside the artifacts.
    """
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    module = model.module
    variables = jax.device_get(model.variables)
    size = module.image_size
    hw = (size, size) if isinstance(size, int) else tuple(size)
    x = jnp.zeros((batch, *hw, 3), jnp.float32)

    def encode(images):
        return module.apply(variables, images, method="encode_codes")

    codes = jax.eval_shape(encode, x)

    def decode(codes):
        return module.apply(variables, codes, method="decode_codes")

    def reconstruct(images):
        return decode(encode(images))

    out = {
        "encode": export_fn(encode, (x,), outdir / "tokenizer_encode.jaxexport",
                            platforms=platforms),
        "decode": export_fn(
            decode, (jnp.zeros(codes.shape, codes.dtype),),
            outdir / "tokenizer_decode.jaxexport", platforms=platforms),
        "reconstruct": export_fn(
            reconstruct, (x,), outdir / "tokenizer_reconstruct.jaxexport",
            platforms=platforms),
    }
    return out


def export_sampler(cond_model, batch: int, outdir: str | Path,
                   *, top_k: Optional[int] = None,
                   top_p: Optional[float] = None,
                   temperature: float = 1.0,
                   platforms: Optional[Sequence[str]] = None) -> dict:
    """Export the full conditional image sampler: (conds, seed) -> pixels.

    One artifact containing prior decode loop + tokenizer decode, weights
    baked in (reference's CondTransformer.sample, transformer.py:78-95)."""
    from ..models.stage2.sampling import sample_gpt, sample_rq

    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    transformer = cond_model.transformer
    stage1 = cond_model.stage1_model
    params = jax.device_get(cond_model.params)
    stage1_vars = jax.device_get(stage1.variables)
    sampler = sample_rq if cond_model.is_rq else sample_gpt
    code_shape = cond_model.code_shape

    def sample(conds, seed):
        rng = jax.random.PRNGKey(seed)
        conds = conds.reshape(conds.shape[0], -1).astype(jnp.int32)
        _, codes = sampler(transformer, {"params": params}, conds, rng,
                           top_k=top_k, top_p=top_p,
                           temperature=float(temperature))
        if code_shape is not None:
            codes = codes.reshape(codes.shape[0], *code_shape)
        pixels = stage1.module.apply(stage1_vars, codes,
                                     method="decode_codes")
        return jnp.clip(pixels, 0.0, 1.0)

    conds = jnp.zeros((batch, cond_model.transformer.cond_num_tokens),
                      jnp.int32)
    return {"sample": export_fn(sample, (conds, jnp.int32(0)),
                                outdir / "sampler.jaxexport",
                                platforms=platforms)}
