"""AOT export artifacts (utils/export.py): serialize, reload WITHOUT the
model object, and match the live module's outputs."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from enhancing_tpu.utils.export import (export_fn, export_sampler,
                                        export_tokenizer, load_artifact)

TINY = dict(dim=64, depth=2, heads=2, mlp_dim=128)


@pytest.fixture(scope="module")
def vitvq():
    from enhancing_tpu.models.stage1.vitvqgan import ViTVQ

    return ViTVQ(image_size=32, patch_size=8, encoder=TINY, decoder=TINY,
                 quantizer=dict(embed_dim=16, n_embed=64))


def test_tokenizer_export_roundtrip(vitvq, tmp_path, rng):
    paths = export_tokenizer(vitvq, batch=2, outdir=tmp_path)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)

    enc = load_artifact(paths["encode"])
    codes = enc(x)
    want = vitvq.module.apply(vitvq.variables, x, method="encode_codes")
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(want))

    dec = load_artifact(paths["decode"])
    pix = dec(codes)
    want_pix = vitvq.module.apply(vitvq.variables, codes,
                                  method="decode_codes")
    np.testing.assert_allclose(np.asarray(pix), np.asarray(want_pix),
                               atol=1e-5)

    rec = load_artifact(paths["reconstruct"])
    np.testing.assert_allclose(np.asarray(rec(x)), np.asarray(pix),
                               atol=1e-5)


def test_export_rejects_other_batch_shape(vitvq, tmp_path, rng):
    """Artifacts are shape-specialized: calling with a different batch is a
    loud error, not silent recompilation."""
    paths = export_tokenizer(vitvq, batch=2, outdir=tmp_path)
    enc = load_artifact(paths["encode"])
    x3 = jnp.asarray(rng.random((3, 32, 32, 3)), jnp.float32)
    with pytest.raises(Exception):
        enc(x3)


def test_sampler_export_roundtrip(tmp_path):
    from enhancing_tpu.utils.config import ConfigDict, initialize_from_config

    cfg = ConfigDict({
        "target": "enhancing_tpu.models.stage2.transformer.CondTransformer",
        "params": {
            "cond_key": "class",
            "stage1": {
                "target": "enhancing_tpu.models.stage1.vitvqgan.ViTVQ",
                "params": {"image_size": 32, "patch_size": 8,
                           "encoder": TINY, "decoder": TINY,
                           "quantizer": {"embed_dim": 16, "n_embed": 32}}},
            "cond": {
                "target": "enhancing_tpu.models.cond.dummycond.ClassCond",
                "params": {"image_size": 32,
                           "class_name": "assets/class/imagenet.txt"}},
            "transformer": {
                "target": "enhancing_tpu.models.stage2.layers.GPT",
                "params": {"vocab_cond_size": 1000, "vocab_img_size": 32,
                           "embed_dim": 64, "cond_num_tokens": 1,
                           "img_num_tokens": 16, "n_heads": 2,
                           "n_layers": 2}}}})
    model = initialize_from_config(cfg)
    paths = export_sampler(model, batch=2, outdir=tmp_path, top_k=8)
    fn = load_artifact(paths["sample"])
    conds = jnp.zeros((2, 1), jnp.int32)
    pix = fn(conds, jnp.int32(3))
    assert pix.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(pix)).all()
    assert 0.0 <= float(np.min(np.asarray(pix)))
    assert float(np.max(np.asarray(pix))) <= 1.0
    # deterministic per seed, varies across seeds
    pix2 = fn(conds, jnp.int32(3))
    np.testing.assert_array_equal(np.asarray(pix), np.asarray(pix2))
    # matches the live sampler
    want = model.sample(np.zeros((2, 1), np.int32), top_k=8, seed=3)
    np.testing.assert_allclose(np.asarray(pix), np.asarray(want), atol=1e-5)


def test_export_fn_constant_baking(tmp_path):
    """Weights passed as baked constants survive serialization."""
    import functools

    w = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))

    def f(weights, x):
        return x @ weights

    path = export_fn(functools.partial(f, w), (jnp.ones((2, 3)),),
                     tmp_path / "f.jaxexport")
    g = load_artifact(path)
    np.testing.assert_allclose(np.asarray(g(jnp.ones((2, 3)))),
                               np.asarray(jnp.ones((2, 3)) @ w))
