"""Parallelism: mesh construction, sharding rules, dp/tp train-step execution."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from enhancing_tpu.models.stage2 import GPT
from enhancing_tpu.parallel import (
    batch_sharding,
    gpt_param_specs,
    make_mesh,
    place_params,
    shard_batch,
)


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.devices.shape == (8, 1)
    m2 = make_mesh(data=4, model=2)
    assert m2.devices.shape == (4, 2)
    with pytest.raises(AssertionError):
        make_mesh(data=3, model=2)


def test_gpt_param_specs():
    m = GPT(vocab_cond_size=4, vocab_img_size=16, embed_dim=32,
            cond_num_tokens=1, img_num_tokens=8, n_heads=2, n_layers=1)
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                jnp.zeros((1, 1), jnp.int32))
    specs = gpt_param_specs(vs["params"])
    # default layout is scan-stacked: kernels carry a leading layer axis
    blk = specs["blocks"]
    assert blk["attn"]["query"]["kernel"] == P(None, None, "model")
    assert blk["attn"]["proj"]["kernel"] == P(None, "model", None)
    assert blk["mlp"]["p0"]["kernel"] == P(None, None, "model")
    assert blk["mlp"]["p1"]["kernel"] == P(None, "model", None)
    assert specs["head"]["kernel"] == P(None, "model")
    # replicated leaves
    assert blk["ln1"]["scale"] == P()
    assert specs["pos_emb_code"] == P()
    assert blk["attn"]["proj"]["bias"] == P()  # row-parallel bias replicated
    assert blk["attn"]["query"]["bias"] == P(None, "model")

    # per-layer (unrolled) layout keeps the 2-D specs
    m2 = GPT(vocab_cond_size=4, vocab_img_size=16, embed_dim=32,
             cond_num_tokens=1, img_num_tokens=8, n_heads=2, n_layers=1,
             scan_layers=False)
    vs2 = m2.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                  jnp.zeros((1, 1), jnp.int32))
    specs2 = gpt_param_specs(vs2["params"])
    assert specs2["blocks_0"]["attn"]["query"]["kernel"] == P(None, "model")


def test_tp_forward_matches_replicated():
    """GPT forward under 4-way tensor parallelism == single-device forward."""
    m = GPT(vocab_cond_size=4, vocab_img_size=64, embed_dim=64,
            cond_num_tokens=1, img_num_tokens=16, n_heads=4, n_layers=2)
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 16), jnp.int32),
                jnp.zeros((2, 1), jnp.int32))
    codes = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 16)),
                        jnp.int32)
    conds = jnp.zeros((2, 1), jnp.int32)
    ref = m.apply(vs, codes, conds)

    mesh = make_mesh(data=2, model=4)
    params = place_params(mesh, vs["params"], gpt_param_specs(vs["params"]))
    codes_s = jax.device_put(codes, batch_sharding(mesh))
    conds_s = jax.device_put(conds, batch_sharding(mesh))
    out = jax.jit(lambda p, c, cc: m.apply({"params": p}, c, cc))(
        params, codes_s, conds_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    batch = {"image": np.zeros((16, 4, 4, 3), np.float32)}
    out = shard_batch(mesh, batch)
    sh = out["image"].sharding
    assert sh.spec == P("data")


def test_dp_gradients_match_single_device():
    """Data-parallel loss/gradients == single-device on the same batch."""
    from enhancing_tpu.models.stage1.vitvqgan import ViTVQ
    tiny = dict(dim=32, depth=1, heads=2, mlp_dim=64)
    model = ViTVQ(image_size=16, patch_size=8, encoder=tiny, decoder=tiny,
                  quantizer=dict(embed_dim=8, n_embed=32))
    x = jnp.asarray(np.random.default_rng(0).random((8, 16, 16, 3)),
                    jnp.float32)

    def loss_fn(params, x):
        rec, qloss = model.module.apply(
            {"params": params, "constants": model.constants}, x)
        return jnp.mean(jnp.square(rec - x)) + qloss

    g_single = jax.grad(loss_fn)(model.params, x)

    mesh = make_mesh()
    xs = jax.device_put(x, batch_sharding(mesh))
    ps = jax.tree.map(
        lambda a: jax.device_put(a, jax.sharding.NamedSharding(mesh, P())),
        model.params)
    g_dp = jax.jit(jax.grad(loss_fn))(ps, xs)
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
