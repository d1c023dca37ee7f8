"""Stage-1 ViT-VQGAN model tests: shapes, quantizers, round trips, parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhancing_tpu.models.stage1 import (
    GumbelQuantizer,
    VectorQuantizer,
    ViTDecoder,
    ViTEncoder,
    ViTVQ,
    ViTVQModule,
    get_2d_sincos_pos_embed,
)

ENC = dict(dim=64, depth=2, heads=2, mlp_dim=128)
Q = dict(embed_dim=16, n_embed=128)


def tiny_module(**kw):
    return ViTVQModule(image_size=32, patch_size=8, encoder=ENC, decoder=ENC,
                       quantizer=Q, **kw)


def test_sincos_pos_embed_matches_reference_construction():
    """Independent numpy re-derivation of the reference formula
    (enhancing/modules/stage1/layers.py:21-68)."""
    dim, gh, gw = 8, 2, 3
    emb = get_2d_sincos_pos_embed(dim, (gh, gw))
    assert emb.shape == (gh * gw, dim)
    # position (h=1, w=2) is row h*gw + w (w varies fastest). In the reference
    # construction the FIRST half encodes the w coordinate (meshgrid w-first).
    row = emb[1 * gw + 2]
    half = dim // 2
    omega = 1.0 / 10000 ** (np.arange(half // 2) / (half / 2))
    np.testing.assert_allclose(row[:half], np.concatenate(
        [np.sin(2 * omega), np.cos(2 * omega)]), atol=1e-6)
    np.testing.assert_allclose(row[half:], np.concatenate(
        [np.sin(1 * omega), np.cos(1 * omega)]), atol=1e-6)


def test_encoder_decoder_shapes(rng):
    enc = ViTEncoder(image_size=32, patch_size=8, **ENC)
    img = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    vs = enc.init(jax.random.PRNGKey(0), img)
    tokens = enc.apply(vs, img)
    assert tokens.shape == (2, 16, 64)

    dec = ViTDecoder(image_size=32, patch_size=8, **ENC)
    vs_d = dec.init(jax.random.PRNGKey(1), tokens)
    out = dec.apply(vs_d, tokens)
    assert out.shape == (2, 32, 32, 3)


def test_patch_embed_matches_torch_conv(rng):
    """Our reshape+Dense patch embed equals Conv2d(kernel=stride=patch)."""
    import torch
    dim, p = 12, 4
    img = rng.random((2, 16, 16, 3)).astype(np.float32)
    enc = ViTEncoder(image_size=16, patch_size=p, dim=dim, depth=1, heads=1,
                     mlp_dim=16)
    vs = enc.init(jax.random.PRNGKey(0), jnp.asarray(img))
    kernel = np.asarray(vs["params"]["patch_embed"]["kernel"])  # (c*p*p, dim)
    bias = np.asarray(vs["params"]["patch_embed"]["bias"])

    conv = torch.nn.Conv2d(3, dim, kernel_size=p, stride=p)
    with torch.no_grad():
        # torch weight (out, in, kh, kw); ours is flat (c, ph, pw) -> dim
        conv.weight.copy_(torch.from_numpy(
            kernel.T.reshape(dim, 3, p, p)))
        conv.bias.copy_(torch.from_numpy(bias))
        torch_out = conv(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        torch_tokens = torch_out.flatten(2).transpose(1, 2).numpy()  # b (h w) c

    from einops import rearrange
    x = rearrange(jnp.asarray(img), "b (h p1) (w p2) c -> b (h w) (c p1 p2)",
                  p1=p, p2=p)
    ours = np.asarray(x @ kernel + bias)
    np.testing.assert_allclose(ours, torch_tokens, atol=1e-5)


def test_unpatchify_matches_torch_convtranspose(rng):
    import torch
    dim, p = 12, 4
    tokens = rng.standard_normal((2, 16, dim)).astype(np.float32)
    kernel = rng.standard_normal((dim, 3 * p * p)).astype(np.float32)
    bias = rng.standard_normal((3 * p * p,)).astype(np.float32)

    # ConvTranspose2d weight layout (in, out, kh, kw)
    tconv = torch.nn.ConvTranspose2d(dim, 3, kernel_size=p, stride=p)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(kernel.reshape(dim, 3, p, p)))
        # our Dense bias is per (c, ph, pw) element; torch bias is per channel
        tconv.bias.zero_()
        grid = torch.from_numpy(tokens.transpose(0, 2, 1).reshape(2, dim, 4, 4))
        torch_img = tconv(grid).numpy().transpose(0, 2, 3, 1)

    from einops import rearrange
    ours = np.asarray(rearrange(
        jnp.asarray(tokens @ kernel), "b (h w) (c p1 p2) -> b (h p1) (w p2) c",
        h=4, p1=p, p2=p))
    np.testing.assert_allclose(ours, torch_img, atol=1e-5)


def test_vector_quantizer_matches_torch(rng):
    """Full VQ parity vs an independent torch implementation of the reference
    math (enhancing/modules/stage1/quantizers.py:74-92)."""
    import torch
    import torch.nn.functional as F
    q = VectorQuantizer(embed_dim=8, n_embed=32, beta=0.25)
    z = rng.standard_normal((2, 5, 8)).astype(np.float32)
    vs = q.init(jax.random.PRNGKey(0), jnp.asarray(z))
    emb = np.asarray(vs["params"]["embedding"])

    zq, loss, idx = q.apply(vs, jnp.asarray(z))

    zt = torch.from_numpy(z)
    et = torch.from_numpy(emb)
    zn = F.normalize(zt.reshape(-1, 8), dim=-1)
    en = F.normalize(et, dim=-1)
    d = (zn**2).sum(1, keepdim=True) + (en**2).sum(1) - 2 * zn @ en.T
    ti = d.argmin(1).reshape(2, 5)
    tq = F.normalize(et[ti], dim=-1)
    t_loss = 0.25 * ((tq - F.normalize(zt, dim=-1)) ** 2).mean() + \
        ((tq - F.normalize(zt, dim=-1)) ** 2).mean()

    np.testing.assert_array_equal(np.asarray(idx), ti.numpy())
    # straight-through: z_q = z + (zq_norm - z), value equals zq_norm
    np.testing.assert_allclose(np.asarray(zq), tq.numpy(), atol=1e-5)
    np.testing.assert_allclose(float(loss), float(t_loss), atol=1e-5)


def test_vq_straight_through_gradient(rng):
    q = VectorQuantizer(embed_dim=4, n_embed=16)
    z = jnp.asarray(rng.standard_normal((3, 4)), jnp.float32)
    vs = q.init(jax.random.PRNGKey(0), z)

    def f(z):
        zq, _, _ = q.apply(vs, z)
        return jnp.sum(zq * 2.0)

    g = jax.grad(f)(z)
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones_like(g), atol=1e-6)


def test_residual_quantizer(rng):
    q = VectorQuantizer(embed_dim=4, n_embed=64, use_residual=True,
                        num_quantizers=3)
    z = jnp.asarray(rng.standard_normal((2, 6, 4)), jnp.float32)
    vs = q.init(jax.random.PRNGKey(0), z)
    zq, loss, idx = q.apply(vs, z)
    assert idx.shape == (2, 6, 3)
    assert zq.shape == z.shape

    # embed_codes sums over depth
    emb = q.apply(vs, idx, method="embed_codes")
    assert emb.shape == z.shape


def test_gumbel_quantizer(rng):
    q = GumbelQuantizer(embed_dim=4, n_embed=16)
    z = jnp.asarray(rng.standard_normal((2, 6, 4)), jnp.float32)
    vs = q.init({"params": jax.random.PRNGKey(0)}, z)
    # deterministic (eval): hard one-hot
    zq, loss, idx = q.apply(vs, z, deterministic=True)
    assert idx.shape == (2, 6)
    # training: soft, needs gumbel rng
    zq2, loss2, idx2 = q.apply(vs, z, jnp.float32(1.0), False,
                               rngs={"gumbel": jax.random.PRNGKey(1)})
    assert np.isfinite(float(loss2))
    # KL to uniform is >= 0
    assert float(loss2) >= -1e-5


def test_vitvq_module_roundtrip(rng):
    m = tiny_module()
    img = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), img)
    rec, qloss = m.apply(vs, img)
    assert rec.shape == img.shape

    codes = m.apply(vs, img, method="encode_codes")
    assert codes.shape == (2, 16)
    dec = m.apply(vs, codes, method="decode_codes")
    assert dec.shape == img.shape

    # decode_codes(encode_codes(x)) == decode(encode(x)) quant path
    quant, _ = m.apply(vs, img, method="encode")
    dec2 = m.apply(vs, quant, method="decode")
    np.testing.assert_allclose(np.asarray(dec), np.asarray(dec2), atol=1e-5)


def test_vitvq_wrapper_api(rng):
    model = ViTVQ(image_size=32, patch_size=8, encoder=ENC, decoder=ENC,
                  quantizer=Q)
    x = rng.random((2, 32, 32, 3)).astype(np.float32)
    rec, qloss = model(x)
    assert rec.shape == (2, 32, 32, 3)
    codes = model.encode_codes(x)
    assert codes.shape == (2, 16)
    out = model.decode_codes(codes)
    assert out.shape == (2, 32, 32, 3)

    # NCHW input (reference layout) is accepted
    codes2 = model.encode_codes(x.transpose(0, 3, 1, 2))
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))

    logs = model.log_images({"image": x})
    assert set(logs) == {"originals", "reconstructions"}


def test_ffn_impl_config_plumbing(rng, monkeypatch):
    """ffn_impl='fused' (config field) routes through the fused Pallas FFN
    with the SAME param tree as the Dense path; the env var stays an A/B
    override in both directions."""
    from enhancing_tpu.models.stage1.layers import FeedForward, resolve_ffn_impl

    monkeypatch.setenv("ENHANCING_TPU_PALLAS_INTERPRET", "1")
    x = jnp.asarray(rng.standard_normal((2, 16, 64)), jnp.float32)
    dense = FeedForward(64, 128)
    fused = FeedForward(64, 128, ffn_impl="fused")
    params = dense.init(jax.random.PRNGKey(0), x)
    want = dense.apply(params, x)
    got = fused.apply(params, x)          # same tree layout, fused kernel
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    assert resolve_ffn_impl(None) == "dense"
    assert resolve_ffn_impl("fused") == "fused"
    monkeypatch.setenv("ENHANCING_TPU_FUSED_FFN", "1")
    assert resolve_ffn_impl(None) == "fused"
    monkeypatch.setenv("ENHANCING_TPU_FUSED_FFN", "0")
    assert resolve_ffn_impl("fused") == "dense"


def test_encoder_accepts_ffn_impl_field(rng):
    enc = ViTEncoder(image_size=32, patch_size=8, dim_head=32,
                     ffn_impl="dense", **ENC)
    img = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), img)
    assert enc.apply(params, img).shape == (1, 16, 64)


def test_w8a8_gemms_mode_feedforward_matches_manual(rng):
    """ops/int8.w8a8_gemms: the FFN's fc1/fc2 route through the int8 MXU
    path with the SAME param tree. Pin the exact semantics against a manual
    LN -> quantize -> int8 dot -> rescale chain built from the quantize
    helpers (wiring test: right weights, right activation order)."""
    from enhancing_tpu.models.stage1.layers import FeedForward, _LNParams
    from enhancing_tpu.ops.int8 import (quantize_channelwise, quantize_rows,
                                        w8a8_gemms)
    from enhancing_tpu.ops.ln_gemm import layernorm_xla

    ff = FeedForward(64, 128)
    x = jnp.asarray(rng.standard_normal((2, 16, 64)), jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(64), jnp.float32)
    bt = jnp.asarray(0.1 * rng.standard_normal(64), jnp.float32)
    params = ff.init(jax.random.PRNGKey(0), x, ln=(g, bt))
    want_bf = ff.apply(params, x, ln=(g, bt))
    with w8a8_gemms():
        got = ff.apply(params, x, ln=(g, bt))
    # engaged: int8 quantization moves the output measurably
    assert not np.allclose(np.asarray(got), np.asarray(want_bf), atol=1e-6)

    def w8a8_dot(a, w):
        aq, sa = quantize_rows(a)
        wq, sw = quantize_channelwise(w)
        acc = jax.lax.dot_general(
            aq.reshape(-1, a.shape[-1]), wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (sa.reshape(-1, 1) * sw[None, :])
        return out.reshape(*a.shape[:-1], w.shape[-1])

    p = params["params"]
    xn = layernorm_xla(x, g, bt)
    h = jnp.tanh(w8a8_dot(xn, p["fc1"]["kernel"])
                 + p["fc1"]["bias"][None, None, :])
    want = w8a8_dot(h, p["fc2"]["kernel"]) + p["fc2"]["bias"][None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_w8a8_gemms_mode_roundtrip_and_env(rng, monkeypatch):
    """Tiny ViTVQ encode/decode under the W8A8 mode: codes mostly match the
    bf16 codes, reconstruction stays close; the env twin
    ENHANCING_TPU_STAGE1_GEMM=w8a8 enables the same routing."""
    from enhancing_tpu.ops.int8 import w8a8_gemms

    m = tiny_module()
    img = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), img)
    codes_bf = m.apply(vs, img, method="encode_codes")
    rec_bf = m.apply(vs, codes_bf, method="decode_codes")
    with w8a8_gemms():
        codes_q = m.apply(vs, img, method="encode_codes")
        rec_q = m.apply(vs, codes_q, method="decode_codes")
    # random-init tiny model: int8 rounding can flip a few argmins — the
    # strict numerics gate runs at base dims (scripts/bench_int8_stage1.py)
    match = float(jnp.mean((codes_q == codes_bf).astype(jnp.float32)))
    assert match > 0.7, match
    assert np.isfinite(np.asarray(rec_q)).all()
    assert float(jnp.mean(jnp.abs(rec_q - rec_bf))) < 0.1

    monkeypatch.setenv("ENHANCING_TPU_STAGE1_GEMM", "w8a8")
    codes_env = m.apply(vs, img, method="encode_codes")
    np.testing.assert_array_equal(np.asarray(codes_env), np.asarray(codes_q))
