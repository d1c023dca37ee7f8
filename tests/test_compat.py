"""Loader-mechanics tests: torch state_dicts -> compat.torch_loader -> JAX.

NOTE: numerical parity with the reference is proven by
tests/test_reference_parity.py, which imports the ACTUAL reference modules
from /root/reference. This file keeps a small independent torch clone to
exercise loader mechanics that don't need the reference checkout (ignore_keys
surgery, scan-stacked layouts, discriminator key mapping) and to stay green
in environments without /root/reference.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F


# --- independent torch re-implementation of the reference ViT-VQGAN ---------

class TorchPreNormAttn(nn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.LayerNorm(dim)
        self.fn = nn.Module()
        self.fn.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.fn.to_out = nn.Linear(inner, dim)
        self.heads, self.dim_head = heads, dim_head

    def forward(self, x):
        h = self.norm(x)
        qkv = self.fn.to_qkv(h).chunk(3, dim=-1)
        b, n, _ = x.shape
        q, k, v = [t.view(b, n, self.heads, self.dim_head).transpose(1, 2)
                   for t in qkv]
        att = torch.softmax(q @ k.transpose(-1, -2) * self.dim_head ** -0.5,
                            dim=-1)
        out = (att @ v).transpose(1, 2).reshape(b, n, -1)
        return self.fn.to_out(out)


class TorchPreNormFF(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fn = nn.Module()
        self.fn.net = nn.Sequential(nn.Linear(dim, hidden), nn.Tanh(),
                                    nn.Linear(hidden, dim))

    def forward(self, x):
        return self.fn.net(self.norm(x))


class TorchTransformer(nn.Module):
    def __init__(self, dim, depth, heads, dim_head, mlp_dim):
        super().__init__()
        self.layers = nn.ModuleList(
            [nn.ModuleList([TorchPreNormAttn(dim, heads, dim_head),
                            TorchPreNormFF(dim, mlp_dim)])
             for _ in range(depth)])
        self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        for attn, ff in self.layers:
            x = attn(x) + x
            x = ff(x) + x
        return self.norm(x)


def sincos_pos_embed(dim, grid):
    from enhancing_tpu.models.stage1.layers import get_2d_sincos_pos_embed
    return torch.from_numpy(get_2d_sincos_pos_embed(dim, grid)).float()


class TorchViTVQ(nn.Module):
    """Same state_dict naming as the reference ViTVQ."""

    def __init__(self, image_size=32, patch_size=8, dim=64, depth=2, heads=2,
                 mlp_dim=128, embed_dim=16, n_embed=64, dim_head=64):
        super().__init__()
        grid = image_size // patch_size
        self.encoder = nn.Module()
        self.encoder.to_patch_embedding = nn.Sequential(
            nn.Conv2d(3, dim, kernel_size=patch_size, stride=patch_size))
        self.encoder.transformer = TorchTransformer(dim, depth, heads,
                                                    dim_head, mlp_dim)
        self.encoder.pos = sincos_pos_embed(dim, grid)

        self.decoder = nn.Module()
        self.decoder.transformer = TorchTransformer(dim, depth, heads,
                                                    dim_head, mlp_dim)
        self.decoder.to_pixel = nn.Sequential(
            nn.Identity(),
            nn.ConvTranspose2d(dim, 3, kernel_size=patch_size,
                               stride=patch_size))
        self.decoder.pos = sincos_pos_embed(dim, grid)

        self.pre_quant = nn.Linear(dim, embed_dim)
        self.post_quant = nn.Linear(embed_dim, dim)
        self.quantizer = nn.Module()
        self.quantizer.embedding = nn.Embedding(n_embed, embed_dim)
        self.quantizer.embedding.weight.data.normal_()
        self.grid = grid

    def encode_tokens(self, img):  # img NCHW
        x = self.encoder.to_patch_embedding[0](img)
        x = x.flatten(2).transpose(1, 2)
        x = x + self.encoder.pos[None]
        x = self.encoder.transformer(x)
        return self.pre_quant(x)

    def quantize(self, z):
        zn = F.normalize(z.reshape(-1, z.shape[-1]), dim=-1)
        en = F.normalize(self.quantizer.embedding.weight, dim=-1)
        d = (zn ** 2).sum(1, keepdim=True) + (en ** 2).sum(1) - 2 * zn @ en.T
        idx = d.argmin(1).view(*z.shape[:-1])
        zq = F.normalize(self.quantizer.embedding(idx), dim=-1)
        return zq, idx

    def decode_tokens(self, quant):
        x = self.post_quant(quant)
        x = x + self.decoder.pos[None]
        x = self.decoder.transformer(x)
        x = x.transpose(1, 2).reshape(x.shape[0], -1, self.grid, self.grid)
        return self.decoder.to_pixel[1](x)

    def forward(self, img):
        z = self.encode_tokens(img)
        zq, idx = self.quantize(z)
        return self.decode_tokens(zq), idx


@pytest.fixture(scope="module")
def torch_and_jax(tmp_path_factory):
    torch.manual_seed(0)
    tmodel = TorchViTVQ().eval()
    path = tmp_path_factory.mktemp("ckpt") / "model.ckpt"
    torch.save({"state_dict": tmodel.state_dict()}, path)

    from enhancing_tpu.models.stage1.vitvqgan import ViTVQ
    ENC = dict(dim=64, depth=2, heads=2, mlp_dim=128)
    jmodel = ViTVQ(image_size=32, patch_size=8, encoder=ENC, decoder=ENC,
                   quantizer=dict(embed_dim=16, n_embed=64), path=str(path))
    return tmodel, jmodel


def test_checkpoint_roundtrip_codes_match(torch_and_jax, rng):
    tmodel, jmodel = torch_and_jax
    img = rng.random((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        trec, tidx = tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    jcodes = jmodel.encode_codes(img)
    np.testing.assert_array_equal(np.asarray(jcodes), tidx.numpy())

    jrec, _ = jmodel(img)
    np.testing.assert_allclose(np.asarray(jrec),
                               trec.numpy().transpose(0, 2, 3, 1), atol=2e-4)


def test_checkpoint_decode_codes_match(torch_and_jax, rng):
    tmodel, jmodel = torch_and_jax
    codes = rng.integers(0, 64, (2, 16))
    with torch.no_grad():
        zq = F.normalize(tmodel.quantizer.embedding(torch.from_numpy(codes)),
                         dim=-1)
        tdec = tmodel.decode_tokens(zq)
    jdec = jmodel.decode_codes(jnp.asarray(codes))
    np.testing.assert_allclose(np.asarray(jdec),
                               tdec.numpy().transpose(0, 2, 3, 1), atol=2e-4)


def test_ignore_keys_surgery(torch_and_jax, tmp_path, rng, capsys):
    tmodel, _ = torch_and_jax
    path = tmp_path / "m.ckpt"
    torch.save({"state_dict": tmodel.state_dict()}, path)
    from enhancing_tpu.models.stage1.vitvqgan import ViTVQ
    ENC = dict(dim=64, depth=2, heads=2, mlp_dim=128)
    m = ViTVQ(image_size=32, patch_size=8, encoder=ENC, decoder=ENC,
              quantizer=dict(embed_dim=16, n_embed=64), path=str(path),
              ignore_keys=["quantizer."])
    out = capsys.readouterr().out
    assert "Deleting key quantizer.embedding.weight" in out


# --- GPT checkpoint parity ----------------------------------------------------

class TorchGPTBlock(nn.Module):
    def __init__(self, dim, heads, ctx_len, cond_len):
        super().__init__()
        self.ln1, self.ln2 = nn.LayerNorm(dim), nn.LayerNorm(dim)
        self.attn = nn.Module()
        a = self.attn
        a.key = nn.Linear(dim, dim)
        a.query = nn.Linear(dim, dim)
        a.value = nn.Linear(dim, dim)
        a.proj = nn.Linear(dim, dim)
        ww = torch.arange(dim, dtype=torch.float32) / (dim - 1)
        a.time_mix = nn.Parameter(ww.view(1, 1, dim))
        self.heads = heads
        mask = torch.tril(torch.ones(ctx_len, ctx_len))
        mask[:cond_len, :cond_len] = 1
        self.register_buffer("mask", mask)
        self.mlp = nn.Module()
        self.mlp.p0 = nn.Linear(dim, 4 * dim)
        self.mlp.p1 = nn.Linear(4 * dim, dim)

    def _attn(self, x):
        a = self.attn
        shift = F.pad(x, (0, 0, 1, -1))
        x = x * a.time_mix + shift * (1 - a.time_mix)
        b, t, c = x.shape
        hd = c // self.heads
        q = a.query(x).view(b, t, self.heads, hd).transpose(1, 2)
        k = a.key(x).view(b, t, self.heads, hd).transpose(1, 2)
        v = a.value(x).view(b, t, self.heads, hd).transpose(1, 2)
        att = q @ k.transpose(-1, -2) / math.sqrt(hd)
        att = att.masked_fill(self.mask[:t, :t] == 0, float("-inf"))
        att = torch.softmax(att, dim=-1)
        y = (att @ v).transpose(1, 2).reshape(b, t, c)
        return a.proj(y)

    def forward(self, x):
        x = x + self._attn(self.ln1(x))
        h = self.mlp.p0(self.ln2(x))
        x = x + self.mlp.p1(torch.square(torch.relu(h)))
        return x


class TorchGPT(nn.Module):
    def __init__(self, vc=10, vi=32, dim=32, cond_n=1, img_n=8, heads=2,
                 layers=2):
        super().__init__()
        self.tok_emb_cond = nn.Embedding(vc, dim)
        self.pos_emb_cond = nn.Parameter(torch.randn(1, cond_n, dim) * 0.02)
        self.tok_emb_code = nn.Embedding(vi, dim)
        self.pos_emb_code = nn.Parameter(torch.randn(1, img_n, dim) * 0.02)
        self.blocks = nn.Sequential(*[
            TorchGPTBlock(dim, heads, cond_n + img_n, cond_n)
            for _ in range(layers)])
        self.layer_norm = nn.LayerNorm(dim)
        self.head = nn.Linear(dim, vi, bias=False)
        self.cond_n = cond_n

    def forward(self, codes, conds):
        ce = self.tok_emb_code(codes) + self.pos_emb_code
        cc = self.tok_emb_cond(conds) + self.pos_emb_cond
        x = torch.cat([cc, ce], dim=1)
        x = self.blocks(x)
        x = self.layer_norm(x)
        return self.head(x[:, self.cond_n - 1:-1])


def test_gpt_checkpoint_parity(tmp_path, rng):
    torch.manual_seed(1)
    tm = TorchGPT().eval()
    path = tmp_path / "gpt.ckpt"
    torch.save({"state_dict": tm.state_dict()}, path)

    from enhancing_tpu.compat.torch_loader import load_gpt_params
    from enhancing_tpu.models.stage2 import GPT
    m = GPT(vocab_cond_size=10, vocab_img_size=32, embed_dim=32,
            cond_num_tokens=1, img_num_tokens=8, n_heads=2, n_layers=2)
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                jnp.zeros((1, 1), jnp.int32))
    params = load_gpt_params(str(path), vs["params"])

    codes = rng.integers(0, 32, (2, 8))
    conds = rng.integers(0, 10, (2, 1))
    with torch.no_grad():
        tlogits = tm(torch.from_numpy(codes), torch.from_numpy(conds))
    jlogits = m.apply({"params": params}, jnp.asarray(codes),
                      jnp.asarray(conds))
    np.testing.assert_allclose(np.asarray(jlogits), tlogits.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_checkpoint_parity_scanned_vit(torch_and_jax, tmp_path, rng):
    """The same torch ckpt loads into the scan-stacked ViT layout and
    produces identical codes."""
    tmodel, jmodel = torch_and_jax
    path = tmp_path / "m.ckpt"
    torch.save({"state_dict": tmodel.state_dict()}, path)

    from enhancing_tpu.models.stage1.vitvqgan import ViTVQ
    ENC = dict(dim=64, depth=2, heads=2, mlp_dim=128)
    scanned = ViTVQ(image_size=32, patch_size=8, encoder=ENC, decoder=ENC,
                    quantizer=dict(embed_dim=16, n_embed=64), path=str(path),
                    scan_layers=True)
    assert scanned.params["encoder"]["transformer"]["layers"][
        "attn"]["to_qkv"]["kernel"].shape[0] == 2  # stacked leading axis

    img = rng.random((2, 32, 32, 3)).astype(np.float32)
    codes_scanned = scanned.encode_codes(img)
    codes_unrolled = jmodel.encode_codes(img)
    np.testing.assert_array_equal(np.asarray(codes_scanned),
                                  np.asarray(codes_unrolled))
    rec_s = np.asarray(scanned.decode_codes(codes_scanned))
    rec_u = np.asarray(jmodel.decode_codes(codes_unrolled))
    np.testing.assert_allclose(rec_s, rec_u, atol=1e-5)


def test_discriminator_checkpoint_mapping(tmp_path):
    """loss.discriminator.* keys map onto StyleDiscriminator with correct
    shapes/transposes (reference naming from losses/layers.py Sequential
    indices)."""
    import math
    from enhancing_tpu.losses import StyleDiscriminator
    size = 32
    d = StyleDiscriminator(size=size)
    vs = d.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    params = vs["params"]

    # build a reference-shaped state dict from our shapes (inverse transforms)
    rng = np.random.default_rng(0)
    sd = {}
    def conv_inv(p):  # (k,k,in,out) -> (out,in,k,k)
        return rng.standard_normal(
            (p.shape[3], p.shape[2], p.shape[0], p.shape[1])).astype(np.float32)
    sd["loss.discriminator.blocks.0.0.weight"] = conv_inv(
        params["stem"]["conv"]["weight"])
    sd["loss.discriminator.blocks.0.1.bias"] = rng.standard_normal(
        params["stem"]["act_bias"].shape).astype(np.float32)
    log_size = int(math.log2(size))
    for j in range(1, log_size - 1):
        res = log_size - (j - 1)
        blk = params[f"block_{res}"]
        sd[f"loss.discriminator.blocks.{j}.conv1.0.weight"] = conv_inv(
            blk["conv1"]["conv"]["weight"])
        sd[f"loss.discriminator.blocks.{j}.conv1.1.bias"] = \
            rng.standard_normal(blk["conv1"]["act_bias"].shape).astype(np.float32)
        sd[f"loss.discriminator.blocks.{j}.conv2.1.weight"] = conv_inv(
            blk["conv2"]["conv"]["weight"])
        sd[f"loss.discriminator.blocks.{j}.conv2.2.bias"] = \
            rng.standard_normal(blk["conv2"]["act_bias"].shape).astype(np.float32)
        sd[f"loss.discriminator.blocks.{j}.skip.1.weight"] = conv_inv(
            blk["skip"]["conv"]["weight"])
    sd["loss.discriminator.final_conv.0.weight"] = conv_inv(
        params["final_conv"]["conv"]["weight"])
    sd["loss.discriminator.final_conv.1.bias"] = rng.standard_normal(
        params["final_conv"]["act_bias"].shape).astype(np.float32)
    for i, name in [(0, "final_linear1"), (1, "final_linear2")]:
        w = params[name]["weight"]
        sd[f"loss.discriminator.final_linear.{i}.weight"] = \
            rng.standard_normal((w.shape[1], w.shape[0])).astype(np.float32)
        sd[f"loss.discriminator.final_linear.{i}.bias"] = rng.standard_normal(
            params[name]["bias"].shape).astype(np.float32)

    path = tmp_path / "gan.ckpt"
    torch.save({"state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}},
               path)
    from enhancing_tpu.compat.torch_loader import load_style_discriminator_params
    loaded = load_style_discriminator_params(str(path), params, size=size)

    # spot check: transposes landed exactly
    np.testing.assert_allclose(
        loaded["stem"]["conv"]["weight"],
        sd["loss.discriminator.blocks.0.0.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        loaded["final_linear1"]["weight"],
        sd["loss.discriminator.final_linear.0.weight"].T)
    res = log_size  # first style block
    np.testing.assert_allclose(
        loaded[f"block_{res}"]["conv2"]["conv"]["weight"],
        sd["loss.discriminator.blocks.1.conv2.1.weight"].transpose(2, 3, 1, 0))

    # forward still runs with loaded params
    out = StyleDiscriminator(size=size).apply(
        {"params": loaded}, jnp.zeros((2, size, size, 3)))
    assert out.shape == (2,)
