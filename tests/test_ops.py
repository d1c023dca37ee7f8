"""Pallas kernels (interpreter mode) vs pure-XLA reference paths."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhancing_tpu.ops import attention as att
from enhancing_tpu.ops import vq


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    monkeypatch.setenv("ENHANCING_TPU_PALLAS_INTERPRET", "1")


def test_attention_pallas_matches_xla(rng):
    b, h, n, d = 2, 4, 128, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
               for _ in range(3))
    ref = att._attention_xla(q, k, v, d**-0.5, "none", 0)
    out = att._attention_pallas(q, k, v, d**-0.5, "none", 0, block_q=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_attention_prefix_causal_mask(rng):
    b, h, n, d = 1, 2, 64, 32
    cond_len = 4
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
               for _ in range(3))
    ref = att._attention_xla(q, k, v, d**-0.5, "prefix_causal", cond_len)
    out = att._attention_pallas(q, k, v, d**-0.5, "prefix_causal", cond_len,
                                block_q=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # causal structure: output at position t must not depend on future tokens
    v2 = v.at[:, :, -1, :].set(99.0)
    out2 = att._attention_xla(q, k, v2, d**-0.5, "prefix_causal", cond_len)
    np.testing.assert_allclose(np.asarray(ref[:, :, :-1]),
                               np.asarray(out2[:, :, :-1]), atol=1e-6)


def test_attention_mask_matches_reference_semantics(rng):
    """Mask equals torch.tril with mask[:cond_len, :cond_len] = 1."""
    n, cond_len = 16, 3
    rows = np.arange(n)[:, None]
    cols = np.arange(n)[None, :]
    ours = (cols <= rows) | ((rows < cond_len) & (cols < cond_len))
    torch_style = np.tril(np.ones((n, n), bool))
    torch_style[:cond_len, :cond_len] = True
    np.testing.assert_array_equal(ours, torch_style)


def test_attention_grad_flows(rng):
    b, h, n, d = 1, 2, 32, 16
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
               for _ in range(3))

    def loss_fused(q, k, v):
        return jnp.sum(att._attention_fused(q, k, v, d**-0.5, "none", 0) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(att._attention_xla(q, k, v, d**-0.5, "none", 0) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_vq_pallas_matches_xla(rng):
    m, n, d = 300, 1000, 32  # deliberately unaligned sizes
    z = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    codebook = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    ref = vq._nearest_xla(z, codebook)
    out = vq._nearest_pallas(z, codebook, block_m=128, block_n=256)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_vq_exact_bruteforce(rng):
    z = jnp.asarray(rng.standard_normal((50, 8)), jnp.float32)
    codebook = jnp.asarray(rng.standard_normal((37, 8)), jnp.float32)
    d = np.linalg.norm(np.asarray(z)[:, None] - np.asarray(codebook)[None], axis=-1)
    expected = d.argmin(axis=1)
    got = vq.nearest_codebook_indices(z, codebook, impl="xla")
    np.testing.assert_array_equal(np.asarray(got), expected)
    got_p = vq._nearest_pallas(z, codebook, block_m=64, block_n=128)
    np.testing.assert_array_equal(np.asarray(got_p), expected)


def test_l2_normalize_matches_torch_semantics(rng):
    import torch
    import torch.nn.functional as F
    x = rng.standard_normal((10, 32)).astype(np.float32)
    ours = np.asarray(vq.l2_normalize(jnp.asarray(x)))
    theirs = F.normalize(torch.from_numpy(x), dim=-1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)

    # zero rows do not NaN
    z = np.zeros((2, 4), np.float32)
    assert not np.isnan(np.asarray(vq.l2_normalize(jnp.asarray(z)))).any()


def test_codebook_distances(rng):
    z = jnp.asarray(rng.standard_normal((5, 4)), jnp.float32)
    e = jnp.asarray(rng.standard_normal((7, 4)), jnp.float32)
    d = np.asarray(vq.codebook_distances(z, e))
    expected = ((np.asarray(z)[:, None] - np.asarray(e)[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, expected, atol=1e-4)


def test_attention_bnhd_matches_bhnd(rng):
    b, n, h, d = 2, 64, 4, 32
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    ref = att._attention_xla(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                             v.transpose(0, 2, 1, 3), d**-0.5, "none", 0)
    out = att._attention_pallas_bnhd(q, k, v, d**-0.5, "none", 0)
    np.testing.assert_allclose(np.asarray(out.transpose(0, 2, 1, 3)),
                               np.asarray(ref), atol=2e-5)


def test_fused_ffn_matches_xla(rng):
    from enhancing_tpu.ops import ffn
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((128, 256)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(256) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((256, 128)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(128) * 0.1, jnp.float32)
    for act in ("tanh", "sqrelu", "gelu"):
        ref = ffn._ffn_xla(x, w1, b1, w2, b2, act)
        out = ffn._ffn_pallas(x, w1, b1, w2, b2, act)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, err_msg=act)
    # gradients flow through the fused op
    g = jax.grad(lambda x: jnp.sum(
        ffn._ffn_fused(x, w1, b1, w2, b2, "tanh") ** 2))(x)
    g_ref = jax.grad(lambda x: jnp.sum(
        ffn._ffn_xla(x, w1, b1, w2, b2, "tanh") ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-3,
                               rtol=1e-3)


@pytest.mark.parametrize("shape,mode,cl", [
    ((2, 64, 4, 64), "none", 0),
    ((2, 48, 2, 128), "none", 0),
    ((1, 33, 4, 64), "prefix_causal", 3),
    ((2, 40, 2, 256), "none", 0),            # multi-pass-slab head (RQ pad)
    ((1, 40, 2, 384), "none", 0),            # flagship GPT prior head dim
    ((1, 33, 2, 384), "prefix_causal", 3),
    ((2, 40, 8, 32), "prefix_causal", 2),    # 4 heads per slab
])
def test_attention_packed_matches_xla(rng, shape, mode, cl):
    """Packed slab kernel ((B,N,H*D) lane slabs) forward parity."""
    b, n, h, d = shape
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h * d)), jnp.float32)
               for _ in range(3))
    q = q * d ** -0.5
    out = att._attention_packed_call(q, k, v, mode, cl, d)
    ref = att._attention_xla_packed(q, k, v, mode, cl, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("shape,mode,cl", [
    ((2, 64, 4, 64), "none", 0),
    ((2, 48, 2, 128), "none", 0),
    ((1, 33, 4, 64), "prefix_causal", 3),
    ((2, 65, 2, 64), "prefix_causal", 1),
    ((1, 40, 2, 384), "none", 0),            # flagship GPT prior head dim
    ((1, 33, 2, 384), "prefix_causal", 3),
    ((2, 40, 8, 32), "prefix_causal", 2),    # 4 heads per slab
])
def test_attention_packed_backward_matches_xla_vjp(rng, shape, mode, cl):
    """Flash-style Pallas dq/dk/dv vs the XLA VJP (VERDICT r1 item #4)."""
    b, n, h, d = shape
    q, k, v, g = (jnp.asarray(rng.standard_normal((b, n, h * d)), jnp.float32)
                  * 0.2 for _ in range(4))
    dq, dk, dv = att._attention_packed_bwd_call(q, k, v, g, mode, cl, d)
    _, vjp = jax.vjp(lambda a, b_, c: att._attention_xla_packed(
        a, b_, c, mode, cl, d), q, k, v)
    dq_r, dk_r, dv_r = vjp(g)
    for name, a, r in (("dq", dq, dq_r), ("dk", dk, dk_r), ("dv", dv, dv_r)):
        rel = (float(jnp.abs(a - r).max())
               / (float(jnp.abs(r).max()) + 1e-12))
        assert rel < 5e-4, (name, rel)


@pytest.mark.parametrize("h,d,mode,cl", [
    (4, 96, "prefix_causal", 1),   # shipped RQ prior spatial: 1536/16
    (2, 192, "prefix_causal", 1),  # shipped RQ prior depth: 1536/8
    (2, 96, "none", 0),
])
def test_attention_padded_head_dims_match_xla(rng, h, d, mode, cl):
    """D=96/192 (the RQ prior dims) run the packed kernel via per-head
    zero-padding to the next 128 multiple — exact forward AND gradient
    parity with the XLA path."""
    b, n = 2, 40
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
               for _ in range(3))
    out_p = att.multihead_attention_bnhd(q, k, v, impl="pallas",
                                         mask_mode=mode, cond_len=cl)
    out_x = att.multihead_attention_bnhd(q, k, v, impl="xla",
                                         mask_mode=mode, cond_len=cl)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=3e-5)

    def loss(impl):
        return lambda q_, k_, v_: jnp.sum(att.multihead_attention_bnhd(
            q_, k_, v_, impl=impl, mask_mode=mode, cond_len=cl) ** 2)

    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=3e-4)


def test_attention_packed_dispatch(rng):
    """multihead_attention_bnhd routes D=64 pairs through the packed kernel
    and keeps gradient parity with the XLA path (scale folded into q)."""
    b, n, h, d = 2, 32, 2, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
               for _ in range(3))

    def loss(fn_impl):
        def f(q_):
            return jnp.sum(att.multihead_attention_bnhd(
                q_, k, v, impl=fn_impl) ** 2)
        return f

    out_p = att.multihead_attention_bnhd(q, k, v, impl="pallas")
    out_x = att.multihead_attention_bnhd(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=2e-5)
    g_p = jax.grad(loss("pallas"))(q)
    g_x = jax.grad(loss("xla"))(q)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=2e-4)


@pytest.mark.parametrize("head_dim,hd", [(64, 256), (128, 256),
                                         (96, 384), (192, 384), (384, 768)])
@pytest.mark.parametrize("cur_len", [1, 5, 128, 200, 255])
def test_decode_attention_pallas_matches_xla(rng, head_dim, hd, cur_len):
    """Prefix-aware decode kernel == masked-softmax XLA reference, incl.
    chunk-boundary cur_len values and the folded-in new-token column."""
    b, m = 2, 256
    q = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((b, m, hd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, m, hd)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    cl = jnp.int32(cur_len)
    ref = att._decode_xla(q, kc, vc, kn, vn, cl, head_dim)
    out = att._decode_pallas(q, kc, vc, kn, vn, cl, head_dim, block_k=128)
    # online vs whole-row softmax accumulate in different orders; the
    # observed worst case drifts with the shared rng fixture's stream
    # position, so leave headroom over the ~4.6e-5 seen in-suite
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=2e-4)


def test_decode_attention_ignores_stale_cache_rows(rng):
    """Rows >= cur_len must not affect the output (the kernel never reads
    them; the XLA path masks them)."""
    b, m, hd, head_dim = 1, 256, 128, 64
    q = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((b, m, hd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, m, hd)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    cl = jnp.int32(100)
    base = att._decode_pallas(q, kc, vc, kn, vn, cl, head_dim, block_k=64)
    kc2 = kc.at[:, 100:].set(1e6)
    vc2 = vc.at[:, 100:].set(-1e6)
    out = att._decode_pallas(q, kc2, vc2, kn, vn, cl, head_dim, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


@pytest.mark.parametrize("mode,cl", [("none", 0), ("prefix_causal", 3)])
def test_attention_packed_kchunk_matches_whole_row(rng, mode, cl):
    """Online (flash-style) k-chunked softmax == whole-row softmax."""
    b, n, hd, d = 2, 128, 256, 64
    q = jnp.asarray(rng.standard_normal((b, n, hd)), jnp.float32) * 0.125
    k = jnp.asarray(rng.standard_normal((b, n, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, hd)), jnp.float32)
    whole = att._attention_packed_call(q, k, v, mode, cl, d, k_chunk=0)
    chunked = att._attention_packed_call(q, k, v, mode, cl, d, k_chunk=32)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(whole),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("mode,cl", [("none", 0), ("prefix_causal", 3)])
@pytest.mark.parametrize("unroll", [0, 2, 4])
def test_attention_packed_unroll_matches_xla(rng, mode, cl, unroll,
                                             monkeypatch):
    """The Python-unrolled online-softmax chunks (the measured default, 4)
    == the single whole-row softmax == XLA, for both mask modes."""
    monkeypatch.setenv("ENHANCING_TPU_ATTN_UNROLL", str(unroll))
    b, n, hd, d = 2, 64, 256, 64  # n % 4 == 0 so the unroll path engages
    q = jnp.asarray(rng.standard_normal((b, n, hd)), jnp.float32) * 0.125
    k = jnp.asarray(rng.standard_normal((b, n, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, hd)), jnp.float32)
    out = att._attention_packed_call(q, k, v, mode, cl, d)
    ref = att._attention_xla_packed(q, k, v, mode, cl, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5,
                               rtol=1e-4)


@pytest.mark.parametrize("shape,mode,cl", [
    ((2, 64, 4, 64), "none", 0),
    ((1, 64, 2, 128), "none", 0),
    ((1, 33, 4, 64), "prefix_causal", 3),
])
def test_attention_proj_fused_matches_xla(rng, shape, mode, cl):
    """Fused attention->projection->residual kernel == the XLA twin, and
    gradients (through the unfused custom_vjp forward) == jax.grad of the
    twin — for q/k/v, Wp, bias and the residual."""
    b, n, h, d = shape
    hd, ho = h * d, 128
    q3, k3, v3 = (jnp.asarray(rng.standard_normal((b, n, hd)), jnp.float32)
                  * 0.2 for _ in range(3))
    wp = jnp.asarray(rng.standard_normal((hd, ho)) * 0.05, jnp.float32)
    bp = jnp.asarray(rng.standard_normal(ho) * 0.1, jnp.float32)
    res = jnp.asarray(rng.standard_normal((b, n, ho)), jnp.float32)

    out = att._attention_proj_packed_call(q3, k3, v3, wp, bp, res, mode, cl, d)
    ref = att._attention_proj_xla(q3, k3, v3, wp, bp, res, mode, cl, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5,
                               rtol=1e-4)

    def loss_fused(q3, k3, v3, wp, bp, res):
        return jnp.sum(att._attention_proj_fused(q3, k3, v3, wp, bp, res,
                                                 mode, cl, d) ** 2)

    def loss_ref(q3, k3, v3, wp, bp, res):
        return jnp.sum(att._attention_proj_xla(q3, k3, v3, wp, bp, res,
                                               mode, cl, d) ** 2)

    gs = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
        q3, k3, v3, wp, bp, res)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        q3, k3, v3, wp, bp, res)
    for name, a, r in zip(("dq", "dk", "dv", "dwp", "dbp", "dres"), gs, gr):
        rel = (float(jnp.abs(a - r).max())
               / (float(jnp.abs(r).max()) + 1e-12))
        assert rel < 1e-3, (name, rel)


@pytest.mark.parametrize("shape,mode,cl", [
    ((2, 64, 4, 64), "none", 0),
    ((1, 64, 2, 128), "none", 0),
    ((1, 33, 4, 64), "prefix_causal", 3),
    ((2, 40, 8, 32), "prefix_causal", 2),
])
def test_attention_packed_qkv_matches_split(rng, shape, mode, cl):
    """The fused-qkv-buffer entry (lane-offset BlockSpecs into one buffer,
    in-kernel q scale) == split + packed kernel == XLA — values and grads."""
    b, n, h, d = shape
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * h * d)), jnp.float32) \
        * 0.3
    out = att.multihead_attention_packed_qkv(
        qkv, h, d, mask_mode=mode, cond_len=cl, impl="pallas")
    q3, k3, v3 = att._qkv_split_scaled(qkv, d, d ** -0.5)
    ref = att._attention_xla_packed(q3, k3, v3, mode, cl, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5,
                               rtol=1e-4)

    g = jax.grad(lambda qkv: jnp.sum(att.multihead_attention_packed_qkv(
        qkv, h, d, mask_mode=mode, cond_len=cl, impl="pallas") ** 2))(qkv)
    gr = jax.grad(lambda qkv: jnp.sum(att._attention_xla_packed(
        *att._qkv_split_scaled(qkv, d, d ** -0.5), mode, cl, d) ** 2))(qkv)
    rel = float(jnp.abs(g - gr).max()) / (float(jnp.abs(gr).max()) + 1e-12)
    assert rel < 1e-3, rel


def test_attention_proj_module_path(rng):
    """stage-1 Attention(residual=...) == residual + to_out(attention) with
    the same params (checkpoint-layout compatibility of the fused path)."""
    from enhancing_tpu.models.stage1.layers import Attention

    x = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    mod = Attention(dim=128, heads=2, dim_head=64)
    variables = mod.init(jax.random.PRNGKey(0), x)
    fused = mod.apply(variables, x, None, x)
    unfused = x + mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               atol=3e-5, rtol=1e-4)


def test_attention_kchunk_long_cond_prefix(rng):
    """cond_len > block_q: prefix rows in EARLY q-blocks attend cond columns
    past their own diagonal — the live-chunk bound must extend to cond_len-1,
    not stop at the block diagonal."""
    b, n, hd, d, cl = 1, 192, 128, 64, 100
    q = jnp.asarray(rng.standard_normal((b, n, hd)), jnp.float32) * 0.125
    k = jnp.asarray(rng.standard_normal((b, n, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, hd)), jnp.float32)
    want = att._attention_xla_packed(q, k, v, "prefix_causal", cl, d)
    chunked = att._attention_packed_call(q, k, v, "prefix_causal", cl, d,
                                         k_chunk=32, block_q=64)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("cur", [0, 5, 7, 8, 15])
def test_cache_row_update_matches_dus(rng, cur):
    """In-place Pallas row write == dynamic_update_slice (interpret mode)."""
    import os

    from enhancing_tpu.ops.cache import _cache_row_update_pallas

    os.environ["ENHANCING_TPU_PALLAS_INTERPRET"] = "1"
    try:
        cache = jnp.asarray(rng.standard_normal((2, 3, 16, 128)), jnp.float32)
        news = jnp.asarray(rng.standard_normal((2, 3, 1, 128)), jnp.float32)
        want = jax.lax.dynamic_update_slice(cache, news, (0, 0, cur, 0))
        got = _cache_row_update_pallas(cache, news, jnp.int32(cur))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    finally:
        os.environ.pop("ENHANCING_TPU_PALLAS_INTERPRET", None)


def test_cache_row_update_fallback_unpadded(rng):
    """Non-sublane-aligned ctx uses the XLA fallback and stays correct."""
    from enhancing_tpu.ops.cache import cache_row_update

    cache = jnp.asarray(rng.standard_normal((2, 2, 13, 64)), jnp.float32)
    news = jnp.asarray(rng.standard_normal((2, 2, 1, 64)), jnp.float32)
    got = cache_row_update(cache, news, jnp.int32(11))
    want = jax.lax.dynamic_update_slice(cache, news, (0, 0, 11, 0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("b,n,hd,d,cl", [(2, 160, 256, 64, 3),
                                         (1, 130, 128, 128, 1),
                                         (1, 160, 128, 64, 100)])
def test_attention_gridchunk_matches_xla(rng, b, n, hd, d, cl):
    """Grid-level k-chunked causal forward (clamped dead-chunk DMAs,
    pl.when-gated compute, scratch online softmax) == XLA reference,
    including non-chunk-multiple key counts via padding."""
    q = jnp.asarray(rng.standard_normal((b, n, hd)), jnp.float32) * 0.1
    k = jnp.asarray(rng.standard_normal((b, n, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, hd)), jnp.float32)
    out = att._attention_packed_gridchunk_call(q, k, v, "prefix_causal", cl,
                                               d, block_q=64, k_chunk=64)
    want = att._attention_xla_packed(q, k, v, "prefix_causal", cl, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=3e-5)


def test_fused_ln_gemm_matches_flax_ln_dense(rng):
    """Pallas LN->GEMM fusion == flax nn.LayerNorm followed by nn.Dense
    (the XLA twin is bit-exact in fp32; the kernel is allclose)."""
    from flax import linen as nn

    from enhancing_tpu.ops import ln_gemm

    m, d, n = 72, 256, 384
    x = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(d), jnp.float32)
    bt = jnp.asarray(rng.standard_normal(d), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, n)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.LayerNorm(epsilon=1e-5, name="ln")(x)
            return jnp.tanh(nn.Dense(n, name="fc")(h))

    params = {"params": {"ln": {"scale": g, "bias": bt},
                         "fc": {"kernel": w, "bias": b}}}
    want = Ref().apply(params, x)

    twin = ln_gemm._ln_gemm_xla(x, g, bt, w, b, "tanh", 1e-5)
    np.testing.assert_array_equal(np.asarray(twin), np.asarray(want))

    got = ln_gemm.fused_ln_gemm(x, g, bt, w, b, activation="tanh",
                                impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    # no-bias / no-activation variant (the QKV projection shape)
    got2 = ln_gemm.fused_ln_gemm(x, g, bt, w, impl="pallas")
    want2 = ln_gemm._ln_gemm_xla(x, g, bt, w, None, None, 1e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=2e-6)


def test_fused_ln_gemm_grads_match_unfused(rng):
    from flax import linen as nn

    from enhancing_tpu.ops.ln_gemm import fused_ln_gemm

    m, d, n = 40, 128, 256
    x = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(d), jnp.float32)
    bt = jnp.asarray(rng.standard_normal(d), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, n)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.LayerNorm(epsilon=1e-5, name="ln")(x)
            return jnp.tanh(nn.Dense(n, name="fc")(h))

    def loss_ref(x, g_, bt_, w_, b_):
        p = {"params": {"ln": {"scale": g_, "bias": bt_},
                        "fc": {"kernel": w_, "bias": b_}}}
        return jnp.sum(Ref().apply(p, x) ** 2)

    def loss_fused(x, g_, bt_, w_, b_):
        return jnp.sum(fused_ln_gemm(x, g_, bt_, w_, b_,
                                     activation="tanh") ** 2)

    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, g, bt, w, b)
    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, g, bt, w, b)
    for u, v in zip(got, want):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=3e-5)


def test_lngemm_blocks_divide_n():
    """A block_n that does not divide n computes dead padded columns on the
    MXU (the qkv n=2304 GEMM @ bn=1024 wasted 33% of its MACs, profiled r3);
    the picker must return an even split when one exists."""
    from enhancing_tpu.ops.ln_gemm import _pick_blocks

    bm, bn = _pick_blocks(131072, 768, 2304, 2)  # qkv (d=768, 3 * 768)
    assert 2304 % bn == 0 and bn % 128 == 0 and bn >= 256
    bm, bn = _pick_blocks(131072, 768, 3072, 2)  # fc1 — unchanged optimum
    assert (bm, bn) == (1024, 1024)


def test_fused_layernorm_matches_flax(rng):
    """Standalone Pallas LayerNorm == flax nn.LayerNorm (the XLA twin is
    bit-exact; the kernel is allclose), values and grads."""
    from flax import linen as nn

    from enhancing_tpu.ops.ln_gemm import fused_layernorm, layernorm_xla

    m, d = 72, 256
    x = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(d), jnp.float32)
    bt = jnp.asarray(rng.standard_normal(d), jnp.float32)

    want = nn.LayerNorm(epsilon=1e-5).apply(
        {"params": {"scale": g, "bias": bt}}, x)
    np.testing.assert_array_equal(
        np.asarray(layernorm_xla(x, g, bt)), np.asarray(want))
    got = fused_layernorm(x, g, bt, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    # batched (B, N, d) input reshapes through the kernel
    x3 = jnp.asarray(rng.standard_normal((4, 24, d)), jnp.float32)
    got3 = fused_layernorm(x3, g, bt, impl="pallas")
    np.testing.assert_allclose(
        np.asarray(got3),
        np.asarray(nn.LayerNorm(epsilon=1e-5).apply(
            {"params": {"scale": g, "bias": bt}}, x3)), atol=2e-6)

    def loss_fused(x, g_, b_):
        return jnp.sum(fused_layernorm(x, g_, b_) ** 2)

    def loss_ref(x, g_, b_):
        return jnp.sum(nn.LayerNorm(epsilon=1e-5).apply(
            {"params": {"scale": g_, "bias": b_}}, x) ** 2)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, g, bt)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, bt)
    for u, v in zip(got, want):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=3e-5)


@pytest.mark.parametrize("b", [6, 8])
def test_decode_attention_batched_blocks(rng, b):
    """Batch-blocked decode grid (block_b rows per program) == XLA ref:
    rows must not leak into each other's accumulator slices."""
    m, hd, head_dim = 256, 256, 64
    from enhancing_tpu.ops.attention import _decode_blocks
    assert _decode_blocks(b, m, hd, 256)[0] == b  # exercises block_b > 1
    q = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((b, m, hd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, m, hd)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    for cur_len in (1, 130, 255):
        cl = jnp.int32(cur_len)
        ref = att._decode_xla(q, kc, vc, kn, vn, cl, head_dim)
        out = att._decode_pallas(q, kc, vc, kn, vn, cl, head_dim)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4)


def test_decode_attention_head_split(rng):
    """Head-split decode grid (nh > 1: each program owns a head slab and
    its hd/nh cache lanes) == dequant-XLA ref — the per-slab online softmax
    must not mix head slabs, and the out blocks must tile hd exactly.

    The quantized path forces the split: its scale blocks pin block_b to
    8-multiples (sublane) and block_k to >= 128 (lane), so at b8 x hd4096
    no whole-hd tile fits the VMEM model and _decode_blocks must split
    heads — the flagship (6144d) b>=8 int8-serving shape in miniature."""
    from enhancing_tpu.ops.attention import _decode_blocks
    L, b, m, hd, head_dim = 2, 8, 256, 4096, 512
    bb, bk, nh = _decode_blocks(b, m, hd, 256, itemsize=1, sublane8=True,
                                n_heads=hd // head_dim, head_dim=head_dim)
    assert nh > 1 and bb == b, (bb, bk, nh)
    kq = jnp.asarray(rng.integers(-127, 128, (L, b, m, hd)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (L, b, m, hd)), jnp.int8)
    ks = jnp.asarray(rng.random((L, b, m)) * 0.05 + 1e-3, jnp.float32)
    vs = jnp.asarray(rng.random((L, b, m)) * 0.05 + 1e-3, jnp.float32)
    q3 = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    for cur in (jnp.int32(37),
                jnp.asarray(rng.integers(1, m, (b,)), jnp.int32)):
        out = att._decode_pallas(q3, kq, vq, kn, vn, cur, head_dim,
                                 layer=jnp.int32(1), ks=ks, vs=vs)
        k_deq, v_deq = att._dequant_cache(kq[1], vq[1], ks[1], vs[1],
                                          jnp.float32)
        ref = att._decode_xla(q3, k_deq, v_deq, kn, vn, cur, head_dim)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)


def test_decode_attention_stacked_layer_indexing(rng):
    """Stacked-cache decode == per-layer 3D decode for every layer index
    (the BlockSpec index map must pick exactly layer l's chunks)."""
    from enhancing_tpu.ops.attention import decode_attention_stacked
    L, b, m, hd, head_dim = 3, 2, 256, 256, 64
    q = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    ks = jnp.asarray(rng.standard_normal((L, b, m, hd)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((L, b, m, hd)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    for cur_len in (1, 130, 255):
        cl = jnp.int32(cur_len)
        for layer in range(L):
            want = att._decode_xla(q, ks[layer], vs[layer], kn, vn, cl, head_dim)
            got = decode_attention_stacked(q, ks, vs, kn, vn, cl,
                                           jnp.int32(layer),
                                           head_dim=head_dim, impl="pallas")
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=3e-5, rtol=1e-4)


def test_decode_attention_ragged_matches_per_row(rng):
    """(B,) per-row cur_len == per-row scalar decode (continuous batching):
    rows at different sequence positions in one kernel call."""
    b, m, hd, head_dim = 8, 256, 256, 64
    q = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((b, m, hd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, m, hd)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    curs = jnp.asarray([1, 7, 63, 128, 129, 200, 255, 256], jnp.int32)
    out = att.decode_attention(q, kc, vc, kn, vn, curs, head_dim=head_dim,
                               impl="pallas")
    for r in range(b):
        want = att._decode_xla(q[r:r + 1], kc[r:r + 1], vc[r:r + 1],
                               kn[r:r + 1], vn[r:r + 1], curs[r], head_dim)
        np.testing.assert_allclose(np.asarray(out[r:r + 1]),
                                   np.asarray(want), atol=1e-4, rtol=2e-4)
    # XLA twin agrees with the kernel wholesale
    ref = att._decode_xla(q, kc, vc, kn, vn, curs, head_dim)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=2e-4)


def test_decode_attention_stacked_ragged(rng):
    from enhancing_tpu.ops.attention import decode_attention_stacked
    L, b, m, hd, head_dim = 2, 4, 256, 256, 64
    q = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    ks = jnp.asarray(rng.standard_normal((L, b, m, hd)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((L, b, m, hd)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    curs = jnp.asarray([3, 130, 255, 64], jnp.int32)
    for layer in range(L):
        got = decode_attention_stacked(q, ks, vs, kn, vn, curs,
                                       jnp.int32(layer), head_dim=head_dim,
                                       impl="pallas")
        want = att._decode_xla(q, ks[layer], vs[layer], kn, vn, curs,
                               head_dim)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=2e-4)


def test_cache_row_update_ragged(rng):
    from enhancing_tpu.ops.cache import cache_row_update
    L, b, ctx, c = 2, 4, 32, 128
    cache = jnp.asarray(rng.standard_normal((L, b, ctx, c)), jnp.float32)
    news = jnp.asarray(rng.standard_normal((L, b, 1, c)), jnp.float32)
    curs = jnp.asarray([0, 5, 17, 31], jnp.int32)
    got = cache_row_update(cache, news, curs, impl="pallas")
    want = np.asarray(cache).copy()
    for r in range(b):
        want[:, r, int(curs[r])] = np.asarray(news)[:, r, 0]
    np.testing.assert_allclose(np.asarray(got), want, atol=0)
    # XLA twin (ragged) matches too
    got_x = cache_row_update(cache, news, curs, impl="xla")
    np.testing.assert_allclose(np.asarray(got_x), want, atol=0)


# ---------------------------------------------------------------------------
# int8 weights-only GEMMs (ops/int8.py)
# ---------------------------------------------------------------------------


def test_quantize_channelwise_roundtrip(rng):
    from enhancing_tpu.ops import int8 as q8
    w = jnp.asarray(rng.standard_normal((256, 384)) * 0.05, jnp.float32)
    w_q, scale = q8.quantize_channelwise(w)
    assert w_q.dtype == jnp.int8 and scale.shape == (384,)
    deq = np.asarray(w_q, np.float32) * np.asarray(scale)[None, :]
    err = np.abs(deq - np.asarray(w))
    # symmetric per-channel: error bounded by half an LSB of each channel
    assert (err <= np.asarray(scale)[None, :] * 0.5 + 1e-8).all()

    # stacked (L, d, n) kernels quantize per layer
    ws = jnp.stack([w, 3 * w])
    wq2, sc2 = q8.quantize_channelwise(ws)
    assert sc2.shape == (2, 384)
    np.testing.assert_allclose(np.asarray(sc2[1]), 3 * np.asarray(sc2[0]),
                               rtol=1e-6)


def test_int8_gemm_pallas_matches_xla(rng):
    from enhancing_tpu.ops import int8 as q8
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 384)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(384), jnp.float32)
    res = jnp.asarray(rng.standard_normal((8, 384)), jnp.float32)
    w_q, scale = q8.quantize_channelwise(w)
    for act in (None, "sqrelu"):
        for r in (None, res):
            ref = q8._int8_gemm_xla(x, w_q, scale, b, r, act)
            out = q8._int8_gemm_pallas(x, w_q, scale, b, r, act)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-5)


def test_int8_ln_gemm_pallas_matches_xla(rng):
    from enhancing_tpu.ops import int8 as q8
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    prev = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(256), jnp.float32)
    bt = jnp.asarray(rng.standard_normal(256), jnp.float32)
    tm = jnp.asarray(rng.random(256), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 384)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(384), jnp.float32)
    w_q, scale = q8.quantize_channelwise(w)
    ref_o, ref_xn = q8._int8_ln_gemm_xla(x, g, bt, tm, prev, w_q, scale, b,
                                         None, 1e-5)
    out, xn = q8._int8_ln_gemm_pallas(x, g, bt, tm, prev, w_q, scale, b,
                                      None, 1e-5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_o), atol=2e-5)
    np.testing.assert_allclose(np.asarray(xn), np.asarray(ref_xn), atol=2e-5)
    # no-shift variant
    ref_o2, _ = q8._int8_ln_gemm_xla(x, g, bt, None, prev, w_q, scale, b,
                                     "sqrelu", 1e-5)
    out2, _ = q8._int8_ln_gemm_pallas(x, g, bt, tm, prev, w_q, scale, b,
                                      "sqrelu", 1e-5, False)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref_o2),
                               atol=2e-5)


def test_int8_impl_resolution_scanned_weights():
    """Inside a scanned_weights() region 'auto' resolves to the XLA impl
    (Pallas custom calls force per-layer weight-slice materialization in a
    scan-over-layers body); explicit impl= args and the env override win."""
    import os

    from enhancing_tpu.ops import int8 as q8
    from enhancing_tpu.ops.common import scanned_weights

    assert q8._resolve_impl("auto") == "auto"
    assert q8._resolve_impl("pallas") == "pallas"
    with scanned_weights():
        assert q8._resolve_impl("auto") == "xla"
        assert q8._resolve_impl(None) == "xla"
        assert q8._resolve_impl("pallas") == "pallas"  # explicit wins
        os.environ["ENHANCING_TPU_INT8_IMPL"] = "pallas"
        try:
            assert q8._resolve_impl("auto") == "pallas"  # env wins
        finally:
            del os.environ["ENHANCING_TPU_INT8_IMPL"]
    assert q8._resolve_impl("auto") == "auto"


def test_w8a8_gemm_exactness(rng):
    """w8a8=True is EXACTLY quantize-rows -> int8 dot -> rescale (the int8
    dot accumulates losslessly in int32), and tracks the f32 GEMM within
    the activation-quant error bound."""
    from enhancing_tpu.ops import int8 as q8
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 384)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(384), jnp.float32)
    w_q, scale = q8.quantize_channelwise(w)

    out = q8.int8_gemm(x, w_q, scale, b, w8a8=True)
    # manual reference
    x_q, sx = q8.quantize_rows(x)
    acc = np.asarray(x_q, np.int32) @ np.asarray(w_q, np.int32)
    want = acc * np.asarray(sx) * np.asarray(scale)[None, :] + np.asarray(b)
    np.testing.assert_allclose(np.asarray(out, np.float32), want, rtol=1e-5,
                               atol=1e-5)
    # close to the true GEMM: per-element error ~ d * (sx*|w| + sw*|x|)/2
    true = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    assert np.abs(np.asarray(out, np.float32) - true).max() < 0.2

    # the ln/mlp variants accept the flag end to end
    g = jnp.ones((256,), jnp.float32)
    bt = jnp.zeros((256,), jnp.float32)
    o_ln, _ = q8.int8_ln_gemm(x, g, bt, None, None, w_q, scale, b,
                              w8a8=True)
    assert np.isfinite(np.asarray(o_ln)).all()
    w1 = jnp.asarray(rng.standard_normal((384, 256)) * 0.05, jnp.float32)
    w1_q, s1 = q8.quantize_channelwise(w1)
    o_mlp = q8.int8_mlp_decode(x, g, bt, w_q, scale, b, w1_q, s1, None,
                               residual=x, w8a8=True)
    assert np.isfinite(np.asarray(o_mlp)).all()
    assert o_mlp.shape == x.shape


def test_fused_ln_shift_gemm_pallas_matches_xla(rng):
    from enhancing_tpu.ops import ln_gemm as lg
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    prev = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(256), jnp.float32)
    bt = jnp.asarray(rng.standard_normal(256), jnp.float32)
    tm = jnp.asarray(rng.random(256), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 384)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(384), jnp.float32)
    ref_o, ref_xn = lg._ln_shift_gemm_xla(x, g, bt, tm, prev, w, b, None,
                                          1e-5)
    out, xn = lg._ln_shift_gemm_pallas(x, g, bt, tm, prev, w, b, None, 1e-5,
                                       True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_o), atol=2e-5)
    np.testing.assert_allclose(np.asarray(xn), np.asarray(ref_xn), atol=2e-5)
    # gradient flows through the custom_vjp (twin-derived backward)
    f = lambda x_: lg.fused_ln_shift_gemm(x_, g, bt, tm, prev, w, b)[0].sum()
    gx = jax.grad(f)(x)
    assert np.isfinite(np.asarray(gx)).all()


def test_decode_attention_stacked_int8_cache(rng):
    """Quantized stacked decode kernel == dequantize-then-XLA twin, scalar
    and ragged cur_len."""
    L, b, m, hd, head_dim = 3, 8, 256, 256, 64
    kq = jnp.asarray(rng.integers(-127, 128, (L, b, m, hd)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (L, b, m, hd)), jnp.int8)
    ks = jnp.asarray(rng.random((L, b, m)) * 0.05 + 1e-3, jnp.float32)
    vs = jnp.asarray(rng.random((L, b, m)) * 0.05 + 1e-3, jnp.float32)
    q3 = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    for layer in (0, 2):
        for cur in (jnp.int32(37),
                    jnp.asarray(rng.integers(1, m, (b,)), jnp.int32)):
            out = att._decode_pallas(q3, kq, vq, kn, vn, cur, head_dim,
                                     layer=jnp.int32(layer), ks=ks, vs=vs)
            k_deq, v_deq = att._dequant_cache(kq[layer], vq[layer],
                                              ks[layer], vs[layer],
                                              jnp.float32)
            ref = att._decode_xla(q3, k_deq, v_deq, kn, vn, cur, head_dim)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-4, rtol=2e-4)


def test_scale_row_update(rng):
    from enhancing_tpu.ops.cache import scale_row_update
    L, b, ctx = 2, 4, 64
    scales = jnp.asarray(rng.random((L, b, ctx)), jnp.float32)
    news = jnp.asarray(rng.random((L, b, 1)), jnp.float32)
    out = scale_row_update(scales, news, jnp.int32(7))
    ref = scales.at[:, :, 7:8].set(news)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # ragged
    cur = jnp.asarray([1, 5, 0, 63], jnp.int32)
    out2 = scale_row_update(scales, news, cur)
    ref2 = np.asarray(scales).copy()
    for i, c in enumerate([1, 5, 0, 63]):
        ref2[:, i, c] = np.asarray(news)[:, i, 0]
    np.testing.assert_array_equal(np.asarray(out2), ref2)


def test_cache_row_update_int8(rng):
    from enhancing_tpu.ops.cache import cache_row_update
    L, b, ctx, c = 2, 3, 64, 128
    cache = jnp.asarray(rng.integers(-127, 128, (L, b, ctx, c)), jnp.int8)
    news = jnp.asarray(rng.integers(-127, 128, (L, b, 1, c)), jnp.int8)
    out = cache_row_update(cache, news, jnp.int32(33))
    ref = jax.lax.dynamic_update_slice(cache, news, (0, 0, 33, 0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_int8_mlp_decode_matches_xla(rng):
    from enhancing_tpu.ops import int8 as q8
    m, d, h = 8, 256, 1024
    x = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(d), jnp.float32)
    bt = jnp.asarray(rng.standard_normal(d), jnp.float32)
    w0 = jnp.asarray(rng.standard_normal((d, h)) * 0.05, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal(h), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((h, d)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(d), jnp.float32)
    res = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    w0q, s0 = q8.quantize_channelwise(w0)
    w1q, s1 = q8.quantize_channelwise(w1)
    ref = q8._int8_mlp_xla(x, g, bt, w0q, s0, b0, w1q, s1, b1, res,
                           "sqrelu", 1e-5)
    out = q8._int8_mlp_pallas(x, g, bt, w0q, s0, b0, w1q, s1, b1, res,
                              "sqrelu", 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4,
                               rtol=3e-4)
