"""SPMD partitioning of the Pallas ops (ops/partition.py).

Without partitioning rules, GSPMD treats every pallas_call as an opaque
custom call and all-gathers its operands to full shape on each device
(measured: 22 all-gathers around one attention op on this 8-device mesh) —
silently erasing data/tensor parallelism. These tests pin the contract:
sharded inputs compile to ZERO all-gathers around the kernels and produce
the exact replicated-run numerics. Kernels run in interpreter mode
(ENHANCING_TPU_PALLAS_INTERPRET) on the virtual CPU mesh.
"""
import os
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from enhancing_tpu.parallel import make_mesh


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    monkeypatch.setenv("ENHANCING_TPU_PALLAS_INTERPRET", "1")


def _all_gathers(jitted, *args) -> int:
    hlo = jitted.lower(*args).compile().as_text()
    return len(re.findall(r"all-gather", hlo))


def test_attention_fwd_dp_tp_no_allgather(devices):
    """Packed attention with batch over 'data' AND heads over 'model'
    partitions with zero collectives; numerics match the XLA reference."""
    from enhancing_tpu.ops.attention import (_attention_xla_bnhd,
                                             multihead_attention_bnhd)

    mesh = make_mesh(data=4, model=2, devices=devices)
    rng = np.random.default_rng(0)
    b, n, h, d = 8, 128, 8, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
               for _ in range(3))
    sh = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    f = jax.jit(lambda a, b_, c: multihead_attention_bnhd(a, b_, c,
                                                          impl="pallas"),
                in_shardings=(sh, sh, sh))
    assert _all_gathers(f, qs, ks, vs) == 0
    out = f(qs, ks, vs)
    want = _attention_xla_bnhd(q, k, v, d ** -0.5, "none", 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_attention_bwd_dp_tp_no_allgather(devices):
    """The flash-style packed backward partitions too (training path)."""
    from enhancing_tpu.ops.attention import (_attention_xla_bnhd,
                                             multihead_attention_bnhd)

    mesh = make_mesh(data=4, model=2, devices=devices)
    rng = np.random.default_rng(1)
    b, n, h, d = 8, 128, 8, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
               for _ in range(3))
    sh = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    def loss(a, b_, c):
        y = multihead_attention_bnhd(a, b_, c, impl="pallas",
                                     mask_mode="prefix_causal", cond_len=4)
        return jnp.sum(jnp.square(y))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)),
                in_shardings=(sh, sh, sh))
    assert _all_gathers(g, qs, ks, vs) == 0
    gq, gk, gv = g(qs, ks, vs)

    def loss_xla(a, b_, c):
        y = _attention_xla_bnhd(a, b_, c, d ** -0.5, "prefix_causal", 4)
        return jnp.sum(jnp.square(y))

    wq, wk, wv = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for got, want in ((gq, wq), (gk, wk), (gv, wv)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-4)


def test_vq_search_dp_no_allgather(devices):
    from enhancing_tpu.ops.vq import _nearest_xla, nearest_codebook_indices

    mesh = make_mesh(data=len(devices), model=1, devices=devices)
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((256, 32)), jnp.float32)
    shz = NamedSharding(mesh, P("data", None))
    f = jax.jit(lambda a, b: nearest_codebook_indices(a, b, impl="pallas"),
                in_shardings=(shz, NamedSharding(mesh, P())))
    zs = jax.device_put(z, shz)
    assert _all_gathers(f, zs, cb) == 0
    np.testing.assert_array_equal(np.asarray(f(zs, cb)),
                                  np.asarray(_nearest_xla(z, cb)))


def test_fused_act_dp_no_allgather(devices):
    from enhancing_tpu.ops.fused_act import _fused_xla, fused_leaky_relu

    mesh = make_mesh(data=len(devices), model=1, devices=devices)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((16, 8, 8, 64)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
    shx = NamedSharding(mesh, P("data"))
    f = jax.jit(lambda a, b: fused_leaky_relu(a, b, impl="pallas"),
                in_shardings=(shx, NamedSharding(mesh, P())))
    xs = jax.device_put(x, shx)
    assert _all_gathers(f, xs, bias) == 0
    np.testing.assert_allclose(
        np.asarray(f(xs, bias)),
        np.asarray(_fused_xla(x, bias, 0.2, 2 ** 0.5)), atol=1e-5)


def test_upfirdn2d_fir_dp_no_allgather(devices):
    from enhancing_tpu.ops.upfirdn2d import (_upfirdn2d_xla, make_blur_kernel,
                                             upfirdn2d)

    mesh = make_mesh(data=len(devices), model=1, devices=devices)
    rng = np.random.default_rng(4)
    kern = make_blur_kernel([1, 3, 3, 1])
    x = jnp.asarray(rng.standard_normal((16, 16, 16, 8)), jnp.float32)
    shx = NamedSharding(mesh, P("data"))
    f = jax.jit(lambda a: upfirdn2d(a, kern, pad=(1, 2), impl="pallas"),
                in_shardings=(shx,))
    xs = jax.device_put(x, shx)
    assert _all_gathers(f, xs) == 0
    np.testing.assert_allclose(
        np.asarray(f(xs)),
        np.asarray(_upfirdn2d_xla(x, kern, 1, 1, (1, 2, 1, 2))), atol=1e-5)


def test_decode_attention_dp_no_allgather(devices):
    """The prefix-aware decode kernel partitions over batch (and stays
    correct: the (1,)-shaped cur_len operand is replicated)."""
    from enhancing_tpu.ops.attention import _decode_xla, decode_attention

    mesh = make_mesh(data=len(devices), model=1, devices=devices)
    rng = np.random.default_rng(5)
    b, m, hd, d = 8, 256, 256, 64
    q3 = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((b, m, hd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, m, hd)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    sh2 = NamedSharding(mesh, P("data"))
    sh3 = NamedSharding(mesh, P("data", None, None))
    f = jax.jit(
        lambda a, b_, c, d_, e: decode_attention(
            a, b_, c, d_, e, jnp.int32(100), head_dim=d, impl="pallas"),
        in_shardings=(sh2, sh3, sh3, sh2, sh2))
    args = (jax.device_put(q3, sh2), jax.device_put(kc, sh3),
            jax.device_put(vc, sh3), jax.device_put(kn, sh2),
            jax.device_put(vn, sh2))
    assert _all_gathers(f, *args) == 0
    np.testing.assert_allclose(
        np.asarray(f(*args)),
        np.asarray(_decode_xla(q3, kc, vc, kn, vn, jnp.int32(100), d)),
        atol=1e-4)


def test_escape_hatch_restores_replicating_dispatch(monkeypatch):
    from enhancing_tpu.ops import partition

    assert partition.partitioning_enabled()
    monkeypatch.setenv("ENHANCING_TPU_NO_CUSTOM_PARTITION", "1")
    assert not partition.partitioning_enabled()


def test_misaligned_local_shard_falls_back_to_xla_twin(devices):
    """Head-dim sharding that leaves a local block below the packed kernel's
    128-lane grid must still be numerically right (local XLA twin)."""
    from enhancing_tpu.ops.attention import (_attention_xla_bnhd,
                                             multihead_attention_bnhd)

    mesh = make_mesh(data=1, model=8, devices=devices)
    rng = np.random.default_rng(6)
    b, n, h, d = 2, 64, 8, 64   # hd=512; tp=8 -> local 64 lanes (< 128)
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
               for _ in range(3))
    sh = NamedSharding(mesh, P(None, None, "model", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    f = jax.jit(lambda a, b_, c: multihead_attention_bnhd(a, b_, c,
                                                          impl="pallas"),
                in_shardings=(sh, sh, sh))
    out = f(qs, ks, vs)
    want = _attention_xla_bnhd(q, k, v, d ** -0.5, "none", 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_gspmd_fallback_infer_sharding_rank_change(devices):
    """With Shardy off, infer_sharding_from_operands drives propagation. For
    rank-changing rules (vq: 'm d, n d -> m') the fallback must build the
    result sharding from the rule's OUTPUT factors, not copy the rank-2
    first-operand sharding onto the rank-1 result."""
    from enhancing_tpu.ops.vq import _nearest_xla, nearest_codebook_indices

    prev = jax.config.jax_use_shardy_partitioner
    try:
        jax.config.update("jax_use_shardy_partitioner", False)
        mesh = make_mesh(data=8, devices=devices)
        rng = np.random.default_rng(7)
        z = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
        codebook = jnp.asarray(rng.standard_normal((128, 32)), jnp.float32)
        zsh = NamedSharding(mesh, P("data", None))
        f = jax.jit(
            lambda a, c: nearest_codebook_indices(a, c, impl="pallas"),
            in_shardings=(zsh, NamedSharding(mesh, P())))
        zs = jax.device_put(z, zsh)
        cs = jax.device_put(codebook, NamedSharding(mesh, P()))
        assert _all_gathers(f, zs, cs) == 0
        np.testing.assert_array_equal(np.asarray(f(zs, cs)),
                                      np.asarray(_nearest_xla(z, codebook)))
    finally:
        jax.config.update("jax_use_shardy_partitioner", prev)


def test_ln_gemm_dp_tp_no_allgather(devices):
    """LN->GEMM with rows over 'data' and weight columns over 'model'
    (Megatron column-parallel) partitions with zero collectives."""
    from enhancing_tpu.ops.ln_gemm import _ln_gemm_xla, fused_ln_gemm

    mesh = make_mesh(data=4, model=2, devices=devices)
    rng = np.random.default_rng(3)
    m, d, n = 64, 128, 256
    x = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(d), jnp.float32)
    bt = jnp.asarray(rng.standard_normal(d), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, n)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)

    shx = NamedSharding(mesh, P("data", None))
    shw = NamedSharding(mesh, P(None, "model"))
    shb = NamedSharding(mesh, P("model"))
    rep = NamedSharding(mesh, P())
    f = jax.jit(lambda *a: fused_ln_gemm(*a, activation="tanh",
                                         impl="pallas"),
                in_shardings=(shx, rep, rep, shw, shb))
    args = (jax.device_put(x, shx), jax.device_put(g, rep),
            jax.device_put(bt, rep), jax.device_put(w, shw),
            jax.device_put(b, shb))
    assert _all_gathers(f, *args) == 0
    want = _ln_gemm_xla(x, g, bt, w, b, "tanh", 1e-5)
    np.testing.assert_allclose(np.asarray(f(*args)), np.asarray(want),
                               atol=2e-5)


def test_decode_attention_ragged_dp_no_allgather(devices):
    """Ragged decode: the (B,) per-row cur_len vector shards WITH the batch
    rows — zero collectives, per-shard kernels see their own rows' lengths."""
    from enhancing_tpu.ops.attention import _decode_xla, decode_attention

    mesh = make_mesh(data=len(devices), model=1, devices=devices)
    rng = np.random.default_rng(6)
    b, m, hd, d = 8, 256, 256, 64
    q3 = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((b, m, hd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, m, hd)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, hd)), jnp.float32)
    curs = jnp.asarray([1, 7, 64, 128, 129, 200, 255, 256], jnp.int32)
    sh2 = NamedSharding(mesh, P("data"))
    sh3 = NamedSharding(mesh, P("data", None, None))
    sh1 = NamedSharding(mesh, P("data"))
    f = jax.jit(
        lambda a, b_, c, d_, e, cu: decode_attention(
            a, b_, c, d_, e, cu, head_dim=d, impl="pallas"),
        in_shardings=(sh2, sh3, sh3, sh2, sh2, sh1))
    args = (jax.device_put(q3, sh2), jax.device_put(kc, sh3),
            jax.device_put(vc, sh3), jax.device_put(kn, sh2),
            jax.device_put(vn, sh2), jax.device_put(curs, sh1))
    assert _all_gathers(f, *args) == 0
    np.testing.assert_allclose(
        np.asarray(f(*args)),
        np.asarray(_decode_xla(q3, kc, vc, kn, vn, curs, d)),
        atol=1e-4)
