"""Stage-2 prior tests: GPT forward/sampling consistency, RQTransformer, masks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhancing_tpu.models.stage2 import (
    GPT,
    RQTransformer,
    filter_logits,
    sample_gpt,
    sample_rq,
)

GPT_KW = dict(vocab_cond_size=10, vocab_img_size=32, embed_dim=64,
              cond_num_tokens=1, img_num_tokens=16, n_heads=4, n_layers=2)


@pytest.fixture(scope="module")
def gpt():
    m = GPT(**GPT_KW)
    codes = jnp.zeros((2, 16), jnp.int32)
    conds = jnp.zeros((2, 1), jnp.int32)
    vs = m.init(jax.random.PRNGKey(0), codes, conds)
    return m, vs


def test_gpt_forward_shape(gpt):
    m, vs = gpt
    codes = jnp.ones((2, 16), jnp.int32)
    conds = jnp.ones((2, 1), jnp.int32)
    logits = m.apply(vs, codes, conds)
    assert logits.shape == (2, 16, 32)


def test_gpt_causality(gpt):
    """Changing code t must not affect logits for positions <= t."""
    m, vs = gpt
    conds = jnp.ones((1, 1), jnp.int32)
    codes = jnp.zeros((1, 16), jnp.int32)
    base = m.apply(vs, codes, conds)
    mod = codes.at[0, 7].set(5)
    out = m.apply(vs, mod, conds)
    # logits[:, t] predicts code t from tokens < t: positions 0..7 unaffected
    np.testing.assert_allclose(np.asarray(base[:, :8]), np.asarray(out[:, :8]),
                               atol=1e-5)
    assert np.abs(np.asarray(base[:, 8:]) - np.asarray(out[:, 8:])).max() > 1e-6


def test_gpt_cached_decode_matches_full_forward(gpt):
    """Prefill + decode_step logits == full forward logits (teacher forcing)."""
    m, vs = gpt
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 32, (2, 16)), jnp.int32)
    conds = jnp.asarray(rng.integers(0, 10, (2, 1)), jnp.int32)

    full = m.apply(vs, codes, conds)  # (2, 16, 32)

    cache = m.apply(vs, 2, method="init_cache")
    logits0, cache = m.apply(vs, conds, cache, method="prefill")
    step_logits = [logits0]
    for t in range(1, 16):
        lg, cache = m.apply(vs, codes[:, t - 1], jnp.int32(t), cache,
                            method="decode_step")
        step_logits.append(lg)
    stepped = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               atol=2e-4, rtol=1e-3)


def test_sample_gpt(gpt):
    m, vs = gpt
    conds = jnp.zeros((2, 1), jnp.int32)
    logits, codes = sample_gpt(m, vs, conds, jax.random.PRNGKey(0),
                               top_k=8, temperature=1.0)
    assert codes.shape == (2, 16)
    assert logits.shape == (2, 16, 32)
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 32).all()
    # different seeds give different samples
    _, codes2 = sample_gpt(m, vs, conds, jax.random.PRNGKey(1), top_k=8,
                           temperature=1.0)
    assert (np.asarray(codes) != np.asarray(codes2)).any()


def test_filter_logits_topk():
    logits = jnp.asarray([[1.0, 3.0, 2.0, 0.5]])
    out = np.asarray(filter_logits(logits, top_k=2))
    assert np.isfinite(out[0, 1]) and np.isfinite(out[0, 2])
    assert np.isinf(out[0, 0]) and np.isinf(out[0, 3])


def test_filter_logits_topp():
    # probs ~ [0.643, 0.236, 0.087, 0.032]: top_p=0.7 keeps first two
    logits = jnp.log(jnp.asarray([[0.643, 0.236, 0.087, 0.032]]))
    out = np.asarray(filter_logits(logits, top_p=0.7))
    assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
    assert np.isinf(out[0, 2]) and np.isinf(out[0, 3])


def test_token_shift_semantics(gpt):
    """First token's shifted component is zero; later tokens see predecessor."""
    from enhancing_tpu.models.stage2.layers import MultiHeadSelfAttention
    m = MultiHeadSelfAttention(embed_dim=8, n_heads=2, cond_len=1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 8)),
                    jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), x)
    tm = np.asarray(vs["params"]["time_mix"])
    # time_mix ramp: i/(C-1)
    np.testing.assert_allclose(tm[0, 0], np.arange(8) / 7.0, atol=1e-6)


RQ_KW = dict(vocab_cond_size=10, vocab_img_size=32, embed_dim=64,
             cond_num_tokens=1, img_num_tokens=8, depth_num_tokens=3,
             spatial_n_heads=4, depth_n_heads=4, spatial_n_layers=2,
             depth_n_layers=2)


@pytest.fixture(scope="module")
def rqt():
    m = RQTransformer(**RQ_KW)
    codes = jnp.zeros((2, 8, 3), jnp.int32)
    conds = jnp.zeros((2, 1), jnp.int32)
    vs = m.init(jax.random.PRNGKey(0), codes, conds)
    return m, vs


def test_rq_forward_shape(rqt):
    m, vs = rqt
    codes = jnp.ones((2, 8, 3), jnp.int32)
    conds = jnp.ones((2, 1), jnp.int32)
    logits = m.apply(vs, codes, conds)
    assert logits.shape == (2 * 8, 3, 32)


def test_rq_depth_causality(rqt):
    """Depth logits at (t, d) must not depend on depth codes >= d at t."""
    m, vs = rqt
    conds = jnp.ones((1, 1), jnp.int32)
    codes = jnp.zeros((1, 8, 3), jnp.int32)
    base = m.apply(vs, codes, conds).reshape(8, 3, 32)
    mod = codes.at[0, 3, 1].set(7)  # change depth-1 code at position 3
    out = m.apply(vs, mod, conds).reshape(8, 3, 32)
    # at position 3: depth 0 and 1 logits unchanged, depth 2 changed
    np.testing.assert_allclose(np.asarray(base[3, :2]), np.asarray(out[3, :2]),
                               atol=1e-5)
    assert np.abs(np.asarray(base[3, 2]) - np.asarray(out[3, 2])).max() > 1e-6
    # earlier positions unchanged
    np.testing.assert_allclose(np.asarray(base[:3]), np.asarray(out[:3]),
                               atol=1e-5)


def test_sample_rq(rqt):
    m, vs = rqt
    conds = jnp.zeros((2, 1), jnp.int32)
    logits, codes = sample_rq(m, vs, conds, jax.random.PRNGKey(0), top_k=8)
    assert codes.shape == (2, 8, 3)
    assert logits.shape == (2 * 8, 3, 32)
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 32).all()


def test_continuous_batcher_matches_lockstep_greedy(gpt):
    """Staggered admissions through ContinuousGPTBatcher reproduce per-cond
    greedy lockstep sampling exactly: per-row positions in the ragged step
    (decode-attention masks, cache-row writes, pos-embed gathers) must not
    leak across slots."""
    from enhancing_tpu.models.stage2.batcher import ContinuousGPTBatcher
    m, vs = gpt
    conds = [jnp.asarray([c], jnp.int32) for c in (1, 4, 7)]
    want = {}
    for i, c in enumerate(conds):
        _, codes = sample_gpt(m, vs, c[None, :], jax.random.PRNGKey(9),
                              top_k=1)
        want[i] = np.asarray(codes[0])

    b = ContinuousGPTBatcher(m, vs, num_slots=2,
                             rng=jax.random.PRNGKey(123), top_k=1)
    rid0 = b.submit(conds[0])
    for _ in range(3):                        # req 0 runs alone for a bit
        assert b.step() == []
    rid1 = b.submit(conds[1])                 # joins mid-flight
    done = {}
    while len(done) < 2:
        for rid, seq in b.step():
            done[rid] = seq
            if len(done) == 1:                # a slot just freed: admit #2
                rid2 = b.submit(conds[2])
    while True:
        fin = b.step()
        if fin:
            done.update(dict(fin))
            break
    assert b.num_active() == 0
    np.testing.assert_array_equal(done[rid0], want[0])
    np.testing.assert_array_equal(done[rid1], want[1])
    np.testing.assert_array_equal(done[rid2], want[2])


@pytest.mark.parametrize("depth,fetch_thread",
                         [(True, False), (2, False), (2, True)])
def test_pipelined_batcher_matches_lockstep_greedy(gpt, depth, fetch_thread):
    """Pipelined dispatch (up to D issued before fetching the oldest) must
    not change ANY request's greedy codes — the stale active mask only
    covers rows already frozen on device, and the up-to-D-dispatch
    admission lag shifts schedules, never contents. Also pins flush()
    draining every in-flight dispatch. depth=True pins the bool
    back-compat (== depth 1); depth=2 the deeper queue; fetch_thread=True
    the background-thread materialization (results must be byte-identical
    whether fetched inline or by the worker)."""
    from enhancing_tpu.models.stage2.batcher import ContinuousGPTBatcher
    m, vs = gpt
    conds = [jnp.asarray([c], jnp.int32) for c in (1, 4, 7)]
    want = {}
    for i, c in enumerate(conds):
        _, codes = sample_gpt(m, vs, c[None, :], jax.random.PRNGKey(9),
                              top_k=1)
        want[i] = np.asarray(codes[0])

    b = ContinuousGPTBatcher(m, vs, num_slots=2,
                             rng=jax.random.PRNGKey(123), top_k=1,
                             pipeline=depth, fetch_thread=fetch_thread)
    rid0 = b.submit(conds[0])
    for _ in range(3):
        b.step(2)
    rid1 = b.submit(conds[1])
    done = {}
    rid2 = None
    steps = 0
    while len(done) < 3:
        for rid, seq in b.step(2):
            done[rid] = seq
            if rid2 is None:                  # a slot just freed: admit #2
                rid2 = b.submit(conds[2])
        steps += 1
        if steps > 200:                       # 2 slots x 8 tokens: plenty
            done.update(dict(b.flush()))
            break
    done.update(dict(b.flush()))
    assert b.num_active() == 0 and not b._pending
    np.testing.assert_array_equal(done[rid0], want[0])
    np.testing.assert_array_equal(done[rid1], want[1])
    np.testing.assert_array_equal(done[rid2], want[2])


def test_ragged_decode_step_matches_lockstep(gpt):
    """decode_step with a (B,) step vector == scalar steps row by row
    (teacher forcing at mixed positions)."""
    m, vs = gpt
    rng = np.random.default_rng(3)
    codes = jnp.asarray(rng.integers(0, 32, (2, 16)), jnp.int32)
    conds = jnp.asarray(rng.integers(0, 10, (2, 1)), jnp.int32)

    # build per-row caches by teacher-forcing each row to its own depth
    cache = m.apply(vs, 2, method="init_cache")
    _, cache = m.apply(vs, conds, cache, method="prefill")
    depths = (5, 9)
    for t in range(1, max(depths)):
        # advance only rows still below their depth; freezing a row means
        # re-feeding its position (writes same row, reads unchanged)
        steps = jnp.asarray([min(t, d - 1) for d in depths], jnp.int32)
        toks = jnp.stack([codes[r, min(t, depths[r] - 1) - 1]
                          for r in range(2)])
        logits_r, cache = m.apply(vs, toks, steps, cache,
                                  method="decode_step")

    # reference: scalar decode of each row alone at its own position
    for r, d in enumerate(depths):
        cache1 = m.apply(vs, 1, method="init_cache")
        _, cache1 = m.apply(vs, conds[r:r + 1], cache1, method="prefill")
        for t in range(1, d):
            logits_s, cache1 = m.apply(
                vs, codes[r:r + 1, t - 1], jnp.int32(t), cache1,
                method="decode_step")
        if d == max(depths):
            np.testing.assert_allclose(np.asarray(logits_r[r]),
                                       np.asarray(logits_s[0]),
                                       atol=1e-5, rtol=1e-5)


def test_continuous_rq_batcher_matches_lockstep_greedy(rqt):
    """Staggered RQ admissions == per-cond greedy lockstep sample_rq."""
    from enhancing_tpu.models.stage2.batcher import ContinuousRQBatcher
    m, vs = rqt
    conds = [jnp.asarray([c], jnp.int32) for c in (2, 6)]
    want = {}
    for i, c in enumerate(conds):
        _, codes = sample_rq(m, vs, c[None, :], jax.random.PRNGKey(5),
                             top_k=1)
        want[i] = np.asarray(codes[0])          # (T, D)

    b = ContinuousRQBatcher(m, vs, num_slots=2,
                            rng=jax.random.PRNGKey(77), top_k=1)
    rid0 = b.submit(conds[0])
    for _ in range(2):
        assert b.step() == []
    rid1 = b.submit(conds[1])                   # joins mid-flight
    done = dict(b.run_until_done())
    assert b.num_active() == 0
    np.testing.assert_array_equal(done[rid0], want[0])
    np.testing.assert_array_equal(done[rid1], want[1])


def test_continuous_batcher_multistep_dispatch(gpt):
    """step(n) (one scanned dispatch) == n single steps: completion
    mid-scan freezes the row on device, surplus items are discarded."""
    from enhancing_tpu.models.stage2.batcher import ContinuousGPTBatcher
    m, vs = gpt
    conds = [jnp.asarray([c], jnp.int32) for c in (1, 4)]
    want = {}
    for i, c in enumerate(conds):
        _, codes = sample_gpt(m, vs, c[None, :], jax.random.PRNGKey(9),
                              top_k=1)
        want[i] = np.asarray(codes[0])

    b = ContinuousGPTBatcher(m, vs, num_slots=2,
                             rng=jax.random.PRNGKey(0), top_k=1)
    rid0 = b.submit(conds[0])
    assert b.step(4) == []                   # 4 tokens, one dispatch
    rid1 = b.submit(conds[1])                # staggered by 4
    done = {}
    while b.num_active():
        done.update(dict(b.step(5)))
    np.testing.assert_array_equal(done[rid0], want[0])
    np.testing.assert_array_equal(done[rid1], want[1])


def test_quantized_decode_sampling():
    """Weights-only int8 decode (models/stage2/quantize.py): deterministic,
    shape-correct, and greedy codes mostly agree with full precision (the
    kernels are exact in the scale factorization; disagreements come only
    from near-tied logits of the random-weight model)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhancing_tpu.models.stage2 import (GPT, RQTransformer, sample_gpt,
                                             sample_rq,
                                             quantize_decode_params)

    m = GPT(vocab_cond_size=10, vocab_img_size=256, embed_dim=128,
            cond_num_tokens=1, img_num_tokens=16, n_heads=4, n_layers=2)
    conds = jnp.zeros((4, 1), jnp.int32)
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((4, 16), jnp.int32), conds)
    qvs = quantize_decode_params(vs)
    # every Dense kernel got an int8 twin
    q_leaves = jax.tree.leaves(qvs["quant"])
    assert any(a.dtype == jnp.int8 for a in q_leaves)
    # scan-stacked blocks: one stacked (L, d, n) int8 kernel per Dense
    # (query/key/value/proj/p0/p1) + the vocab head
    assert sum(a.dtype == jnp.int8 for a in q_leaves) == 6 + 1

    _, full = sample_gpt(m, vs, conds, jax.random.PRNGKey(1), top_k=1)
    _, q1 = sample_gpt(m, qvs, conds, jax.random.PRNGKey(1), top_k=1)
    _, q2 = sample_gpt(m, qvs, conds, jax.random.PRNGKey(1), top_k=1)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    assert float((q1 == full).mean()) > 0.5, (q1, full)

    rq = RQTransformer(vocab_cond_size=10, vocab_img_size=64, embed_dim=128,
                       cond_num_tokens=1, img_num_tokens=4,
                       depth_num_tokens=2, spatial_n_heads=4,
                       depth_n_heads=4, spatial_n_layers=2, depth_n_layers=2)
    vs2 = rq.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2), jnp.int32),
                  conds[:1])
    qvs2 = quantize_decode_params(vs2)
    _, full_rq = sample_rq(rq, vs2, conds, jax.random.PRNGKey(2), top_k=1)
    _, q_rq = sample_rq(rq, qvs2, conds, jax.random.PRNGKey(2), top_k=1)
    assert q_rq.shape == full_rq.shape
    assert float((q_rq == full_rq).mean()) > 0.5


def test_dropped_kernel_int8_serving():
    """drop_quantized_kernels: the bf16 kernels are dead weight once the
    quant collection exists — dropping them (the memory mode that fits the
    24L flagship on one chip) leaves GPT sampling, incl. the int8 prefill
    path, bit-identical. Placeholders keep the scan layer axis (a 0-d
    placeholder broke flax scan_prefill)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhancing_tpu.models.stage2 import (GPT, drop_quantized_kernels,
                                             quantize_decode_params,
                                             sample_gpt)

    for scan in (True, False):
        m = GPT(vocab_cond_size=10, vocab_img_size=256, embed_dim=128,
                cond_num_tokens=1, img_num_tokens=8, n_heads=4, n_layers=2,
                scan_layers=scan)
        conds = jnp.zeros((2, 1), jnp.int32)
        vs = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 8), jnp.int32),
                    conds)
        qvs = quantize_decode_params(vs)
        dvs = drop_quantized_kernels(qvs)
        # kernels with int8 twins collapsed to (..., 1, 1); biases intact
        blk = (dvs["params"]["blocks"] if scan
               else dvs["params"]["blocks_0"])
        k = blk["attn"]["query"]["kernel"]
        assert k.shape[-2:] == (1, 1)
        if scan:
            assert k.shape[0] == 2  # layer axis survives for nn.scan
        assert blk["attn"]["query"]["bias"].ndim >= 1
        _, want = sample_gpt(m, qvs, conds, jax.random.PRNGKey(1), top_k=1)
        _, got = sample_gpt(m, dvs, conds, jax.random.PRNGKey(1), top_k=1)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_drop_quantized_kernels_rejects_rq():
    """RQTransformer's depth stack samples by full recompute and still reads
    the bf16 kernels — drop_quantized_kernels on an RQ param tree must raise
    instead of silently corrupting the depth logits."""
    import jax
    import jax.numpy as jnp
    import pytest

    from enhancing_tpu.models.stage2 import (RQTransformer,
                                             drop_quantized_kernels,
                                             quantize_decode_params)

    rq = RQTransformer(vocab_cond_size=10, vocab_img_size=256, embed_dim=64,
                       cond_num_tokens=1, img_num_tokens=4,
                       depth_num_tokens=2, spatial_n_heads=4,
                       depth_n_heads=4, spatial_n_layers=2, depth_n_layers=2)
    vs = rq.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2), jnp.int32),
                 jnp.zeros((1, 1), jnp.int32))
    qvs = quantize_decode_params(vs)
    with pytest.raises(ValueError, match="RQTransformer"):
        drop_quantized_kernels(qvs)


def test_sample_without_logits():
    """with_logits=False: identical codes, None logits — drops the stacked
    (B, T, V) f32 logits from the decode scan (537 MB at flagship b16, the
    margin between one-chip fit and OOM)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhancing_tpu.models.stage2 import (GPT, RQTransformer, sample_gpt,
                                             sample_rq)

    m = GPT(vocab_cond_size=10, vocab_img_size=64, embed_dim=64,
            cond_num_tokens=1, img_num_tokens=8, n_heads=2, n_layers=2)
    conds = jnp.zeros((2, 1), jnp.int32)
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 8), jnp.int32), conds)
    lg, c1 = sample_gpt(m, vs, conds, jax.random.PRNGKey(1), top_k=4)
    none, c2 = sample_gpt(m, vs, conds, jax.random.PRNGKey(1), top_k=4,
                          with_logits=False)
    assert none is None and lg.shape == (2, 8, 64)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    rq = RQTransformer(vocab_cond_size=10, vocab_img_size=32, embed_dim=64,
                       cond_num_tokens=1, img_num_tokens=4,
                       depth_num_tokens=2, spatial_n_heads=2,
                       depth_n_heads=2, spatial_n_layers=1, depth_n_layers=1)
    vs2 = rq.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2), jnp.int32),
                  conds[:1])
    lg, r1 = sample_rq(rq, vs2, conds, jax.random.PRNGKey(2), top_k=4)
    none, r2 = sample_rq(rq, vs2, conds, jax.random.PRNGKey(2), top_k=4,
                         with_logits=False)
    assert none is None
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_w8a8_sampling():
    """act_int8=True (W8A8 serving: int8 activations + native int8 MXU
    dots): deterministic, shape-correct, and greedy codes mostly agree
    with the weights-only int8 sampler (activation quantization is the
    only numerics difference)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhancing_tpu.models.stage2 import (GPT, RQTransformer,
                                             drop_quantized_kernels,
                                             quantize_decode_params,
                                             sample_gpt, sample_rq)

    kw = dict(vocab_cond_size=10, vocab_img_size=256, embed_dim=128,
              cond_num_tokens=1, img_num_tokens=16, n_heads=4, n_layers=2)
    m = GPT(**kw)
    conds = jnp.zeros((4, 1), jnp.int32)
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((4, 16), jnp.int32), conds)
    dvs = drop_quantized_kernels(quantize_decode_params(vs))
    _, ref = sample_gpt(m, dvs, conds, jax.random.PRNGKey(1), top_k=1)

    m8 = GPT(**kw, act_int8=True, kv_int8=True)
    _, a = sample_gpt(m8, dvs, conds, jax.random.PRNGKey(1), top_k=1)
    _, b = sample_gpt(m8, dvs, conds, jax.random.PRNGKey(1), top_k=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == ref.shape
    assert float((a == ref).mean()) > 0.5

    rkw = dict(vocab_cond_size=10, vocab_img_size=64, embed_dim=128,
               cond_num_tokens=1, img_num_tokens=4, depth_num_tokens=2,
               spatial_n_heads=4, depth_n_heads=4, spatial_n_layers=2,
               depth_n_layers=2)
    rq = RQTransformer(**rkw)
    vs2 = rq.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2), jnp.int32),
                  conds[:1])
    qvs2 = quantize_decode_params(vs2)  # RQ keeps bf16 kernels (depth path)
    _, fr = sample_rq(rq, qvs2, conds, jax.random.PRNGKey(2), top_k=1)
    rq8 = RQTransformer(**rkw, act_int8=True)
    _, qr = sample_rq(rq8, qvs2, conds, jax.random.PRNGKey(2), top_k=1)
    assert qr.shape == fr.shape
    assert float((qr == fr).mean()) > 0.5


def test_int8_kv_cache_sampling():
    """kv_int8=True: int8 cache + per-row scales; greedy codes match the
    bf16-cache sampler exactly on this tiny model (per-row int8 keeps
    ~2 decimal digits — enough to preserve the argmax everywhere here)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enhancing_tpu.models.stage2 import GPT, RQTransformer, sample_gpt, \
        sample_rq
    from enhancing_tpu.models.stage2.batcher import ContinuousGPTBatcher

    kw = dict(vocab_cond_size=10, vocab_img_size=256, embed_dim=128,
              cond_num_tokens=1, img_num_tokens=16, n_heads=4, n_layers=2)
    m_bf = GPT(**kw)
    m_q8 = GPT(**kw, kv_int8=True)
    conds = jnp.zeros((4, 1), jnp.int32)
    vs = m_bf.init(jax.random.PRNGKey(0), jnp.zeros((4, 16), jnp.int32),
                   conds)
    cache = m_q8.apply(vs, 4, method="init_cache")
    assert cache["k"].dtype == jnp.int8 and "k_scale" in cache
    _, full = sample_gpt(m_bf, vs, conds, jax.random.PRNGKey(1), top_k=1)
    _, q8 = sample_gpt(m_q8, vs, conds, jax.random.PRNGKey(1), top_k=1)
    assert float((full == q8).mean()) > 0.9, (full, q8)

    rkw = dict(vocab_cond_size=10, vocab_img_size=64, embed_dim=128,
               cond_num_tokens=1, img_num_tokens=4, depth_num_tokens=2,
               spatial_n_heads=4, depth_n_heads=4, spatial_n_layers=2,
               depth_n_layers=2)
    rq_bf = RQTransformer(**rkw)
    rq_q8 = RQTransformer(**rkw, kv_int8=True)
    vs2 = rq_bf.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2), jnp.int32),
                     conds[:1])
    _, fr = sample_rq(rq_bf, vs2, conds, jax.random.PRNGKey(2), top_k=1)
    _, qr = sample_rq(rq_q8, vs2, conds, jax.random.PRNGKey(2), top_k=1)
    assert float((fr == qr).mean()) > 0.9

    # ragged continuous batching over the int8 pool
    b = ContinuousGPTBatcher(m_q8, vs, num_slots=2,
                             rng=jax.random.PRNGKey(3), top_k=4)
    b.submit(jnp.asarray([1], jnp.int32))
    b.submit(jnp.asarray([2], jnp.int32))
    done = b.run_until_done()
    assert len(done) == 2 and all(c.shape == (16,) for _, c in done)
