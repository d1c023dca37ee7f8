"""Schedulers vs reference semantics, eval metrics, optimizer masks, profiler."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhancing_tpu.train.optim import (
    ExponentialDecayScheduler,
    LambdaWarmUpCosineScheduler,
    LambdaWarmUpLinearScheduler,
    gpt_decay_mask,
)


def test_warmup_cosine_matches_reference_semantics():
    """Golden numpy re-derivation of reference scheduler.py:45-66."""
    s = LambdaWarmUpCosineScheduler(warm_up_steps=10, max_decay_steps=100,
                                    min_=0.1, max_=1.0, start=0.5)
    for n in [0, 5, 9, 10, 50, 100, 150]:
        if n < 10:
            expected = ((1.0 - 0.5) / 10 * n + 0.5) / 0.5
        else:
            t = min((n - 10) / 90, 1.0)
            expected = (0.1 + 0.5 * 0.9 * (1 + np.cos(t * np.pi))) / 0.5
        np.testing.assert_allclose(float(s.schedule(n)), expected, atol=1e-5)


def test_warmup_linear():
    s = LambdaWarmUpLinearScheduler(warm_up_steps=10, max_decay_steps=100,
                                    min_=0.0, max_=1.0, start=0.5)
    assert float(s.schedule(0)) == 1.0  # 0.5/0.5
    np.testing.assert_allclose(float(s.schedule(100)), 0.0, atol=1e-6)


def test_exponential_decay_piecewise():
    s = ExponentialDecayScheduler(start=1.0, end=0.01, decay_every_step=10,
                                  scale_factor=0.1)
    # constant within a decay window
    np.testing.assert_allclose(float(s.schedule(10)), float(s.schedule(19)),
                               atol=1e-7)
    assert float(s.schedule(20)) < float(s.schedule(10))
    # floors at end
    np.testing.assert_allclose(float(s.schedule(10_000)), 0.01, atol=1e-6)


def test_gpt_decay_mask():
    from enhancing_tpu.models.stage2 import GPT
    m = GPT(vocab_cond_size=4, vocab_img_size=16, embed_dim=32,
            cond_num_tokens=1, img_num_tokens=8, n_heads=2, n_layers=1)
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                jnp.zeros((1, 1), jnp.int32))
    mask = gpt_decay_mask(vs["params"])
    # decayed: Linear kernels
    assert mask["blocks"]["attn"]["query"]["kernel"] is True
    assert mask["blocks"]["mlp"]["p0"]["kernel"] is True
    assert mask["head"]["kernel"] is True
    # not decayed: biases, LN, embeddings, pos embeds, time_mix (RWKV)
    assert mask["blocks"]["attn"]["query"]["bias"] is False
    assert mask["blocks"]["ln1"]["scale"] is False
    assert mask["tok_emb_code"]["embedding"] is False
    assert mask["pos_emb_code"] is False
    assert mask["blocks"]["attn"]["time_mix"] is False


def test_psnr_ssim():
    from enhancing_tpu.eval import psnr, ssim
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    assert float(psnr(x, x).min()) > 100
    np.testing.assert_allclose(np.asarray(ssim(x, x)), 1.0, atol=1e-4)
    y = jnp.clip(x + 0.1, 0, 1)
    assert float(psnr(x, y).max()) < 30
    assert float(ssim(x, y).max()) < 1.0


def test_frechet_distance():
    from enhancing_tpu.eval import FrechetDistance
    rng = np.random.default_rng(0)
    fd = FrechetDistance(lambda im: jnp.asarray(im).reshape(len(im), -1))
    a = rng.standard_normal((256, 8)).astype(np.float32)
    b = rng.standard_normal((256, 8)).astype(np.float32) + 2.0
    fd.update_real(a)
    fd.update_fake(a)
    same = fd.compute()
    fd2 = FrechetDistance(lambda im: jnp.asarray(im).reshape(len(im), -1))
    fd2.update_real(a)
    fd2.update_fake(b)
    diff = fd2.compute()
    assert same < 0.5 and diff > 10  # mean shift of 2 in 8 dims -> fd ~ 32


def test_codebook_usage():
    from enhancing_tpu.eval import codebook_usage
    codes = np.asarray([0, 0, 1, 2, 3, 3, 3, 3])
    u = codebook_usage(codes, n_embed=8)
    assert u["n_used"] == 4
    assert u["usage"] == 0.5
    assert 1.0 < u["perplexity"] <= 4.0


def test_step_timer():
    from enhancing_tpu.train.profiler import StepTimer
    t = StepTimer(window=4, batch_size=8)
    for _ in range(6):
        t.tick()
    assert t.steps_per_sec > 0
    assert "images/s" in t.summary()


def test_compilation_cache_round_trip(tmp_path):
    """enable_compilation_cache writes reusable executables to disk."""
    import jax
    import jax.numpy as jnp

    from enhancing_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache(tmp_path)
    try:
        @jax.jit
        def f(x):
            return jnp.tanh(x) @ x.T

        f(jnp.ones((16, 16))).block_until_ready()
        assert any(tmp_path.iterdir()), "no cache entry written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_compile_cache_env_gate(tmp_path, monkeypatch):
    import jax

    from enhancing_tpu.utils.compile_cache import (ENV_VAR,
                                                   maybe_enable_from_env)

    monkeypatch.delenv(ENV_VAR, raising=False)
    assert maybe_enable_from_env() is None
    monkeypatch.setenv(ENV_VAR, str(tmp_path))
    try:
        assert maybe_enable_from_env() == str(tmp_path)
        # set-but-empty is the explicit OFF switch, overriding any default
        monkeypatch.setenv(ENV_VAR, "")
        assert maybe_enable_from_env(default=tmp_path / "dflt") is None
        assert not (tmp_path / "dflt").exists()
        # unset + default => default applies
        monkeypatch.delenv(ENV_VAR)
        assert maybe_enable_from_env(
            default=tmp_path / "dflt") == str(tmp_path / "dflt")
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
