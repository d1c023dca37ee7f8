"""Losses: GAN fns vs torch semantics, StyleGAN discriminator, upfirdn2d,
fused leaky relu, LPIPS structure, composite losses, R1."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhancing_tpu.losses import (
    LPIPS,
    PatchDiscriminator,
    StyleDiscriminator,
    hinge_d_loss,
    least_square_d_loss,
    minibatch_stddev,
    vanilla_d_loss,
)
from enhancing_tpu.losses.vqperceptual import VQLPIPSWithDiscriminator
from enhancing_tpu.ops.fused_act import _fused_xla, fused_leaky_relu
from enhancing_tpu.ops.upfirdn2d import (
    _upfirdn2d_pallas_fir,
    _upfirdn2d_xla,
    make_blur_kernel,
    upfirdn2d,
)


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    monkeypatch.setenv("ENHANCING_TPU_PALLAS_INTERPRET", "1")


def test_gan_losses_match_torch(rng):
    import torch
    import torch.nn.functional as F
    lf = torch.from_numpy(rng.standard_normal(16).astype(np.float32))
    lr = torch.from_numpy(rng.standard_normal(16).astype(np.float32))
    jf, jr = jnp.asarray(lf.numpy()), jnp.asarray(lr.numpy())

    # discriminator mode
    t = 0.5 * (F.relu(1. + lf).mean() + F.relu(1. - lr).mean())
    np.testing.assert_allclose(float(hinge_d_loss(jf, jr)), float(t), atol=1e-6)
    t = 0.5 * (F.softplus(lf).mean() + F.softplus(-lr).mean())
    np.testing.assert_allclose(float(vanilla_d_loss(jf, jr)), float(t), atol=1e-6)
    t = 0.5 * ((1 + lf).pow(2).mean() + (1 - lr).pow(2).mean())
    np.testing.assert_allclose(float(least_square_d_loss(jf, jr)), float(t),
                               atol=1e-6)

    # generator mode
    t = 0.5 * (-lf.mean() * 2)
    np.testing.assert_allclose(float(hinge_d_loss(jf)), float(t), atol=1e-6)
    t = 0.5 * (F.softplus(-lf).mean() * 2)
    np.testing.assert_allclose(float(vanilla_d_loss(jf)), float(t), atol=1e-6)


def test_upfirdn2d_matches_torch_native(rng):
    """vs an independent torch implementation of upsample-pad-conv-downsample."""
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    k = np.asarray(make_blur_kernel([1, 3, 3, 1]))

    def torch_upfirdn(x_nhwc, kernel, up, down, pad):
        # direct re-derivation of the upfirdn semantics
        t = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2))
        b, c, h, w = t.shape
        t = t.reshape(b * c, 1, h, w)
        if up > 1:
            z = torch.zeros(b * c, 1, h, up, w, up)
            z[:, :, :, 0, :, 0] = t.reshape(b * c, 1, h, 1, w, 1)[:, :, :, 0, :, 0]
            t = z.reshape(b * c, 1, h * up, w * up)
        t = F.pad(t, (pad[0], pad[1], pad[2], pad[3]))
        w_ = torch.from_numpy(np.flip(kernel, (0, 1)).copy())[None, None]
        t = F.conv2d(t, w_)
        t = t[:, :, ::down, ::down]
        oh, ow = t.shape[2], t.shape[3]
        return t.reshape(b, c, oh, ow).numpy().transpose(0, 2, 3, 1)

    for up, down, pad in [(1, 1, (2, 1, 2, 1)), (1, 2, (1, 1, 1, 1)),
                          (2, 1, (2, 1, 2, 1)), (1, 1, (0, 0, 0, 0))]:
        ref = torch_upfirdn(x, k, up, down, pad)
        ours = np.asarray(_upfirdn2d_xla(jnp.asarray(x), jnp.asarray(k),
                                         up, down, pad))
        np.testing.assert_allclose(ours, ref, atol=1e-5,
                                   err_msg=f"up={up} down={down} pad={pad}")


def test_upfirdn2d_pallas_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)), jnp.float32)
    k = make_blur_kernel([1, 3, 3, 1])
    pad = (2, 1, 2, 1)
    ref = _upfirdn2d_xla(x, k, 1, 1, pad)
    taps = tuple(tuple(float(v) for v in row)
                 for row in np.flip(np.asarray(k), (0, 1)))
    out = _upfirdn2d_pallas_fir(x, taps, pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_leaky_relu(rng):
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(16), jnp.float32)
    ref = _fused_xla(x, b, 0.2, 2**0.5)
    out = fused_leaky_relu(x, b, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    # grad of sum: d/dx = scale * (1 or slope)
    g = jax.grad(lambda x: jnp.sum(fused_leaky_relu(x, b, impl="xla")))(x)
    t = np.asarray(x) + np.asarray(b)
    expected = np.where(t >= 0, 2**0.5, 0.2 * 2**0.5)
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-6)


def test_fused_leaky_relu_bf16_pallas(rng, monkeypatch):
    """bf16 inputs through the Pallas kernel (interpret): the sign predicate
    must be computed in f32 — Mosaic rejects bf16 comparisons on v5e."""
    monkeypatch.setenv("ENHANCING_TPU_PALLAS_INTERPRET", "1")
    x = jnp.asarray(rng.standard_normal((16, 8, 8, 16)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(16), jnp.float32)
    ref = _fused_xla(x, b, 0.2, 2**0.5)
    out = fused_leaky_relu(x, b, impl="pallas")
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=1e-2)


def test_style_discriminator_bf16(rng):
    """Mixed-precision D (disc_params dtype=bfloat16): fwd + grads finite,
    logits track the f32 tower loosely — the AMP analogue of the
    reference's `-a` flag (reference main.py precision=16)."""
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    d32 = StyleDiscriminator(size=32)
    vs = d32.init(jax.random.PRNGKey(0), x)
    d16 = StyleDiscriminator(size=32, dtype=jnp.bfloat16)
    l32 = d32.apply(vs, x)
    l16 = d16.apply(vs, x)
    np.testing.assert_allclose(np.asarray(l16, np.float32),
                               np.asarray(l32, np.float32),
                               atol=0.15, rtol=0.1)
    g = jax.grad(lambda p: jnp.sum(d16.apply(p, x)))(vs)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()


def test_minibatch_stddev(rng):
    x = jnp.asarray(rng.standard_normal((4, 4, 4, 8)), jnp.float32)
    out = minibatch_stddev(x)
    assert out.shape == (4, 4, 4, 9)
    # constant input across batch -> stddev channel ~ 0 (plus eps)
    xc = jnp.ones((4, 4, 4, 8))
    out_c = minibatch_stddev(xc)
    assert float(out_c[..., -1].max()) < 1e-3


def test_style_discriminator(rng):
    d = StyleDiscriminator(size=32)
    x = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
    vs = d.init(jax.random.PRNGKey(0), x)
    logits = d.apply(vs, x)
    assert logits.shape == (4,)
    assert np.isfinite(np.asarray(logits)).all()


def test_patch_discriminator(rng):
    d = PatchDiscriminator(n_layers=2)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    vs = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(vs, x)
    assert out.ndim == 4 and out.shape[-1] == 1


def test_lpips_structure(rng):
    m = LPIPS()
    x = jnp.asarray(rng.random((2, 32, 32, 3)) * 2 - 1, jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), x, x)
    # identical inputs -> zero distance
    d0 = m.apply(vs, x, x)
    np.testing.assert_allclose(np.asarray(d0), 0.0, atol=1e-6)
    y = jnp.asarray(rng.random((2, 32, 32, 3)) * 2 - 1, jnp.float32)
    d1 = m.apply(vs, x, y)
    assert d1.shape == (2,)


def test_vgg16_param_count():
    """13 convs with torchvision vgg16 channel plan."""
    from enhancing_tpu.losses import VGG16Features
    m = VGG16Features()
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    convs = list(vs["params"].keys())
    assert len(convs) == 13
    assert vs["params"]["conv1_1"]["kernel"].shape == (3, 3, 3, 64)
    assert vs["params"]["conv5_3"]["kernel"].shape == (3, 3, 512, 512)


@pytest.fixture(scope="module")
def vq_disc_loss():
    return VQLPIPSWithDiscriminator(image_size=32, disc_loss="vanilla",
                                    adversarial_weight=0.1)


def test_random_lpips_refuses_to_train(vq_disc_loss):
    """perceptual_weight > 0 without lpips_weights: constructable (eval-only
    paths keep working) but check_trainable — called by Trainer before
    building stage-1 steps — raises unless allow_random_lpips opts in."""
    assert vq_disc_loss.lpips_is_random
    with pytest.raises(ValueError, match="allow_random_lpips"):
        vq_disc_loss.check_trainable()
    ok = VQLPIPSWithDiscriminator(image_size=32, perceptual_weight=0.5,
                                  allow_random_lpips=True)
    ok.check_trainable()
    off = VQLPIPSWithDiscriminator(image_size=32, perceptual_weight=0.0)
    assert not off.lpips_is_random
    off.check_trainable()


def test_trainer_refuses_random_lpips_config(tmp_path):
    """End to end: a Trainer.fit-bound build on a shipped-style config
    (perceptual_weight 0.1, no weights) fails loudly at step-build time."""
    from enhancing_tpu.models.stage1.vitvqgan import ViTVQ
    from enhancing_tpu.train import Trainer

    tiny = dict(dim=32, depth=1, heads=2, mlp_dim=64)
    model = ViTVQ(
        image_size=16, patch_size=8, encoder=tiny, decoder=tiny,
        quantizer=dict(embed_dim=8, n_embed=32),
        loss={"target":
              "enhancing_tpu.losses.vqperceptual.VQLPIPSWithDiscriminator",
              "params": {"image_size": 16, "perceptual_weight": 0.1,
                         "adversarial_weight": 0.1}})
    trainer = Trainer(max_epochs=1, base_lr=1e-4, max_steps=1)
    with pytest.raises(ValueError, match="allow_random_lpips"):
        trainer._build_stage1(model)


def test_generator_and_disc_losses(vq_disc_loss, rng):
    loss_obj = vq_disc_loss
    x = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
    xrec = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
    qloss = jnp.float32(0.1)

    g, log = loss_obj.generator_loss(qloss, x, xrec,
                                     loss_obj.disc_init_params, 1.0)
    assert np.isfinite(float(g))
    assert "train/g_loss" in log and "train/rec_loss" in log

    d, dlog = loss_obj.discriminator_loss(loss_obj.disc_init_params, x, xrec,
                                          1.0, do_r1=False)
    assert np.isfinite(float(d))

    # disc_factor gates the loss (warmup): factor 0 -> loss exactly 0
    d0, _ = loss_obj.discriminator_loss(loss_obj.disc_init_params, x, xrec,
                                        0.0, do_r1=False)
    np.testing.assert_allclose(float(d0), 0.0, atol=1e-7)


def test_r1_penalty(vq_disc_loss, rng):
    loss_obj = vq_disc_loss
    x = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
    xrec = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
    d_plain, _ = loss_obj.discriminator_loss(loss_obj.disc_init_params, x,
                                             xrec, 1.0, do_r1=False)
    d_r1, log = loss_obj.discriminator_loss(loss_obj.disc_init_params, x,
                                            xrec, 1.0, do_r1=True)
    assert "train/r1_reg" in log
    assert float(log["train/r1_reg"]) > 0
    assert float(d_r1) > float(d_plain)


def test_lpips_loader_golden_vs_torch(tmp_path, rng):
    """Synthesize a checkpoint with the EXACT torchvision/lpips key layout
    (features.{0,2,5,...}.weight + lin{i}.model.1.weight), load it through
    load_torch_lpips, and demand the flax LPIPS value match a torch clone of
    the lpips-package forward (unit-normalize -> sq diff -> 1x1 lin ->
    spatial mean -> sum over 5 stages)."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF
    from enhancing_tpu.losses.lpips import _SCALE, _SHIFT, init_lpips

    torch.manual_seed(0)
    # torchvision vgg16.features layout: convs at 0,2,5,7,10,12,14,17,19,21,
    # 24,26,28 with ReLU after each and MaxPool at 4,9,16,23,30
    plan = [(3, 64), (64, 64), "M", (64, 128), (128, 128), "M",
            (128, 256), (256, 256), (256, 256), "M",
            (256, 512), (512, 512), (512, 512), "M",
            (512, 512), (512, 512), (512, 512), "M"]
    layers = []
    for p in plan:
        if p == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(p[0], p[1], 3, padding=1))
            layers.append(tnn.ReLU())
    features = tnn.Sequential(*layers).eval()
    # scale weights down so deep activations stay well-conditioned
    with torch.no_grad():
        for m in features:
            if isinstance(m, tnn.Conv2d):
                m.weight.mul_(0.05)
                m.bias.mul_(0.05)
    lins = [torch.rand(1, c, 1, 1) * 0.1 for c in (64, 128, 256, 512, 512)]

    sd = {f"features.{i}.{p}": t.detach().clone()
          for i, m in enumerate(features) if isinstance(m, tnn.Conv2d)
          for p, t in (("weight", m.weight), ("bias", m.bias))}
    sd.update({f"lin{i}.model.1.weight": w for i, w in enumerate(lins)})
    path = tmp_path / "lpips.pth"
    torch.save(sd, path)

    def torch_lpips(x, y):  # NCHW in [-1, 1]
        shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(_SCALE).view(1, 3, 1, 1)
        stage_idx = [3, 8, 15, 22, 29]

        def stages(t):
            outs = []
            for i, m in enumerate(features):
                t = m(t)
                if i in stage_idx:
                    outs.append(t)
            return outs

        total = 0.0
        for i, (a, b) in enumerate(zip(stages((x - shift) / scale),
                                       stages((y - shift) / scale))):
            a = a / (a.norm(dim=1, keepdim=True) + 1e-10)
            b = b / (b.norm(dim=1, keepdim=True) + 1e-10)
            val = tF.conv2d((a - b) ** 2, lins[i])
            total = total + val.mean(dim=(1, 2, 3))
        return total

    x = (rng.random((2, 64, 64, 3)).astype(np.float32) - 0.5) * 2
    y = (rng.random((2, 64, 64, 3)).astype(np.float32) - 0.5) * 2
    with torch.no_grad():
        ref = torch_lpips(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          torch.from_numpy(y.transpose(0, 3, 1, 2)))

    module, params = init_lpips(jax.random.PRNGKey(0), image_size=64,
                                weights_path=str(path))
    ours = module.apply({"params": params}, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_r1_chunked_matches_unchunked(rng):
    """r1_chunk sub-batches the gradient penalty (rematerialized lax.map)
    in units of whole minibatch-stddev groups: identical loss AND identical
    second-order disc grads to the one-shot R1 — purely a memory knob.
    b=8 has two STRIDED stddev groups ({0,2,4,6} and {1,3,5,7}); chunk=4
    maps over them one group at a time."""
    x = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    xrec = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    whole = VQLPIPSWithDiscriminator(image_size=32, disc_loss="vanilla",
                                     adversarial_weight=0.1)
    chunked = VQLPIPSWithDiscriminator(image_size=32, disc_loss="vanilla",
                                       adversarial_weight=0.1, r1_chunk=4)
    # same D params on both objects (seeded identically)
    dp = whole.disc_init_params

    def d_loss(obj):
        def f(params):
            loss, _ = obj.discriminator_loss(params, x, xrec, 1.0,
                                             do_r1=True)
            return loss
        return f

    l_w, g_w = jax.value_and_grad(d_loss(whole))(dp)
    l_c, g_c = jax.value_and_grad(d_loss(chunked))(dp)
    np.testing.assert_allclose(float(l_c), float(l_w), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_c), jax.tree.leaves(g_w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_r1_chunk_misaligned_raises(rng):
    """Chunks that cut through a minibatch-stddev group compute a DIFFERENT
    function than the full batch (the stddev channel couples images within
    a group) — misaligned r1_chunk raises instead of silently diverging or
    silently falling back to the whole-batch (OOM-prone) path."""
    x = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    xrec = jnp.asarray(rng.random((8, 32, 32, 3)), jnp.float32)
    for bad_chunk in (2, 3):  # 2: cuts groups of 4; 3: doesn't divide b=8
        loss = VQLPIPSWithDiscriminator(image_size=32, disc_loss="vanilla",
                                        adversarial_weight=0.1,
                                        r1_chunk=bad_chunk)
        with pytest.raises(ValueError, match="r1_chunk"):
            loss.discriminator_loss(loss.disc_init_params, x, xrec, 1.0,
                                    do_r1=True)
