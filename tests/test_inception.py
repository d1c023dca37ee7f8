"""Golden test for the flax InceptionV3-pool3 rFID trunk.

Builds a torch clone with torchvision's exact module naming (so its
state_dict has the exact key layout of the published FID weights), random
weights AND random BatchNorm running stats, loads that state_dict through
load_torch_inception, and demands matching 2048-d features — verifying conv
transposes, BN-from-running-stats, branch concat order, and every pooling
variant (incl. the pytorch-fid count_include_pad=False avg pools and the
max-pool branch of the final InceptionE).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from enhancing_tpu.eval.inception import (fid_feature_fn, init_inception,
                                          load_torch_inception)


class TBasic(tnn.Module):
    def __init__(self, i, o, k, s=1, p=0):
        super().__init__()
        self.conv = tnn.Conv2d(i, o, k, stride=s, padding=p, bias=False)
        self.bn = tnn.BatchNorm2d(o, eps=1e-3)

    def forward(self, x):
        return tF.relu(self.bn(self.conv(x)))


def _avg(x):
    return tF.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class TInceptionA(tnn.Module):
    def __init__(self, i, pool_features):
        super().__init__()
        self.branch1x1 = TBasic(i, 64, 1)
        self.branch5x5_1 = TBasic(i, 48, 1)
        self.branch5x5_2 = TBasic(48, 64, 5, p=2)
        self.branch3x3dbl_1 = TBasic(i, 64, 1)
        self.branch3x3dbl_2 = TBasic(64, 96, 3, p=1)
        self.branch3x3dbl_3 = TBasic(96, 96, 3, p=1)
        self.branch_pool = TBasic(i, pool_features, 1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg(x))], 1)


class TInceptionB(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = TBasic(i, 384, 3, s=2)
        self.branch3x3dbl_1 = TBasic(i, 64, 1)
        self.branch3x3dbl_2 = TBasic(64, 96, 3, p=1)
        self.branch3x3dbl_3 = TBasic(96, 96, 3, s=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            tF.max_pool2d(x, 3, 2)], 1)


class TInceptionC(tnn.Module):
    def __init__(self, i, c7):
        super().__init__()
        self.branch1x1 = TBasic(i, 192, 1)
        self.branch7x7_1 = TBasic(i, c7, 1)
        self.branch7x7_2 = TBasic(c7, c7, (1, 7), p=(0, 3))
        self.branch7x7_3 = TBasic(c7, 192, (7, 1), p=(3, 0))
        self.branch7x7dbl_1 = TBasic(i, c7, 1)
        self.branch7x7dbl_2 = TBasic(c7, c7, (7, 1), p=(3, 0))
        self.branch7x7dbl_3 = TBasic(c7, c7, (1, 7), p=(0, 3))
        self.branch7x7dbl_4 = TBasic(c7, c7, (7, 1), p=(3, 0))
        self.branch7x7dbl_5 = TBasic(c7, 192, (1, 7), p=(0, 3))
        self.branch_pool = TBasic(i, 192, 1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg(x))], 1)


class TInceptionD(tnn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = TBasic(i, 192, 1)
        self.branch3x3_2 = TBasic(192, 320, 3, s=2)
        self.branch7x7x3_1 = TBasic(i, 192, 1)
        self.branch7x7x3_2 = TBasic(192, 192, (1, 7), p=(0, 3))
        self.branch7x7x3_3 = TBasic(192, 192, (7, 1), p=(3, 0))
        self.branch7x7x3_4 = TBasic(192, 192, 3, s=2)

    def forward(self, x):
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3, self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([self.branch3x3_2(self.branch3x3_1(x)), b7,
                          tF.max_pool2d(x, 3, 2)], 1)


class TInceptionE(tnn.Module):
    def __init__(self, i, pool_kind):
        super().__init__()
        self.pool_kind = pool_kind
        self.branch1x1 = TBasic(i, 320, 1)
        self.branch3x3_1 = TBasic(i, 384, 1)
        self.branch3x3_2a = TBasic(384, 384, (1, 3), p=(0, 1))
        self.branch3x3_2b = TBasic(384, 384, (3, 1), p=(1, 0))
        self.branch3x3dbl_1 = TBasic(i, 448, 1)
        self.branch3x3dbl_2 = TBasic(448, 384, 3, p=1)
        self.branch3x3dbl_3a = TBasic(384, 384, (1, 3), p=(0, 1))
        self.branch3x3dbl_3b = TBasic(384, 384, (3, 1), p=(1, 0))
        self.branch_pool = TBasic(i, 192, 1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_kind == "max":
            bp = tF.max_pool2d(x, 3, 1, 1)
        else:
            bp = _avg(x)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class TInception(tnn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasic(3, 32, 3, s=2)
        self.Conv2d_2a_3x3 = TBasic(32, 32, 3)
        self.Conv2d_2b_3x3 = TBasic(32, 64, 3, p=1)
        self.Conv2d_3b_1x1 = TBasic(64, 80, 1)
        self.Conv2d_4a_3x3 = TBasic(80, 192, 3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, "avg")
        self.Mixed_7c = TInceptionE(2048, "max")

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = tF.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = tF.max_pool2d(x, 3, 2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))


@pytest.fixture(scope="module")
def torch_inception():
    torch.manual_seed(0)
    model = TInception().eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.mul_(0.1)
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.05)
    return model


def test_inception_pool3_golden(torch_inception, rng):
    module, params = init_inception(jax.random.PRNGKey(0))
    params = load_torch_inception(torch_inception.state_dict(), params)

    x = rng.random((2, 96, 96, 3)).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = torch_inception(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = module.apply({"params": params}, jnp.asarray(x))
    assert ours.shape == (2, 2048)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-3, atol=2e-4)


def test_inception_loader_rejects_incomplete(torch_inception):
    module, params = init_inception(jax.random.PRNGKey(0))
    sd = torch_inception.state_dict()
    sd.pop("Mixed_7c.branch_pool.conv.weight")
    with pytest.raises(ValueError, match="unfilled"):
        load_torch_inception(sd, params)


def test_fid_feature_fn_and_frechet(torch_inception, rng):
    """End-to-end rFID pipeline on fake images: resize->scale->features->FD."""
    from enhancing_tpu.eval import FrechetDistance
    module, params = init_inception(jax.random.PRNGKey(0))
    params = load_torch_inception(torch_inception.state_dict(), params)
    fn = fid_feature_fn(module, params)

    real = rng.random((4, 64, 64, 3)).astype(np.float32)
    fake = rng.random((4, 64, 64, 3)).astype(np.float32) * 0.5
    fd = FrechetDistance(fn)
    fd.update_real(jnp.asarray(real))
    fd.update_fake(jnp.asarray(fake))
    val = fd.compute()
    assert np.isfinite(val) and val > 0

    fd2 = FrechetDistance(fn)
    fd2.update_real(jnp.asarray(real))
    fd2.update_fake(jnp.asarray(real))
    assert abs(fd2.compute()) < 1e-3  # identical distributions -> ~0
