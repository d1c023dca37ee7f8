"""Condition encoders: Dummy/Text/Class, VQCond, VQSegmentation, CLIP gating."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhancing_tpu.models.cond import ClassCond, DummyCond, VQCond, VQSegmentation


def test_dummy_cond_identity():
    d = DummyCond()
    x = np.arange(5)
    assert (d.encode_codes(x) == x).all()
    assert (d.decode_codes(x) == x).all()
    enc, _, codes = d.encode(x)
    assert (enc == x).all() and (codes == x).all()


def test_class_cond_renders():
    c = ClassCond(image_size=32, class_name=["cat", "dog"])
    assert c.num_classes == 2
    imgs = c.to_img(np.asarray([0, 1]))
    assert imgs.shape == (2, 32, 32, 3)
    assert imgs.min() >= 0 and imgs.max() <= 1
    # identity encode
    assert (c.encode_codes(np.asarray([1, 0])) == [1, 0]).all()


def test_class_cond_from_file(tmp_path):
    f = tmp_path / "classes.txt"
    f.write_text("a\nb\nc")
    c = ClassCond(image_size=16, class_name=str(f))
    assert c.num_classes == 3


def test_vqcond_wraps_model():
    m = VQCond("enhancing_tpu.models.stage1.vitvqgan.ViTVQ",
               image_size=16, patch_size=8,
               encoder=dict(dim=16, depth=1, heads=1, mlp_dim=16),
               decoder=dict(dim=16, depth=1, heads=1, mlp_dim=16),
               quantizer=dict(embed_dim=8, n_embed=16))
    x = np.random.rand(1, 16, 16, 3).astype(np.float32)
    codes = m.encode_codes(x)
    assert codes.shape == (1, 4)
    out = m.to_img(np.asarray([[2.0, -1.0]]))
    assert out.min() >= 0 and out.max() <= 1


def test_vqsegmentation():
    n_labels = 8
    m = VQSegmentation(
        "enhancing_tpu.models.stage1.vitvqgan.ViTVQ", n_labels,
        image_size=16, patch_size=8,
        encoder=dict(dim=16, depth=1, heads=1, mlp_dim=16, channels=n_labels),
        decoder=dict(dim=16, depth=1, heads=1, mlp_dim=16, channels=n_labels),
        quantizer=dict(embed_dim=8, n_embed=16))
    seg = np.eye(n_labels, dtype=np.float32)[
        np.random.randint(0, n_labels, (2, 16, 16))]
    rec, qloss = m(seg)
    assert np.asarray(rec).shape == (2, 16, 16, n_labels)
    logs = m.log_images({"image": seg})
    assert logs["inputs"].shape[-1] == 3  # colorized
    assert logs["reconstructions"].shape[-1] == 3


def test_clip_cond_gated():
    from enhancing_tpu.models.cond.clipcond import ClipImageCond
    with pytest.raises(RuntimeError, match="no network egress"):
        ClipImageCond(clip_model="ViT-B/32")


def test_lsun_gated_without_lmdb(tmp_path):
    from enhancing_tpu.data.lsun import LSUNTrain
    with pytest.raises(ImportError, match="lmdb"):
        LSUNTrain(root=str(tmp_path))
