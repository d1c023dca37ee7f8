"""Native (libjpeg/libpng) decode pipeline vs the PIL reference path.

The C++ library (native/image_ops.cpp) replaces PIL in the loader hot path:
in-memory JPEG/PNG decode plus a thread-pool batch of
decode -> shorter-side resize -> crop -> flip -> normalize. PIL itself links
libjpeg, so JPEG decode parity is bit-exact; PNG is lossless by definition.
"""
import io

import numpy as np
import pytest

from enhancing_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.has_decoders(),
    reason="native lib built without libjpeg/libpng")


@pytest.fixture(scope="module")
def encoded(rng):
    from PIL import Image

    img = (rng.random((83, 57, 3)) * 255).astype(np.uint8)
    pil = Image.fromarray(img)
    jb = io.BytesIO()
    pil.save(jb, "JPEG", quality=92)
    pb = io.BytesIO()
    pil.save(pb, "PNG")
    return img, jb.getvalue(), pb.getvalue()


def test_png_decode_lossless(encoded):
    img, _, png = encoded
    np.testing.assert_array_equal(native.decode_image(png), img)


def test_jpeg_decode_matches_pil(encoded):
    from PIL import Image

    _, jpeg, _ = encoded
    got = native.decode_image(jpeg)
    want = np.asarray(Image.open(io.BytesIO(jpeg)).convert("RGB"))
    np.testing.assert_array_equal(got, want)  # both decode via libjpeg


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        native.decode_image(b"not an image at all")


def test_load_image_native_path(tmp_path, encoded):
    from enhancing_tpu.data.transforms import load_image

    img, jpeg, png = encoded
    p = tmp_path / "x.png"
    p.write_bytes(png)
    np.testing.assert_array_equal(load_image(str(p)), img)


def test_pipeline_batch_matches_reference_transforms(encoded):
    """The fused C++ batch == decode + transforms.resize + crop + flip +
    /255 done stepwise in numpy/PIL."""
    from enhancing_tpu.data import transforms as T

    img, jpeg, png = encoded
    blobs = [jpeg, png, jpeg, png]
    tops, lefts, flips = [1, 3, 0, 2], [2, 0, 1, 3], [0, 1, 1, 0]
    out, ok = native.decode_pipeline_batch(blobs, 48, 32, tops, lefts, flips)
    assert ok.all()
    for i, blob in enumerate(blobs):
        ref = native.decode_image(blob)      # same decoder; isolates resize+
        ref = native.resize_bilinear(
            ref, *((48, round(ref.shape[1] * 48 / ref.shape[0]))
                   if ref.shape[0] < ref.shape[1]
                   else (round(ref.shape[0] * 48 / ref.shape[1]), 48)))
        crop = ref[tops[i]:tops[i] + 32, lefts[i]:lefts[i] + 32]
        if flips[i]:
            crop = crop[:, ::-1]
        np.testing.assert_allclose(out[i], crop.astype(np.float32) / 255.0,
                                   atol=1e-6)


def test_pipeline_batch_flags_corrupt(encoded):
    _, jpeg, _ = encoded
    out, ok = native.decode_pipeline_batch(
        [b"garbage", jpeg, b"\xff\xd8truncated"], 48, 32,
        [0, 0, 0], [0, 0, 0], [0, 0, 0])
    assert list(ok) == [False, True, False]
    assert (out[0] == 0).all() and (out[2] == 0).all()
    assert (out[1] != 0).any()


def test_pipeline_batch_concurrent_callers(encoded):
    """Pool::run serializes whole batches: concurrent decode_pipeline_batch
    calls (DataLoader workers; ctypes drops the GIL) must each get a fully
    decoded, correct batch — no cross-batch counter clobbering, no
    uninitialized rows, no deadlock."""
    import concurrent.futures

    img, jpeg, png = encoded
    want_j = native.decode_image(jpeg)[3:35, 2:34].astype(np.float32) / 255.0
    want_p = img[1:33, 4:36].astype(np.float32) / 255.0

    def one(i):
        if i % 2:
            out, ok = native.decode_pipeline_batch(
                [jpeg] * 6, 0, 32, [3] * 6, [2] * 6, [0] * 6)
            want = want_j
        else:
            out, ok = native.decode_pipeline_batch(
                [png] * 6, 0, 32, [1] * 6, [4] * 6, [0] * 6)
            want = want_p
        assert ok.all()
        for row in out:
            np.testing.assert_allclose(row, want, atol=1e-6)

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(one, range(64), timeout=120))


def test_pipeline_batch_no_resize(encoded):
    img, _, png = encoded
    out, ok = native.decode_pipeline_batch([png], 0, 32, [4], [5], [0])
    assert ok.all()
    np.testing.assert_allclose(
        out[0], img[4:36, 5:37].astype(np.float32) / 255.0, atol=1e-6)
