"""Data layer: loader, transforms, datasets, tokenizer, native ops."""
import os
from pathlib import Path

import numpy as np
import pytest

from enhancing_tpu.data import DataLoader, DataModuleFromConfig, FakeImages
from enhancing_tpu.data.transforms import (
    EvalTransform,
    TrainTransform,
    center_crop,
    resize,
)

REPO_ROOT = Path(__file__).resolve().parents[1]
REF_VOCAB = str(REPO_ROOT / "assets/vocab/bpe_simple_vocab_16e6.txt.gz")


def test_fake_dataset_deterministic():
    ds = FakeImages(length=8, resolution=16)
    a, b = ds[3], ds[3]
    np.testing.assert_array_equal(a["image"], b["image"])
    assert a["image"].shape == (16, 16, 3)
    assert a["image"].dtype == np.float32


def test_dataloader_batching_and_order():
    ds = FakeImages(length=20, resolution=8)
    dl = DataLoader(ds, batch_size=4, shuffle=False, num_workers=3)
    batches = list(dl)
    assert len(batches) == 5
    assert batches[0]["image"].shape == (4, 8, 8, 3)
    # deterministic order without shuffle
    np.testing.assert_array_equal(batches[0]["image"][0], ds[0]["image"])
    np.testing.assert_array_equal(batches[2]["image"][1], ds[9]["image"])


def test_dataloader_shuffle_differs_per_epoch():
    ds = FakeImages(length=16, resolution=8)
    dl = DataLoader(ds, batch_size=16, shuffle=True, num_workers=2)
    e1 = next(iter(dl))["class"]
    e2 = next(iter(dl))["class"]
    assert (np.asarray(e1) != np.asarray(e2)).any()


def test_dataloader_propagates_worker_errors():
    class Bad(FakeImages):
        def __getitem__(self, idx):
            raise ValueError("boom")
    dl = DataLoader(Bad(length=4, resolution=8), batch_size=2, num_workers=1)
    with pytest.raises(ValueError, match="boom"):
        list(dl)


def test_datamodule_from_config():
    dm = DataModuleFromConfig(
        batch_size=4,
        train={"target": "enhancing_tpu.data.fake.FakeImages",
               "params": {"length": 8, "resolution": 8}},
        validation={"target": "enhancing_tpu.data.fake.FakeImages",
                    "params": {"length": 4, "resolution": 8}})
    dm.setup()
    assert len(list(dm.train_dataloader())) == 2
    assert len(list(dm.val_dataloader())) == 1


def test_transforms_shapes(rng):
    img = (rng.random((300, 400, 3)) * 255).astype(np.uint8)
    t = TrainTransform(64)(img)
    assert t.shape == (64, 64, 3) and t.dtype == np.float32
    assert 0.0 <= t.min() and t.max() <= 1.0
    e = EvalTransform(64)(img)
    assert e.shape == (64, 64, 3)
    # resize keeps aspect: shorter side = target
    r = resize(img, 64)
    assert min(r.shape[:2]) == 64 and max(r.shape[:2]) == 85


def test_classimage_folder(tmp_path, rng):
    from PIL import Image
    from enhancing_tpu.data.classimage import ClassImageTrain
    for cls in ["cat", "dog"]:
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    ds = ClassImageTrain(root=str(tmp_path), resolution=32)
    assert len(ds) == 6
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["class"] in (0, 1)
    assert ds.classes == ["cat", "dog"]


@pytest.mark.skipif(not os.path.exists(REF_VOCAB),
                    reason="CLIP vocab data file not present")
def test_clip_tokenizer_roundtrip():
    from enhancing_tpu.utils.tokenizer import SimpleTokenizer
    tok = SimpleTokenizer(bpe_path=REF_VOCAB)
    assert tok.vocab_size == 49408
    text = "a photo of a cat sitting on a mat"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    # bare caption tokens, no SOT/EOT wrapping (reference tokenizer.py:136-151)
    arr = tok.tokenize(text, context_length=77)
    assert arr.shape == (77,)
    assert arr[0] == ids[0]
    assert tok.encoder["<|startoftext|>"] not in arr.tolist()
    # batch form
    arr2 = tok.tokenize([text, "dog"], context_length=16, truncate_text=True)
    assert arr2.shape == (2, 16)


GOLDEN_TEXTS = [
    "a photo of a cat sitting on a mat",
    "route 66, the year 1984 and 3.14159 pies",
    "snake_case_words and CamelCase MIXED with UPPER",
    "punctuation!!! ... ??? -- (parentheses) [brackets] {braces}",
    "it's we've they'll i'm you're he'd don't",
    "unicode: café naïve Zürich 東京 emoji 🎉 done",
    "digits2words34mix5 a1b2c3",
]


@pytest.mark.skipif(not os.path.exists(REF_VOCAB),
                    reason="CLIP vocab data file not present")
def test_clip_tokenizer_digit_splitting():
    """CLIP splits digits per-character; letters-only runs stay whole."""
    from enhancing_tpu.utils.tokenizer import SimpleTokenizer
    tok = SimpleTokenizer(bpe_path=REF_VOCAB)
    words = [m for m in tok.pat.findall("year 1984 ok")]
    assert words == ["year", "1", "9", "8", "4", "ok"]
    # '_' is not a letter: snake_case splits on the underscore
    assert tok.pat.findall("a_b") == ["a", "_", "b"]


def test_fix_mojibake_golden():
    """Vendored ftfy-equivalent recovers cp1252/latin-1 mojibake captions."""
    from enhancing_tpu.utils.tokenizer import basic_clean, fix_mojibake

    clean = "The Müller residence — a façade in Zürich café"
    mojibake_cp1252 = clean.encode("utf-8").decode("cp1252")
    mojibake_latin1 = clean.encode("utf-8").decode("latin-1")
    assert mojibake_cp1252 != clean  # e.g. 'Ã©' style garbage
    assert fix_mojibake(mojibake_cp1252) == clean
    assert fix_mojibake(mojibake_latin1) == clean
    # double-encoded (mojibake of mojibake) recovers via iteration
    double = clean.encode("utf-8").decode("latin-1") \
        .encode("utf-8").decode("latin-1")
    assert fix_mojibake(double) == clean
    # already-clean text is untouched: ASCII and legit accents/CJK/emoji
    for text in ["a photo of a cat", clean, "東京 🎉 naïve"]:
        assert fix_mojibake(text) == text
    # wired into the cleaning pipeline the reference runs before BPE
    assert basic_clean("  " + mojibake_cp1252 + "  ") == clean


def _load_reference_tokenizer():
    """File-spec import of the actual reference tokenizer (ftfy stubbed)."""
    import importlib.util
    import sys
    import types

    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda t: t
        sys.modules["ftfy"] = stub
    spec = importlib.util.spec_from_file_location(
        "_ref_tokenizer", "/root/reference/enhancing/utils/tokenizer.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(
    not os.path.exists("/root/reference/enhancing/utils/tokenizer.py"),
    reason="reference checkout not present")
def test_clip_tokenizer_golden_vs_reference():
    """Token IDs match the ACTUAL reference tokenizer on digit/punct fixtures."""
    import gzip
    import shutil
    import tempfile

    from enhancing_tpu.utils.tokenizer import SimpleTokenizer

    ref_mod = _load_reference_tokenizer()
    with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as f:
        with gzip.open(REF_VOCAB, "rb") as g:
            shutil.copyfileobj(g, f)
        plain_vocab = f.name
    try:
        ref = ref_mod.SimpleTokenizer(bpe_path=plain_vocab, text_length=77)
        ours = SimpleTokenizer(bpe_path=REF_VOCAB, text_length=77)
        for text in GOLDEN_TEXTS:
            ref_ids = ref.encode(text)
            our_ids = ours.encode(text)
            assert our_ids == ref_ids, text
            ref_mat = ref.tokenize([text]).numpy()
            our_mat = ours.tokenize([text])
            np.testing.assert_array_equal(our_mat, ref_mat.astype(np.int32))
    finally:
        os.unlink(plain_vocab)


def test_textimage_dataset(tmp_path, rng):
    from PIL import Image
    if not os.path.exists(REF_VOCAB):
        pytest.skip("vocab file missing")
    from enhancing_tpu.data.textimage import TextImageTrain
    for i in range(3):
        arr = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"s{i}.png")
        (tmp_path / f"s{i}.txt").write_text(f"sample caption {i}")
    ds = TextImageTrain(root=str(tmp_path), resolution=32,
                        tokenizer={"target":
                                   "enhancing_tpu.utils.tokenizer.SimpleTokenizer",
                                   "params": {"bpe_path": REF_VOCAB}})
    assert len(ds) == 3
    s = ds[1]
    assert s["image"].shape == (32, 32, 3)
    assert s["caption"].shape == (77,)


def test_srimage_dataset(tmp_path, rng):
    from PIL import Image
    from enhancing_tpu.data.srimage import SRImageTrain
    for i in range(2):
        arr = (rng.random((300, 300, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{i}.png")
    ds = SRImageTrain(root=str(tmp_path), resolution=64, downscale=4)
    s = ds[0]
    assert s["high resolution"].shape == (64, 64, 3)
    assert s["low resolution"].shape == (16, 16, 3)


def test_cc3m_dataset(tmp_path, rng):
    from PIL import Image
    if not os.path.exists(REF_VOCAB):
        pytest.skip("vocab file missing")
    from enhancing_tpu.data.cc3m import CC3MTrain
    (tmp_path / "imgs").mkdir()
    lines = []
    for i in range(2):
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / "imgs" / f"{i}.jpg")
        lines.append(f"imgs/{i}.jpg\ta caption number {i}")
    (tmp_path / "train_list.txt").write_text("\n".join(lines))
    ds = CC3MTrain(root=str(tmp_path), resolution=32,
                   tokenizer={"target":
                              "enhancing_tpu.utils.tokenizer.SimpleTokenizer",
                              "params": {"bpe_path": REF_VOCAB}})
    assert len(ds) == 2
    assert ds[0]["image"].shape == (32, 32, 3)


def test_native_ops_match_fallback(rng):
    from enhancing_tpu.data import native
    if not native.available():
        pytest.skip("no C++ toolchain")
    img = (rng.random((50, 70, 3)) * 255).astype(np.uint8)
    from PIL import Image
    ref = np.asarray(Image.fromarray(img).resize((32, 32), Image.BILINEAR))
    out = native.resize_bilinear(img, 32, 32)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1

    cf = native.crop_flip_normalize(img, 2, 3, 32, False)
    np.testing.assert_allclose(cf, img[2:34, 3:35].astype(np.float32) / 255,
                               atol=1e-6)


def test_dataloader_multihost_sharding():
    """Disjoint per-shard coverage of the full dataset."""
    ds = FakeImages(length=24, resolution=8)
    seen = []
    for shard in range(3):
        dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=1,
                        shard_id=shard, num_shards=3, seed=5)
        assert len(dl) == 2
        for b in dl:
            seen.extend(np.asarray(b["class"]).tolist())
    # shards together cover 24 distinct samples (same epoch permutation)
    classes_all = [int(ds[i]["class"]) for i in range(24)]
    assert sorted(seen) == sorted(classes_all)


def test_inaturalist_download_extract_pipeline(tmp_path):
    """download_and_extract verifies MD5 and unpacks a 2021-layout archive;
    INaturalistTrain(download=True, source=...) runs the whole pipeline
    (reference: enhancing/dataloader/inatural.py:24-40 tables + extract)."""
    import hashlib
    import tarfile

    from PIL import Image

    from enhancing_tpu.data.inatural import (
        DATASET_MD5,
        DATASET_URLS,
        INaturalistTrain,
        download_and_extract,
    )

    # reference URL/MD5 tables carried over verbatim
    assert set(DATASET_MD5) == set(DATASET_URLS)
    assert DATASET_MD5["2021_train"] == "e0526d53c7f7b2e3167b2b43bb2690ed"

    # build a tiny 2021-layout archive: train/<id super name>/*.jpg
    src = tmp_path / "src"
    rng = np.random.default_rng(0)
    for ci, cat in enumerate(["00001 Animalia Insecta", "00002 Plantae Rosa"]):
        d = src / "train" / cat
        d.mkdir(parents=True)
        for i in range(2):
            arr = rng.integers(0, 255, (48, 48, 3), np.uint8)
            Image.fromarray(arr).save(d / f"img{i}.jpg")
    archive = tmp_path / "train.tar.gz"
    with tarfile.open(archive, "w:gz") as tf:
        tf.add(src / "train", arcname="train")
    digest = hashlib.md5(archive.read_bytes()).hexdigest()

    # wrong digest must be rejected
    root_bad = tmp_path / "bad"
    with pytest.raises(RuntimeError, match="MD5 mismatch"):
        download_and_extract(root_bad, "2021_train", source=archive,
                             md5="0" * 32)

    root = tmp_path / "data"
    ds = INaturalistTrain(str(root), version="2021_train", resolution=32,
                          download=True, source=str(archive))
    assert len(ds) == 4
    assert ds.categories == ["00001 Animalia Insecta", "00002 Plantae Rosa"]
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["class"] == 0
    # explicit extract with the right digest also passes
    download_and_extract(tmp_path / "data2", "2021_train", source=archive,
                         md5=digest)


def test_classimage_get_batch_matches_per_sample(tmp_path, rng):
    """The native whole-batch fast path == per-sample PIL assembly (within
    the documented +-1/255 resize rounding) and flows through DataLoader."""
    from PIL import Image

    from enhancing_tpu.data import native
    from enhancing_tpu.data.classimage import (ClassImageTrain,
                                               ClassImageValidation)

    if not native.has_decoders():
        pytest.skip("native lib built without decoders")

    for i in range(3):
        for cls in ("cat", "dog"):
            d = tmp_path / "train" / cls
            d.mkdir(parents=True, exist_ok=True)
            img = (rng.random((60 + i * 7, 80 - i * 5, 3)) * 255
                   ).astype(np.uint8)
            Image.fromarray(img).save(d / f"{i}.jpg", quality=95)

    ds = ClassImageValidation(str(tmp_path), resolution=32, split="train")
    idx = [0, 2, 3, 5]
    batch = ds.get_batch(idx)
    ref = np.stack([ds[j]["image"] for j in idx])
    assert np.abs(batch["image"] - ref).max() <= (1.0 / 255 + 1e-6)
    np.testing.assert_array_equal(batch["class"],
                                  [ds[j]["class"] for j in idx])

    tr = ClassImageTrain(str(tmp_path), resolution=32)
    bt = tr.get_batch(idx)
    assert bt["image"].shape == (4, 32, 32, 3)
    assert 0.0 <= bt["image"].min() and bt["image"].max() <= 1.0

    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                    auto_shard=False)
    batches = list(dl)
    assert len(batches) == 3
    assert all(b["image"].shape == (2, 32, 32, 3) for b in batches)


def test_classimage_get_batch_corrupt_falls_back(tmp_path, rng):
    """A corrupt file inside a batch falls back to the per-sample path
    (which PIL also fails -> the loader surfaces the error) — here we use
    a non-native format PIL can read (bmp) to exercise the fallback."""
    from PIL import Image

    from enhancing_tpu.data import native
    from enhancing_tpu.data.classimage import ClassImageValidation

    if not native.has_decoders():
        pytest.skip("native lib built without decoders")

    d = tmp_path / "train" / "x"
    d.mkdir(parents=True)
    img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(d / "a.jpg", quality=95)
    Image.fromarray(img).save(d / "b.bmp")  # native decoder can't read bmp

    ds = ClassImageValidation(str(tmp_path), resolution=32, split="train")
    batch = ds.get_batch([0, 1])
    ref = np.stack([ds[j]["image"] for j in (0, 1)])
    assert np.abs(batch["image"] - ref).max() <= (1.0 / 255 + 1e-6)
