"""scripts/serve.py: HTTP serving of exported artifacts, driven end-to-end
over a real socket (healthz, PNG sampling with request padding, raw
encode)."""
import importlib.util
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np
import pytest

TINY = dict(dim=64, depth=2, heads=2, mlp_dim=128)
PORT = 8791


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from enhancing_tpu.utils.config import ConfigDict, initialize_from_config
    from enhancing_tpu.utils.export import export_sampler, export_tokenizer

    outdir = tmp_path_factory.mktemp("artifacts")
    cfg = ConfigDict({
        "target": "enhancing_tpu.models.stage2.transformer.CondTransformer",
        "params": {
            "cond_key": "class",
            "stage1": {
                "target": "enhancing_tpu.models.stage1.vitvqgan.ViTVQ",
                "params": {"image_size": 32, "patch_size": 8,
                           "encoder": TINY, "decoder": TINY,
                           "quantizer": {"embed_dim": 16, "n_embed": 32}}},
            "cond": {
                "target": "enhancing_tpu.models.cond.dummycond.ClassCond",
                "params": {"image_size": 32,
                           "class_name": "assets/class/imagenet.txt"}},
            "transformer": {
                "target": "enhancing_tpu.models.stage2.layers.GPT",
                "params": {"vocab_cond_size": 1000, "vocab_img_size": 32,
                           "embed_dim": 64, "cond_num_tokens": 1,
                           "img_num_tokens": 16, "n_heads": 2,
                           "n_layers": 2}}}})
    model = initialize_from_config(cfg)
    paths = export_sampler(model, batch=4, outdir=outdir, top_k=8)
    enc = export_tokenizer(model.stage1_model, batch=4, outdir=outdir)

    root = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "serve", root / "scripts" / "serve.py")
    serve = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve)

    argv = ["--artifact", str(paths["sample"]),
            "--encode_artifact", str(enc["encode"]), "-p", str(PORT)]
    t = threading.Thread(target=serve.main, args=(argv,), daemon=True)
    t.start()
    for _ in range(60):
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{PORT}/healthz", timeout=1)
            break
        except Exception:
            time.sleep(1)
    yield f"http://127.0.0.1:{PORT}"


def test_healthz(server):
    r = urllib.request.urlopen(f"{server}/healthz")
    assert json.loads(r.read()) == {"ok": True, "batch": 4}


def test_sample_returns_png(server):
    req = urllib.request.Request(
        f"{server}/sample",
        data=json.dumps({"classes": [1, 2, 3], "seed": 7}).encode(),
        headers={"Content-Type": "application/json"})
    r = urllib.request.urlopen(req, timeout=300)
    png = r.read()
    assert png[:4] == b"\x89PNG"
    assert r.headers["Content-Type"] == "image/png"


def test_encode_roundtrip(server):
    x = np.random.default_rng(0).random((4, 32, 32, 3)).astype(np.float32)
    req = urllib.request.Request(f"{server}/encode", data=x.tobytes(),
                                 headers={"X-Shape": "4,32,32,3"})
    r = urllib.request.urlopen(req, timeout=300)
    shape = tuple(int(s) for s in r.headers["X-Shape"].split(","))
    codes = np.frombuffer(r.read(), np.int32).reshape(shape)
    assert shape == (4, 16)
    assert (codes >= 0).all() and (codes < 32).all()


def test_bad_request_is_400_not_crash(server):
    req = urllib.request.Request(f"{server}/encode", data=b"short",
                                 headers={"X-Shape": "4,32,32,3"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400
    # server still alive
    urllib.request.urlopen(f"{server}/healthz", timeout=10)
