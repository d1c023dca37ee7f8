"""End-to-end continuous-batching server: concurrent /generate requests at
different admission times each get their own completed sequence."""
import importlib.util
import json
import threading
import urllib.request
from pathlib import Path

import pytest

PORT = 8791


@pytest.fixture(scope="module")
def server():
    root = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "serve_continuous", root / "scripts" / "serve_continuous.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = ["-c", "fake_gpt_tiny", "--slots", "2", "-p", str(PORT),
            "--top_k", "1"]
    t = threading.Thread(target=mod.main, args=(argv,), daemon=True)
    t.start()
    import time
    for _ in range(120):
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{PORT}/healthz", timeout=1)
            break
        except Exception:
            time.sleep(1)
    yield f"http://127.0.0.1:{PORT}"


def _generate(server, klass):
    req = urllib.request.Request(
        f"{server}/generate",
        data=json.dumps({"class": klass}).encode(),
        headers={"Content-Type": "application/json"})
    return json.loads(urllib.request.urlopen(req, timeout=300).read())


def test_healthz(server):
    r = json.loads(urllib.request.urlopen(f"{server}/healthz").read())
    assert r["ok"] and r["slots"] == 2


def test_concurrent_generate(server):
    """3 concurrent requests on 2 slots: the third admits only after a slot
    frees; all complete with full sequences; greedy sampling makes equal
    classes reproducible."""
    out = {}

    def worker(i, klass):
        out[i] = _generate(server, klass)

    ts = [threading.Thread(target=worker, args=(i, k))
          for i, k in enumerate((3, 3, 5))]
    for t in ts:
        t.start()
    for t in ts:
        t.join(300)
    assert set(out) == {0, 1, 2}
    for v in out.values():
        assert len(v["codes"]) == 16
        assert all(0 <= c < 128 for c in v["codes"])
    # same class + greedy -> identical codes regardless of admission order
    assert out[0]["codes"] == out[1]["codes"]


def test_decode_to_png(server):
    req = urllib.request.Request(
        f"{server}/generate",
        data=json.dumps({"class": 1, "decode": True}).encode(),
        headers={"Content-Type": "application/json"})
    resp = urllib.request.urlopen(req, timeout=300)
    assert resp.headers["Content-Type"] == "image/png"
    body = resp.read()
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


PORT_RQ = 8792


@pytest.fixture(scope="module")
def rq_server():
    root = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "serve_continuous_rq", root / "scripts" / "serve_continuous.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = ["-c", "fake_rq_tiny", "--slots", "2", "-p", str(PORT_RQ),
            "--top_k", "1"]
    t = threading.Thread(target=mod.main, args=(argv,), daemon=True)
    t.start()
    import time
    for _ in range(120):
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{PORT_RQ}/healthz", timeout=1)
            break
        except Exception:
            time.sleep(1)
    yield f"http://127.0.0.1:{PORT_RQ}"


def test_rq_generate(rq_server):
    out = _generate(rq_server, 4)
    codes = out["codes"]                    # (T, D) nested lists
    assert len(codes) == 16 and all(len(c) == 2 for c in codes)
    assert all(0 <= x < 128 for row in codes for x in row)


PORT_Q8 = 8793


@pytest.fixture(scope="module")
def int8_server():
    root = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "serve_continuous_q8", root / "scripts" / "serve_continuous.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = ["-c", "fake_gpt_tiny", "--slots", "2", "-p", str(PORT_Q8),
            "--top_k", "1", "--int8"]
    t = threading.Thread(target=mod.main, args=(argv,), daemon=True)
    t.start()
    import time
    for _ in range(120):
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{PORT_Q8}/healthz", timeout=1)
            break
        except Exception:
            time.sleep(1)
    yield f"http://127.0.0.1:{PORT_Q8}"


def test_int8_generate(int8_server):
    """--int8 serving (quantized weights, dropped bf16 kernels, int8 KV):
    requests complete with full valid sequences through the same HTTP
    surface."""
    out = _generate(int8_server, 3)
    codes = out["codes"]
    assert len(codes) == 16
    assert all(0 <= int(x) < 128 for x in codes)
