"""Minimal HTTP serving front-end for exported StableHLO artifacts.

Stdlib-only (http.server) — zero extra dependencies. Loads a sampler
artifact produced by scripts/export.py and serves:

    GET  /healthz                  -> {"ok": true}
    POST /sample {"classes": [...], "seed": 0}
                                   -> PNG grid (image/png)
    POST /encode  (stage-1 encode artifact; body: raw float32 NHWC bytes,
                   shape in X-Shape header "b,h,w,c") -> int32 codes bytes

Usage:
    python scripts/export.py -c <cfg> -o artifacts/
    python scripts/serve.py --artifact artifacts/sampler.jaxexport -p 8787

The artifact is shape-specialized at export time; requests are padded (and
truncated) to the exported batch, so one compiled program serves every
request — no recompilation at serving time.
"""
import argparse
import io
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_handler(sample_fn, batch: int, encode_fn=None):
    import jax.numpy as jnp

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, "batch": batch})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            try:
                if self.path == "/sample":
                    req = json.loads(raw or b"{}")
                    classes = np.asarray(req.get("classes", [0]),
                                         np.int32).reshape(-1)
                    seed = int(req.get("seed", 0))
                    k = min(len(classes), batch)
                    conds = np.zeros((batch, 1), np.int32)
                    conds[:k, 0] = classes[:k]
                    pixels = np.asarray(
                        sample_fn(jnp.asarray(conds), jnp.int32(seed)))[:k]
                    png = _to_png_grid(pixels)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(png)))
                    self.end_headers()
                    self.wfile.write(png)
                elif self.path == "/encode" and encode_fn is not None:
                    shape = tuple(int(s) for s in
                                  self.headers["X-Shape"].split(","))
                    x = np.frombuffer(raw, np.float32).reshape(shape)
                    codes = np.asarray(encode_fn(jnp.asarray(x)))
                    body = codes.astype(np.int32).tobytes()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/octet-stream")
                    self.send_header("X-Shape",
                                     ",".join(map(str, codes.shape)))
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._json(404, {"error": "unknown path"})
            except Exception as e:  # noqa: BLE001 — report, don't crash
                self._json(400, {"error": str(e)})

    return Handler


def _to_png_grid(pixels: np.ndarray) -> bytes:
    from enhancing_tpu.utils.logging import make_grid

    grid = make_grid(pixels)
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(
        buf, "PNG")
    return buf.getvalue()


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", required=True,
                   help="sampler.jaxexport from scripts/export.py")
    p.add_argument("--encode_artifact", default=None,
                   help="optional tokenizer_encode.jaxexport for /encode")
    p.add_argument("-p", "--port", type=int, default=8787)
    p.add_argument("--host", default="127.0.0.1")
    args = p.parse_args(argv)

    from enhancing_tpu.utils.compile_cache import maybe_enable_from_env

    maybe_enable_from_env()
    from enhancing_tpu.utils.export import load_artifact

    sample_fn = load_artifact(args.artifact)
    encode_fn = (load_artifact(args.encode_artifact)
                 if args.encode_artifact else None)
    # the exported batch size is the leading dim of the first input spec
    import jax.export

    exported = jax.export.deserialize(Path(args.artifact).read_bytes())
    batch = exported.in_avals[0].shape[0]

    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(sample_fn, batch, encode_fn))
    print(f"serving on http://{args.host}:{args.port} (batch={batch})")
    server.serve_forever()


if __name__ == "__main__":
    main()
